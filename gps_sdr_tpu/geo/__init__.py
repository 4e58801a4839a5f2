"""Geodesy / navigation math: coordinates, SV ephemeris, atmosphere, earth rotation."""

from gps_sdr_tpu.geo.coords import xyz2llh, llh2xyz, xyz2enu, enu2xyz, enu_rotation
from gps_sdr_tpu.geo.ephemeris import sv_pos_vel_clock
from gps_sdr_tpu.geo.atmosphere import klobuchar_delay, tropo_unb3_delay
from gps_sdr_tpu.geo.earth import earth_rotation_correction

__all__ = [
    "xyz2llh", "llh2xyz", "xyz2enu", "enu2xyz", "enu_rotation",
    "sv_pos_vel_clock", "klobuchar_delay", "tropo_unb3_delay",
    "earth_rotation_correction",
]
