"""Geodesy library tests: coordinate round-trips, Kepler orbit sanity, atmosphere."""

import numpy as np
import pytest

from gps_sdr_tpu.config import C_LIGHT
from gps_sdr_tpu.geo import (earth_rotation_correction, enu2xyz, llh2xyz,
                             klobuchar_delay, sv_pos_vel_clock,
                             tropo_unb3_delay, xyz2enu, xyz2llh)
from gps_sdr_tpu.geo.ephemeris import Ephemeris

# Ground-truth antenna location from the reference (initParameters.m:23)
TRUTH_LLH = np.array([np.deg2rad(22.328444770087565),
                      np.deg2rad(114.1713630049711), 4.0])


def make_eph(n=1, **overrides):
    """A plausible GPS ephemeris (PRN-3-like values from BASELINE.md)."""
    base = dict(
        sqrta=5153.6413, ecc=0.00122963, m0=2.14587329, omega0=1.25789432,
        i0=0.96679784, w=-0.89245321, deltan=4.3267e-09, omegadot=-7.2345e-09,
        idot=-4.2e-10, cuc=1.5272e-07, cus=2.3842e-07, crc=287.46875,
        crs=-2.59375, cic=-7.45058e-09, cis=1.3039e-08, toe=388800.0,
        toc=388800.0, af0=1.8364e-04, af1=2.0464e-12, af2=0.0,
        tgd=-7.4506e-09)
    base.update(overrides)
    return Ephemeris(**{k: np.full((n,), v, dtype=np.float64)
                        for k, v in base.items()})


def test_llh_xyz_roundtrip():
    xyz = np.asarray(llh2xyz(TRUTH_LLH))
    llh = np.asarray(xyz2llh(xyz))
    # Kaplan's closed form is accurate to ~1e-8 rad (cm level) at this point.
    np.testing.assert_allclose(llh[:2], TRUTH_LLH[:2], atol=2e-8)
    assert abs(llh[2] - TRUTH_LLH[2]) < 1e-2
    # Hong Kong is ~ (-2.4e6, 5.4e6, 2.4e6) in ECEF
    assert np.linalg.norm(xyz) == pytest.approx(6378137, rel=2e-3)


def test_enu_roundtrip_and_orientation():
    org = np.asarray(llh2xyz(TRUTH_LLH))
    up = np.asarray(llh2xyz(TRUTH_LLH + [0, 0, 100.0]))
    enu = np.asarray(xyz2enu(up, org))
    np.testing.assert_allclose(enu, [0, 0, 100.0], atol=1e-6)
    north = np.asarray(llh2xyz(TRUTH_LLH + [1e-6, 0, 0]))
    enu_n = np.asarray(xyz2enu(north, org))
    assert enu_n[1] > 0 and abs(enu_n[0]) < 1e-6
    back = np.asarray(enu2xyz(enu, org))
    np.testing.assert_allclose(back, up, atol=1e-6)


def test_sv_orbit_radius_and_velocity():
    eph = make_eph(2)
    out = sv_pos_vel_clock(eph, np.array([388800.0, 389800.0]))
    r = np.linalg.norm(np.asarray(out["pos"]), axis=-1)
    # GPS orbital radius ≈ 26,560 km
    np.testing.assert_allclose(r, 26.56e6, rtol=2e-3)
    v = np.linalg.norm(np.asarray(out["vel"]), axis=-1)
    # ECEF-frame GPS SV speed is ~3.3-4.3 km/s (orbital 3.9 km/s ± earth rotation)
    assert np.all((v > 2.5e3) & (v < 5.0e3))


def test_sv_velocity_consistent_with_finite_difference():
    eph = make_eph(1)
    t0 = 389000.0
    dt = 0.5
    p0 = np.asarray(sv_pos_vel_clock(eph, np.array([t0 - dt]))["pos"])[0]
    p1 = np.asarray(sv_pos_vel_clock(eph, np.array([t0 + dt]))["pos"])[0]
    v = np.asarray(sv_pos_vel_clock(eph, np.array([t0]))["vel"])[0]
    fd = (p1 - p0) / (2 * dt)
    np.testing.assert_allclose(v, fd, atol=2e-2)


def test_sv_clock_terms():
    eph = make_eph(1)
    out = sv_pos_vel_clock(eph, np.array([388800.0]))
    # af0 ≈ 1.8364e-4 s → ~55 km in meters, minus TGD (+2.2m) + relativity
    assert abs(np.asarray(out["clk_m"])[0] - 1.8364e-04 * C_LIGHT) < 100.0
    assert abs(np.asarray(out["clk_rate_ms"])[0]) < 1.0


def test_klobuchar_plausible():
    usr = np.asarray(llh2xyz(TRUTH_LLH))
    # place an SV roughly overhead at 26,560 km radius
    sv = usr / np.linalg.norm(usr) * 26.56e6
    alpha = (9.3132e-09, 1.4901e-08, -5.9605e-08, -1.1921e-07)
    beta = (8.8064e+04, 4.9152e+04, -1.3107e+05, -3.2768e+05)
    d = float(klobuchar_delay(50400.0, sv, usr, alpha, beta))
    assert 0.5 < d < 40.0  # meters, daytime zenith-ish


def test_tropo_unb3_plausible():
    d_zenith = float(tropo_unb3_delay(171, 22.33, 4.0, 90.0))
    d_low = float(tropo_unb3_delay(171, 22.33, 4.0, 10.0))
    assert 2.0 < d_zenith < 3.0      # typical ~2.4 m zenith total delay
    assert d_low > 3.0 * d_zenith    # mapping grows at low elevation


def test_earth_rotation_correction_magnitude():
    sv = np.array([26.56e6, 0.0, 0.0])
    pr = 22e6
    rot = np.asarray(earth_rotation_correction(sv, pr))
    # rotation angle ωe·pr/c ≈ 5.35e-6 rad → ~142 m displacement
    disp = np.linalg.norm(rot - sv)
    assert 100.0 < disp < 200.0
    assert rot[1] < 0  # rotated by +theta: y picks up +s*x... check sign
