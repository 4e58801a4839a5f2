"""Positioning: WLS PVT + DOP, Doppler velocity LS, vector-tracking EKF."""

from gps_sdr_tpu.positioning.wls import (geometry_matrix, iterated_ls_position,
                                         doppler_velocity_ls, dop_from_geometry)

__all__ = ["geometry_matrix", "iterated_ls_position", "doppler_velocity_ls",
           "dop_from_geometry"]
