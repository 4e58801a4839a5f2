"""Atmospheric delay models: Klobuchar ionosphere + UNB3 troposphere.

Equivalents of the reference's `geo/ionocorr.m` (GPSoft 8-coefficient
broadcast Klobuchar) and `geo/trop_UNB3.m` + `Get_UNB3_Model.m` +
`Trop_Saastamoinen_UNB3_Components.m` + `Trop_Black_Eisner_Map.m`
(Saastamoinen zenith delays from the UNB3 5-latitude table with annual
cycle, Black & Eisner mapping).  Branch-free jnp formulations so they can
live inside the jitted VT scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gps_sdr_tpu.geo.coords import xyz2llh, xyz2enu

C_LIGHT = 299_792_458.0


@jax.jit
def klobuchar_delay(gps_tow_s, sv_xyz, usr_xyz, alpha, beta):
    """Klobuchar ionospheric group delay [m].

    Faithful to geo/ionocorr.m including its quirk of using the *satellite*
    LLH for the "user" latitude/longitude terms (ionocorr.m:24,34,40 pass
    `svxyz` into xyz2llh) — kept for output parity with the reference.
    """
    alpha = jnp.asarray(alpha, dtype=jnp.float64)
    beta = jnp.asarray(beta, dtype=jnp.float64)
    sv_llh = xyz2llh(sv_xyz)
    enu = xyz2enu(sv_xyz, usr_xyz)
    el = jnp.arctan2(enu[..., 2], jnp.linalg.norm(enu[..., :2], axis=-1))
    az = jnp.arctan2(enu[..., 0], enu[..., 1])
    E = el / jnp.pi    # semicircles
    F = 1.0 + 16.0 * (0.53 - E) ** 3
    psi = 0.00137 / (E + 0.11) - 0.022

    phiu = sv_llh[..., 0] / jnp.pi
    phii = jnp.clip(phiu + psi * jnp.cos(az), -0.416, 0.416)
    lambdau = sv_llh[..., 1] / jnp.pi
    lambdai = lambdau + psi * jnp.sin(az) / jnp.cos(phii * jnp.pi)
    phim = phii + 0.064 * jnp.cos((lambdai - 1.616) * jnp.pi)

    t = jnp.mod(4.32e4 * lambdai + gps_tow_s, 86400.0)
    per = beta[0] + beta[1] * phim + beta[2] * phim ** 2 + beta[3] * phim ** 3
    per = jnp.maximum(per, 72000.0)
    x = 2.0 * jnp.pi * (t - 50400.0) / per
    amp = alpha[0] + alpha[1] * phim + alpha[2] * phim ** 2 + alpha[3] * phim ** 3
    amp = jnp.maximum(amp, 0.0)
    t_iono = jnp.where(jnp.abs(x) < 1.57,
                       F * (5e-9 + amp * (1.0 - x * x / 2.0 + x ** 4 / 24.0)),
                       F * 5e-9)
    return t_iono * C_LIGHT


# UNB3 look-up tables: lat [deg], P0 [mbar], T0 [K], WVP [mbar], beta, lambda
_UNB3_AVG = jnp.array([
    [15.0, 1013.25, 299.65, 26.31, 0.00630, 2.77],
    [30.0, 1017.25, 294.15, 21.79, 0.00605, 3.15],
    [45.0, 1015.75, 283.15, 11.66, 0.00558, 2.57],
    [60.0, 1011.75, 272.15, 6.78, 0.00539, 1.81],
    [75.0, 1013.00, 263.65, 4.11, 0.00453, 1.55],
], dtype=jnp.float64)
_UNB3_AMP = jnp.array([
    [15.0, 0.00, 0.00, 0.00, 0.00000, 0.00],
    [30.0, -3.75, 7.00, 8.85, 0.00025, 0.33],
    [45.0, -2.25, 11.00, 7.24, 0.00032, 0.46],
    [60.0, -1.75, 15.00, 5.36, 0.00081, 0.74],
    [75.0, -0.50, 14.50, 3.39, 0.00062, 0.30],
], dtype=jnp.float64)

_UNB3_GM = 9.80665
_UNB3_RD = 287.054
_UNB3_K1 = 0.000077604
_UNB3_K2 = 0.382


def _unb3_surface(doy, lat_deg, alt_m):
    """Interpolated UNB3 met values at altitude (Get_UNB3_Model.m)."""
    doy = jnp.where(lat_deg < 0.0, doy - 211.0, doy - 28.0)
    cosphs = jnp.cos(doy * 2.0 * jnp.pi / 365.25)
    lat = jnp.abs(lat_deg)
    # index into the 15..75 table with linear interpolation
    p1 = jnp.clip(jnp.floor((lat - 15.0) / 15.0).astype(jnp.int32), 0, 4)
    p2 = jnp.clip(p1 + 1, 0, 4)
    same = (lat >= 75.0) | (lat <= 15.0)
    p1 = jnp.where(lat <= 15.0, 0, jnp.where(lat >= 75.0, 4, p1))
    p2 = jnp.where(same, p1, p2)
    denom = jnp.where(same, 1.0, _UNB3_AVG[p2, 0] - _UNB3_AVG[p1, 0])
    m = jnp.where(same, 0.0, (lat - _UNB3_AVG[p1, 0]) / denom)

    avg = _UNB3_AVG[p1, 1:] + m[..., None] * (_UNB3_AVG[p2, 1:] - _UNB3_AVG[p1, 1:])
    amp = _UNB3_AMP[p1, 1:] + m[..., None] * (_UNB3_AMP[p2, 1:] - _UNB3_AMP[p1, 1:])
    surf = avg - amp * cosphs[..., None]
    p0, t0, wvp0, beta, lam = (surf[..., 0], surf[..., 1], surf[..., 2],
                               surf[..., 3], surf[..., 4])
    ep = _UNB3_GM / _UNB3_RD
    t = t0 - beta * alt_m
    p = p0 * (t / t0) ** (ep / beta)
    wvp = wvp0 * (t / t0) ** (ep * (lam + 1.0) / beta - 1.0)
    return t, t0, p, wvp, beta, lam


def tropo_hopfield_delay(el_deg, h_m=0.0):
    """Hopfield dry-component troposphere (geo/tropocorr.m) — the unused
    alternate model the reference ships; kept for capability parity."""
    el = jnp.deg2rad(jnp.asarray(el_deg, jnp.float64))
    # standard atmosphere at height h
    p = 1013.25 * (1.0 - 2.2557e-5 * h_m) ** 5.2568
    t = 288.15 - 6.5e-3 * h_m
    kd = 1.55208e-4 * p * (40136.0 + 148.72 * (t - 273.16)) / t
    return kd / jnp.sin(jnp.sqrt(el * el + 1.904e-3))


@jax.jit
def tropo_unb3_delay(doy, lat_deg, alt_m, el_deg):
    """UNB3 tropospheric delay [m]: Saastamoinen zenith × Black&Eisner map.

    (trop_UNB3.m: dry map reused for wet.)
    """
    t, t0, p, wvp, beta, lam = _unb3_surface(
        jnp.asarray(doy, jnp.float64), jnp.asarray(lat_deg, jnp.float64),
        jnp.asarray(alt_m, jnp.float64))
    k_dry = p * _UNB3_K1 * _UNB3_RD / _UNB3_GM
    k_wet = wvp * _UNB3_K2 * _UNB3_RD / (
        (_UNB3_GM * (lam + 1.0) - beta * _UNB3_RD) * t0)
    cos_el = jnp.cos(jnp.deg2rad(jnp.asarray(el_deg, jnp.float64)))
    m_dry = 1.0 / jnp.sqrt(1.0 - cos_el * cos_el / 1.002001)
    return k_dry * m_dry + k_wet * m_dry


def igs_tec_slant_delay(time_user_s, user_lat_deg, user_lon_deg, el_rad,
                        grid_tecu_early, grid_tecu_late,
                        time_early_s, time_late_s,
                        corner_sw=(22.5, 120.0), d_lat=2.5, d_lon=5.0,
                        shell_h_km=450.0, f_hz=1575.42e6):
    """IGS TEC-grid ionospheric slant delay [m] — the reference's unused
    alternate model `geo/igs_iono.m` (hard-coded 4-corner grid, two
    epochs 2 h apart, thin-shell obliquity).

    The grid is a parameter here instead of a hard-coded capture
    snapshot: `grid_tecu_early/late` are the 4 corner vertical-TEC
    values [TECU] at `time_early_s`/`time_late_s`, ordered
    (SW, SE, NE, NW) around the cell whose south-west corner is
    `corner_sw` (igs_iono.m:10-25 lists them per capture).  Time
    interpolation is linear between the two epochs (igs_iono.m:27-30),
    position interpolation bilinear in the cell, the obliquity factor is
    the single-layer model sec(asin(Re/(Re+h)·cos(el)))
    (igs_iono.m:44), and the vertical delay is 40.3/f²·TEC
    (igs_iono.m:45).

    NB the reference file carries transcription defects it never has to
    face because it is dead code (a shadowed corner variable at
    igs_iono.m:16-17, missing parentheses in the bilinear weights
    :35-36, a stray `cos(...)`/`*1-1` in the vertical delay :39,:45);
    this implements the model those lines intend.
    """
    w = (jnp.asarray(time_user_s, jnp.float64) - time_early_s) / (
        time_late_s - time_early_s)
    tec4 = ((1.0 - w) * jnp.asarray(grid_tecu_early, jnp.float64)
            + w * jnp.asarray(grid_tecu_late, jnp.float64))
    sw, se, ne, nw = tec4[0], tec4[1], tec4[2], tec4[3]
    p = (jnp.asarray(user_lat_deg, jnp.float64) - corner_sw[0]) / d_lat
    q = (jnp.asarray(user_lon_deg, jnp.float64) - corner_sw[1]) / d_lon
    tec = ((1 - p) * (1 - q) * sw + (1 - p) * q * se
           + p * q * ne + p * (1 - q) * nw)
    re_km = 6378.137
    cos_el = jnp.cos(jnp.asarray(el_rad, jnp.float64))
    obliq = 1.0 / jnp.cos(jnp.arcsin(
        re_km / (re_km + shell_h_km) * cos_el))
    i_vert = 40.3 / (f_hz * f_hz) * tec * 1e16
    return obliq * i_vert
