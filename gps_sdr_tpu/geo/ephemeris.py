"""IS-GPS-200 broadcast-ephemeris satellite position / velocity / clock.

Vectorized Kepler solver equivalent to the reference's `geo/svPosVel.m`:
clock polynomial − TGD, week-rollover normalization, fixed-point Kepler
iteration, harmonic corrections, ECEF position, analytic velocity, and the
relativistic clock term.  Re-designed for XLA: all channels evaluated at
once as (N,) arrays, the Kepler iteration is a fixed-trip `fori_loop`
(converges to <1e-13 well inside 12 iterations — svPosVel.m:94-100 allows
10), and week rollover is a closed-form mod instead of a data-dependent
while-loop (svPosVel.m:49-59).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

GPS_PI = 3.1415926535898
MU_EARTH = 3.986005e14
OMEGA_E_DOT = 7.2921151467e-5
F_REL = -4.442807633e-10
C_LIGHT = 299_792_458.0
WEEK_SECONDS = 604800.0


class Ephemeris(NamedTuple):
    """One broadcast ephemeris per channel — every field is shape (N,).

    Field names follow IS-GPS-200 (and the reference's eph struct,
    ini_eph.m:19-55).  Angles in radians, times in seconds of week.
    """
    sqrta: jnp.ndarray
    ecc: jnp.ndarray
    m0: jnp.ndarray
    omega0: jnp.ndarray   # Ω0, longitude of ascending node
    i0: jnp.ndarray
    w: jnp.ndarray        # argument of perigee
    deltan: jnp.ndarray
    omegadot: jnp.ndarray
    idot: jnp.ndarray
    cuc: jnp.ndarray
    cus: jnp.ndarray
    crc: jnp.ndarray
    crs: jnp.ndarray
    cic: jnp.ndarray
    cis: jnp.ndarray
    toe: jnp.ndarray
    toc: jnp.ndarray
    af0: jnp.ndarray
    af1: jnp.ndarray
    af2: jnp.ndarray
    tgd: jnp.ndarray

    @staticmethod
    def stack(eph_list) -> "Ephemeris":
        return Ephemeris(*[jnp.asarray([getattr(e, f) for e in eph_list],
                                       dtype=jnp.float64)
                           for f in Ephemeris._fields])


def _wrap_week(t):
    """Normalize a time difference into [-302400, 302400] (svPosVel.m:49-59)."""
    return jnp.mod(t + WEEK_SECONDS / 2, WEEK_SECONDS) - WEEK_SECONDS / 2


@jax.jit
def sv_pos_vel_clock(eph: Ephemeris, t):
    """SV ECEF position, velocity, and clock at transmit time `t` (s of week).

    Returns dict with:
      pos (…,3) m, vel (…,3) m/s,
      clk_m     — clock correction in meters incl. relativistic term
                  (svPosVel.m:174-175),
      clk_rate_ms — clock drift in m/s (svPosVel.m:177),
      tgd_s     — broadcast group delay in seconds (svPosVel.m:176).

    The orbit is evaluated at tk = (t − clkcorr) − toe where clkcorr is the
    polynomial clock (incl. −TGD), matching svPosVel.m:61-72.
    """
    t = jnp.asarray(t, dtype=jnp.float64)
    tkc = _wrap_week(t - eph.toc)
    clkcorr = (eph.af0 + eph.af1 * tkc + eph.af2 * tkc * tkc) - eph.tgd
    tk = _wrap_week((t - clkcorr) - eph.toe)

    a = eph.sqrta * eph.sqrta
    n0 = jnp.sqrt(MU_EARTH / (a * a * a))
    n = n0 + eph.deltan
    mk = jnp.mod(eph.m0 + n * tk + 2 * GPS_PI, 2 * GPS_PI)

    def kepler_body(_, ek):
        return mk + eph.ecc * jnp.sin(ek)

    ek = jax.lax.fori_loop(0, 12, kepler_body, mk)
    ek = jnp.mod(ek + 2 * GPS_PI, 2 * GPS_PI)
    cek, sek = jnp.cos(ek), jnp.sin(ek)
    c1 = 1.0 - eph.ecc * cek
    ek_dot = n / c1
    c2 = jnp.sqrt(1.0 - eph.ecc * eph.ecc)
    vk = jnp.arctan2(c2 * sek / c1, (cek - eph.ecc) / c1)
    vk_dot = ek_dot * c2 / c1

    phik = jnp.mod(vk + eph.w, 2 * GPS_PI)
    c2p, s2p = jnp.cos(2 * phik), jnp.sin(2 * phik)

    uk = phik + eph.cus * s2p + eph.cuc * c2p
    uk_dot = vk_dot * (1.0 + 2.0 * (eph.cus * c2p - eph.cuc * s2p))
    rk = a * c1 + eph.crs * s2p + eph.crc * c2p
    rk_dot = a * eph.ecc * ek_dot * sek + 2.0 * vk_dot * (eph.crs * c2p - eph.crc * s2p)
    ik = eph.i0 + eph.cis * s2p + eph.cic * c2p + eph.idot * tk
    ik_dot = eph.idot + vk_dot * 2.0 * (eph.cis * c2p - eph.cic * s2p)

    cuk, suk = jnp.cos(uk), jnp.sin(uk)
    xxk = rk * cuk
    yyk = rk * suk
    xxk_dot = rk_dot * cuk - uk_dot * rk * suk
    yyk_dot = rk_dot * suk + uk_dot * rk * cuk

    omgk = jnp.mod(eph.omega0 + (eph.omegadot - OMEGA_E_DOT) * tk
                   - OMEGA_E_DOT * eph.toe + 2 * GPS_PI, 2 * GPS_PI)
    odot = eph.omegadot - OMEGA_E_DOT
    co, so = jnp.cos(omgk), jnp.sin(omgk)
    ci, si = jnp.cos(ik), jnp.sin(ik)

    pos = jnp.stack([
        xxk * co - yyk * ci * so,
        xxk * so + yyk * ci * co,
        yyk * si,
    ], axis=-1)
    vel = jnp.stack([
        xxk_dot * co - odot * xxk * so - yyk_dot * ci * so
        + ik_dot * yyk * si * so - odot * yyk * ci * co,
        xxk_dot * so + odot * xxk * co + yyk_dot * ci * co
        - ik_dot * yyk * si * co - odot * yyk * ci * so,
        yyk_dot * si + ik_dot * yyk * ci,
    ], axis=-1)

    c3 = F_REL * eph.ecc * eph.sqrta
    clk_m = C_LIGHT * (eph.af0 + eph.af1 * tkc + eph.af2 * tkc * tkc + c3 * sek)
    clk_rate_ms = C_LIGHT * (eph.af1 + 2.0 * eph.af2 * tkc + c3 * cek * ek_dot)

    return {"pos": pos, "vel": vel, "clk_m": clk_m,
            "clk_rate_ms": clk_rate_ms, "tgd_s": eph.tgd}
