"""Least-squares position and velocity solutions.

Equivalents of the reference's `olspos.m` (iterated Gauss-Newton on
pseudoranges with G/P/H/V-DOP from (HᵀH)⁻¹), `hmat.m` (unit line-of-sight
geometry matrix), and `LS_SA_code_Vel.m` (one-shot Doppler velocity LS,
goGPS lineage).  Written with jnp + fixed iteration counts so the same
code runs on host (f64) and inside jitted device loops.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gps_sdr_tpu.config import C_LIGHT


def geometry_matrix(sv_pos: jnp.ndarray, usr_pos: jnp.ndarray) -> jnp.ndarray:
    """(N,4) rows [unit(usr−sv), 1] (hmat.m:8-21)."""
    diff = usr_pos[None, :3] - sv_pos
    rng = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    return jnp.concatenate([diff / rng, jnp.ones_like(rng)], axis=-1)


def iterated_ls_position(pr: jnp.ndarray, sv_pos: jnp.ndarray,
                         init_state: jnp.ndarray, n_iter: int = 10
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton pseudorange solution (olspos.m:40-53).

    `init_state` = [x, y, z, clk_m].  The reference iterates until
    ‖Δ‖<1e-3 m; a fixed 10 iterations converges far past that from any
    terrestrial initialization.  Returns (state, dop[G,P,H,V]).
    """
    state = jnp.asarray(init_state, jnp.float64)
    pr = jnp.asarray(pr, jnp.float64)
    sv_pos = jnp.asarray(sv_pos, jnp.float64)
    H = geometry_matrix(sv_pos, state[:3])
    for _ in range(n_iter):
        rng = jnp.linalg.norm(sv_pos - state[None, :3], axis=-1)
        y = pr - rng - state[3]
        H = geometry_matrix(sv_pos, state[:3])
        beta, *_ = jnp.linalg.lstsq(H, y)
        state = state + beta
    dop = dop_from_geometry(H)
    return state, dop


def dop_from_geometry(H: jnp.ndarray) -> jnp.ndarray:
    """[GDOP, PDOP, HDOP, VDOP] from (HᵀH)⁻¹ (olspos.m:56-61).

    NB: like the reference, DOP is computed in ECEF axes (H/VDOP split on
    ECEF z, not local ENU).
    """
    q = jnp.linalg.inv(H.T @ H)
    d = jnp.diagonal(q)
    return jnp.stack([
        jnp.sqrt(jnp.trace(q)),
        jnp.sqrt(d[0] + d[1] + d[2]),
        jnp.sqrt(d[0] + d[1]),
        jnp.sqrt(d[2]),
    ])


def doppler_velocity_ls(usr_pos: jnp.ndarray, sv_pos: jnp.ndarray,
                        sv_vel: jnp.ndarray, doppler_hz: jnp.ndarray,
                        wavelength_m: float, sv_clk_rate_ms: jnp.ndarray):
    """One-shot velocity + clock-drift LS (LS_SA_code_Vel.m:58-97).

    doppler_hz is the tracked carrier frequency minus IF;  y0 = +dop·λ
    with the reference's sign convention (LS_SA_code_Vel.m:81).
    Returns (vel_ecef (3,), clk_drift m/s, residuals).
    """
    usr_pos = jnp.asarray(usr_pos, jnp.float64)
    sv_pos = jnp.asarray(sv_pos, jnp.float64)
    diff = usr_pos[None, :] - sv_pos
    rng = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    A = jnp.concatenate([diff / rng, jnp.ones_like(rng)], axis=-1)
    b = jnp.sum(A[:, :3] * sv_vel, axis=-1) - jnp.asarray(sv_clk_rate_ms)
    y0 = jnp.asarray(doppler_hz, jnp.float64) * wavelength_m
    x, *_ = jnp.linalg.lstsq(A, y0 - b)
    residuals = y0 - b - x[3]
    return x[:3], x[3], residuals
