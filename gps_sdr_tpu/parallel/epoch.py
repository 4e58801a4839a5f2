"""Sharded measurement-epoch solvers.

At a WLS epoch every channel contributes one geometry row and one
residual (trackingCT_POS_updated.m:512-514).  With channels sharded over
devices, the normal equations HᵀWH (4×4) and HᵀWy (4,) are formed
locally and reduced with `psum` over the mesh — the receiver's natural
20 ms synchronization point mapped onto ICI collectives (SURVEY.md
§2.9).  Every device then solves the replicated 4×4 system identically.

`sharded_wls_epoch` reproduces the FULL production epoch semantics of
`positioning/wls.py` — iterated Gauss-Newton position (10 iterations),
G/P/H/V-DOP from (HᵀWH)⁻¹, Doppler velocity LS, and per-channel
validity weights — so `receiver/ct.py` can swap it in for the host
solver unchanged (pipeline.Receiver does this when given a mesh).
Channels are padded to a multiple of the mesh size with zero-weight
rows; weights make padding and gated-out channels exact no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gps_sdr_tpu.parallel.mesh import AXIS


def sharded_wls_normal_equations(mesh: Mesh):
    """One Gauss-Newton step via psum — the minimal collective pattern
    (kept for the dryrun and as the building block's unit test)."""

    def local(sv_pos, resid, usr):
        diff = usr[None, :] - sv_pos
        rng = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        h = jnp.concatenate([diff / rng, jnp.ones_like(rng)], axis=-1)
        hth = jax.lax.psum(h.T @ h, AXIS)
        hty = jax.lax.psum(h.T @ resid, AXIS)
        return jnp.linalg.solve(hth, hty)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(AXIS, None), P(AXIS), P(None)),
                       out_specs=P(None), check_vma=False)
    return jax.jit(fn)


def sharded_wls_epoch(mesh: Mesh, n_iter: int = 10):
    """Full WLS epoch with channels sharded over the mesh.

    Returns fn(pr, sv_pos, sv_vel, doppler_mps, sv_clk_rate, weight,
    init_state) → (state (4,), dop (4,), vel (3,), clk_drift ()):

    - `pr` (N,) corrected pseudoranges, `sv_pos` (N,3) rotated SV
      positions, `weight` (N,) 1.0 for channels in the solution / 0.0
      for gated-out or padding rows,
    - position: `n_iter` Gauss-Newton steps on the weighted normal
      equations, psum-reduced per iteration (olspos.m:40-53 semantics),
    - DOP from (HᵀWH)⁻¹ of the final geometry (olspos.m:56-61),
    - velocity: one-shot weighted LS on `doppler_mps` = λ·(carrFreq−IF)
      (LS_SA_code_Vel.m:58-97 semantics).
    """

    def local(pr, sv_pos, sv_vel, doppler_mps, sv_clk_rate, weight,
              init_state):
        w = weight[:, None]

        def gn_step(state, _):
            diff = state[None, :3] - sv_pos
            rng = jnp.linalg.norm(diff, axis=-1, keepdims=True)
            h = jnp.concatenate([diff / rng, jnp.ones_like(rng)], axis=-1)
            y = pr - rng[:, 0] - state[3]
            hth = jax.lax.psum((w * h).T @ h, AXIS)
            hty = jax.lax.psum((w * h).T @ y, AXIS)
            return state + jnp.linalg.solve(hth, hty), None

        state, _ = jax.lax.scan(gn_step, init_state, None, length=n_iter)

        diff = state[None, :3] - sv_pos
        rng = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        h = jnp.concatenate([diff / rng, jnp.ones_like(rng)], axis=-1)
        ata = jax.lax.psum((w * h).T @ h, AXIS)  # shared: DOP + velocity
        q = jnp.linalg.inv(ata)
        d = jnp.diagonal(q)
        dop = jnp.stack([jnp.sqrt(jnp.trace(q)),
                         jnp.sqrt(d[0] + d[1] + d[2]),
                         jnp.sqrt(d[0] + d[1]), jnp.sqrt(d[2])])

        b = jnp.sum(h[:, :3] * sv_vel, axis=-1) - sv_clk_rate
        y0 = doppler_mps - b
        aty = jax.lax.psum((w * h).T @ y0, AXIS)
        x = jnp.linalg.solve(ata, aty)
        return state, dop, x[:3], x[3:4]   # drift as (1,): shard_map
        # outputs must have at least one axis

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS), P(None)),
        out_specs=(P(None), P(None), P(None), P(None)), check_vma=False)
    return jax.jit(fn)


def make_epoch_solver(mesh: Mesh, wavelength_m: float):
    """Adapter with the host-solver calling convention used by
    `receiver/ct.py`: solver(prvec, sv_pos_rot, sv_vel, doppler_hz,
    sv_clk_rate, valid_mask, init_state) → (state, dop, vel, drift),
    padding channels to the mesh size internally."""
    import numpy as np

    fn = sharded_wls_epoch(mesh)
    size = mesh.size

    def solver(prvec, sv_pos_rot, sv_vel, doppler_hz, sv_clk_rate,
               valid, init_state):
        n = len(prvec)
        pad = (-n) % size
        w = valid.astype(np.float64)
        if pad:
            prvec = np.concatenate([prvec, np.zeros(pad)])
            sv_pos_rot = np.concatenate(
                [sv_pos_rot, np.tile(sv_pos_rot[:1], (pad, 1))])
            sv_vel = np.concatenate([sv_vel, np.zeros((pad, 3))])
            doppler_hz = np.concatenate([doppler_hz, np.zeros(pad)])
            sv_clk_rate = np.concatenate([sv_clk_rate, np.zeros(pad)])
            w = np.concatenate([w, np.zeros(pad)])
        state, dop, vel, drift = fn(
            jnp.asarray(prvec), jnp.asarray(sv_pos_rot),
            jnp.asarray(sv_vel), jnp.asarray(doppler_hz * wavelength_m),
            jnp.asarray(sv_clk_rate), jnp.asarray(w),
            jnp.asarray(init_state, jnp.float64))
        return (np.asarray(state), np.asarray(dop), np.asarray(vel),
                float(np.asarray(drift)[0]))

    return solver
