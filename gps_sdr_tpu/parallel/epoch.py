"""Sharded measurement-epoch reduction.

At a WLS epoch every channel contributes one geometry row and one residual
(trackingCT_POS_updated.m:512).  With channels sharded over devices, the
normal equations HᵀH (4×4) and Hᵀy (4,) are formed locally and reduced
with `psum` over the mesh — the natural 20 ms synchronization point of the
receiver mapped onto ICI collectives (SURVEY.md §2.9)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gps_sdr_tpu.parallel.mesh import AXIS


def sharded_wls_normal_equations(mesh: Mesh):
    """Returns fn(sv_pos (N,3), pr_resid (N,), usr (3,)) → Δstate (4,)
    with N sharded over the mesh; one Gauss-Newton step solved identically
    on every device after a psum."""

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
