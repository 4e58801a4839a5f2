"""Mesh-sharded acquisition: the PRN axis of the search grid is data
parallel (SURVEY.md §2.9) — each device owns P/D code replicas, computes
its slice of the (P, F, S) power grid locally (the per-block FFTs are
recomputed per shard, which is negligible next to the P×F IFFT batch),
and the host reads back only per-PRN peak statistics."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_sdr_tpu.acquisition import acquisition_power_grid
from gps_sdr_tpu.parallel.mesh import AXIS


def sharded_acquisition_power(mesh: Mesh, prn_chunk: int = 8):
    """Returns power_fn(blocks, carriers, code_fft) → (P,F,S) sharded over
    PRNs; drop-in for `run_acquisition(power_fn=…)`."""
    ndev = mesh.shape[AXIS]

    def fn(blocks, carriers, code_fft):
        p = code_fft.shape[0]
        pad = (-p) % ndev
        code_fft = jnp.pad(code_fft, ((0, pad), (0, 0)))
        code_fft = jax.device_put(
            code_fft, NamedSharding(mesh, P(AXIS, None)))
        blocks = jax.device_put(blocks, NamedSharding(mesh, P(None, None)))
        carriers = jax.device_put(carriers, NamedSharding(mesh, P(None, None)))
        shard_fn = jax.shard_map(
            functools.partial(acquisition_power_grid, prn_chunk=prn_chunk),
            mesh=mesh,
            in_specs=(P(None, None), P(None, None), P(AXIS, None)),
            out_specs=P(AXIS, None, None), check_vma=False)
        out = jax.jit(shard_fn)(blocks, carriers, code_fft)
        return out[:p]

    return fn
