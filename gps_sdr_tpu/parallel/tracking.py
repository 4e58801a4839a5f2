"""Mesh-sharded conventional tracking: channels are independent between
measurement epochs (SURVEY.md §2.9), so the channel batch axis shards
cleanly over devices — each device scans its channels against a replicated
raw chunk; no collectives until the positioning epoch."""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_sdr_tpu.parallel.mesh import AXIS
from gps_sdr_tpu.tracking import TrackParams, TrackState, track_scan


def sharded_track_scan(mesh: Mesh, params: TrackParams, n_steps: int,
                       fs: float, blk: int, code_freq_basis: float):
    """Returns fn(raw, chunk_start, state, chip_tables) with the channel
    axis of `state`/`chip_tables` sharded over the mesh.  Channel count
    must be a multiple of the mesh size (pad with dummy channels)."""

    def inner(raw, chunk_start, state, chip_tables):
        return track_scan(raw, chunk_start, state, chip_tables, params,
                          n_steps, fs, blk, code_freq_basis)

    chan = P(AXIS)
    state_spec = TrackState(*([chan] * len(TrackState._fields)))
    rec_spec = dict(corr=P(None, AXIS, None, None), code_err=P(None, AXIS),
                    carr_err=P(None, AXIS), code_freq=P(None, AXIS),
                    carr_freq=P(None, AXIS), num_sample=P(None, AXIS),
                    rem_chip=P(None, AXIS), rem_phase=P(None, AXIS),
                    absolute_sample=P(None, AXIS))
    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None), P(), state_spec, P(AXIS, None)),
        out_specs=(state_spec, rec_spec), check_vma=False)
    return jax.jit(fn)
