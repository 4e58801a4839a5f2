"""Fused Pallas correlator vs the XLA shift-replica path.

Runs in Pallas interpret mode on CPU (tests never need TPU hardware);
the same kernel lowers to Mosaic on the real chip, where the driver's
bench exercises it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.tracking import (TrackParams, build_shift_tables,
                                  build_shift_tables_2d, init_track_state,
                                  track_scan)

CFG = ReceiverConfig(file=FileConfig(skip_ms=0),
                     signal=SignalConfig(f_if=2.5e5, fs=1.023e6))


def _run(replica, raw_pairs, raw_planes, state, n_steps, blk, params_kw):
    S = CFG.signal.samples_per_ms
    params = TrackParams.epl(CFG, replica=replica, **params_kw)
    if replica == "pallas":
        tables, margin = build_shift_tables_2d(CFG, [3, 7, 11], blk)
        raw = raw_planes
    else:
        tables, margin = build_shift_tables(CFG, [3, 7, 11], blk)
        raw = raw_pairs
    return track_scan(raw, jnp.int64(0), state, jnp.asarray(tables),
                      params, n_steps, float(CFG.signal.fs), blk,
                      float(CFG.signal.code_freq_basis), margin)


@pytest.mark.parametrize("params_kw", [
    dict(),                                    # trackingCT EPL
    dict(negate_iq=True),                      # 10 ms eph phase signs
])
def test_pallas_matches_shift_replica(params_kw):
    rng = np.random.default_rng(0)
    S = CFG.signal.samples_per_ms
    n_ch, n_steps = 3, 5
    blk = -(-(S + 256) // 128) * 128
    state = init_track_state(CFG, np.array([5, 100, 900], np.int64),
                             np.full(n_ch, CFG.signal.f_if + 700.0))
    state = state._replace(ptr=jnp.asarray([0, 37, 411], jnp.int64))
    vals = rng.integers(-64, 64,
                        size=((n_steps + 2) * S + blk, 2)).astype(np.float32)
    raw_pairs = jnp.asarray(vals)
    raw_planes = jnp.asarray(vals.T.copy())

    st_ref, rec_ref = _run("shift", raw_pairs, raw_planes, state, n_steps,
                           blk, params_kw)
    st_pl, rec_pl = _run("pallas", raw_pairs, raw_planes, state, n_steps,
                         blk, params_kw)

    scale = np.abs(np.asarray(rec_ref["corr"])).max()
    np.testing.assert_allclose(np.asarray(rec_pl["corr"]),
                               np.asarray(rec_ref["corr"]),
                               rtol=1e-4, atol=2e-4 * scale)
    np.testing.assert_array_equal(np.asarray(st_pl.ptr),
                                  np.asarray(st_ref.ptr))
    # the closed loop feeds f32 correlator sums into the f64 NCO state, so
    # the two implementations may differ by a few Q32 ulps of phase
    # (sum-order); bound it well below a micro-radian equivalent
    dphase = (np.asarray(st_pl.phase_fp).astype(np.int64)
              - np.asarray(st_ref.phase_fp).astype(np.int64))
    assert np.abs(dphase).max() < 8192  # < 1.2e-5 rad
    np.testing.assert_allclose(np.asarray(st_pl.rem_chip),
                               np.asarray(st_ref.rem_chip), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec_pl["code_freq"]),
                               np.asarray(rec_ref["code_freq"]), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(rec_pl["carr_freq"]),
                               np.asarray(rec_ref["carr_freq"]), rtol=1e-7)


def test_pallas_remove_dc_matches():
    rng = np.random.default_rng(1)
    S = CFG.signal.samples_per_ms
    n_ch, n_steps = 3, 3
    blk = -(-(S + 256) // 128) * 128
    state = init_track_state(CFG, np.zeros(n_ch, np.int64),
                             np.full(n_ch, CFG.signal.f_if + 250.0))
    state = state._replace(ptr=jnp.zeros(n_ch, jnp.int64))
    vals = (rng.integers(-64, 64, size=((n_steps + 2) * S + blk, 2))
            + 11.0).astype(np.float32)
    raw_pairs = jnp.asarray(vals)
    raw_planes = jnp.asarray(vals.T.copy())
    kw = dict(remove_dc=True)
    _, rec_ref = _run("shift", raw_pairs, raw_planes, state, n_steps, blk, kw)
    _, rec_pl = _run("pallas", raw_pairs, raw_planes, state, n_steps, blk, kw)
    scale = np.abs(np.asarray(rec_ref["corr"])).max()
    np.testing.assert_allclose(np.asarray(rec_pl["corr"]),
                               np.asarray(rec_ref["corr"]),
                               rtol=1e-4, atol=2e-4 * scale)


def test_pallas_multicorr_taps():
    """The 25-tap CT-POS bank through the fused kernel."""
    rng = np.random.default_rng(2)
    S = CFG.signal.samples_per_ms
    n_steps = 2
    blk = -(-(S + 256) // 128) * 128
    state = init_track_state(CFG, np.array([10, 400, 20], np.int64),
                             np.full(3, CFG.signal.f_if - 500.0))
    state = state._replace(ptr=jnp.asarray([3, 0, 99], jnp.int64))
    vals = rng.integers(-64, 64,
                        size=((n_steps + 2) * S + blk, 2)).astype(np.float32)
    raw_pairs = jnp.asarray(vals)
    raw_planes = jnp.asarray(vals.T.copy())

    def run(replica, raw, tables, margin):
        params = TrackParams.pos_multicorr(CFG, replica=replica)
        return track_scan(raw, jnp.int64(0), state, jnp.asarray(tables),
                          params, n_steps, float(CFG.signal.fs), blk,
                          float(CFG.signal.code_freq_basis), margin)

    t1, m1 = build_shift_tables(CFG, [3, 7, 11], blk)
    t2, m2 = build_shift_tables_2d(CFG, [3, 7, 11], blk)
    _, rec_ref = run("shift", raw_pairs, t1, m1)
    _, rec_pl = run("pallas", raw_planes, t2, m2)
    assert rec_pl["corr"].shape == (n_steps, 3, 25, 2)
    scale = np.abs(np.asarray(rec_ref["corr"])).max()
    np.testing.assert_allclose(np.asarray(rec_pl["corr"]),
                               np.asarray(rec_ref["corr"]),
                               rtol=1e-4, atol=2e-4 * scale)
