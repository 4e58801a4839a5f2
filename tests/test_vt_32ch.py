"""VDFLL at production channel count (round-4 VERDICT item 6): 32
channels — a 64-row measurement vector and an 8×64 Kalman-gain path —
unsharded and sharded over the virtual 8-device mesh (4 channels per
device), with the same exact/allclose equivalence split as the 5-channel
test (tests/test_mesh_pipeline.py::test_sharded_vt_bit_identical)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gps_sdr_tpu.parallel.distributed import _vt_fixture
from gps_sdr_tpu.parallel.mesh import make_mesh
from gps_sdr_tpu.parallel.vt import pad_vt_state, sharded_vt_scan
from gps_sdr_tpu.receiver.vt import _VT_REC_GLOBAL, vt_scan

N_CH = 32


@pytest.fixture(scope="module")
def runs():
    cfg, params, state, eph, tables, raw_np, blk, n_steps = _vt_fixture(
        N_CH)
    alpha = jnp.asarray(cfg.cmn.iono_alpha, jnp.float64)
    beta = jnp.asarray(cfg.cmn.iono_beta, jnp.float64)
    args = (float(cfg.signal.fs), blk, float(cfg.signal.f_if),
            float(cfg.signal.fc), float(cfg.signal.code_freq_basis),
            int(cfg.cmn.day_of_year))
    raw = jnp.asarray(raw_np)
    _, ref = vt_scan(raw, jnp.int64(0), state, jnp.asarray(tables), eph,
                     alpha, beta, params, n_steps, *args, 0)
    mesh = make_mesh()
    st_p, tab_p, eph_p, n_pad = pad_vt_state(state, jnp.asarray(tables),
                                             eph, mesh.size)
    assert n_pad == 0                     # 32 divides 8
    fn = sharded_vt_scan(mesh, params, n_steps, *args, 0, N_CH, 2)
    _, rec = fn(raw, jnp.int64(0), st_p, tab_p, eph_p, alpha, beta)
    return ({k: np.asarray(v) for k, v in ref.items()},
            {k: np.asarray(v) for k, v in rec.items()}, n_steps)


def test_vt32_shapes_and_finite(runs):
    ref, _, n_steps = runs
    assert ref["corr"].shape == (n_steps, N_CH, 3, 2)
    assert ref["kalman_gain"].shape == (n_steps, 8, 2 * N_CH)
    assert ref["innovation"].shape == (n_steps, 2 * N_CH)
    for k in ("corr", "kalman_gain", "innovation", "total_state",
              "state_cov_diag"):
        assert np.all(np.isfinite(ref[k])), k
    # the covariance stays positive through the 64-measurement updates
    assert np.all(ref["state_cov_diag"] > 0)


def test_vt32_sharded_equivalence(runs):
    """Sharded ≡ unsharded at 32 channels.  The correlators and the
    integer block chain are bit-exact; unlike the 5-channel test, the
    f32 DISCRIMINATORS are only ulp-close here — a 4-channel shard
    vectorizes the e/l magnitude chain with different fma contraction
    than the 32-channel batch (≤1e-7 absolute), and that wobble
    propagates bounded through the (stable) EKF recursion — so
    everything downstream is held to tight tolerances instead."""
    ref, rec, _ = runs
    exact = ("corr", "num_sample", "absolute_sample", "rem_phase")
    for k, v in rec.items():
        if k in exact:
            np.testing.assert_array_equal(v, ref[k], err_msg=k)
        elif k in ("carr_err", "code_err"):
            np.testing.assert_allclose(v, ref[k], rtol=0, atol=2e-6,
                                       err_msg=k)
        elif k == "valid":
            np.testing.assert_array_equal(v, ref[k], err_msg=k)
        elif k in _VT_REC_GLOBAL or k in ("cn0",):
            # EKF series: meters-scale quantities, ulp-perturbed inputs
            np.testing.assert_allclose(v, ref[k], rtol=1e-5, atol=2e-3,
                                       err_msg=k)
        elif k == "delta_pr":
            # /dt = 1e3 differencing of the ~2e7 m predicted pseudorange
            # amplifies the EKF-state wobble — still ≥4 orders below the
            # measurement noise
            np.testing.assert_allclose(v, ref[k], rtol=0, atol=0.05,
                                       err_msg=k)
        else:
            np.testing.assert_allclose(v, ref[k], rtol=1e-7, atol=1e-3,
                                       err_msg=k)
