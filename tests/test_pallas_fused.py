"""Whole-chunk fused tracking kernel (ops/pallas_track.py) vs the scan
engine: the entire DLL/PLL loop of trackingCT.m:96-150 runs inside one
Pallas dispatch, with the f64 NCO recurrences replaced by compensated
f32/int32 forms.  Equivalence to the f64 scan is trajectory-level (the
loop filters absorb the ≤1e-6-relative state noise); these tests pin
the agreement and the fused path's own convergence, in interpret mode
on CPU."""

import numpy as np
import pytest

from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
from gps_sdr_tpu.tracking import TrackParams, init_track_state, run_tracking

CFG = ReceiverConfig(
    file=FileConfig(name="synthetic", skip_ms=0),
    signal=SignalConfig(f_if=1.023e6, fs=4.092e6),
)

SVS = [
    SyntheticSV(prn=7, amplitude=3.0, doppler_hz=1234.5,
                code_delay_samples=800.0),
    SyntheticSV(prn=21, amplitude=2.5, doppler_hz=-2500.25,
                code_delay_samples=2345.0),
]
N_MS = 300


def _source(n_ms):
    iq = generate_if_samples(CFG, SVS, n_ms, noise_std=4.0, seed=5)
    vals = np.empty(2 * iq.size)
    vals[0::2] = iq.real
    vals[1::2] = iq.imag
    return IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), CFG.file)


def _init_state():
    S = CFG.signal.samples_per_ms
    delays, fine = [], []
    for sv in SVS:
        f_code = CFG.signal.code_freq_basis * (
            1 + sv.doppler_hz / CFG.signal.fc)
        next_epoch = sv.code_delay_samples % (1023 / f_code * CFG.signal.fs)
        delays.append(int(round((S - next_epoch) % S)))
        fine.append(CFG.signal.f_if + sv.doppler_hz + 3.0)
    return np.array(delays), np.array(fine)


@pytest.fixture(scope="module")
def pair():
    src = _source(N_MS + 5)
    delays, fine = _init_state()
    prns = [sv.prn for sv in SVS]
    out = {}
    for replica in ("shift", "fused"):
        state = init_track_state(CFG, delays, fine)
        params = TrackParams.epl(CFG, replica=replica)
        out[replica] = run_tracking(src, CFG, prns, state, params, N_MS)
    return out


def test_fused_matches_scan_trajectory(pair):
    """The fused kernel's f32 loop follows the f64 scan: identical block
    boundaries (the compensated num/rem forms keep the f32 rounding
    decisions ~1e-6 samples from the f64 ones), correlators and loop
    frequencies within the f32 noise the filters absorb."""
    ref, _ = pair["shift"]
    fus, _ = pair["fused"]
    np.testing.assert_array_equal(fus.num_sample, ref.num_sample)
    np.testing.assert_array_equal(fus.absolute_sample, ref.absolute_sample)
    np.testing.assert_allclose(fus.rem_chip, ref.rem_chip, atol=2e-4)
    scale = np.mean(np.abs(ref.corr))
    np.testing.assert_allclose(fus.corr, ref.corr, atol=2e-3 * scale)
    np.testing.assert_allclose(fus.code_freq, ref.code_freq, atol=0.05)
    np.testing.assert_allclose(fus.carr_freq, ref.carr_freq, atol=0.05)
    # carrier phase: the in-kernel carr_fp reconstruction can differ by
    # ±1 Q32 LSB per block from the f64 rounding — a ≤2π·T·S/2³² drift
    dphi = np.angle(np.exp(1j * (fus.rem_phase - ref.rem_phase)))
    assert np.max(np.abs(dphi)) < 0.02, np.max(np.abs(dphi))


def test_fused_converges_to_truth(pair):
    """Independent of the scan: the fused loop locks to the synthesized
    Doppler/code rate (same bounds as test_tracking convergence)."""
    rec, _ = pair["fused"]
    for ch, sv in enumerate(SVS):
        carr_truth = CFG.signal.f_if + sv.doppler_hz
        code_truth = CFG.signal.code_freq_basis * (
            1 + sv.doppler_hz / CFG.signal.fc)
        assert abs(np.mean(rec.carr_freq[-100:, ch]) - carr_truth) < 2.0
        # 300 ms at noise_std 4 — the 2 Hz-BW DLL is still settling, so
        # the bound is looser than test_tracking's 1500 ms run
        assert abs(np.mean(rec.code_freq[-100:, ch]) - code_truth) < 1.5
        pp = rec.p_i[-100:, ch] ** 2 + rec.p_q[-100:, ch] ** 2
        ee = rec.e_i[-100:, ch] ** 2 + rec.corr[-100:, ch, 0, 1] ** 2
        assert np.mean(pp) > 1.5 * np.mean(ee)


def test_fused_chunk_chaining(pair):
    """Chunked execution (state packed/unpacked at each boundary) equals
    the single-chunk run: the f32 state round-trips exactly; only the
    within-kernel sum order depends on the chunk-relative offsets, so
    correlators agree to f32 tolerance and the integer block chain is
    identical."""
    fus, _ = pair["fused"]
    src = _source(N_MS + 5)
    delays, fine = _init_state()
    state = init_track_state(CFG, delays, fine)
    params = TrackParams.epl(CFG, replica="fused")
    rec, _ = run_tracking(src, CFG, [sv.prn for sv in SVS], state, params,
                          N_MS, chunk_ms=77)
    np.testing.assert_array_equal(rec.num_sample, fus.num_sample)
    np.testing.assert_array_equal(rec.absolute_sample, fus.absolute_sample)
    scale = np.mean(np.abs(fus.corr))
    np.testing.assert_allclose(rec.corr, fus.corr, atol=1e-3 * scale)
    np.testing.assert_allclose(rec.code_freq, fus.code_freq, atol=0.02)


def test_fused_pos_variant(pair):
    """The CT-POS configuration (ceil rounding, +nco sign, +0.05 prompt
    quirk) through the fused kernel vs the scan."""
    src = _source(120 + 5)
    delays, fine = _init_state()
    prns = [sv.prn for sv in SVS]
    recs = {}
    for replica in ("shift", "fused"):
        state = init_track_state(CFG, delays, fine)
        params = TrackParams.pos_epl(CFG, replica=replica)
        recs[replica], _ = run_tracking(src, CFG, prns, state, params, 120)
    ref, fus = recs["shift"], recs["fused"]
    np.testing.assert_array_equal(fus.num_sample, ref.num_sample)
    scale = np.mean(np.abs(ref.corr))
    np.testing.assert_allclose(fus.corr, ref.corr, atol=2e-3 * scale)
    np.testing.assert_allclose(fus.code_freq, ref.code_freq, atol=0.05)
