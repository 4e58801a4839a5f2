"""Multicorrelator modes end to end (round-1 VERDICT missing #5):
the 25-tap CT-POS bank (trackingCT_POS_updated_multicorrelator.m:233-329),
the 29-tap VT bank (trackingVT_POS_updated_multicorrelator.m:401-450),
and the combined multicorr-tracking → ACF-feature path
(trackingCT_multiCorr-GIVEN.m + ACF/CalculateFeatures.m)."""

import numpy as np
import pytest

from gps_sdr_tpu.analysis.acf import acf_envelope, acf_features
from gps_sdr_tpu.geo.coords import llh2xyz
from gps_sdr_tpu.pipeline import Receiver

from tests import scenario

TRUTH = np.asarray(llh2xyz(np.asarray(scenario.TRUTH_LLH)))
INIT = TRUTH + np.array([3000.0, -2000.0, 1500.0])


@pytest.fixture(scope="module")
def rx():
    src = scenario.build_scenario_source()
    r = Receiver(scenario.CFG, src, artifact_dir=scenario.CACHE_DIR)
    r.track_for_eph(n_ms=scenario.DURATION_MS - 200)
    r.decode(start_offset_ms=200)
    return r


def test_ct_multicorr_positioning(rx):
    """25-tap CT tracking+WLS: triangular ACF, converged DLL, and the
    same position quality as the 3-tap bank (the loop closes on the
    identical ±0.5/P taps)."""
    rec, nav = rx.ct_position(n_ms=1500, multicorr=True,
                              init_pos_ecef=INIT)
    assert rec.corr.shape[2] == 25
    assert (rec.i_early, rec.i_prompt, rec.i_late) == (2, 12, 22)
    # mean envelope over the last second is the C/A autocorrelation
    # triangle: peak at the prompt, monotone-ish decay, low edges
    env = acf_envelope(rec.corr[500:]).mean(axis=0)        # (N, 25)
    for ch in range(env.shape[0]):
        e = env[ch] / env[ch].max()
        assert abs(int(np.argmax(e)) - 12) <= 1, (ch, np.argmax(e))
        assert e[0] < 0.55 and e[24] < 0.55, e[[0, 24]]  # ideal
        # triangle gives 0.40; noise + Gold cross-correlation lift it
        # inside ±0.5 chip the triangle rises toward the peak
        assert e[2] < e[7] < e[11] + 0.05
        assert e[22] < e[17] < e[13] + 0.05
    err = np.linalg.norm(nav.usr_pos - TRUTH, axis=1)
    assert np.median(err[2:]) < 40.0, np.median(err[2:])


def test_vt_multicorr(rx):
    """29-tap VT bank: full-bank records + EKF convergence."""
    trk, sol = rx.vt_position(n_ms=1000, ct_n_ms=1500, multicorr=True,
                              init_pos_ecef=INIT)
    assert trk.corr.shape[2] == 29
    err = np.linalg.norm(sol.usr_pos - TRUTH, axis=1)
    assert np.median(err[300:]) < 40.0, np.median(err[300:])
    env = acf_envelope(trk.corr[300:]).mean(axis=0)
    for ch in range(env.shape[0]):
        e = env[ch] / env[ch].max()
        assert abs(int(np.argmax(e)) - 14) <= 1
        assert e[0] < 0.5 and e[28] < 0.5  # ideal 0.30 + floor


def test_multicorr_acf_separates_multipath(tmp_path):
    """The combined path the reference ships as an instructor experiment:
    multicorr tracking of a clean vs a multipath-contaminated channel →
    ACF features (CalculateFeatures.m) separate them."""
    from gps_sdr_tpu.config import (FileConfig, ReceiverConfig,
                                    SignalConfig)
    from gps_sdr_tpu.io.ifdata import IFSampleSource, write_if_file
    from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
    from gps_sdr_tpu.tracking import (TrackParams, init_track_state,
                                      run_tracking)

    cfg = ReceiverConfig(file=FileConfig(name="mcmp", skip_ms=1),
                         signal=SignalConfig(f_if=1.25e6, fs=5e6))
    spc = cfg.signal.fs / cfg.signal.code_freq_basis   # samples per chip
    svs = [
        SyntheticSV(prn=9, amplitude=3.0, doppler_hz=987.0,
                    code_delay_samples=1500.0),
        SyntheticSV(prn=23, amplitude=3.0, doppler_hz=-2100.0,
                    code_delay_samples=100.0),
        # in-phase echo of PRN 23, 0.3 chips late, 60% amplitude — the
        # MultipathSimulator.m configuration as an actual emitter
        SyntheticSV(prn=23, amplitude=1.8, doppler_hz=-2100.0,
                    code_delay_samples=100.0 + 0.3 * spc),
    ]
    iq = generate_if_samples(cfg, svs, duration_ms=900, noise_std=4.0,
                             seed=5)
    path = str(tmp_path / "mcmp.bin")
    write_if_file(path, iq, cfg.file)
    src = IFSampleSource(path, cfg.file)
    rx = Receiver(cfg, src)
    acq = rx.acquisition()
    assert {9, 23} <= set(int(s) for s in acq.sv)
    clean, mp = 0, 1
    chans = [acq.channel_index(9), acq.channel_index(23)]
    params = TrackParams.pos_multicorr(cfg)
    st = init_track_state(cfg, acq.code_delay[chans],
                          acq.fine_freq_hz[chans])
    rec, _ = run_tracking(src, cfg, [9, 23], st, params, 800)
    feats = acf_features(rec.corr[200:], rec.code_err[200:], params.taps,
                         window_ms=100)
    # The E−L envelope DLL re-balances the early/late wings, so the
    # echo shows up as (a) a raised correlation amplitude (in-phase
    # echo: ×(1+α·(1−d)) ≈ 1.42 here — F1 with equal emitted power),
    # (b) a broadened peak plateau, (c) the LOS peak pushed EARLY of
    # the re-centered prompt (F2 toward positive taps).
    assert (feats.f1_amp[:, mp].mean()
            > 1.25 * feats.f1_amp[:, clean].mean())
    assert (feats.f2_delay[:, mp].mean()
            > feats.f2_delay[:, clean].mean() + 0.02)
    env = acf_envelope(rec.corr[200:]).mean(axis=0)        # (N, 25)
    e_clean = env[clean] / env[clean].max()
    e_mp = env[mp] / env[mp].max()
    assert (e_mp >= 0.93).sum() >= (e_clean >= 0.93).sum() + 2