"""Long-schedule soak (round-3 VERDICT weak #5): the reference's
3-phase ephemeris-decoding schedule at its REAL proportions — 1000 ms
@ 1 ms pdi, then 40000 ms @ 10 ms pdi with negated correlators
(initParameters.m:66-67, trackingCT.m:73-525) — executed end-to-end on
a ≥40 s synthetic capture.  The short-schedule equivalence test
(tests/test_reference_schedule.py) proves the batched engine ≡ the
reference's per-channel loops; this soak proves the production-scale
path: countinx detection at real indices, the re-track merge, 4000
negated 10 ms blocks, and a complete ephemeris decode from the merged
record.

Marked slow: one-time capture generation (~42 s at 5 MHz, cached in
.cache) plus a full-length scan.
"""

import os

import numpy as np
import pytest

from gps_sdr_tpu.config import ReceiverConfig, FileConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.pipeline import _REC_FIELDS, Receiver

from tests import scenario

N1 = 1000      # ms @ 1 ms pdi (initParameters.m:66)
N10 = 40000    # ms @ 10 ms pdi (initParameters.m:67)
DUR_MS = 42000


@pytest.fixture(scope="module")
def soak_source():
    """42 s capture of the shared scenario constellation at 5 MHz
    (the scenario's own 32 s capture is too short for the full
    1000+40000 ms schedule)."""
    from gps_sdr_tpu.geo.coords import llh2xyz
    from gps_sdr_tpu.io.synthetic import GeometrySignal, GeometrySV

    cfg = ReceiverConfig(
        file=FileConfig(name="soak_scn", skip_ms=0),
        signal=scenario.CFG.signal, solu=scenario.CFG.solu,
        cmn=scenario.CFG.cmn)
    os.makedirs(scenario.CACHE_DIR, exist_ok=True)
    path = os.path.join(scenario.CACHE_DIR, "soak_scn_v2.bin")
    n_bytes = DUR_MS * cfg.signal.samples_per_ms * 2
    if not (os.path.exists(path) and os.path.getsize(path) == n_bytes):
        truth = np.asarray(llh2xyz(np.asarray(scenario.TRUTH_LLH)))
        ephs = scenario.visible_constellation(len(scenario.SCN_PRNS))
        svs = [GeometrySV(prn=p, eph=e, amplitude=a)
               for p, e, a in zip(scenario.SCN_PRNS, ephs,
                                  scenario.AMPLITUDES)]
        gs = GeometrySignal(cfg, svs, truth, scenario.TOW0,
                            clk_bias_s=scenario.CLK_BIAS_S,
                            clk_drift_sps=scenario.CLK_DRIFT_SPS,
                            n_subframes=16,
                            atmosphere=True,
                            iono_alpha=cfg.cmn.iono_alpha,
                            iono_beta=cfg.cmn.iono_beta,
                            doy=cfg.cmn.day_of_year)
        gs.write_file(path, DUR_MS, noise_std=scenario.NOISE_STD, seed=17)
    return cfg, IFSampleSource(path, cfg.file)


@pytest.mark.slow
def test_reference_schedule_at_production_scale(soak_source, tmp_path):
    cfg, src = soak_source
    rx = Receiver(cfg, src, artifact_dir=str(tmp_path / "art"))
    acq = rx.acquisition()
    # all 5 real SVs acquired; a cross-correlation false alarm may ride
    # along above the 12 dB threshold (it tracks noise, fails to decode,
    # and findPosSV drops it — the production path handles it end-to-end)
    assert set(scenario.SCN_PRNS) <= set(int(p) for p in acq.sv)
    n_ch = len(acq.sv)
    real_ch = [acq.channel_index(p) for p in scenario.SCN_PRNS]

    # the full 3-phase schedule: (a) 1000 ms → countinx, (b) re-track
    # 1000+countinx, (c) 40000 ms @ 10 ms negated ×10-replicated
    rec = rx.track_for_eph_reference()
    # countinx exactly as the schedule's phase (a) detected it: the
    # merged record's first 1000 rows ARE phase (a)/(b) bit-identically,
    # so re-detecting on that prefix reproduces the internal offsets
    # (trackingCT.m:178-213 searches only its own 1000 ms window;
    # Receiver.countinx() searches the full plain record and can find a
    # LATER transition when this window has none — a different span,
    # not the schedule's)
    from gps_sdr_tpu.pipeline import detect_bit_transition
    cnt = np.array([detect_bit_transition(rec.p_i[:N1, ch])
                    for ch in range(n_ch)])
    assert np.all((cnt >= 0) & (cnt < 20)), cnt
    t_total = N1 + int(cnt.max()) + N10
    assert rec.p_i.shape == (t_total, n_ch)

    # phase-(c) structure: rows are ×10-replicated negated 10 ms blocks —
    # per channel, past its switch row the prompt stream is constant in
    # runs of 10 (trackingCT.m:377-525)
    for ch in range(n_ch):
        tail = rec.p_i[N1 + int(cnt[ch]):, ch]
        tail = tail[:(len(tail) // 10) * 10].reshape(-1, 10)
        np.testing.assert_array_equal(tail, tail[:, :1] * np.ones(10))
        # 10 ms coherent blocks: block sizes ≈ 10·S
        ns_tail = rec.num_sample[N1 + int(cnt[ch]) + 10:, ch]
        S = cfg.signal.samples_per_ms
        assert np.all(np.abs(ns_tail - 10 * S) < 60)

    # the merged record decodes COMPLETE ephemerides for every channel —
    # the schedule's entire purpose (naviDecode_updated.m consumes
    # exactly this ×10-replicated record in the reference)
    eph, sbf = rx.decode(start_offset_ms=3000)
    assert rx.usable_svs() == sorted(scenario.SCN_PRNS)
    for p in scenario.SCN_PRNS:
        assert eph[p].updateflag == 1
        assert eph[p].toe[0] == scenario.BASE_EPH["toe"]
        assert abs(eph[p].sqrta[0] - scenario.BASE_EPH["sqrta"]) < 1e-3
        assert abs(eph[p].ecc[0] - scenario.BASE_EPH["ecc"]) < 1e-8
        assert sbf["nav1"][p] >= 1

    # parity with a plain 1 ms run: phases (a)+(b) ARE plain 1 ms
    # tracking, so the schedule's prefix must be bit-for-bit identical
    # to a fresh plain scan over the same span (trackingCT.m:215-369)
    from gps_sdr_tpu.tracking import TrackParams, init_track_state, \
        run_tracking
    st = init_track_state(cfg, acq.code_delay, acq.fine_freq_hz)
    plain, _ = run_tracking(src, cfg, [int(p) for p in acq.sv], st,
                            TrackParams.epl(cfg), 2000)
    for ch in range(n_ch):
        n_pref = N1 + int(cnt[ch])
        for f in _REC_FIELDS:
            np.testing.assert_array_equal(
                getattr(rec, f)[:n_pref, ch],
                getattr(plain, f)[:n_pref, ch], err_msg=f)
