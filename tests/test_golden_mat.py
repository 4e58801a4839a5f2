"""Parity against the reference's shipped golden `.mat` artifacts.

The reference repo ships every stage's outputs (SURVEY.md §4).  The raw
IF captures are not distributable, but the WLS positioning stage is a
pure function of the tracked records — so feeding the reference's own
`tckRstCT_10ms_Opensky.mat` through `run_ct_positioning` must reproduce
`navSolCT_10ms_Opensky.mat` epoch for epoch.  This is real-data parity
with the reference's production run, no capture required.

Reference-run quirks these tests encode (verified archaeology):
- `absoluteSample` is an ftell BYTE offset (2 bytes/sample for int8 IQ).
- localTime advances by measSampleStep/Fs where measSampleStep is a
  byte count (trackingCT_POS_updated.m:164,554) → recorded clkBias sits
  at ≈ +20 ms·c; the per-epoch feedback re-removes it (position is
  unaffected).  The replay passes local_time_advance_s=0.04 to match.
- The Doppler-velocity LS uses the LIVE carrier frequency at the row
  where the epoch fired — one common row for all channels — not the row
  containing the measurement sample (…:514 uses the loop variable).
- The golden record's per-channel pdi switch rows are
  1000 + countinx[1..5] of the 8-SV *acquired* list (the reference
  indexes countinx by positioning-list position, so PRN 16 got PRN 4's
  offset, …:183 vs trackingCT.m:530); the loader derives pdi from
  numSample instead of trusting countinx.
"""

import os

import numpy as np
import pytest

from gps_sdr_tpu import navdecode
from gps_sdr_tpu.config import (C_LIGHT, ReceiverConfig, SolutionConfig)
from gps_sdr_tpu.geo.coords import llh2xyz
from gps_sdr_tpu.io import matref
from gps_sdr_tpu.receiver.ct import run_ct_positioning

REF = "/root/reference/SDR_MATLAB-main"
POS_PRNS = [3, 16, 22, 26, 31]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "navSolCT_10ms_Opensky.mat")),
    reason="reference .mat artifacts not mounted")


@pytest.fixture(scope="module")
def golden():
    rec, pdi = matref.load_tck_records(
        os.path.join(REF, "tckRstCT_10ms_Opensky.mat"), POS_PRNS)
    eph = matref.load_eph(os.path.join(REF, "eph_Opensky_90.mat"))
    sbf = matref.load_sbf(os.path.join(REF, "sbf_Opensky_90.mat"))
    nav = matref.load_navsol(os.path.join(REF, "navSolCT_10ms_Opensky.mat"))
    return rec, pdi, eph, sbf, nav


def test_nacquired_conventions(golden):
    """nAcquired artifact matches BASELINE.md and the usable-SV filter
    applied to the shipped ephemerides (findPosSV.m:23-42)."""
    na = matref.load_nacquired(
        os.path.join(REF, "nAcquired_Opensky_5000.mat"))
    assert list(na["sv"]) == POS_PRNS
    assert list(na["code_delay"]) == [3683, 26051, 2610, 57908, 39064]
    np.testing.assert_allclose(
        na["fine_freq_hz"],
        [4580990, 4579695, 4581565, 4581835, 4581045], atol=0.5)
    _, _, eph, _, _ = golden
    assert navdecode.usable_svs(eph) == POS_PRNS


def test_record_adaptation(golden):
    """Record adaptation sanity: 3000 rows, per-channel pdi switch at
    1000 + the (mis-indexed, see module docstring) countinx, rows ≈ S
    before and ≈ 10·S after."""
    rec, pdi, _, _, _ = golden
    assert rec.absolute_sample.shape == (3000, 5)
    switch_rows = [int(np.argmax(pdi[:, c] == 10)) for c in range(5)]
    assert switch_rows == [1012, 1012, 1003, 1013, 1005]
    S = 58000
    for c in range(5):
        sw = switch_rows[c]
        assert np.all(np.abs(rec.num_sample[:sw, c] - S) < 20)
        assert np.all(np.abs(rec.num_sample[sw:, c] - 10 * S) < 20)
    # absoluteSample (converted to samples) is consistent with the block
    # lengths: abs[t] − abs[t−1] == numSample[t]
    d = np.diff(rec.absolute_sample, axis=0)
    np.testing.assert_array_equal(d, rec.num_sample[1:])


def test_meas_start_reconstruction(golden):
    """Inverting epoch 0's codePhaseMeas through every channel's record
    yields ONE measurement sample (spread ≪ 1 sample) — proof that the
    record adaptation and the interpolation formula are exact."""
    rec, pdi, eph, sbf, nav = golden
    cfg = ReceiverConfig()
    tow1 = np.array([eph[p].tow[0] for p in POS_PRNS])
    nav1 = np.array([sbf["nav1"][p] for p in POS_PRNS])
    sfb1 = np.array([eph[p].sfb[0] for p in POS_PRNS])
    cur = matref.reconstruct_meas_start(rec, pdi, nav, tow1, nav1, sfb1,
                                        cfg.signal.fs)
    assert cur.max() - cur.min() < 1e-3, cur
    # sampleStartMea must sit inside the capture span of the records
    assert rec.absolute_sample[0].max() < cur[0] < rec.absolute_sample[-1].min()


@pytest.fixture(scope="module")
def replay(golden):
    rec, pdi, eph, sbf, nav_ref = golden
    cfg = ReceiverConfig(solu=SolutionConfig(mask_snr_db=0.0))
    tow1 = np.array([eph[p].tow[0] for p in POS_PRNS])
    nav1 = np.array([sbf["nav1"][p] for p in POS_PRNS])
    sfb1 = np.array([eph[p].sfb[0] for p in POS_PRNS])
    cur = matref.reconstruct_meas_start(rec, pdi, nav_ref, tow1, nav1, sfb1,
                                        cfg.signal.fs)
    init = np.asarray(llh2xyz(np.asarray(cfg.solu.truth_llh)))
    nav = run_ct_positioning(
        rec, cfg, POS_PRNS, eph, sbf, init, pdi_ms_per_block=pdi,
        meas_start_sample=float(np.median(cur)),
        # the reference's byte-scaled localTime step (module docstring)
        local_time_advance_s=2 * cfg.solu.nav_sol_period_ms / 1000.0,
        doppler_at_fire_row=True)
    return nav, nav_ref


def test_replay_all_660_epochs(replay):
    nav, ref = replay
    assert len(nav.local_time) == len(ref.local_time) == 660


def test_replay_measurements_exact(replay):
    """Transmit times, code phases, pseudoranges and localTime replay
    bit-for-bit (identical float64 arithmetic path)."""
    nav, ref = replay
    np.testing.assert_array_equal(nav.transmit_time, ref.transmit_time)
    np.testing.assert_array_equal(nav.code_phase_meas, ref.code_phase_meas)
    np.testing.assert_array_equal(nav.raw_pseudorange, ref.raw_pseudorange)
    np.testing.assert_allclose(nav.local_time, ref.local_time, atol=1e-9)


def test_replay_position_parity(replay):
    """All 660 WLS fixes match the reference to sub-micrometre (the LS
    solves differ only in lstsq vs backslash round-off)."""
    nav, ref = replay
    dp = np.linalg.norm(nav.usr_pos - ref.usr_pos, axis=1)
    assert dp.max() < 1e-5, dp.max()
    np.testing.assert_allclose(nav.clk_bias_m, ref.clk_bias_m, atol=1e-5)
    np.testing.assert_allclose(nav.dop, ref.dop, atol=1e-8)
    np.testing.assert_allclose(nav.usr_pos_enu, ref.usr_pos_enu, atol=1e-5)
    np.testing.assert_allclose(nav.usr_pos_llh[:, 2], ref.usr_pos_llh[:, 2],
                               atol=1e-5)


def test_replay_velocity_and_angles(replay):
    nav, ref = replay
    dv = np.linalg.norm(nav.usr_vel - ref.usr_vel, axis=1)
    assert dv.max() < 1e-6, dv.max()
    np.testing.assert_allclose(nav.clk_drift_ms, ref.clk_drift_ms, atol=1e-6)
    # the reference's ENU velocity rotation negates its third row
    # (trackingCT_POS_updated.m:523-526: [-cosL·cosλ, -cosL·sinλ, -sinL])
    # so its recorded "U" is down-positive; ours is true up
    np.testing.assert_allclose(nav.usr_vel_enu * [1.0, 1.0, -1.0],
                               ref.usr_vel_enu, atol=1e-6)
    np.testing.assert_allclose(nav.sat_el_deg, ref.sat_el_deg, atol=1e-9)
    np.testing.assert_allclose(nav.sat_az_deg, ref.sat_az_deg, atol=1e-9)


def test_replay_against_surveyed_truth(replay):
    """End-to-end accuracy on the real capture: the reference README's
    qualitative 'accurate in open sky' claim, quantified."""
    nav, _ = replay
    truth = np.asarray(llh2xyz(np.asarray(ReceiverConfig().solu.truth_llh)))
    err = np.linalg.norm(nav.usr_pos - truth, axis=1)
    # the reference run's own accuracy on this capture: ~43 m median 3-D
    # error (its README shows the same tens-of-metres WLS scatter)
    assert np.median(err) < 50.0, np.median(err)
    assert np.percentile(err, 95) < 100.0


def test_golden_cn0_matches_shipped_cn0_ct(golden):
    """Our per-window C/N0 equals the reference's shipped in-loop CN0_CT
    to float round-off in 748/750 windows; the 2 exceptions are exactly
    the windows straddling a channel's pdi switch, where the t_coh²
    normalization keeps the estimate physical (≥18 dB-Hz) while the
    reference's unnormalized mixed window dips to its global minimum
    (12.4 dB).  Also guards the round-2 regression (−220 dB gate trips
    at the switch) on real data."""
    import scipy.io as sio

    from gps_sdr_tpu.utils.metrics import cn0_series

    rec, pdi, _, _, _ = golden
    ref_cn0 = np.asarray(sio.loadmat(
        os.path.join(REF, "tckRstCT_10ms_Opensky.mat"),
        squeeze_me=True)["CN0_CT"])                       # (150, 5)
    ours = cn0_series(rec.p_i, rec.p_q, t_coh_s=pdi * 1e-3)
    assert ours.shape == ref_cn0.shape
    switch_rows = np.array([int(np.argmax(pdi[:, c] == 10))
                            for c in range(5)])
    straddle_w = switch_rows // 20                        # window index
    mask = np.ones_like(ours, bool)
    mask[straddle_w, np.arange(5)] = False
    np.testing.assert_allclose(ours[mask], ref_cn0[mask], atol=1e-5)
    # the straddle windows stay physical instead of collapsing
    assert np.all(ours[~mask] > 15.0), ours[~mask]
    assert np.all(ours > 15.0) and np.all(ours < 60.0)
    # and the mean-of-5-windows gate keeps every healthy channel on this
    # real capture — including the 31 dB-Hz ones whose single pdi=1
    # windows dip to −4 dB (the reason the gate averages; metrics note)
    _, gate = cn0_series(rec.p_i, rec.p_q, t_coh_s=pdi * 1e-3, gated=True)
    assert np.all(gate[20:] > 1.0), gate[20:].min()


def test_urban_artifacts_load():
    """Urban artifacts are shipped trimmed ({P_i,P_q,carrFreq} and
    {usrPos,clkBias} only — no remChip/absoluteSample), so the WLS replay
    cannot run on them; validate what they do pin down: the nAcquired
    conventions and a physical C/N0 on the real urban prompt records."""
    import scipy.io as sio

    na = matref.load_nacquired(
        os.path.join(REF, "nAcquired_Urban_5000.mat"))
    assert list(na["sv"]) == [1, 3, 7, 11, 18, 22]
    np.testing.assert_allclose(
        na["snr_db"], [42.63, 29.38, 19.90, 23.05, 18.69, 17.79], atol=0.01)
    m = sio.loadmat(os.path.join(REF, "tckRstCT_1ms_Urban.mat"),
                    squeeze_me=True)
    t = m["TckResultCT_pos"]
    from gps_sdr_tpu.utils.metrics import cn0_series
    p_i = np.stack([np.asarray(t[p - 1]["P_i"], np.float64)
                    for p in na["sv"]], axis=1)
    p_q = np.stack([np.asarray(t[p - 1]["P_q"], np.float64)
                    for p in na["sv"]], axis=1)
    cn0 = cn0_series(p_i, p_q, t_coh_s=1e-3)
    # urban multipath: deep fades (mins near 14 dB-Hz) but every tracked
    # channel's median sits in the physical 28–40 dB-Hz band
    assert cn0.shape[0] == 150
    assert np.all(np.median(cn0, axis=0) > 28.0)
    assert np.all(np.median(cn0, axis=0) < 40.0)
    # archaeology the trimming hides: the shipped urban navSol's usrPos
    # is CONSTANT over all solved epochs — it is the initialization
    # (solu.iniPos ≈ 22.3199N 114.2091E h=4), not real fixes, so no
    # position-domain replay target exists in the shipped artifact
    un = sio.loadmat(os.path.join(REF, "navSolCT_1ms_Urban.mat"),
                     squeeze_me=True)
    upos = np.asarray(un["navSolutionsCT"]["usrPos"][()])
    solved = upos[~np.all(upos == 0, axis=1)]
    assert len(solved) >= 2999
    assert np.ptp(solved, axis=0).max() == 0.0


def test_replay_sharded_epochs_match_reference(golden, replay):
    """The mesh-sharded WLS epoch solver (psum normal equations over an
    8-device mesh) replays the reference's 660 golden epochs to within
    float round-off of the reference's own fixes — multi-device
    execution at reference parity."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from gps_sdr_tpu.parallel.mesh import make_mesh

    rec, pdi, eph, sbf, nav_ref = golden
    nav_host, _ = replay
    cfg = ReceiverConfig(solu=SolutionConfig(mask_snr_db=0.0))
    init = np.asarray(llh2xyz(np.asarray(cfg.solu.truth_llh)))
    tow1 = np.array([eph[p].tow[0] for p in POS_PRNS])
    nav1 = np.array([sbf["nav1"][p] for p in POS_PRNS])
    sfb1 = np.array([eph[p].sfb[0] for p in POS_PRNS])
    cur = matref.reconstruct_meas_start(rec, pdi, nav_ref, tow1, nav1,
                                        sfb1, cfg.signal.fs)
    nav = run_ct_positioning(
        rec, cfg, POS_PRNS, eph, sbf, init, pdi_ms_per_block=pdi,
        meas_start_sample=float(np.median(cur)),
        local_time_advance_s=2 * cfg.solu.nav_sol_period_ms / 1000.0,
        doppler_at_fire_row=True, mesh=make_mesh())
    assert len(nav.local_time) == 660
    dp = np.linalg.norm(nav.usr_pos - nav_ref.usr_pos, axis=1)
    assert dp.max() < 1e-4, dp.max()
    np.testing.assert_allclose(nav.clk_bias_m, nav_ref.clk_bias_m,
                               atol=1e-4)
    np.testing.assert_allclose(nav.dop, nav_ref.dop, atol=1e-7)
    dv = np.linalg.norm(nav.usr_vel - nav_ref.usr_vel, axis=1)
    assert dv.max() < 1e-5, dv.max()
    # and the sharded solver tracks the host solver to round-off
    dph = np.linalg.norm(nav.usr_pos - nav_host.usr_pos, axis=1)
    assert dph.max() < 1e-5


def test_mat_export_roundtrip(golden, replay, tmp_path):
    """The export side of the `.mat` interop (a reference user keeps
    their MATLAB tooling): records/solutions/eph written in the
    reference schemas round-trip through the import loaders."""
    rec, pdi, eph, sbf, _ = golden
    nav, _ = replay

    p = str(tmp_path / "tck.mat")
    matref.save_tck_records_mat(p, rec, POS_PRNS)
    rec2, pdi2 = matref.load_tck_records(p, POS_PRNS)
    np.testing.assert_array_equal(rec2.absolute_sample, rec.absolute_sample)
    np.testing.assert_array_equal(rec2.rem_chip, rec.rem_chip)
    np.testing.assert_array_equal(rec2.code_freq, rec.code_freq)
    np.testing.assert_array_equal(rec2.num_sample, rec.num_sample)
    np.testing.assert_allclose(rec2.corr, rec.corr, rtol=1e-6)
    np.testing.assert_array_equal(pdi2, pdi)

    pn = str(tmp_path / "nav.mat")
    matref.save_navsol_mat(pn, nav)
    nav2 = matref.load_navsol(pn)
    np.testing.assert_array_equal(nav2.usr_pos, nav.usr_pos)
    np.testing.assert_array_equal(nav2.transmit_time, nav.transmit_time)
    np.testing.assert_array_equal(nav2.clk_bias_m, nav.clk_bias_m)
    np.testing.assert_array_equal(nav2.dop, nav.dop)

    pe, ps = str(tmp_path / "eph.mat"), str(tmp_path / "sbf.mat")
    matref.save_eph_mat(pe, eph, sbf=sbf, sbf_path=ps)
    eph2 = matref.load_eph(pe)
    sbf2 = matref.load_sbf(ps)
    assert sorted(eph2) == sorted(eph)
    for p_ in POS_PRNS:
        assert eph2[p_].updateflag == eph[p_].updateflag == 1
        np.testing.assert_array_equal(eph2[p_].tow, eph[p_].tow)
        np.testing.assert_array_equal(eph2[p_].sqrta, eph[p_].sqrta)
        assert sbf2["nav1"][p_] == sbf["nav1"][p_]
        assert sbf2["sfb1"][p_] == sbf["sfb1"][p_]

    pa = str(tmp_path / "nacq.mat")
    matref.save_nacquired_mat(pa, POS_PRNS, [30.0] * 5, [0.0] * 5,
                              [3683, 26051, 2610, 57908, 39064],
                              [4580990] * 5)
    na = matref.load_nacquired(pa)
    assert list(na["sv"]) == POS_PRNS
    assert list(na["code_delay"]) == [3683, 26051, 2610, 57908, 39064]


def test_mat_export_mixed_pdi_conventions():
    """Exporting a pdi-switched record keeps the reference conventions:
    codedelay is mod the 1 ms sample count (never the 10 ms block),
    delayValue is numSample − S·pdi, and the loader recovers the pdi
    matrix — the opensky_config() export path."""
    from gps_sdr_tpu.tracking import TrackRecords

    rng = np.random.default_rng(4)
    T, N, S = 120, 2, 5000
    pdi = np.where(np.arange(T)[:, None] < np.array([40, 60]), 1, 10)
    num = pdi * S + rng.integers(-2, 3, size=(T, N))
    abs_s = 1_000_000 + np.cumsum(num, axis=0).astype(np.float64)
    rec = TrackRecords(
        corr=rng.normal(size=(T, N, 3, 2)).astype(np.float32),
        code_err=rng.normal(size=(T, N)), carr_err=rng.normal(size=(T, N)),
        code_freq=np.full((T, N), 1.023e6),
        carr_freq=np.full((T, N), 4.58e6),
        num_sample=num.astype(np.int64), rem_chip=rng.random((T, N)),
        rem_phase=rng.random((T, N)), absolute_sample=abs_s)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.mat")
        matref.save_tck_records_mat(p, rec, [3, 16])
        import scipy.io as sio
        raw = sio.loadmat(p, squeeze_me=True)["TckResultCT_pos"]
        for prn, ch in ((3, 0), (16, 1)):
            cd = np.asarray(raw[prn - 1]["codedelay"], np.float64)
            assert np.all(cd < S), cd.max()       # mod 1 ms, never 10 ms
            dv = np.asarray(raw[prn - 1]["delayValue"], np.float64)
            assert np.all(np.abs(dv) <= 3), np.abs(dv).max()
        rec2, pdi2 = matref.load_tck_records(p, [3, 16],
                                             bytes_per_sample=2)
        np.testing.assert_array_equal(pdi2, pdi)


def test_pdi_recovery_exact_with_few_1ms_rows():
    """With the exact samples_per_ms the pdi recovery is exact even when
    1 ms rows are <10% of the record (a long opensky run past the 1→10 ms
    switch) — the regime where the percentile heuristic collapses to
    all-ones and would mis-normalize the exported C/N0 windows."""
    rng = np.random.default_rng(11)
    T, N, S = 1500, 3, 5000
    sw = np.array([60, 80, 100])            # 4-7% of rows at pdi=1
    pdi = np.where(np.arange(T)[:, None] < sw, 1, 10)
    num = pdi * S + rng.integers(-2, 3, size=(T, N))
    got, s = matref.pdi_from_block_sizes(num, samples_per_ms=S)
    assert s == S
    np.testing.assert_array_equal(got, pdi)
    # and the estimator still recovers it when every channel has ≥10%
    # 1 ms rows (the documented validity condition)
    pdi2 = np.where(np.arange(300)[:, None] < sw, 1, 10)
    num2 = pdi2 * S + rng.integers(-2, 3, size=(300, N))
    got2, _ = matref.pdi_from_block_sizes(num2)
    np.testing.assert_array_equal(got2, pdi2)


def test_vt_golden_code_nco_law(golden):
    """The vector code-NCO law codeFreq = f0·(1 − ΔPr/c)
    (trackingVT_POS_updated.m:221-222) holds row-by-row on the shipped
    VT record — the same law receiver/vt.py closes its loop with
    (vt.py step 5).  Row 0 is the CT handoff (…:219)."""
    import scipy.io as sio

    vt = sio.loadmat(os.path.join(REF, "tckRstVT_Opensky_updated.mat"),
                     squeeze_me=True)["TckResultVT"]
    for prn in POS_PRNS:
        ch = vt[prn - 1]
        dpr = np.asarray(ch["deltaPr"], np.float64)
        cf = np.asarray(ch["codeFreq"], np.float64)
        law = 1.023e6 * (1.0 - dpr / C_LIGHT)
        np.testing.assert_allclose(law[1:], cf[1:], rtol=0, atol=1e-6)
        # and the handoff row equals the CT record's final-row frequency
        # ballpark (same signal, both near the nominal chip rate)
        assert abs(cf[0] - 1.023e6) < 50.0


def test_vt_golden_handoff_alignment(golden):
    """The shipped VT run warm-started from the LAST row of the shipped
    CT record (trackingVT_POS_updated.m:109-132,219): its first codeFreq
    equals CT row 2999's bit-for-bit, and its first sample pointer sits
    exactly one nominal 1 ms block (58000 samples) past that row — the
    same handoff indexing this build replicates in
    pipeline.vt_position/init_vt_state."""
    import scipy.io as sio

    rec, _, _, _, _ = golden
    vt = sio.loadmat(os.path.join(REF, "tckRstVT_Opensky_updated.mat"),
                     squeeze_me=True)["TckResultVT"]
    for ch, prn in enumerate(POS_PRNS):
        v = vt[prn - 1]
        assert float(np.asarray(v["codeFreq"])[0]) == \
            rec.code_freq[2999, ch], prn
        vt_abs0 = float(np.asarray(v["absoluteSample"])[0]) / 2
        assert vt_abs0 - rec.absolute_sample[2999, ch] == 58000.0, prn


@pytest.fixture(scope="module")
def golden_vt(golden):
    """Shipped VT record as per-channel arrays + the CT handoff row
    (the VT run warm-starts from CT row 2999,
    trackingVT_POS_updated.m:109-132)."""
    import scipy.io as sio

    rec, _, _, _, _ = golden
    vt = sio.loadmat(os.path.join(REF, "tckRstVT_Opensky_updated.mat"),
                     squeeze_me=True)
    fields = ("P_i", "P_q", "carrError", "codeError", "remChip",
              "remCarrPhase", "codeFreq", "carrFreq", "carrNco",
              "absoluteSample", "deltaPr", "codedelay")
    per = {f: np.stack([np.asarray(vt["TckResultVT"][p - 1][f], np.float64)
                        for p in POS_PRNS], axis=1) for f in fields}
    handoff = dict(
        rem_chip=rec.rem_chip[2999], carr_err=rec.carr_err[2999],
        carr_freq=rec.carr_freq[2999], rem_phase=rec.rem_phase[2999],
        abs_sample=rec.absolute_sample[2999])
    return per, handoff, np.asarray(vt["CN0_VT"], np.float64)


def test_vt_golden_numsample_advance_chain(golden_vt):
    """The absoluteSample advance reproduces the block-length law
    numSample = ceil((1023·pdi − remChip)/(codeFreq/Fs)) row-by-row for
    all 5000 ms × 5 channels (trackingVT_POS_updated.m:164-181: the
    ftell after reading numSample·dataType samples advances by exactly
    2·numSample bytes) — pinning the entire sample-pointer chain of the
    reference's production VT run, including the CT→VT handoff block.

    NB block t is sized with codeFreq[t−1]: line 164 runs BEFORE the
    nav-driven code-frequency prediction at :218-223, so the recorded
    codeFreq[t] steps the replica but the NEXT block's length (exactly
    the staggering receiver/vt.py's step docstring notes)."""
    per, handoff, _ = golden_vt
    fs = 58e6
    abs_s = per["absoluteSample"] / 2.0          # bytes → samples
    num = np.diff(abs_s, axis=0)                 # blocks 1..4999
    rem_prev = per["remChip"][:-1]
    law = np.ceil((1023.0 - rem_prev) / (per["codeFreq"][:-1] / fs))
    np.testing.assert_array_equal(num, law)
    # handoff block 0: remChip/pointer from CT row 2999; codeFreq[0] IS
    # the CT handoff frequency (…:219, msIndex==1 branch)
    num0 = abs_s[0] - handoff["abs_sample"]
    law0 = np.ceil((1023.0 - handoff["rem_chip"])
                   / (per["codeFreq"][0] / fs))
    np.testing.assert_array_equal(num0, law0)


def test_vt_golden_remchip_recurrence(golden_vt):
    """remChip[t] = numSample[t]·(codeFreq[t]/Fs) + remChip[t−1] − 1023
    (trackingVT_POS_updated.m:284 with the prompt tap at Spacing(15)=0)
    to float round-off on every row of the shipped record."""
    per, handoff, _ = golden_vt
    fs = 58e6
    abs_s = per["absoluteSample"] / 2.0
    num = np.diff(abs_s, axis=0)
    step = per["codeFreq"] / fs
    law = num * step[1:] + per["remChip"][:-1] - 1023.0
    np.testing.assert_allclose(per["remChip"][1:], law, atol=1e-9)
    num0 = abs_s[0] - handoff["abs_sample"]
    law0 = num0 * step[0] + handoff["rem_chip"] - 1023.0
    np.testing.assert_allclose(per["remChip"][0], law0, atol=1e-9)


def test_vt_golden_carrier_phase_recurrence(golden_vt):
    """remCarrPhase[t] = rem(2π·carrFreq[t−1]·numSample[t]/Fs
    + remCarrPhase[t−1], 2π) (trackingVT_POS_updated.m:266-285): the
    carrier mix at :266 runs BEFORE the PLL update at :309-312, so block
    t's replica spins at the PREVIOUS row's carrier frequency (the
    handoff basis for block 0, :117-118).  ~4580 replica cycles per 1 ms
    block leave ~1e-8 rad of f64 round-off after the modular
    reduction."""
    per, handoff, _ = golden_vt
    fs = 58e6
    abs_s = per["absoluteSample"] / 2.0
    num = np.diff(abs_s, axis=0)
    num0 = abs_s[0] - handoff["abs_sample"]
    rem_prev = np.concatenate([handoff["rem_phase"][None, :],
                               per["remCarrPhase"][:-1]])
    nums = np.concatenate([num0[None, :], num])
    carr_prev = np.concatenate([handoff["carr_freq"][None, :],
                                per["carrFreq"][:-1]])
    law = np.mod(2.0 * np.pi * carr_prev * (nums / fs) + rem_prev,
                 2.0 * np.pi)
    err = np.abs(per["remCarrPhase"] - law)
    err = np.minimum(err, 2.0 * np.pi - err)     # wrap-around at 0/2π
    assert err.max() < 1e-7, err.max()


def test_vt_golden_pll_recurrence(golden_vt):
    """The scalar-PLL chain reproduces carrNco/carrFreq from carrError
    row-by-row (trackingVT_POS_updated.m:307-313): carrNco[t] =
    carrNco[t−1] + (τ₂/τ₁)(carrError[t] − carrError[t−1]) +
    carrError[t]·(pdi·1e-3/τ₁), with oldCarrNco=0 and oldCarrError from
    CT row 2999 at the handoff (…:123-124), and carrFreq = carrFreqBasis
    + carrNco with carrFreqBasis = the CT handoff carrier frequency
    (…:121) — the complete carrier chain of the production run."""
    from gps_sdr_tpu.ops.loops import loop_coefficients

    per, handoff, _ = golden_vt
    tau1, tau2 = loop_coefficients(15.0, 0.707, 0.25)
    nco_prev = np.concatenate([np.zeros((1, 5)), per["carrNco"][:-1]])
    err_prev = np.concatenate([handoff["carr_err"][None, :],
                               per["carrError"][:-1]])
    law = (nco_prev + (tau2 / tau1) * (per["carrError"] - err_prev)
           + per["carrError"] * (1e-3 / tau1))
    np.testing.assert_allclose(per["carrNco"], law, atol=1e-9)
    basis = per["carrFreq"] - per["carrNco"]
    np.testing.assert_allclose(basis, handoff["carr_freq"][None, :]
                               * np.ones((5000, 1)), atol=1e-6)


def test_vt_golden_codedelay_and_placeholders(golden_vt):
    """codedelay = mod(absoluteSample/bytes, Fs·ms)
    (trackingVT_POS_updated.m:347), and the dead fields the reference
    never assigns (prRate :142, amplitude/navi_data :138-140) are
    all-zero in the shipped record — exactly what save_vt_records_mat
    emits for them."""
    import scipy.io as sio

    per, _, _ = golden_vt
    np.testing.assert_array_equal(
        per["codedelay"], np.mod(per["absoluteSample"] / 2.0, 58000.0))
    vt = sio.loadmat(os.path.join(REF, "tckRstVT_Opensky_updated.mat"),
                     squeeze_me=True)["TckResultVT"]
    for p in POS_PRNS:
        assert np.all(np.asarray(vt[p - 1]["prRate"], np.float64) == 0)
        assert np.all(np.asarray(vt[p - 1]["amplitude"], np.float64) == 0)
        assert np.all(np.asarray(vt[p - 1]["navi_data"], np.float64) == 0)


def test_vt_golden_cn0_matches_shipped(golden_vt):
    """The shipped CN0_VT is the moment-method estimator
    (trackingVT_POS_updated.m:293-303) INCLUDING MATLAB's
    complex-arithmetic fallthrough: at 1 ms coherent integration the
    VT prompts sit near −2 dB post-correlation SNR, so ~40% of windows
    have E[Z]² < Var[Z]; MATLAB's sqrt goes imaginary and
    abs(10·log10(complex)) emits a plausible-LOOKING but meaningless
    value.  The complex-faithful replica matches every one of the 250×5
    shipped windows to float round-off; our real-valued estimator
    (which clamps the degenerate moment instead) matches wherever the
    estimate is physically meaningful."""
    from gps_sdr_tpu.utils.metrics import cn0_series

    per, _, ref_cn0 = golden_vt
    pp = per["P_i"] ** 2 + per["P_q"] ** 2
    zk = pp[:250 * 20].reshape(250, 20, 5)
    mean_zk = zk.mean(axis=1)
    var_zk = zk.var(axis=1, ddof=1)
    na2 = np.sqrt((mean_zk ** 2 - var_zk).astype(complex))
    var_iq = 0.5 * (mean_zk - na2)
    ratio = na2 / (2.0 * var_iq) / 1e-3
    matlab = np.abs(10.0 * np.log10(ratio))
    assert matlab.shape == ref_cn0.shape == (250, 5)
    np.testing.assert_allclose(matlab, ref_cn0, atol=1e-6)
    # the real-moment windows (the meaningful ones) also match our
    # production estimator
    ours = cn0_series(per["P_i"], per["P_q"], t_coh_s=1e-3)
    ok = mean_zk ** 2 > var_zk
    np.testing.assert_allclose(ours[ok], ref_cn0[ok], atol=1e-6)
    assert ok.mean() > 0.5  # the majority of windows are meaningful


def test_vt_golden_loader_roundtrip(golden_vt):
    """The VT loader consumes the reference's own shipped artifact and
    the laws above hold identically on the loaded VTTrackRecords — the
    import side of the VT .mat interop."""
    per, _, ref_cn0 = golden_vt
    trk, cn0 = matref.load_vt_records(
        os.path.join(REF, "tckRstVT_Opensky_updated.mat"), POS_PRNS)
    np.testing.assert_array_equal(trk.carr_nco, per["carrNco"])
    np.testing.assert_array_equal(trk.rem_chip, per["remChip"])
    np.testing.assert_array_equal(trk.absolute_sample,
                                  per["absoluteSample"] / 2.0)
    np.testing.assert_array_equal(cn0, ref_cn0)
    np.testing.assert_array_equal(
        trk.num_sample[1:].astype(np.float64),
        np.diff(per["absoluteSample"] / 2.0, axis=0))


def test_vt_golden_resave_schema_parity(golden_vt, tmp_path):
    """Writer-vs-reference schema parity: the reference's own shipped VT
    record, loaded and re-saved through save_vt_records_mat, carries
    EXACTLY the shipped field set (names and order) and round-trips the
    per-ms series bit-for-bit — a MATLAB consumer cannot distinguish
    the schemas."""
    import scipy.io as sio

    shipped = os.path.join(REF, "tckRstVT_Opensky_updated.mat")
    trk, cn0 = matref.load_vt_records(shipped, POS_PRNS)
    p = str(tmp_path / "resave.mat")
    matref.save_vt_records_mat(p, trk, POS_PRNS, samples_per_ms=58000,
                               cn0_vt=cn0)
    ref_names = sio.loadmat(shipped, squeeze_me=True
                            )["TckResultVT"].dtype.names
    our_names = sio.loadmat(p, squeeze_me=True
                            )["TckResultVT"].dtype.names
    assert our_names == ref_names
    trk2, cn02 = matref.load_vt_records(p, POS_PRNS)
    np.testing.assert_array_equal(cn02, cn0)
    np.testing.assert_array_equal(trk2.absolute_sample,
                                  trk.absolute_sample)
    np.testing.assert_array_equal(trk2.rem_chip, trk.rem_chip)
    np.testing.assert_array_equal(trk2.rem_phase, trk.rem_phase)
    np.testing.assert_array_equal(trk2.carr_nco, trk.carr_nco)
    np.testing.assert_array_equal(trk2.code_freq, trk.code_freq)
    np.testing.assert_array_equal(trk2.carr_freq, trk.carr_freq)
    np.testing.assert_array_equal(trk2.delta_pr, trk.delta_pr)
    np.testing.assert_allclose(trk2.corr, trk.corr, rtol=1e-6)
    np.testing.assert_allclose(trk2.sv_vel, trk.sv_vel, rtol=1e-9)
