"""Measurement-validity masking (SURVEY.md §5 failure handling): channels
losing lock mid-capture must drop out of the WLS / EKF epochs instead of
silently poisoning the solution (round-1 VERDICT missing #4)."""

import dataclasses

import numpy as np
import pytest

from gps_sdr_tpu.geo.coords import llh2xyz
from gps_sdr_tpu.pipeline import _REC_FIELDS, Receiver
from gps_sdr_tpu.receiver.ct import run_ct_positioning
from gps_sdr_tpu.tracking import TrackRecords

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


@pytest.fixture(scope="module")
def dropout_records(rx):
    """CT records with channel 0 losing lock at ms 2000: correlators
    collapse to noise and the code phase walks off (~2.9 m per ms)."""
    rec, _ = rx.ct_position(n_ms=4000, init_pos_ecef=INIT)
    d = {f: np.array(getattr(rec, f)) for f in _REC_FIELDS}
    t0, t_len = 2000, d["corr"].shape[0]
    rng = np.random.default_rng(3)
    d["corr"][t0:, 0] = rng.normal(scale=1.0,
                                   size=d["corr"][t0:, 0].shape)
    d["rem_chip"][t0:, 0] += 0.01 * np.arange(t_len - t0)
    return TrackRecords(**d, i_early=rec.i_early, i_prompt=rec.i_prompt,
                        i_late=rec.i_late), t0


def test_ct_mask_drops_dead_channel_and_survives(rx, dropout_records):
    rec, t0 = dropout_records
    eph, sbf = rx.decode()
    prns = rx.usable_svs()
    nav = run_ct_positioning(rec, scenario.CFG, prns, eph, sbf, INIT)
    err = np.linalg.norm(nav.usr_pos - TRUTH, axis=1)
    # epoch index of the dropout: epochs start ~1.08 s in, 20 ms apart
    e0 = np.searchsorted(nav.local_time - nav.local_time[0],
                         (t0 - 1080) / 1000.0) + 5
    # the gate sees the collapsed SNR within ~2 windows (40 rows)
    assert not nav.valid[e0 + 5:, 0].any(), "dead channel still in WLS"
    assert nav.valid[e0 + 5:, 1:].all(), "healthy channels were masked"
    assert np.median(nav.cn0_dbhz[e0 + 5:, 0]) < 35.0
    # the solution survives on the remaining 4 SVs
    post = err[e0 + 5:]
    assert np.median(post) < 60.0, np.median(post)
    assert np.median(err[5:e0 - 2]) < 40.0


def test_ct_unmasked_dropout_poisons_solution(rx, dropout_records):
    """Contrast: with the gate disabled (threshold 0, the reference's
    behavior) the walking pseudorange wrecks the fix."""
    rec, t0 = dropout_records
    eph, sbf = rx.decode()
    prns = rx.usable_svs()
    cfg0 = scenario.CFG.replace(solu=dataclasses.replace(
        scenario.CFG.solu, mask_snr_db=0.0))
    nav = run_ct_positioning(rec, cfg0, prns, eph, sbf, INIT)
    err = np.linalg.norm(nav.usr_pos - TRUTH, axis=1)
    assert np.median(err[-30:]) > 150.0, np.median(err[-30:])


def test_vt_mask_survives_corrupted_channel(rx):
    """A channel handed to VT two chips off the peak never correlates;
    the EKF must gate it out and hold the fix on the rest."""
    import jax.numpy as jnp

    from gps_sdr_tpu.geo.ephemeris import Ephemeris
    from gps_sdr_tpu.receiver.vt import (VTParams, init_vt_state,
                                         run_vector_tracking)

    cfg = scenario.CFG
    eph, sbf = rx.decode()
    pos_svs = rx.usable_svs()
    ct_rec, ct_nav = rx.ct_position(n_ms=4000, init_pos_ecef=INIT)
    epoch0 = cfg.file.skiptime_vt_ms // cfg.solu.nav_sol_period_ms - 1
    params = VTParams()
    start_slot, tt0 = {}, np.empty(len(pos_svs))
    for ch, p in enumerate(pos_svs):
        first_sf_ms = sbf["nav1"][p] + eph[p].sfb[0] * 20
        slot = first_sf_ms + cfg.file.skiptime_vt_ms - 1
        start_slot[ch] = slot
        tt0[ch] = (eph[p].tow[0] + (slot + 1 - first_sf_ms) / 1000.0
                   + ct_rec.rem_chip[slot, ch] / cfg.signal.code_freq_basis)
    state = init_vt_state(cfg, ct_rec, list(range(len(pos_svs))),
                          start_slot, tt0, ct_nav.usr_pos[epoch0],
                          ct_nav.usr_vel[epoch0],
                          float(ct_nav.clk_bias_m[epoch0]),
                          float(ct_nav.clk_drift_ms[epoch0]), params)
    # corrupt channel 0: +2 chips of code phase = off the correlation peak
    state = state._replace(
        rem_chip=state.rem_chip.at[0].add(2.0),
        transmit_time=state.transmit_time.at[0].add(
            2.0 / cfg.signal.code_freq_basis))
    eph_struct = Ephemeris(**{
        k: np.asarray([eph[p].latest(0)[k] for p in pos_svs])
        for k in Ephemeris._fields})
    trk, sol, _ = run_vector_tracking(rx.source, cfg, pos_svs, eph_struct,
                                      state, params, 1500, INIT)
    err = np.linalg.norm(sol.usr_pos - TRUTH, axis=1)
    # gated out within a few C/N0 windows, healthy channels stay in
    assert not sol.valid[200:, 0].any()
    assert sol.valid[200:, 1:].all()
    assert np.median(err[500:]) < 60.0, np.median(err[500:])
    assert np.max(err[500:]) < 120.0