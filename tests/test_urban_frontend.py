"""Urban-style front-end path: int16 IQ, near-zero IF, per-block DC
removal (the reference's second capture configuration — acquisition.m:28-32
int16 branch, BASELINE.md 'Urban front-end')."""

import numpy as np
import pytest

from gps_sdr_tpu.acquisition import run_acquisition
from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource, write_if_file
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
from gps_sdr_tpu.tracking import TrackParams, init_track_state, run_tracking

CFG = ReceiverConfig(
    file=FileConfig(name="urban_syn", skip_ms=1, data_precision=2),
    signal=SignalConfig(f_if=0.0, fs=5e6),
)

SVS = [
    SyntheticSV(prn=1, amplitude=60.0, doppler_hz=1200.0,
                code_delay_samples=777.0),
    SyntheticSV(prn=11, amplitude=50.0, doppler_hz=-365.0,
                code_delay_samples=3001.0),
]


@pytest.fixture(scope="module")
def source(tmp_path_factory):
    iq = generate_if_samples(CFG, SVS, duration_ms=600, noise_std=180.0,
                             seed=5)
    iq = iq + (230.0 - 95.0j)  # DC offset the int16 path must remove
    path = str(tmp_path_factory.mktemp("urban") / "urban_syn.bin")
    write_if_file(path, iq, CFG.file)
    return IFSampleSource(path, CFG.file)


def test_int16_acquisition_with_dc_offset(source):
    acq = run_acquisition(source, CFG)
    # marginal cross-correlation false alarms near threshold are pruned
    # later by nav decode (findPosSV); require the true SVs, strongly
    got_set = set(int(s) for s in acq.sv)
    assert {1, 11}.issubset(got_set)
    snr = {int(p): s for p, s in zip(acq.sv, acq.snr_db)}
    assert snr[1] > 30 and snr[11] > 30
    got = {int(p): f for p, f in zip(acq.sv, acq.fine_freq_hz)}
    assert abs(got[1] - 1200.0) < 25.0
    assert abs(got[11] - (-365.0)) < 25.0


def test_int16_tracking_locks(source):
    acq = run_acquisition(source, CFG)
    chans = [acq.channel_index(p) for p in (1, 11)]
    state = init_track_state(CFG, acq.code_delay[chans],
                             acq.fine_freq_hz[chans])
    params = TrackParams.epl(CFG)
    assert params.remove_dc  # int16 front-end engages DC removal
    rec, _ = run_tracking(source, CFG, [1, 11], state, params, 400)
    p = np.abs(rec.p_i[-100:]).mean(axis=0)
    q = np.abs(rec.p_q[-100:]).mean(axis=0)
    assert np.all(p > 4 * q)
    for ch, sv in enumerate((SVS[0], SVS[1])):
        err = np.mean(rec.carr_freq[-100:, ch]) - sv.doppler_hz
        assert abs(err) < 3.0, (sv.prn, err)
