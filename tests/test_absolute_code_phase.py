"""Absolute pseudorange-level accuracy: tracked code phase vs generator
truth for a single SV (no cross-correlation floor).  This pins the whole
chain acquisition→tracking→code-phase bookkeeping to sub-meter-level
accuracy; the multi-SV e2e position error is then dominated by physics
(Gold-code cross-correlation), not implementation bias."""

import numpy as np
import pytest

from gps_sdr_tpu.acquisition import run_acquisition
from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.geo.coords import llh2xyz
from gps_sdr_tpu.io.ifdata import IFSampleSource, write_if_file
from gps_sdr_tpu.io.synthetic import GeometrySignal, GeometrySV
from gps_sdr_tpu.tracking import TrackParams, init_track_state, run_tracking

from tests import scenario

CFG = ReceiverConfig(
    file=FileConfig(name="single_sv", skip_ms=0),
    signal=SignalConfig(f_if=1.25e6, fs=5e6),
)


@pytest.fixture(scope="module")
def tracked(tmp_path_factory):
    eph = scenario.visible_constellation(1)[0]
    usr = np.asarray(llh2xyz(np.asarray(scenario.TRUTH_LLH)))
    gs = GeometrySignal(CFG, [GeometrySV(prn=12, eph=eph, amplitude=3.0)],
                        usr, scenario.TOW0, clk_bias_s=0.0,
                        clk_drift_sps=0.0, n_subframes=4)
    path = str(tmp_path_factory.mktemp("single") / "single_sv.bin")
    gs.write_file(path, 2600, noise_std=8.0, seed=3)
    src = IFSampleSource(path, CFG.file)
    acq = run_acquisition(src, CFG, prns=[12])
    state = init_track_state(CFG, acq.code_delay, acq.fine_freq_hz)
    rec, _ = run_tracking(src, CFG, [12], state, TrackParams.epl(CFG), 2500)
    return gs, rec


def test_absolute_code_phase_bias(tracked):
    gs, rec = tracked
    fs = CFG.signal.fs
    fchip = CFG.signal.code_freq_basis
    rebase = gs.tow0 - gs.msg_tow0
    biases = []
    for i in range(1500, 2500, 100):
        a = float(rec.absolute_sample[i, 0])          # block-end sample
        # replica chips elapsed since tracking start at this sample
        chips_tracked = 1023.0 * (i + 1) + rec.rem_chip[i, 0]
        # true SV-clock code phase at that receiver sample
        delta = gs.sv_clock_delta(12, np.array([a / fs]))[0]
        chip_true = (rebase + a / fs + delta) * fchip
        biases.append((chip_true - chips_tracked + 511.5) % 1023.0 - 511.5)
    biases = np.asarray(biases)
    frac = biases - np.round(np.mean(biases))
    # DLL steady-state bias — require < 0.015 chips (≈ 4.4 m of range)
    assert abs(np.mean(frac)) < 0.015, f"code bias {np.mean(frac):.4f} chips"
    assert np.std(frac) < 0.01


def test_tracked_doppler_matches_geometry(tracked):
    gs, rec = tracked
    fs = CFG.signal.fs
    d = gs.sv_clock_delta(12, np.array([2.0, 2.2]))
    f_true = CFG.signal.f_if + (d[1] - d[0]) / 0.2 * CFG.signal.fc
    f_track = np.mean(rec.carr_freq[2000:2200, 0])
    assert abs(f_track - f_true) < 1.0, (f_track, f_true)
