"""Acquisition stage tests on synthetic signals with known truth."""

import numpy as np
import pytest

from gps_sdr_tpu.acquisition import run_acquisition
from gps_sdr_tpu.config import (AcqConfig, FileConfig, ReceiverConfig,
                                SignalConfig)
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples

CFG = ReceiverConfig(
    file=FileConfig(name="synthetic", skip_ms=2),
    signal=SignalConfig(f_if=1.023e6, fs=4.092e6),
)

# Realistic levels: GPS C/A is below the per-sample noise floor; strong
# signals would raise the Gold cross-correlation floor above threshold for
# every PRN.
TRUE_SVS = [
    SyntheticSV(prn=3, amplitude=2.5, doppler_hz=1500.0,
                code_delay_samples=1234.0),
    SyntheticSV(prn=16, amplitude=2.0, doppler_hz=-3000.0,
                code_delay_samples=0.0),
    SyntheticSV(prn=27, amplitude=1.8, doppler_hz=250.0,
                code_delay_samples=4000.0),
]


@pytest.fixture(scope="module")
def acq_result():
    iq = generate_if_samples(CFG, TRUE_SVS, duration_ms=40,
                             noise_std=8.0, seed=1)
    vals = np.empty(2 * iq.size, dtype=np.float64)
    vals[0::2] = iq.real
    vals[1::2] = iq.imag
    src = IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), CFG.file)
    return run_acquisition(src, CFG)


def test_correct_svs_found(acq_result):
    assert set(acq_result.sv) == {3, 16, 27}


def test_absent_svs_rejected(acq_result):
    assert 9 not in acq_result.sv and 30 not in acq_result.sv


def test_coarse_doppler(acq_result):
    got = {int(p): d for p, d in zip(acq_result.sv, acq_result.doppler_hz)}
    # grid resolution 500 Hz → nearest bin
    assert got[3] == 1500.0
    assert got[16] == -3000.0
    assert got[27] in (0.0, 500.0)  # 250 Hz is exactly between bins


def test_fine_doppler_within_bin(acq_result):
    got = {int(p): f for p, f in zip(acq_result.sv, acq_result.fine_freq_hz)}
    for sv in TRUE_SVS:
        err = got[sv.prn] - (CFG.signal.f_if + sv.doppler_hz)
        # long-FFT resolution fs/(L·S·20) ≈ 5 Hz; allow a few bins
        assert abs(err) < 25.0, (sv.prn, err)


def test_code_delay_consistency(acq_result):
    """Code delay convention: the first code epoch in the acquisition
    window starts at sample (S − codedelay) (0-based), mod one period —
    the reference's tracking seek (trackingCT.m:63)."""
    S = CFG.signal.samples_per_ms
    got = {int(p): int(d) for p, d in zip(acq_result.sv, acq_result.code_delay)}
    for sv in TRUE_SVS:
        # true code epoch position within a period, relative to the
        # acquisition window start (skip_ms blocks in)
        f_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        # chip phase at window start sample n0 = skip·S:
        n0 = CFG.file.skip_ms * S
        chip0 = (n0 - sv.code_delay_samples) / CFG.signal.fs * f_code
        # samples until next code epoch
        next_epoch = (np.ceil(chip0 / 1023) * 1023 - chip0) / f_code * CFG.signal.fs
        expect = (S - next_epoch) % S
        err = (got[sv.prn] - expect + S / 2) % S - S / 2
        assert abs(err) <= 1.5, (sv.prn, got[sv.prn], expect)
