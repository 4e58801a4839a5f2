"""Power-of-two (TPU) acquisition path vs the circular reference path."""

import numpy as np
import pytest

from gps_sdr_tpu.acquisition import run_acquisition
from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples

CFG = ReceiverConfig(
    file=FileConfig(name="synthetic", skip_ms=2),
    signal=SignalConfig(f_if=1.023e6, fs=4.092e6),
)

TRUE_SVS = [
    SyntheticSV(prn=3, amplitude=2.5, doppler_hz=1500.0,
                code_delay_samples=1234.0),
    SyntheticSV(prn=16, amplitude=2.0, doppler_hz=-3000.0,
                code_delay_samples=0.0),
]


@pytest.fixture(scope="module")
def source():
    iq = generate_if_samples(CFG, TRUE_SVS, duration_ms=40,
                             noise_std=8.0, seed=1)
    vals = np.empty(2 * iq.size)
    vals[0::2] = iq.real
    vals[1::2] = iq.imag
    return IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), CFG.file)


def test_pow2_matches_circular(source):
    a_circ = run_acquisition(source, CFG, fft_mode="circular")
    a_pow2 = run_acquisition(source, CFG, fft_mode="pow2")
    assert set(a_circ.sv) == set(a_pow2.sv) == {3, 16}
    for p in (3, 16):
        ic, ip = a_circ.channel_index(p), a_pow2.channel_index(p)
        # identical delay convention (±1 sample from the different
        # correlation support) and consistent Doppler
        assert abs(int(a_circ.code_delay[ic]) - int(a_pow2.code_delay[ip])) <= 1
        assert a_circ.doppler_hz[ic] == a_pow2.doppler_hz[ip]
        # fine Doppler: pow2 pads the spectrum FFT → ≤ bin-level difference
        assert abs(a_circ.fine_freq_hz[ic] - a_pow2.fine_freq_hz[ip]) < 20.0
        assert abs(a_circ.snr_db[ic] - a_pow2.snr_db[ip]) < 2.0
