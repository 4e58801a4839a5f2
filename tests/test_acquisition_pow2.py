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


def test_real_grid_matches_complex(source):
    """The float-pair / matmul-DFT grid equals the complex pow2 grid."""
    import jax.numpy as jnp
    from gps_sdr_tpu.acquisition import (acquisition_power_grid_pow2,
                                         acquisition_power_grid_real,
                                         doppler_carriers, next_pow2,
                                         sampled_codes)
    S = CFG.signal.samples_per_ms
    B = 6
    raw = source.read_complex(CFG.file.skip_ms * S, (B + 1) * S)
    idx = np.arange(B)[:, None] * S + np.arange(2 * S)[None, :]
    blocks2 = raw[idx]
    carriers2 = doppler_carriers(CFG, 2 * S)
    fft_len = next_pow2(2 * S)
    code_fft = np.fft.fft(sampled_codes(CFG, [3, 16, 9, 22]),
                          n=fft_len).astype(np.complex64)
    ref = np.asarray(acquisition_power_grid_pow2(
        jnp.asarray(blocks2), jnp.asarray(carriers2),
        jnp.asarray(code_fft), fft_len, S, prn_chunk=2))
    got = np.asarray(acquisition_power_grid_real(
        jnp.asarray(np.stack([blocks2.real, blocks2.imag], -1
                             ).astype(np.float32)),
        jnp.asarray(np.stack([carriers2.real, carriers2.imag], -1
                             ).astype(np.float32)),
        jnp.asarray(np.stack([code_fft.real, code_fft.imag], -1
                             ).astype(np.float32)),
        fft_len, S, prn_chunk=2))
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3 * ref.max())
