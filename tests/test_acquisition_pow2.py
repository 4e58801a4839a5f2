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


def test_fine_peaks_device_batch_matches_host_fft():
    """The one-dispatch batched fine-Doppler spectrum peaks
    (_fine_peaks_device — the TPU path run_acquisition takes) equal the
    host FFT argmax for every SV in the batch, and fine_doppler_batch's
    fallback equals the per-SV fine_doppler on this backend."""
    import jax.numpy as jnp

    from gps_sdr_tpu.acquisition import (_fine_peaks_device, fine_doppler,
                                         fine_doppler_batch, next_pow2)
    from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig

    rng = np.random.default_rng(9)
    n, n_sv = 4096, 5
    fft_len = next_pow2(20 * n)
    freqs = rng.uniform(0.05, 0.45, n_sv)          # cycles/sample
    t = np.arange(n)
    segs = np.stack([np.exp(2j * np.pi * f * t)
                     + 0.5 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                     for f in freqs]).astype(np.complex64)
    pairs = jnp.asarray(np.stack([segs.real, segs.imag], -1
                                 ).astype(np.float32))
    idx_dev = np.asarray(_fine_peaks_device(pairs, fft_len))
    idx_host = np.array([int(np.argmax(np.abs(np.fft.fft(s, fft_len))))
                         for s in segs])
    np.testing.assert_array_equal(idx_dev, idx_host)

    # the batch entry falls back to the per-SV path off-TPU with
    # identical results (same segments, same peak map)
    cfg = ReceiverConfig(file=FileConfig(skip_ms=0),
                         signal=SignalConfig(f_if=2.5e5, fs=1.023e6))
    S = cfg.signal.samples_per_ms
    long_raw = (rng.normal(size=(cfg.acq.fine_fft_ms + 1) * S)
                + 1j * rng.normal(size=(cfg.acq.fine_fft_ms + 1) * S)
                ).astype(np.complex64)
    prns, delays = (3, 7), (123, 456)
    got = fine_doppler_batch(long_raw, prns, delays, cfg, "pow2")
    want = [fine_doppler(long_raw, p, d, cfg, "pow2")
            for p, d in zip(prns, delays)]
    np.testing.assert_array_equal(got, want)
