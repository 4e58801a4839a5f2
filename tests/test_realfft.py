"""Four-step matmul DFT vs numpy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from gps_sdr_tpu.ops.realfft import fft_real, ifft_real


@pytest.mark.parametrize("n", [16, 256, 8192, 131072])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n)))
    Xr, Xi = fft_real(x.real.astype(np.float32), x.imag.astype(np.float32))
    ref = np.fft.fft(x, axis=-1)
    err = np.max(np.abs((np.asarray(Xr) + 1j * np.asarray(Xi)) - ref))
    assert err < 2e-5 * np.max(np.abs(ref))


def test_ifft_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    Xr, Xi = fft_real(x, np.zeros_like(x))
    yr, yi = ifft_real(Xr, Xi)
    np.testing.assert_allclose(np.asarray(yr), x, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), 0.0, atol=2e-4)


def test_non_pow2_rejected():
    with pytest.raises(ValueError):
        fft_real(np.zeros((1, 100), np.float32), np.zeros((1, 100), np.float32))


def test_graphplan_matches_numpy():
    from gps_sdr_tpu.ops.realfft import fft_real_graphplan
    rng = np.random.default_rng(5)
    for n in (1024, 16384):
        x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
             ).astype(np.complex64)
        yr, yi = fft_real_graphplan(jnp.asarray(x.real.astype(np.float32)),
                                    jnp.asarray(x.imag.astype(np.float32)))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(yr), ref.real, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=2e-4 * scale)
