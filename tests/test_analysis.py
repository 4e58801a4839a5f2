"""Analysis module tests: multipath ACF, feature extraction, C/N0, plots."""

import numpy as np

from gps_sdr_tpu.analysis.acf import acf_features, acf_envelope
from gps_sdr_tpu.analysis.multipath import multipath_acf, pseudorange_bias_chips
from gps_sdr_tpu.utils.metrics import cn0_series, format_acquisition_table


def test_multipath_acf_distortion():
    res = multipath_acf(prn=3, fs=20.46e6,
                        delays_chips=np.array([0.0, 0.25, 0.5, 1.0, 2.0]),
                        alpha=0.5, n_ms=1)
    # clean LOS ACF: triangular, peak at tap 0
    k0 = np.argmin(np.abs(res.taps_chips))
    assert np.argmax(res.acf_los) == k0
    # in-phase multipath raises the peak and skews the late side
    assert res.acf[1].max() > res.acf_los.max()
    # a 2-chip-delayed reflection no longer overlaps: ACF ≈ LOS
    np.testing.assert_allclose(res.acf[4][k0 - 8:k0 + 9],
                               res.acf_los[k0 - 8:k0 + 9], rtol=0.12)


def test_multipath_pseudorange_bias():
    res = multipath_acf(prn=3, fs=20.46e6,
                        delays_chips=np.linspace(0.05, 1.2, 12), alpha=0.5)
    bias = pseudorange_bias_chips(res, spacing=0.5)
    assert np.max(np.abs(bias)) > 0.05     # in-phase multipath biases DLL
    assert abs(bias[-1]) < np.max(np.abs(bias))  # decays at long delay


def test_acf_features_shapes_and_separation():
    rng = np.random.default_rng(0)
    T, N, K = 400, 2, 25
    taps = np.linspace(0.6, -0.6, K)
    corr = rng.normal(0, 1, (T, N, K, 2))
    # channel 0: clean triangular ACF; channel 1: flat (multipath-like)
    tri = np.maximum(0, 1 - np.abs(taps)) * 50
    corr[:, 0, :, 0] += tri
    corr[:, 1, :, 0] += 25.0
    code_err = rng.normal(0, 0.05, (T, N))
    code_err[:, 1] *= 4
    f = acf_features(corr, code_err, taps, window_ms=100)
    assert f.f1_amp.shape == (4, 2)
    assert f.matrix().shape == (8, 5)
    # clean channel has lower delay variance and lower disc variance
    assert f.f3_delay_var[:, 0].mean() < f.f3_delay_var[:, 1].mean()
    assert f.f5_disc_var[:, 0].mean() < f.f5_disc_var[:, 1].mean()


def test_cn0_series_tracks_snr():
    rng = np.random.default_rng(1)
    T = 400
    amp, sigma = 5000.0, 300.0
    p_i = amp + rng.normal(0, sigma, (T, 1))
    p_q = rng.normal(0, sigma, (T, 1))
    cn0 = cn0_series(p_i, p_q, 1e-3)
    # C/N0 ≈ 10log10(amp²/(2σ²)/T_coh) ≈ 51.4 dB-Hz
    expect = 10 * np.log10(amp ** 2 / (2 * sigma ** 2) / 1e-3)
    assert abs(np.median(cn0) - expect) < 3.0


def test_acquisition_table_format():
    class A:
        sv = np.array([3, 16])
        snr_db = np.array([18.1, 26.4])
        doppler_hz = np.array([1000.0, 0.0])
        fine_freq_hz = np.array([4580990.0, 4579695.0])
        code_delay = np.array([3683, 26051])

    txt = format_acquisition_table(A(), 4.58e6)
    assert "3683" in txt and "26.43" not in txt
    assert len(txt.splitlines()) == 3


def test_acf_evolution_plot(tmp_path):
    """plot_acf_evolution (the CalculateFeatures.m animated-GIF
    equivalent) renders from synthetic multicorrelator records."""
    import os

    from gps_sdr_tpu.analysis.plots import plot_acf_evolution

    rng = np.random.default_rng(2)
    taps = [round(0.6 - 0.05 * i, 4) for i in range(25)]
    tri = np.clip(1.0 - np.abs(np.asarray(taps)), 0.0, None)
    corr = np.zeros((400, 2, 25, 2))
    corr[..., 0] = 1000.0 * tri[None, None, :]
    corr += rng.normal(scale=20.0, size=corr.shape)
    out = str(tmp_path / "acf.png")
    plot_acf_evolution(corr, taps, prns=(3, 16), out_path=out)
    assert os.path.getsize(out) > 10_000


def test_acf_animation_gif(tmp_path):
    """save_acf_animation writes the reference's animated ACF artifact
    (CalculateFeatures.m:299-319 correlation_outputs.gif): a multi-frame
    GIF whose frames accumulate per-ms ACF curves."""
    import os

    from PIL import Image

    from gps_sdr_tpu.analysis.plots import save_acf_animation

    rng = np.random.default_rng(3)
    taps = [round(0.6 - 0.05 * i, 4) for i in range(25)]
    tri = np.clip(1.0 - np.abs(np.asarray(taps)), 0.0, None)
    corr = np.zeros((60, 2, 25, 2))
    corr[..., 0] = 1000.0 * tri[None, None, :]
    corr += rng.normal(scale=20.0, size=corr.shape)
    rem = np.zeros((60, 2))
    rem[:, 1] = np.linspace(0, 0.1, 60)
    out = str(tmp_path / "acf.gif")
    save_acf_animation(corr, taps, prn=16, channel=1, rem_chip=rem,
                       out_path=out, n_frames=12, stride_ms=4)
    assert os.path.getsize(out) > 5_000
    with Image.open(out) as im:
        assert im.format == "GIF"
        assert getattr(im, "n_frames", 1) == 12
