"""Receiver metrics and report formatting.

- C/N0 time series via the moment-method estimator the reference embeds in
  every tracking loop (trackingCT.m:120-134), computed vectorized from the
  recorded prompt correlators instead of in-loop.
- Acquisition results table (showAcqResult.m equivalent).
"""

from __future__ import annotations

import numpy as np

from gps_sdr_tpu.ops.loops import cn0_moment_estimator


def cn0_series(p_i: np.ndarray, p_q: np.ndarray, t_coh_s: float,
               window: int = 20) -> np.ndarray:
    """(W, N) C/N0 estimates from (T, N) prompt records, one per
    `window` blocks (K=20 in the reference)."""
    T = p_i.shape[0]
    W = T // window
    zk = (p_i[:W * window] ** 2 + p_q[:W * window] ** 2)
    zk = zk.reshape(W, window, -1).transpose(0, 2, 1)  # (W, N, window)
    return np.asarray(cn0_moment_estimator(zk, t_coh_s))


def format_acquisition_table(acq, f_if: float) -> str:
    """Console table of acquisition results (showAcqResult.m:14-20)."""
    lines = ["PRN   SNR[dB]  Doppler[Hz]  FineDoppler[Hz]  CodeDelay[smp]"]
    for i, sv in enumerate(acq.sv):
        lines.append(
            f"{int(sv):3d} {acq.snr_db[i]:9.2f} {acq.doppler_hz[i]:12.1f} "
            f"{acq.fine_freq_hz[i] - f_if:16.1f} {int(acq.code_delay[i]):15d}")
    return "\n".join(lines)
