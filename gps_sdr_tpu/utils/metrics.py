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


def export_ephemeris_table(eph: dict, path: str, prns=None) -> str:
    """CSV export of decoded ephemerides — one column per PRN, one row
    per parameter (the reference's Task_3_table.m, whose own export is
    partially broken; this is the working equivalent).  Returns the CSV
    text; writes it to `path` when given."""
    prns = list(prns) if prns is not None else sorted(
        p for p, r in eph.items() if getattr(r, "updateflag", 0) == 1)
    scalar_rows = ["weeknum", "iodc", "iode2", "iode3", "health",
                   "ura"]
    param_rows = ["toe", "toc", "sqrta", "ecc", "m0", "omega0", "i0", "w",
                  "deltan", "omegadot", "idot", "cuc", "cus", "crc", "crs",
                  "cic", "cis", "af0", "af1", "af2", "tgd"]
    lines = ["parameter," + ",".join(f"PRN{p}" for p in prns)]
    for name in scalar_rows + param_rows:
        vals = []
        for p in prns:
            seq = getattr(eph[p], name, [])
            vals.append(repr(seq[0]) if len(seq) else "")
        lines.append(f"{name}," + ",".join(vals))
    text = "\n".join(lines) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def format_acquisition_table(acq, f_if: float) -> str:
    """Console table of acquisition results (showAcqResult.m:14-20)."""
    lines = ["PRN   SNR[dB]  Doppler[Hz]  FineDoppler[Hz]  CodeDelay[smp]"]
    for i, sv in enumerate(acq.sv):
        lines.append(
            f"{int(sv):3d} {acq.snr_db[i]:9.2f} {acq.doppler_hz[i]:12.1f} "
            f"{acq.fine_freq_hz[i] - f_if:16.1f} {int(acq.code_delay[i]):15d}")
    return "\n".join(lines)
