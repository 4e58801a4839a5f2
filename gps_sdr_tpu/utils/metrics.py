"""Receiver metrics and report formatting.

- C/N0 time series via the moment-method estimator the reference embeds in
  every tracking loop (trackingCT.m:120-134), computed vectorized from the
  recorded prompt correlators instead of in-loop.
- Acquisition results table (showAcqResult.m equivalent).
"""

from __future__ import annotations

import numpy as np

from gps_sdr_tpu.ops.loops import cn0_moment_estimator


def cn0_series(p_i: np.ndarray, p_q: np.ndarray, t_coh_s=1e-3,
               window: int = 20, gated: bool = False):
    """C/N0 from (T, N) prompt records via the moment-method estimator
    over disjoint K=`window` blocks (trackingCT.m:120-134,
    trackingCT_POS_updated.m:237-250) — the single implementation behind
    both the plain per-window series and the per-row validity gate.

    `t_coh_s` is the coherent integration time: a scalar, or a (T, N)
    per-row array when channels switch pdi mid-record (the reference's
    1 ms → 10 ms switch).  Prompt powers scale with t_coh² (P ∝ pdi·S),
    so the powers are normalized by t_coh² before windowing: the
    moment-method SNR is invariant to uniform scaling, which leaves
    homogeneous windows unchanged while removing the ~100× power step
    inside a window that straddles a pdi switch (an unnormalized mixed
    window drives 2·M2²−M4 negative and the SNR to ≈−220 dB, spuriously
    tripping the gate — the round-2 pdi-switch epoch spike).

    gated=False → (W, N) per-window C/N0 (the reference's |·| quirk).
    gated=True  → per-row (cn0_dbhz (T,N), gate_snr_db (T,N)): window
    w's estimate applies from window w+1's rows on (no lookahead — the
    first window gates itself, a warmup concession).  The gate series is
    the post-correlation SNR 10·log10(NA²/2σ²_IQ) (C/N0 without the 1/T
    term) averaged over the last 5 completed windows (100 ms at 1 ms
    pdi).  Averaging is what separates weak-lock from noise: a single
    K=20 window measures noise at −2.7 ± 2.5 dB (p99 ≈ +5.8) while a
    locked 31 dB-Hz channel (the reference Opensky capture's weakest)
    measures ≈ +4.4 ± 2.5 dB — inseparable per window, but the 5-window
    means split at ≈ +0.8 vs +4.4 with ~0.1% error either side at a
    +1 dB threshold (SolutionConfig.mask_snr_db).  Hard failures (code
    walked off → bimodal window → ≈ −80 dB) still drop within one
    window of the mean.  Consumers must apply the threshold with
    hysteresis (:func:`gate_mask`): noise strings 5 positive windows
    ~0.04% of the time, so a dead channel would flicker back without
    the +3 dB re-entry margin.
    """
    pp = p_i.astype(np.float64) ** 2 + p_q.astype(np.float64) ** 2
    t_len, n_ch = pp.shape
    k = window
    n_win = t_len // k
    tc = np.broadcast_to(np.asarray(t_coh_s, np.float64), pp.shape)
    pp = pp / (tc * tc)                       # scale-invariant normalization
    zk = pp[:n_win * k].reshape(n_win, k, n_ch)
    snr = np.asarray(cn0_moment_estimator(
        np.moveaxis(zk, 1, 2), 1.0, signed=True))       # (n_win, N)
    # C/N0 = post-correlation SNR − 10·log10(T_coh at the window end)
    est = snr - 10.0 * np.log10(tc[k - 1::k][:n_win])
    if not gated:
        # the reference's |·| quirk applies to the full expression
        # (trackingCT.m:133); the gate must see the signed value instead
        return np.abs(est)
    cn0 = np.full((t_len, n_ch), np.inf)
    gate = np.full((t_len, n_ch), np.inf)
    if n_win == 0:
        return cn0, gate
    # mean of the last ≤5 completed windows
    cs = np.cumsum(snr, axis=0)
    m5 = np.empty_like(snr)
    for w in range(n_win):
        lo = max(0, w - 4)
        m5[w] = (cs[w] - (cs[lo - 1] if lo else 0.0)) / (w - lo + 1)
    cn0[:k] = est[0]
    gate[:k] = m5[0]
    for w in range(n_win):
        lo, hi = (w + 1) * k, min((w + 2) * k, t_len)
        if lo >= t_len:
            break
        cn0[lo:hi] = est[w]
        gate[lo:hi] = m5[w]
    return cn0, gate


def gate_mask(gate: np.ndarray, thresh_db: float,
              reenter_margin_db: float = 3.0) -> np.ndarray:
    """(T, N) validity mask from a gate series with hysteresis: a channel
    drops when its gate falls below `thresh_db` and re-enters only above
    `thresh_db + reenter_margin_db` (Schmitt trigger).  Noise exceeds the
    drop threshold in ~0.04% of 5-window means but the re-entry level in
    ~1e-9, so dead channels stay out; a briefly-dipping weak-lock channel
    (mean ≈ +4.4 dB) recovers within a window or two."""
    t_len, n_ch = gate.shape
    valid = np.empty((t_len, n_ch), bool)
    cur = np.ones(n_ch, bool)
    enter = thresh_db + reenter_margin_db
    # the trigger state is a fixed point under a constant input, so one
    # application per constant-gate segment equals the per-row recurrence
    # (the gate series is window-constant: T/20 segments, not T)
    change = np.ones(t_len, bool)
    change[1:] = np.any(gate[1:] != gate[:-1], axis=1)
    starts = np.flatnonzero(change)
    for i, s0 in enumerate(starts):
        g = gate[s0]
        cur = np.where(cur, g >= thresh_db, g >= enter)
        end = starts[i + 1] if i + 1 < len(starts) else t_len
        valid[s0:end] = cur
    return valid


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
