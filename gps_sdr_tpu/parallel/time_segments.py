"""Time-segmented tracking: sequence parallelism for the serial scan.

The tracking loop is an inherently serial recurrence (SURVEY.md §5
"long-context"): 40+ s of ephemeris tracking is a 40000-step `lax.scan`
whose per-step work is far too small to saturate a chip.  This module is
the overlap-save reformulation: the code-period axis is cut into D
segments, each segment's NCO state is *predicted* from acquisition
(code-period boundaries advance deterministically at ≈S·(1−fd/fc) samples
per period, so after 16 s a 5 Hz fine-Doppler error mispredicts the
boundary by <0.1 chip), every segment tracks a `halo` of extra periods for
the DLL/PLL to pull in, and the halos are discarded at the stitch.

(channel × segment) becomes one big batch axis, so the scan shrinks by D
while the per-step batch grows by D — better utilization on one chip, and
the same axis shards across a mesh with `parallel.tracking`.

Row r of the stitched record corresponds to absolute code period r of
each channel — identical alignment to a serial run; only loop-noise
differs (and only near segment starts).  Intended for the bit-decoding
stage; the POS stages track serially from their own state.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.tracking import (TrackParams, TrackRecords, TrackState,
                                  init_track_state, run_tracking)


def segmented_initial_state(cfg: ReceiverConfig, code_delays: np.ndarray,
                            fine_freqs: np.ndarray, n_segments: int,
                            seg_ms: int, halo_ms: int) -> TrackState:
    """(N·D,)-channel state: segment s of channel c starts at the
    predicted code-period boundary s·L − halo (0 for s=0)."""
    n = len(code_delays)
    base = init_track_state(cfg, code_delays, fine_freqs)
    S = cfg.signal.samples_per_ms
    fd = np.asarray(fine_freqs, np.float64) - cfg.signal.f_if
    samples_per_period = S / (1.0 + fd / cfg.signal.fc)  # code Doppler

    ptrs = np.empty(n * n_segments, np.int64)
    carr = np.empty(n * n_segments, np.float64)
    for s in range(n_segments):
        start_period = max(0, s * seg_ms - halo_ms) if s else 0
        off = np.round(start_period * samples_per_period).astype(np.int64)
        ptrs[s * n:(s + 1) * n] = np.asarray(base.ptr) + off
        carr[s * n:(s + 1) * n] = fine_freqs
    z = np.zeros(n * n_segments)
    return TrackState(
        ptr=jnp.asarray(ptrs),
        rem_chip=jnp.asarray(z),
        code_freq=jnp.full(n * n_segments, cfg.signal.code_freq_basis),
        carr_freq=jnp.asarray(carr),
        carr_freq_basis=jnp.asarray(carr),
        phase_fp=jnp.zeros(n * n_segments, jnp.int32),
        dll_nco=jnp.asarray(z), dll_last=jnp.asarray(z),
        pll_nco=jnp.asarray(z), pll_last=jnp.asarray(z))


def run_tracking_segmented(source: IFSampleSource, cfg: ReceiverConfig,
                           prns: Sequence[int], code_delays: np.ndarray,
                           fine_freqs: np.ndarray, params: TrackParams,
                           n_ms: int, n_segments: int = 8,
                           halo_ms: int = 400, chunk_ms: int = 1000
                           ) -> TrackRecords:
    """Track `n_ms` code periods with D-way time parallelism.

    Returns stitched (n_ms, N) records equivalent to a serial run (up to
    loop noise in the first ~halo of each segment's pull-in).
    """
    if params.pdi_ms != 1:
        raise ValueError("segmented tracking supports pdi=1 (bit stage)")
    n = len(prns)
    seg_ms = -(-n_ms // n_segments)            # ceil
    if halo_ms >= seg_ms:
        raise ValueError(f"halo ({halo_ms} ms) must be < segment length "
                         f"({seg_ms} ms); use fewer segments")
    state = segmented_initial_state(cfg, code_delays, fine_freqs,
                                    n_segments, seg_ms, halo_ms)
    prns_rep = [p for _ in range(n_segments) for p in prns]
    rec, _ = run_tracking(source, cfg, prns_rep, state, params,
                          seg_ms + halo_ms, chunk_ms=chunk_ms,
                          per_channel_io=True)
    return stitch_segments(rec, n, n_segments, seg_ms, halo_ms, n_ms,
                           params)


def stitch_segments(rec: TrackRecords, n: int, n_segments: int,
                    seg_ms: int, halo_ms: int, n_ms: int,
                    params: TrackParams) -> TrackRecords:
    """Overlap-save stitch of a (seg_ms+halo, N·D) segmented record into
    the serial-equivalent (n_ms, N) record — shared by the single-host
    driver above and the multi-process path (parallel/distributed.py,
    where each host tracked only its own segments and the full record
    was assembled by a cross-process all-gather)."""
    # The Costas PLL has an inherent 180° ambiguity: each segment pulls in
    # with an arbitrary polarity.  Align polarities through the halo
    # overlap — segment s's pre-stitch halo rows cover the same absolute
    # code periods as the tail of segment s−1's kept rows.
    k_cmp = min(50, halo_ms - 1)
    flip = np.ones((n_segments, n), dtype=np.float32)
    p_i_all = rec.corr[:, :, params.i_prompt, 0]   # (seg+halo, N·D)
    for s in range(1, n_segments):
        prev = p_i_all[:, (s - 1) * n: s * n]
        cur = p_i_all[:, s * n: (s + 1) * n]
        lo_prev = 0 if s == 1 else halo_ms
        # absolute periods [s·seg−k, s·seg): prev rows, cur halo rows
        prev_rows = prev[lo_prev + seg_ms - k_cmp: lo_prev + seg_ms]
        cur_rows = cur[halo_ms - k_cmp: halo_ms]
        agree = np.median(np.sign(prev_rows) * np.sign(cur_rows), axis=0)
        flip[s] = flip[s - 1] * np.where(agree < 0, -1.0, 1.0)

    fields = {}
    for f in ("corr", "code_err", "carr_err", "code_freq", "carr_freq",
              "num_sample", "rem_chip", "rem_phase", "absolute_sample"):
        a = getattr(rec, f)                    # (seg_ms+halo, N·D, ...)
        parts = []
        for s in range(n_segments):
            cols = a[:, s * n:(s + 1) * n]
            lo = 0 if s == 0 else halo_ms
            cols = cols[lo:lo + seg_ms]
            if f == "corr":
                cols = cols * flip[s][None, :, None, None]
            parts.append(cols)
        fields[f] = np.concatenate(parts)[:n_ms]
    return TrackRecords(**fields, i_early=params.i_early,
                        i_prompt=params.i_prompt, i_late=params.i_late)
