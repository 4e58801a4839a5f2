"""FFT parallel code-phase acquisition.

TPU-first re-design of the reference's `acquisition.m`: instead of the
triple python loop (32 PRN × 20 blocks × 41 Doppler bins of 58k-point
FFTs, acquisition.m:47-61), the whole search grid is one jitted program —

  X[b,f]   = FFT(block_b · carrier_f)                 (batched over F)
  P[p,f,:] += |IFFT(C[p] · conj(X[b,f]))|²            (batched over p,f)

with a `lax.scan` over the non-coherent blocks (constant memory in B) and
an inner scan over PRN chunks (bounds the (chunk,F,S) complex transient).
The (P,F,S) power grid stays on device; only the per-PRN peak statistics
come back to host.  `parallel/acquisition.py` shards the PRN axis over a
device mesh.

Fine Doppler uses the reference's long-FFT method (acquisition.m:102-121):
strip the code over `L` ms at the acquired delay, zero-pad ×20, take the
spectrum peak.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.ops.cacode import CODE_LENGTH, ca_code_table


@dataclasses.dataclass
class AcquisitionResult:
    """Equivalent of the reference's `Acquired` struct."""

    sv: np.ndarray                 # acquired PRNs (1-based)
    snr_db: np.ndarray
    doppler_hz: np.ndarray         # coarse Doppler (grid bin)
    code_delay: np.ndarray         # 0-based sample delay (acquisition.m:74)
    fine_freq_hz: np.ndarray       # absolute fine carrier freq (IF-relative
                                   # Doppler = fine_freq − IF)

    def channel_index(self, prn: int) -> int:
        return int(np.nonzero(self.sv == prn)[0][0])


def doppler_carriers(cfg: ReceiverConfig, n_samples: Optional[int] = None
                     ) -> np.ndarray:
    """(F, n) complex64 carrier grid exp(+i·2π(IF+fd)·k/fs), k=1..n
    (acquisition.m:41-44).  Phase accumulated in f64, wrapped, then cast."""
    sig, acq = cfg.signal, cfg.acq
    n = n_samples or sig.samples_per_ms
    k = np.arange(1, n + 1, dtype=np.float64)
    f = np.asarray(acq.doppler_bins_hz, dtype=np.float64) + sig.f_if
    cycles = np.mod(f[:, None] * k[None, :] / sig.fs, 1.0)
    return np.exp(2j * np.pi * cycles).astype(np.complex64)


def sampled_codes(cfg: ReceiverConfig, prns: Sequence[int]) -> np.ndarray:
    """(P, S) float32 code replicas at the sampling rate.

    scode[k] = code[ceil((k+1)·fchip/fs)] (acquisition.m:49-51).
    """
    sig = cfg.signal
    k = np.arange(1, sig.samples_per_ms + 1, dtype=np.float64)
    chip = (np.ceil(k * sig.code_freq_basis / sig.fs).astype(np.int64) - 1
            ) % CODE_LENGTH
    table = ca_code_table()
    return np.stack([table[p - 1][chip] for p in prns])


@functools.partial(jax.jit, static_argnames=("prn_chunk",))
def acquisition_power_grid(blocks: jnp.ndarray, carriers: jnp.ndarray,
                           code_fft: jnp.ndarray, prn_chunk: int = 8
                           ) -> jnp.ndarray:
    """Non-coherent power accumulation over the full search grid —
    circular-correlation formulation (exactly acquisition.m:53-61).

    blocks   (B, S) complex64 — B 1-ms sample blocks
    carriers (F, S) complex64 — Doppler carrier grid
    code_fft (P, S) complex64 — FFT of sampled code replicas
    returns  (P, F, S) float32 power, P padded to a multiple of prn_chunk
    """
    P, S = code_fft.shape
    F = carriers.shape[0]
    pad = (-P) % prn_chunk
    code_fft = jnp.pad(code_fft, ((0, pad), (0, 0)))
    codes = code_fft.reshape(-1, prn_chunk, S)

    def block_step(acc, x_ms):
        xc = jnp.conj(jnp.fft.fft(x_ms[None, :] * carriers, axis=-1))  # (F,S)

        def chunk_step(_, cf):
            y = jnp.fft.ifft(cf[:, None, :] * xc[None, :, :], axis=-1)
            return None, jnp.abs(y).astype(jnp.float32) ** 2

        _, pw = jax.lax.scan(chunk_step, None, codes)
        return acc + pw.reshape(P + pad, F, S), None

    acc0 = jnp.zeros((P + pad, F, S), jnp.float32)
    acc, _ = jax.lax.scan(block_step, acc0, blocks)
    return acc[:P]


def next_pow2(n: int) -> int:
    return 1 << (int(n - 1)).bit_length()


@functools.partial(jax.jit, static_argnames=("prn_chunk", "fft_len", "s_out"))
def acquisition_power_grid_pow2(blocks2: jnp.ndarray, carriers2: jnp.ndarray,
                                code_fft: jnp.ndarray, fft_len: int,
                                s_out: int, prn_chunk: int = 8
                                ) -> jnp.ndarray:
    """Power grid via *linear* correlation with power-of-two FFTs.

    TPU XLA only supports power-of-two FFT sizes, and zero-padding breaks
    circular correlation; instead each 1 ms block is extended with the
    following ms (overlap-save) and linearly correlated against the
    one-period code:  corr[j] = Σ_n code[n]·y[n+j],  j ∈ [0, S).

    blocks2   (B, 2S) complex64 — blocks extended into the next ms
    carriers2 (F, 2S) complex64
    code_fft  (P, fft_len)      — FFT of the S-sample code, zero-padded
    Returns (P, F, S) float32, re-indexed to the circular-path delay
    convention (power[..., k] ↔ code epoch at sample S−k).
    """
    P = code_fft.shape[0]
    F = carriers2.shape[0]
    pad = (-P) % prn_chunk
    code_fft = jnp.pad(code_fft, ((0, pad), (0, 0)))
    codes = code_fft.reshape(-1, prn_chunk, fft_len)

    def block_step(acc, x2):
        y = jnp.pad(x2[None, :] * carriers2, ((0, 0), (0, fft_len - x2.shape[0])))
        yf = jnp.fft.fft(y, axis=-1)                          # (F, N)

        def chunk_step(_, cf):
            corr = jnp.fft.ifft(yf[None, :, :] * jnp.conj(cf)[:, None, :],
                                axis=-1)[..., :s_out]
            return None, jnp.abs(corr).astype(jnp.float32) ** 2

        _, pw = jax.lax.scan(chunk_step, None, codes)
        return acc + pw.reshape(P + pad, F, s_out), None

    acc0 = jnp.zeros((P + pad, F, s_out), jnp.float32)
    acc, _ = jax.lax.scan(block_step, acc0, blocks2)
    # linear-path index j = epoch position p; circular convention wants
    # power[k] with epoch at S−k  →  k = (S − j) mod S
    acc = acc[:P]
    k = (s_out - jnp.arange(s_out)) % s_out
    return acc[..., k]


@functools.partial(jax.jit, static_argnames=("prn_chunk", "fft_len", "s_out"))
def acquisition_power_grid_real(blocks2: jnp.ndarray, carriers2: jnp.ndarray,
                                code_fft: jnp.ndarray, fft_len: int,
                                s_out: int, prn_chunk: int = 8
                                ) -> jnp.ndarray:
    """The pow2 linear-correlation grid on float32 I/Q pairs only.

    The hosted TPU backend implements no complex-typed ops; here every
    complex quantity is an explicit [re, im] pair and the FFTs are the
    four-step matmul DFT (ops/realfft.py) — the whole search grid becomes
    MXU work.

    blocks2   (B, 2S, 2) float32 — blocks extended into the next ms
    carriers2 (F, 2S, 2) float32
    code_fft  (P, fft_len, 2)    — DFT of the S-sample code, zero-padded
    Returns (P, F, S) float32, same delay convention as the other grids.
    """
    from gps_sdr_tpu.ops.realfft import fft_real, ifft_real

    P = code_fft.shape[0]
    F = carriers2.shape[0]
    two_s = blocks2.shape[1]
    pad = (-P) % prn_chunk
    code_fft = jnp.pad(code_fft, ((0, pad), (0, 0), (0, 0)))
    codes = code_fft.reshape(-1, prn_chunk, fft_len, 2)

    cr, ci = carriers2[..., 0], carriers2[..., 1]

    def block_step(acc, x2):
        xr, xi = x2[None, :, 0], x2[None, :, 1]
        yr = jnp.pad(xr * cr - xi * ci, ((0, 0), (0, fft_len - two_s)))
        yi = jnp.pad(xr * ci + xi * cr, ((0, 0), (0, fft_len - two_s)))
        yfr, yfi = fft_real(yr, yi)                        # (F, N)

        def chunk_step(_, cf):
            cfr, cfi = cf[:, None, :, 0], cf[:, None, :, 1]
            # y · conj(code)
            pr = yfr[None] * cfr + yfi[None] * cfi
            pi = yfi[None] * cfr - yfr[None] * cfi
            zr, zi = ifft_real(pr.reshape(-1, fft_len),
                               pi.reshape(-1, fft_len))
            zr = zr[:, :s_out].reshape(prn_chunk, F, s_out)
            zi = zi[:, :s_out].reshape(prn_chunk, F, s_out)
            return None, zr * zr + zi * zi

        _, pw = jax.lax.scan(chunk_step, None, codes)
        return acc + pw.reshape(P + pad, F, s_out), None

    acc0 = jnp.zeros((P + pad, F, s_out), jnp.float32)
    acc, _ = jax.lax.scan(block_step, acc0, blocks2)
    acc = acc[:P]
    k = (s_out - jnp.arange(s_out)) % s_out
    return acc[..., k]


@functools.partial(jax.jit, static_argnames=("chip_w",))
def _peak_statistics_device(power: jnp.ndarray, chip_w: int):
    """Device-side per-PRN peak pick + SNR — only (P,)-shaped statistics
    leave the device (the full grid can be hundreds of MB).

    SNR per acquisition.m:62-68: peak² over the mean squared off-peak
    power of the best frequency row, excluding ±1 chip around the peak.
    """
    P, F, S = power.shape
    flat = power.reshape(P, F * S)
    arg = jnp.argmax(flat, axis=1)
    fbin = arg // S
    delay = arg % S
    peak = jnp.take_along_axis(flat, arg[:, None], axis=1)[:, 0]
    row = power[jnp.arange(P), fbin]                     # (P, S)
    idx = jnp.arange(S)[None, :]
    keep = (idx <= delay[:, None] - chip_w) | (idx >= delay[:, None] + chip_w)
    mean_off = (jnp.sum(jnp.where(keep, row, 0.0) ** 2, axis=1)
                / jnp.sum(keep, axis=1))
    snr = 10.0 * jnp.log10(peak ** 2 / mean_off)
    return snr, fbin, delay


def peak_statistics(power_pf_s, cfg: ReceiverConfig):
    """Per-PRN (snr_db, best_freq_idx, code_delay) from the power grid."""
    chip_w = int(np.ceil(cfg.signal.fs / cfg.signal.code_freq_basis))
    snr, fbin, delay = _peak_statistics_device(jnp.asarray(power_pf_s),
                                               chip_w)
    return np.asarray(snr), np.asarray(fbin), np.asarray(delay)


@functools.partial(jax.jit, static_argnames=("fft_len",))
def _fine_peak_device(seg_pairs: jnp.ndarray, fft_len: int) -> jnp.ndarray:
    """argmax of the zero-padded power spectrum, computed on device with
    the four-step matmul DFT (ops/realfft.py) — the 2²⁴-point host FFT
    was ~1.7 s per SV; on the MXU it is milliseconds."""
    from gps_sdr_tpu.ops.realfft import fft_real_graphplan

    n = seg_pairs.shape[0]
    xr = jnp.pad(seg_pairs[:, 0], (0, fft_len - n))[None, :]
    xi = jnp.pad(seg_pairs[:, 1], (0, fft_len - n))[None, :]
    yr, yi = fft_real_graphplan(xr, xi)
    return jnp.argmax(yr[0] * yr[0] + yi[0] * yi[0])


@functools.partial(jax.jit, static_argnames=("fft_len",))
def _fine_peaks_device(seg_pairs: jnp.ndarray, fft_len: int) -> jnp.ndarray:
    """(N, n, 2) → (N,) spectrum-peak indices in ONE device call:
    `lax.map` over the SV batch keeps the 2²⁴-point DFT intermediates
    single-SV sized while the host↔device round trip (dominant under a
    tunneled TPU: ~1 s per dispatch) is paid once for the whole batch —
    the 8-SV Opensky fine stage drops from ~9.5 s to ~one dispatch."""
    from gps_sdr_tpu.ops.realfft import fft_real_graphplan

    n = seg_pairs.shape[1]

    def one(pairs):
        xr = jnp.pad(pairs[:, 0], (0, fft_len - n))[None, :]
        xi = jnp.pad(pairs[:, 1], (0, fft_len - n))[None, :]
        yr, yi = fft_real_graphplan(xr, xi)
        return jnp.argmax(yr[0] * yr[0] + yi[0] * yi[0])

    return jax.lax.map(one, seg_pairs)


def _fine_segment(long_signal: np.ndarray, prn: int, code_delay: int,
                  cfg: ReceiverConfig) -> np.ndarray:
    """Code-stripped fine-Doppler segment (acquisition.m:104-106)."""
    sig, acq = cfg.signal, cfg.acq
    S = sig.samples_per_ms
    n = acq.fine_fft_ms * S
    k = np.arange(1, n + 1, dtype=np.float64)
    # ceil-based resampling like the rest of the receiver; the reference's
    # floor((k·fchip)/fs)+1 (acquisition.m:104-105) agrees except when
    # fs/fchip is an exact integer ratio, where floor lands on chip
    # boundaries and misaligns the replica by one sample per chip.
    chip = (np.ceil(k * sig.code_freq_basis / sig.fs).astype(np.int64) - 1
            ) % CODE_LENGTH
    code = ca_code_table()[prn - 1][chip]
    # 0-based sample of the first code epoch after the first ms
    # (acquisition.m:106; validated against synthetic truth — the epoch
    # lands at S − codedelay in this pipeline's 0-based convention)
    start = S - int(code_delay)
    return np.asarray(long_signal[start:start + n],
                      dtype=np.complex64) * code


def _fine_freq_from_index(raw_idx: int, fftlen: int,
                          cfg: ReceiverConfig) -> float:
    """Spectrum-peak index → carrier frequency, with the reference's
    fftshift + sign-flip convention for IQ front ends
    (acquisition.m:109-119)."""
    fs = cfg.signal.fs
    if cfg.file.data_type == 2:
        idx = (raw_idx + fftlen // 2) % fftlen + 1  # fftshift map
        return float(-idx * (fs / fftlen) + fs / 2.0)
    return float((raw_idx + 1) * (fs / fftlen))


def fine_doppler(long_signal: np.ndarray, prn: int, code_delay: int,
                 cfg: ReceiverConfig, fft_mode: str = "auto") -> float:
    """Fine carrier frequency via the ×20 zero-padded long FFT
    (acquisition.m:102-121).  Resolution fs/(L·S·20) ≈ 5 Hz at 58 MHz.
    On TPU the FFT length rounds up to a power of two (spectrum zero
    padding — unlike the search grid, this is exact) and the spectrum
    peak is found on device via the matmul DFT."""
    sig, acq = cfg.signal, cfg.acq
    seg = _fine_segment(long_signal, prn, code_delay, cfg)
    fftlen = seg.shape[0] * acq.n_noncoherent_ms
    if _use_pow2(fft_mode):
        fftlen = next_pow2(fftlen)
        if jax.default_backend() == "tpu":
            pairs = jnp.asarray(np.stack([seg.real, seg.imag], -1
                                         ).astype(np.float32))
            return _fine_freq_from_index(int(_fine_peak_device(
                pairs, fftlen)), fftlen, cfg)
    # host FFT: a once-per-SV spectrum; keeps complex math off the device
    spec = np.abs(np.fft.fft(seg, fftlen))
    if cfg.file.data_type == 2:
        spec = np.fft.fftshift(spec)
        idx = int(np.argmax(spec)) + 1
        return float(-idx * (sig.fs / fftlen) + sig.fs / 2.0)
    idx = int(np.argmax(spec)) + 1
    return float(idx * (sig.fs / fftlen))


def fine_doppler_batch(long_signal: np.ndarray, prns, code_delays,
                       cfg: ReceiverConfig,
                       fft_mode: str = "auto") -> np.ndarray:
    """Fine Doppler for a batch of acquired SVs.

    On the TPU pow2 path all SVs go through ONE device dispatch
    (`_fine_peaks_device`): under a tunneled TPU each dispatch costs
    ~a second of round-trip latency, which dominated the per-SV loop
    (8 SVs ≈ 9.5 s → ≈ 1 dispatch + host replica prep).  Elsewhere it
    falls back to the per-SV `fine_doppler` (identical results — same
    segments, same peak map)."""
    prns = [int(p) for p in prns]
    delays = [int(d) for d in code_delays]
    if _use_pow2(fft_mode) and jax.default_backend() == "tpu" and prns:
        acq = cfg.acq
        segs = [_fine_segment(long_signal, p, d, cfg)
                for p, d in zip(prns, delays)]
        fftlen = next_pow2(segs[0].shape[0] * acq.n_noncoherent_ms)
        pairs = jnp.asarray(np.stack(
            [np.stack([s.real, s.imag], -1) for s in segs]
        ).astype(np.float32))
        idxs = np.asarray(_fine_peaks_device(pairs, fftlen))
        return np.array([_fine_freq_from_index(int(i), fftlen, cfg)
                         for i in idxs])
    return np.array([fine_doppler(long_signal, p, d, cfg, fft_mode)
                     for p, d in zip(prns, delays)])


def _use_pow2(fft_mode: str) -> bool:
    if fft_mode == "auto":
        return jax.default_backend() == "tpu"
    return fft_mode == "pow2"


def run_acquisition(source: IFSampleSource, cfg: ReceiverConfig,
                    prns: Optional[Sequence[int]] = None,
                    power_fn=None, fft_mode: str = "auto"
                    ) -> AcquisitionResult:
    """Full acquisition stage on one capture (acquisition.m end to end).

    `power_fn` overrides the grid computation (e.g. the mesh-sharded
    versions from parallel/acquisition.py) and composes with the branch
    selected by `fft_mode`: on the pow2 path it is called as
    power_fn(blocks2, carriers2, code_fft, fft_len, s_out) with the
    real-pair arrays of `acquisition_power_grid_real`; on the circular
    path as power_fn(blocks, carriers, code_fft) with complex arrays.
    `fft_mode` selects the circular (reference-exact) or power-of-two
    linear-correlation grid ("auto": pow2 on TPU, where XLA only
    supports 2^k FFT sizes).
    """
    prns = list(prns if prns is not None else cfg.acq.prn_list)
    sig, acq = cfg.signal, cfg.acq
    S = sig.samples_per_ms
    start = cfg.file.skip_ms * S

    if _use_pow2(fft_mode):
        raw = source.read_complex(start, (acq.n_noncoherent_ms + 1) * S)
        idx = (np.arange(acq.n_noncoherent_ms)[:, None] * S
               + np.arange(2 * S)[None, :])
        blocks2 = raw[idx]
        carriers2 = doppler_carriers(cfg, 2 * S)
        fft_len = next_pow2(2 * S)
        code_fft = np.fft.fft(sampled_codes(cfg, prns),
                              n=fft_len).astype(np.complex64)
        # real-pair formulation (no complex device buffers)
        fn = power_fn if power_fn is not None else acquisition_power_grid_real
        power = fn(
            jnp.asarray(np.stack([blocks2.real, blocks2.imag], -1
                                 ).astype(np.float32)),
            jnp.asarray(np.stack([carriers2.real, carriers2.imag], -1
                                 ).astype(np.float32)),
            jnp.asarray(np.stack([code_fft.real, code_fft.imag], -1
                                 ).astype(np.float32)),
            fft_len, S)
    else:
        raw = source.read_complex(start, acq.n_noncoherent_ms * S)
        blocks = raw.reshape(acq.n_noncoherent_ms, S)
        carriers = doppler_carriers(cfg)
        code_fft = np.fft.fft(sampled_codes(cfg, prns)).astype(np.complex64)
        fn = power_fn if power_fn is not None else acquisition_power_grid
        power = fn(jnp.asarray(blocks), jnp.asarray(carriers),
                   jnp.asarray(code_fft))
    snr, fbin, delay = peak_statistics(power, cfg)

    keep = snr >= acq.snr_threshold_db
    sv = np.asarray(prns)[keep]
    doppler = acq.freq_min + acq.freq_step * fbin[keep]
    code_delay = delay[keep]

    long_raw = source.read_complex(start, (acq.fine_fft_ms + 1) * S)
    fine = fine_doppler_batch(long_raw, sv, code_delay, cfg, fft_mode)
    return AcquisitionResult(sv=sv, snr_db=snr[keep], doppler_hz=doppler,
                             code_delay=code_delay, fine_freq_hz=fine)
