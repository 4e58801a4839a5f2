"""Complex FFT on real-only hardware paths — four-step factorized DFT.

The hosted TPU backend executes no complex-typed ops at all (every
complex64 buffer fails at runtime), and TPU FFTs are best expressed as
MXU matmuls anyway.  This module implements the classic four-step
Cooley-Tukey factorization N = N1·N2 entirely on float32 pairs:

    A[n1, n2]   = x[N2·n1 + n2]
    B[k1, n2]   = Σ_{n1} A[n1, n2]·W_{N1}^{n1·k1}      (matmul, MXU)
    C[k1, n2]   = B[k1, n2]·W_{N}^{n2·k1}              (elementwise twiddle)
    D[k1, k2]   = Σ_{n2} C[k1, n2]·W_{N2}^{n2·k2}      (matmul, MXU)
    X[k1+N1·k2] = D[k1, k2]

Complex products expand to 4 real matmuls with f32 accumulation.
Cost is N·(N1+N2) MACs per transform — more FLOPs than log-N FFT, but
they run on the systolic array; for the acquisition sizes (2^17) this is
the fast path on TPU.  Verified bit-close against numpy (tests).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _split_factor(n: int) -> Tuple[int, int]:
    """Balanced power-of-two factorization n = n1·n2."""
    if n & (n - 1):
        raise ValueError(f"four-step FFT requires power-of-two n, got {n}")
    p = n.bit_length() - 1
    n1 = 1 << (p // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=8)
def _plan(n: int):
    """Precompute DFT matrices and twiddles as float32 cos/sin pairs."""
    n1, n2 = _split_factor(n)
    k1 = np.arange(n1)
    w1 = -2.0 * np.pi * np.outer(k1, np.arange(n1)) / n1
    k2 = np.arange(n2)
    w2 = -2.0 * np.pi * np.outer(np.arange(n2), k2) / n2
    tw = -2.0 * np.pi * np.outer(k1, np.arange(n2)) / n
    return (n1, n2,
            np.cos(w1).astype(np.float32), np.sin(w1).astype(np.float32),
            np.cos(w2).astype(np.float32), np.sin(w2).astype(np.float32),
            np.cos(tw).astype(np.float32), np.sin(tw).astype(np.float32))


def _cmatmul_left(mc, ms, ar, ai):
    """(mc + i·ms) @ (ar + i·ai) over the n1 axis: (n1,n1)×(b,n1,n2)."""
    f = lambda m, a: jnp.einsum("ij,bjk->bik", m, a,
                                preferred_element_type=jnp.float32)
    return f(mc, ar) - f(ms, ai), f(mc, ai) + f(ms, ar)


def _cmatmul_right(ar, ai, mc, ms):
    """(ar + i·ai) @ (mc + i·ms) over the n2 axis: (b,n1,n2)×(n2,n2)."""
    f = lambda a, m: jnp.einsum("bij,jk->bik", a, m,
                                preferred_element_type=jnp.float32)
    return f(ar, mc) - f(ai, ms), f(ar, ms) + f(ai, mc)


def _plan_graph(n: int):
    """The _plan matrices built IN-GRAPH from iota (for large n the
    host-precomputed constants would be baked into the HLO — a 2²⁴
    plan is ~400 MB of payload; on-device they cost a few ms of VPU
    transcendentals).  Angles are int32 mod-reduced before the float
    cast, so they are as exact as the host path."""
    import jax

    n1, n2 = _split_factor(n)

    def mats(rows, cols, mod, denom):
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        ang = ((i * j) % jnp.int32(mod)).astype(jnp.float32) \
            * np.float32(-2.0 * np.pi / denom)
        return jnp.cos(ang), jnp.sin(ang)

    c1, s1 = mats(n1, n1, n1, n1)
    c2, s2 = mats(n2, n2, n2, n2)
    ct, st = mats(n1, n2, n, n)
    return n1, n2, c1, s1, c2, s2, ct, st


def fft_real_graphplan(xr: jnp.ndarray, xi: jnp.ndarray):
    """fft_real with the DFT/twiddle matrices generated in-graph —
    use for large transforms (the fine-Doppler 2²⁴-point spectrum)."""
    n = xr.shape[-1]
    n1, n2, c1, s1, c2, s2, ct, st = _plan_graph(n)
    batch = xr.shape[:-1]
    ar = xr.reshape((-1, n1, n2))
    ai = xi.reshape((-1, n1, n2))
    br, bi = _cmatmul_left(c1, s1, ar, ai)
    cr = br * ct - bi * st
    ci = br * st + bi * ct
    dr, di = _cmatmul_right(cr, ci, c2, s2)
    return (jnp.swapaxes(dr, -1, -2).reshape(batch + (n,)),
            jnp.swapaxes(di, -1, -2).reshape(batch + (n,)))


def fft_real(xr: jnp.ndarray, xi: jnp.ndarray):
    """Forward DFT of (batch, N) float32 pairs → (Xr, Xi), numpy fft
    convention."""
    n = xr.shape[-1]
    n1, n2, c1, s1, c2, s2, ct, st = _plan(n)
    batch = xr.shape[:-1]
    ar = xr.reshape((-1, n1, n2))
    ai = xi.reshape((-1, n1, n2))
    # step 1: DFT over n1 (left-multiply by W_{N1})
    br, bi = _cmatmul_left(jnp.asarray(c1), jnp.asarray(s1), ar, ai)
    # step 2: twiddle
    ctj, stj = jnp.asarray(ct), jnp.asarray(st)
    cr = br * ctj - bi * stj
    ci = br * stj + bi * ctj
    # step 3: DFT over n2 (right-multiply by W_{N2})
    dr, di = _cmatmul_right(cr, ci, jnp.asarray(c2), jnp.asarray(s2))
    # step 4: index transpose k = k1 + N1·k2
    xr_out = jnp.swapaxes(dr, -1, -2).reshape(batch + (n,))
    xi_out = jnp.swapaxes(di, -1, -2).reshape(batch + (n,))
    return xr_out, xi_out


def ifft_real(xr: jnp.ndarray, xi: jnp.ndarray):
    """Inverse DFT via conj(fft(conj(x)))/N."""
    n = xr.shape[-1]
    yr, yi = fft_real(xr, -xi)
    return yr / n, -yi / n
