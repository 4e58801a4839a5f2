"""Tracking-loop filters and discriminators.

Second-order loop filter in the SoftGNSS form used by the reference
(`calcLoopCoef.m:41-45`, update recurrences in `trackingCT.m:137-150` and
`trackingCT_POS_updated.m:252-270`).  All functions are scalar-jittable and
batch over channels via broadcasting — channel state is carried as arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def loop_coefficients(bw_hz: float, zeta: float, gain: float):
    """(tau1, tau2) for a 2nd-order loop (calcLoopCoef.m:41-45)."""
    wn = bw_hz * 8.0 * zeta / (4.0 * zeta * zeta + 1.0)
    tau1 = gain / (wn * wn)
    tau2 = 2.0 * zeta / wn
    return tau1, tau2


class LoopFilterState(NamedTuple):
    """Carry of one 2nd-order loop filter (per channel)."""
    nco: jnp.ndarray         # accumulated NCO command
    last_error: jnp.ndarray  # previous discriminator output


def loop_filter_step(state: LoopFilterState, error, tau1, tau2, dt):
    """One proportional+integral update.

    nco' = nco + (tau2/tau1)·(e − e_prev) + e·dt/tau1
    (trackingCT.m:140, trackingCT_POS_updated.m:257-258)
    """
    nco = state.nco + (tau2 / tau1) * (error - state.last_error) + error * (dt / tau1)
    return LoopFilterState(nco=nco, last_error=error), nco


def dll_discriminator(e_i, e_q, l_i, l_q):
    """Normalized non-coherent early-minus-late envelope.

    0.5·(E−L)/(E+L) (trackingCT.m:137-139).  Safe at E+L→0.
    """
    e = jnp.sqrt(e_i * e_i + e_q * e_q)
    l = jnp.sqrt(l_i * l_i + l_q * l_q)
    return 0.5 * (e - l) / jnp.maximum(e + l, 1e-30)


def pll_discriminator(p_i, p_q):
    """Costas arctangent discriminator, cycles: atan(Q/I)/2π (trackingCT.m:146)."""
    safe_i = jnp.where(p_i == 0, 1e-30, p_i)
    return jnp.arctan(p_q / safe_i) / (2.0 * jnp.pi)


def cn0_moment_estimator(zk, t_coh_s, signed: bool = False):
    """Moment-method C/N0 from a window of prompt powers Zk = P_i²+P_q².

    CN0 = |10·log10( (1/T)·NA²/(2·varIQ) )| with NA² = sqrt(E[Z]²−Var[Z]),
    varIQ = (E[Z]−NA²)/2, over a K=20 window (trackingCT.m:120-134).
    `zk` has window on the last axis.

    `signed=True` skips the reference's abs() quirk: on pure noise the
    ratio collapses toward 0, so |10·log10| would report a spuriously
    HUGE C/N0 — the validity gates must see the (hugely negative)
    signed value instead.
    """
    mean_zk = jnp.mean(zk, axis=-1)
    var_zk = jnp.var(zk, axis=-1, ddof=1)
    na2 = jnp.sqrt(jnp.maximum(mean_zk * mean_zk - var_zk, 1e-30))
    var_iq = 0.5 * (mean_zk - na2)
    ratio = na2 / jnp.maximum(2.0 * var_iq, 1e-30)
    cn0 = 10.0 * jnp.log10(jnp.maximum(ratio / t_coh_s, 1e-30))
    return cn0 if signed else jnp.abs(cn0)
