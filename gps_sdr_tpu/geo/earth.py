"""Earth-rotation (Sagnac) correction — equivalent of geo/erotcorr.m."""

from __future__ import annotations

import jax
import jax.numpy as jnp

OMEGA_E = 7.2921151467e-5
C_LIGHT = 299_792_458.0


@jax.jit
def earth_rotation_correction(sv_xyz, pseudorange_m):
    """Rotate SV ECEF position by ωe·pr/c about z (erotcorr.m:28-35).

    Batched: sv_xyz (…,3), pseudorange_m (…).
    """
    sv_xyz = jnp.asarray(sv_xyz, dtype=jnp.float64)
    theta = OMEGA_E * jnp.asarray(pseudorange_m, dtype=jnp.float64) / C_LIGHT
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y, z = sv_xyz[..., 0], sv_xyz[..., 1], sv_xyz[..., 2]
    return jnp.stack([c * x + s * y, -s * x + c * y, z], axis=-1)
