"""Host-compute placement.

The positioning epoch loops are HOST-side f64 math (Kepler, Klobuchar,
4×4 WLS solves, coordinate transforms) running between device scans.  On
the hosted TPU backend they must not follow the default device: the
backend implements no f64 LU decomposition (the WLS `linalg.solve`
fails to compile), f64 is software-emulated, and every eager dispatch
crosses the tunnel at ~1 s round trip.  `host_epoch_device()` pins this
math to the local CPU backend; on a CPU-default process it is a no-op.
"""

from __future__ import annotations

import contextlib
import functools


def host_epoch_device():
    """Context manager placing uncommitted computations on the CPU."""
    import jax

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])


def on_host_cpu(fn):
    """Decorator: run `fn` under host_epoch_device()."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with host_epoch_device():
            return fn(*args, **kwargs)

    return wrapped
