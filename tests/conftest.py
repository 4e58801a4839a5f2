"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; sharding tests use
--xla_force_host_platform_device_count=8 as recommended for multi-chip
validation without chips.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosted-TPU (axon) plugin registers itself via sitecustomize and forces
# jax_platforms="axon,cpu" regardless of the environment; override it after
# import so tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-scale soak (minutes of CPU scan); "
                   "deselect with -m 'not slow'")
