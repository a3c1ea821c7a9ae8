"""Root conftest: force JAX onto a virtual 8-device CPU mesh for tests.

The container boot registers an axon/TPU PJRT plugin that overrides
JAX_PLATFORMS, so the env var alone is not enough — we must set the jax
config explicitly before any backend initialization. Real-TPU benchmarking
happens only through bench.py, which does not import this.
"""
import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
