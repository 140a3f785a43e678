"""Test env: force a virtual 8-device CPU platform BEFORE any jax use.

SURVEY.md §4: the reference has no multi-device tests; we add CPU-runnable
multi-chip tests via ``--xla_force_host_platform_device_count`` (fake
8-device mesh on one host).

Note: the session environment pins ``JAX_PLATFORMS=axon`` (one real TPU chip
behind a tunnel) and the axon plugin re-asserts it at import time, so the
env var alone is not enough — ``jax.config.update`` must be used.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
