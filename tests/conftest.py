"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU answer to "test multi-chip
without a pod": `--xla_force_host_platform_device_count=8`), with float64
enabled so synthesis/estimation ops can be pinned against SciPy goldens at
full precision.

The container's sitecustomize pre-imports jax and points it at the remote
axon TPU tunnel, so environment variables are too late — the override must go
through ``jax.config.update`` before any backend is initialized.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: with the whole suite
    in one process, XLA:CPU accumulates ~a hundred large compiled rollout
    programs and eventually segfaults inside backend_compile_and_load
    (reproducible at suite-position ~70, never solo). Dropping the jit cache
    at module boundaries keeps resident-executable count bounded; each
    module recompiles its own programs anyway."""
    yield
    jax.clear_caches()
