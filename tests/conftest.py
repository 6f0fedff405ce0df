"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on XLA's
host platform with 8 virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound per-process compile-cache growth.

    A full single-process suite accumulates hundreds of XLA:CPU executables
    and reliably segfaults inside backend_compile_and_load around the
    ~110th test; dropping caches between modules keeps the LLVM JIT state
    bounded (tests within a module still share compilations).
    """
    yield
    jax.clear_caches()
