"""Persistent XLA compilation cache.

The framework's big programs (the full train_step with three DenseNet-121
trunks differentiating through style-switch branches; the 8-virtual-device
sharded step) cost minutes of XLA compile time. The persistent cache
writes compiled executables to disk so every process after the first —
reruns of bench.py, the driver's dryrun, repeated CLI experiments — skips
straight to execution.

Call `enable_persistent_cache()` before the first jit compilation. The
cache lives under the repo (or JAX_CACHE_DIR if set) and is safe to
delete at any time.
"""

from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str | None = None) -> str:
    if path is None:
        path = os.environ.get(
            "JAX_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".cache",
                "jax"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, not just slow-to-compile entries.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
