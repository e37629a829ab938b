"""Persistent XLA compile-cache setup.

The limb-sliced big-field graphs (EC adds inside MSM, butterfly stages) are
compile-heavy — minutes on the CPU backend — so every entry point routes
through here to share one on-disk cache across processes and rounds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "ZKEVM_TPU_JAX_CACHE", "/tmp/zkevm_tpu_jax_cache"
)

_done = False


def setup_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _done = True
