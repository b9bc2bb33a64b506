"""Persistent XLA compilation cache setup.

The segmentation pipelines compile large programs (nested while_loops over
gossip sweeps); first compiles run minutes. A persistent on-disk cache makes
every subsequent process start instant for known shapes.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gseg_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("GSEG_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: cache flags differ; harmless to skip
