"""Persistent XLA compilation cache setup.

The segmentation pipelines compile large programs (nested while_loops over
gossip sweeps); first compiles run minutes. A persistent on-disk cache makes
every subsequent process start instant for known shapes.

CPU caveat (round-4 incident): XLA:CPU cache entries are AOT machine code
compiled for the HOST's exact CPU features. This box's host can change
across reboots (2026-08-19: post-reboot host lacked avx512-era features the
pre-reboot host had; loading the stale entries SEGFAULTED the test suite in
backend_compile_and_load, after cpu_aot_loader feature-mismatch warnings).
TPU entries are device-side and host-independent. So: CPU processes get a
cache subdirectory keyed by a fingerprint of the host CPU flags; TPU
processes share the flat directory. A host change then means a cold CPU
cache, never a crash.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gseg_tpu_xla")


def _cpu_backend_requested() -> bool:
    """True when this process is pinned to the CPU backend (tests/offline
    probes set JAX_PLATFORMS/JAX_PLATFORM_NAME before import; tests also
    call enable_persistent_cache(cpu=True) explicitly)."""
    return (os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
            or os.environ.get("JAX_PLATFORM_NAME", "").strip().lower()
            == "cpu")


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None,
                            cpu: bool | None = None) -> None:
    import jax

    path = path or os.environ.get("GSEG_XLA_CACHE", _DEFAULT_DIR)
    if cpu is None:
        cpu = _cpu_backend_requested()
    if cpu:
        path = os.path.join(path, f"cpu-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: cache flags differ; harmless to skip
