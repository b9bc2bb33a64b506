"""Test env: force the CPU backend with 8 virtual devices BEFORE jax import.

Mirrors the reference's single-machine validation (SURVEY.md §4.5): jax's
CPU backend is the "fake backend" — every jitted program (and the shard_map
multi-chip path, over the 8 virtual devices) runs in CI without TPU hardware.
"""

import os

# NOTE: in this environment the JAX_PLATFORMS env var is overridden by the
# TPU tunnel plugin; jax.config.update is authoritative (and the legacy
# JAX_PLATFORM_NAME also works). XLA_FLAGS must still be set pre-import.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.utils.synthetic import blobs_image


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Work around a deterministic XLA:CPU compiler segfault.

    The full suite crashed 4x in round 4 (+2 reproductions in round 5)
    inside `backend_compile_and_load` while compiling
    `segment_turbo_hierarchy`, always at the same test — but only with
    the WHOLE suite in one process: the same test passes in isolation
    (warm or cold persistent cache), tests/test_turbo.py alone passes,
    the tail modules (pallas+parallel+turbo) pass, and the full suite
    MINUS test_parallel passes (bench_out/pytest_r5*.log). The trigger
    is cumulative in-process compiler/executable state (the 8-virtual-
    device mesh executables of test_parallel plus everything else), not
    any single program. Raising the stack rlimit (256 MB) did not help,
    so it is not stack exhaustion. Dropping the accumulated executables
    between modules removes the trigger state; compile-time cost is
    minor because modules share few jitted programs.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def small_image():
    return blobs_image(24, 32, num_blobs=5, noise=6.0, seed=0)


@pytest.fixture(scope="session")
def small_cfg():
    return SegmentationConfig(sigma=0.8, k=100.0, min_size=8, max_iters=32)
