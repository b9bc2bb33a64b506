"""Flagship benchmark: atomic-path segmentation throughput at 4K on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's (Report.pdf p.4 §4.1): repeated timed runs
on the same input, disk I/O excluded (the input lives on device before
timing; block_until_ready bounds each rep). Baseline: the reference's atomic
CUDA path at 3840x2160 on a GTX 1080 Ti — 182 ms TOTAL (filter + graph +
segmentation, decoded Fig. 2a, BASELINE.md) = 45.6 MPix/s. Our timed region
covers the same stages (Gaussian + edge weights + full Boruvka loop +
min-size), everything on device.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gseg_tpu.config import SegmentationConfig
    from gseg_tpu.models.atomic_boruvka import segment_atomic
    from gseg_tpu.utils.synthetic import blobs_image

    h, w = 2160, 3840
    cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100, max_iters=32)
    img = jnp.asarray(blobs_image(h, w, num_blobs=64, noise=8.0, seed=0))
    img = jax.device_put(img)

    # Warmup / compile.
    labels = segment_atomic(img, cfg)
    labels.block_until_ready()

    reps = 10
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        segment_atomic(img, cfg).block_until_ready()
        times.append(time.perf_counter() - t0)
    mean_s = float(np.mean(times))

    mpix = (h * w) / 1e6
    mpix_per_s = mpix / mean_s
    baseline_mpix_per_s = mpix / 0.182  # reference atomic total @4K: 182 ms
    print(json.dumps({
        "metric": "4k_atomic_total_throughput",
        "value": round(mpix_per_s, 2),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_per_s / baseline_mpix_per_s, 3),
    }))


if __name__ == "__main__":
    main()
