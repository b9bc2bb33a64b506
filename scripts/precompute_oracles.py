"""Precompute the sweep/parity oracle partitions on the CPU (no TPU needed).

The knob sweep (scripts/sweep_knobs.py) oracle-gates every timed config;
the sequential-oracle labels at bench shapes take tens of minutes on the
1-core host, so computing them DURING the on-tunnel window wastes chip
time. Run this any time (e.g. during a tunnel outage); results are cached
as bench_out/oracle_bench_{h}x{w}_wb{wb}.npy and picked up by the sweep.

Run with the axon plugin stripped if the tunnel is down:
    PYTHONPATH= python scripts/precompute_oracles.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.boruvka_cpu import segment_boruvka_np
from gseg_tpu.utils.labels import canonical_min_labels_np
from gseg_tpu.utils.synthetic import blobs_image

# (h, w, weight_buckets) — must mirror sweep_knobs.py's image recipe.
JOBS = [
    (2160, 3840, 0),   # 4K speed-mode sweep oracle
    (1080, 1920, 16),  # wb16 1080p A/B sweep oracle
    (1080, 1920, 0),   # usually already cached from round 3
]


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_out")
    os.makedirs(out_dir, exist_ok=True)
    for h, w, wb in JOBS:
        path = os.path.join(out_dir, f"oracle_bench_{h}x{w}_wb{wb}.npy")
        if os.path.exists(path):
            print(f"skip {path} (exists)", flush=True)
            continue
        t0 = time.time()
        img = blobs_image(h, w, num_blobs=max(8, (h * w) // 65536),
                          noise=8.0, seed=0)
        cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100,
                                 max_iters=32, weight_buckets=wb)
        np.save(path, canonical_min_labels_np(segment_boruvka_np(img, cfg)))
        print(f"{path} done in {time.time() - t0:.0f}s", flush=True)
    print("ALL ORACLES DONE", flush=True)


if __name__ == "__main__":
    main()
