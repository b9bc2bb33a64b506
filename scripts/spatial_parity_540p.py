"""Bench-scale multi-chip parity: 540p turbo_spatial vs dense, 8-dev mesh.

VERDICT r3 weak-item 6: multi-chip equality tests only ran at toy shapes
(h<=64). This runs the explicit-collectives spatial path at a real ladder
rung (960x540 blobs + textured, speed AND quality mode) on the 8-device
virtual CPU mesh and asserts the partition is IDENTICAL to the dense
single-device path (canonical min-label comparison, same as the oracle
tests). Slow on the 1-core box (~tens of minutes) — run once per round,
result recorded in docs/RESULTS_r4.md and bench_out/spatial_parity.json.

Usage: [GSEG_SP_SHAPE=540x960] python scripts/spatial_parity_540p.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import json
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.turbo import segment_turbo_flagged
from gseg_tpu.parallel.turbo_spatial import segment_turbo_spatial
from gseg_tpu.utils.labels import canonical_min_labels_np
from gseg_tpu.utils.synthetic import blobs_image, textured_image
from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


def main():
    # 540 rows shard over 4 devices (540 % 8 != 0); the 720p rung uses the
    # full 8-device mesh. GSEG_SP_SHAPE=HxWxN overrides.
    ov = os.environ.get("GSEG_SP_SHAPE")
    if ov:
        hh, ww, nn = (int(t) for t in ov.split("x"))
        plan = [(hh, ww, nn)]
    else:
        plan = [(540, 960, 4), (720, 1280, 8)]
    rows = []
    ok_all = True
    for h, w, n_dev in plan:
        mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]).reshape(n_dev),
                    ("space",))
        ok_all &= run_shape(h, w, n_dev, mesh, rows)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_out", "spatial_parity.json")
    with open(out, "w") as f:
        json.dump({"mesh": "virtual CPU devices", "rows": rows,
                   "ok": ok_all}, f, indent=1)
    print("OK" if ok_all else "MISMATCH")
    sys.exit(0 if ok_all else 1)


def run_shape(h, w, n_dev, mesh, rows):
    ok_all = True
    for content in ("blobs", "textured"):
        img_np = (blobs_image(h, w, num_blobs=max(8, (h * w) // 65536),
                              seed=0)
                  if content == "blobs" else textured_image(h, w, seed=0))
        img = jnp.asarray(img_np)
        for wb in (0, 16):
            cfg = SegmentationConfig(k=300.0, min_size=100,
                                     weight_buckets=wb)
            t0 = time.time()
            dense, dflags = segment_turbo_flagged(img, cfg, 2)
            dense = canonical_min_labels_np(np.asarray(dense))
            t_dense = time.time() - t0
            t0 = time.time()
            sp, sflags = segment_turbo_spatial(img, cfg, mesh, "space", 2)
            sp = canonical_min_labels_np(np.asarray(sp))
            t_sp = time.time() - t0
            equal = bool((dense == sp).all())
            ok_all &= equal and int(dflags) == 0 and int(sflags) == 0
            row = {"content": content, "h": h, "w": w, "n_dev": n_dev,
                   "weight_buckets": wb, "equal": equal,
                   "dense_flags": int(dflags), "spatial_flags": int(sflags),
                   "dense_s": round(t_dense, 1),
                   "spatial_s": round(t_sp, 1)}
            rows.append(row)
            print("RESULT", json.dumps(row), flush=True)
    return ok_all


if __name__ == "__main__":
    main()
