"""Post-change hardware parity checks: TPU partitions vs the NumPy oracle.

THE standard validation after touching gseg_tpu/ops/pallas/ or the
models/turbo.py hot paths (CLAUDE.md round-3 lesson: the strip kernels
once returned stable-but-wrong partitions with clean flags — convergence
certificates and overflow flags cannot catch a leaked min label; only an
oracle comparison can).

Runs on the real chip (do NOT force a CPU backend):

  1. the 20-seed synthetic quality sweep (strongest detector — it found
     the round-3 wrap bug on every seed), exact canonical-partition
     equality vs models/boruvka_cpu,
  2. 540p bench-config parity on blobs AND textured content.

Usage: python scripts/check_tpu_parity.py [--seeds 20] [--skip-540p]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.boruvka_cpu import segment_boruvka_np
from gseg_tpu.models.turbo import segment_turbo_flagged
from gseg_tpu.utils.datasets import synthetic_quality_set
from gseg_tpu.utils.labels import canonical_min_labels_np
from gseg_tpu.utils.synthetic import blobs_image, textured_image


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--skip-540p", action="store_true")
    args = ap.parse_args()

    bad = 0
    cfg = SegmentationConfig(k=30.0, min_size=10)
    for name, image, _ in synthetic_quality_set(n=args.seeds):
        lab, flags = segment_turbo_flagged(jnp.asarray(image), cfg, 2)
        oracle = segment_boruvka_np(image, cfg)
        eq = np.array_equal(
            canonical_min_labels_np(np.asarray(lab)),
            canonical_min_labels_np(oracle),
        )
        print(f"{name}: flags={int(flags)} equal={eq}", flush=True)
        bad += not eq or int(flags) != 0

    if not args.skip_540p:
        cfg = SegmentationConfig(k=300.0, min_size=100)
        for content, img in (
            ("blobs", blobs_image(540, 960, num_blobs=8, seed=0)),
            ("textured", textured_image(540, 960, seed=0)),
        ):
            lab, flags = segment_turbo_flagged(jnp.asarray(img), cfg, 2)
            oracle = segment_boruvka_np(img, cfg)
            eq = np.array_equal(
                canonical_min_labels_np(np.asarray(lab)),
                canonical_min_labels_np(oracle),
            )
            print(f"540p {content}: flags={int(flags)} equal={eq}",
                  flush=True)
            bad += not eq or int(flags) != 0

    if bad:
        sys.exit(f"PARITY FAILURES: {bad}")
    print("ALL PARITY CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
