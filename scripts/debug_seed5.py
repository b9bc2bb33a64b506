"""Bisect the r4 parity-gate failure (seeds 5/19, 161x241, speed mode).

Runs the failing configs on the real chip under several knob settings to
locate the divergence: Pallas vs XLA-on-TPU, determinism across reps,
and which pixels differ vs the NumPy oracle.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax.numpy as jnp

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.boruvka_cpu import segment_boruvka_np
from gseg_tpu.utils.datasets import synthetic_quality_set
from gseg_tpu.utils.labels import canonical_min_labels_np


def run_one(image, cfg):
    from gseg_tpu.models.turbo import segment_turbo_flagged
    lab, flags = segment_turbo_flagged(jnp.asarray(image), cfg, 2)
    return np.asarray(lab), int(flags)


def main():
    seeds = [int(s) for s in (sys.argv[1:] or ["5", "19"])]
    cfg = SegmentationConfig(k=30.0, min_size=10)
    samples = {i: s for i, s in enumerate(synthetic_quality_set(n=20))}
    for sd in seeds:
        name, image, _ = samples[sd]
        oracle = canonical_min_labels_np(segment_boruvka_np(image, cfg))
        lab1, f1 = run_one(image, cfg)
        lab2, f2 = run_one(image, cfg)
        c1 = canonical_min_labels_np(lab1)
        c2 = canonical_min_labels_np(lab2)
        det = np.array_equal(c1, c2)
        eq = np.array_equal(c1, oracle)
        diff = (c1 != oracle)
        n_diff = int(diff.sum())
        print(f"{name}: flags={f1}/{f2} deterministic={det} equal={eq} "
              f"n_diff_px={n_diff}", flush=True)
        if not eq and n_diff:
            ys, xs = np.nonzero(diff)
            print(f"  diff bbox rows [{ys.min()},{ys.max()}] cols "
                  f"[{xs.min()},{xs.max()}]")
            # component-level summary: oracle comps touched
            bad_comps = np.unique(oracle[diff])
            got_comps = np.unique(c1[diff])
            print(f"  oracle comps touched: {bad_comps[:12]}"
                  f" (n={len(bad_comps)})")
            print(f"  tpu comps there:      {got_comps[:12]}"
                  f" (n={len(got_comps)})")
            sizes_o = [(c, int((oracle == c).sum())) for c in bad_comps[:8]]
            sizes_t = [(c, int((c1 == c).sum())) for c in got_comps[:8]]
            print(f"  oracle comp sizes: {sizes_o}")
            print(f"  tpu comp sizes:    {sizes_t}")
            np.savez(f"/tmp/seed{sd}_debug.npz", image=image, oracle=oracle,
                     tpu=c1)


if __name__ == "__main__":
    main()
