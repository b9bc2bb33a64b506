"""Enumerate Mosaic kernel instantiations in the turbo program.

The 8K compile blowup is the per-program AGGREGATE of Mosaic kernel
compiles (~112 s each at wp=7680, CLAUDE.md round-4 item 3). This probe
traces the full turbo program (jax.eval_shape — no compile) with
_use_pallas forced on and records every pl.pallas_call instantiation with
the signature Mosaic would key its compile on: kernel body identity, grid,
block shapes/dtypes, scratch shapes. Distinct signatures = sequential
Mosaic compiles; identical repeated signatures are expected to hit the
program cache.

Usage: python scripts/probe_kernels.py [--shape 4320x7680] [--wb 0]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import argparse
import collections

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl

from gseg_tpu.config import SegmentationConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4320x7680")
    ap.add_argument("--wb", type=int, default=0)
    args = ap.parse_args()
    h, w = (int(t) for t in args.shape.split("x"))

    calls = []

    real_pallas_call = pl.pallas_call

    def spying_pallas_call(kernel, **kw):
        def runner(*a, **k):
            sig = (
                getattr(kernel, "__qualname__", str(kernel)),
                tuple(kw.get("grid", ()) if not callable(kw.get("grid"))
                      else ("dyn",)),
                tuple(str(s) for s in jax.tree_util.tree_leaves(
                    kw.get("out_shape"))),
                tuple(str(s) for s in kw.get("scratch_shapes", ())),
                tuple((x.shape, str(x.dtype)) for x in a
                      if hasattr(x, "shape")),
            )
            calls.append(sig)
            return real_pallas_call(kernel, **kw)(*a, **k)

        return runner

    from gseg_tpu.ops.pallas import gossip as pg
    from gseg_tpu.ops.pallas import extract as pe
    from gseg_tpu.models import turbo

    pg.pl.pallas_call = spying_pallas_call
    pe.pl.pallas_call = spying_pallas_call
    turbo._use_pallas = lambda: True

    cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100,
                             weight_buckets=args.wb)
    img = jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)
    jax.eval_shape(lambda im: turbo.segment_turbo_flagged(im, cfg, 2), img)

    uniq = collections.Counter(calls)
    print(f"shape {h}x{w} wb={args.wb}: {len(calls)} pallas_call sites, "
          f"{len(uniq)} DISTINCT signatures")
    for sig, n in uniq.items():
        name, grid, outs, scratch, ins = sig
        print(f"  x{n}  {name} grid={grid}")
        print(f"       ins={ins}")
        print(f"       scratch={scratch}")


if __name__ == "__main__":
    main()
