"""Stage-level decomposition of segment_turbo, prefix-chain form.

Round-5 lesson: timing an isolated stage with loop-INVARIANT inputs in a
fori loop lets XLA hoist the whole stage out of the loop (measured
s2 = 0.000). Prefixes avoid that: every prefix consumes the loop-carried
image, so nothing can be hoisted. Stage costs are adjacent differences:

  prep       gaussian + edge planes + incident views
  P1         _stage_g                       (gossip total = P1 - prep)
  P2         P1 + _extract_stage            (extract = P2 - P1)
  P3         P2 + _s2_stage                 (s2 = P3 - P2)
  P4 = e2e   P3 + _final_map + flags        (final = P4 - P3)

Self-calibrating identity baseline subtracted (harness audit r5).

Usage: python scripts/probe_stages.py [h w]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.utils.synthetic import blobs_image


def fence(x):
    x = jnp.asarray(x).astype(jnp.float32)
    return float(jnp.max(jnp.where(jnp.isfinite(x), x, 0.0)))


_BASE_CACHE = {}


def _baseline(carry):
    key = getattr(carry, "shape", None)
    if key in _BASE_CACHE:
        return _BASE_CACHE[key]
    ident = jax.jit(lambda c: c)
    fence(ident(carry))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(ident(carry))
        ts.append(time.perf_counter() - t0)
    _BASE_CACHE[key] = min(ts)
    return _BASE_CACHE[key]


def timeloop(name, fn, n, carry, reps=3):
    looped = jax.jit(lambda c: jax.lax.fori_loop(
        0, n, lambda _, c: fn(c), c))
    fence(looped(carry))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(looped(carry))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - _baseline(carry), 0.0) / n * 1e3
    print(f"  {name}: {per:8.3f} ms/iter  (n={n})", flush=True)
    return per


def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    v = h * w
    img = jax.device_put(jnp.asarray(
        blobs_image(h, w, num_blobs=max(8, v // 65536), noise=8.0,
                    seed=0)).astype(jnp.float32))
    ms = 4 * (h + w)
    nb = 1

    def fold(img_c, *vals):
        z = jnp.int32(0)
        for val in vals:
            leaf = val
            while not hasattr(leaf, "dtype"):
                leaf = leaf[0] if not hasattr(leaf, "L") else leaf.L
            z = z | (jnp.max(leaf).astype(jnp.int32) & 0)
        return img_c + z.astype(img_c.dtype)

    def prep_step(img_c):
        from gseg_tpu.ops import filters
        from gseg_tpu.ops import grid_graph as gg

        sm = filters.gaussian_smooth(img_c, cfg.sigma)
        weights, _ = gg.edge_weight_planes(sm, cfg.connectivity, 0)
        w8, eid8 = gg.incident_views(weights)
        return fold(img_c, w8)

    timeloop("prep      ", prep_step, 10, img)

    def p1_step(img_c):
        gst, weights, thr = turbo._stage_g(img_c, cfg, 2)
        return fold(img_c, gst.L, gst.S, gst.ID)

    timeloop("P1 stageG ", p1_step, 6, img)

    def p2_step(img_c):
        gst, weights, thr = turbo._stage_g(img_c, cfg, 2)
        st, rm, r0 = turbo._extract_stage(gst, weights, cfg)
        return fold(img_c, st.esrc, st.ew, st.fin, rm)

    timeloop("P2 +extr  ", p2_step, 6, img)

    def p3_step(img_c):
        gst, weights, thr = turbo._stage_g(img_c, cfg, 2)
        st, rm, r0 = turbo._extract_stage(gst, weights, cfg)
        st = turbo._s2_stage(st, v, cfg, thr, nb)
        return fold(img_c, st.fin, st.flags)

    timeloop("P3 +s2    ", p3_step, 6, img)

    def p4_step(img_c):
        labels, flags = turbo.segment_turbo_impl(img_c, cfg, 2)
        return fold(img_c, labels, flags)

    timeloop("P4 e2e    ", p4_step, 6, img)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
