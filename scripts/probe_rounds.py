"""Per-round stage-G cost probe on the bench image (real chip).

Unrolls _stage_g round by round (each round its own jit) and times each,
plus the fixpoint sub-pieces of the slowest rounds. Pinpoints where the
gossip budget goes (peel vs rlist rounds; compmin vs flood vs sizes).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.ops import filters
from gseg_tpu.ops import grid_graph as gg
from gseg_tpu.utils.synthetic import blobs_image


def fence(x):
    return int(jnp.max(x).astype(jnp.int32))


def _leaf(out):
    while not hasattr(out, "dtype"):
        out = out[0] if not hasattr(out, "L") else out.L
    return out


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fence(_leaf(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(_leaf(out))
        ts.append(time.perf_counter() - t0 - 0.030)
    print(f"  {name}: {min(ts)*1e3:7.2f} ms", flush=True)
    return out


def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    v = h * w
    img = jax.device_put(jnp.asarray(
        blobs_image(h, w, num_blobs=max(8, v // 65536), noise=8.0, seed=0)))
    ms = 4 * (h + w)

    @jax.jit
    def prep(im):
        sm = filters.gaussian_smooth(im, cfg.sigma)
        weights, _ = gg.edge_weight_planes(sm, cfg.connectivity, 0)
        w8, eid8 = gg.incident_views(weights)
        return weights, w8, eid8

    weights, w8, eid8 = prep(img)
    fence(w8)
    vid = jnp.arange(v, dtype=jnp.int32).reshape(h, w)
    gst = turbo.GossipState(
        L=vid, S=jnp.ones((h, w), jnp.int32),
        ID=jnp.zeros((h, w), jnp.float32), merged=jnp.bool_(True),
        it=jnp.int32(0), bucket=jnp.int32(0), flags=jnp.int32(0),
    )

    # big arrays threaded as explicit jit args: the axon tunnel compiles
    # remotely and inlined closure constants blow its request-size cap
    # (HTTP 413 at 4K, round 5). vid is rebuilt in-trace (iota is free).
    def _vid():
        return jnp.arange(v, dtype=jnp.int32).reshape(h, w)

    ground_sub = jax.jit(lambda s, w8_, eid8_: turbo._ground(
        s, w8_, eid8_, _vid(), cfg.k, cfg.min_size, "felz", ms,
        sizes="count"))
    g1 = timeit("round1 (count) ", ground_sub, gst, w8, eid8)
    g2 = timeit("round2 (count) ", ground_sub, g1, w8, eid8)
    build = jax.jit(functools.partial(
        turbo._build_rlist, cap=max(v // 8, 16384)))
    rl, _ = timeit("build_rlist    ", build, g2.L)
    ground_rl = jax.jit(lambda s, r, w8_, eid8_: turbo._ground(
        s, w8_, eid8_, _vid(), cfg.k, cfg.min_size, "felz", ms, rlist=r,
        sizes="rlist"))
    g3, rl3 = timeit("round3 (rlist) ", ground_rl, g2, rl, w8, eid8)
    g4, rl4 = timeit("round4 (rlist) ", ground_rl, g3, rl3, w8, eid8)
    for r, g in (("1", g1), ("2", g2), ("3", g3), ("4", g4)):
        print(f"  comps after round {r}: "
              f"{int(jnp.sum((g.L == vid).astype(jnp.int32)))}", flush=True)

    # sub-pieces of the peel rounds: how much of round 1/2 is the flat
    # counting scatter-add (capacity-sized at ~7 ns/slot), and what the
    # dist-ride + subtree-convergecast alternative costs end-to-end.
    csz = jax.jit(lambda L: turbo._component_sizes(L)[0])
    timeit("  r1 countsizes ", csz, g1.L)
    timeit("  r2 countsizes ", csz, g2.L)
    ground_ss = jax.jit(lambda s, w8_, eid8_: turbo._ground(
        s, w8_, eid8_, _vid(), cfg.k, cfg.min_size, "felz", ms,
        sizes="subsum"))
    s1 = timeit("round1 (subsum)", ground_ss, gst, w8, eid8)
    s2 = timeit("round2 (subsum)", ground_ss, s1, w8, eid8)
    print(f"  subsum L == count L after r2: "
          f"{bool(jnp.all(s2.L == g2.L))}", flush=True)

    # sub-pieces of round 3 (the first rlist round)
    from gseg_tpu.ops.pallas import gossip as pg

    vmin = jax.jit(
        lambda s, w8_, eid8_: turbo._vertex_min_outgoing(s.L, w8_, eid8_))
    vminw, veid, _ = timeit("  r3 vertexmin ", vmin, g2, w8, eid8)
    cm = jax.jit(lambda L, bw, be, S: pg.compmin_gossip(L, bw, be, S, ms))
    out = timeit("  r3 compmin   ", cm, g2.L, vminw, veid, g2.S)
    print(f"    compmin passes: {int(out[4])}", flush=True)
    sizes = jax.jit(lambda r, L, S: turbo._rlist_sizes(r, L, S))
    timeit("  r3 rlistsizes", sizes, rl, g3.L, g2.S)

    # label_flood alone on round-3 state (allow = same-label only approx)
    @jax.jit
    def flood(L, idf):
        nbrL = [gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8]
        bits = jnp.zeros_like(L)
        for d in range(8):
            bits = bits | ((nbrL[d] == L).astype(jnp.int32) << d)
        return pg.label_flood(bits, L, idf, ms)

    out = timeit("  r3 flood(sameL)", flood, g2.L, g2.ID)
    print(f"    flood passes: {int(out[3])}", flush=True)

    # warm-pass sweep on the full round 3
    for warm in (2, 8, 1 << 20):
        pg.WARM_PASSES = warm
        gr = jax.jit(lambda s, r, w8_, eid8_: turbo._ground(
            s, w8_, eid8_, _vid(), cfg.k, cfg.min_size, "felz", ms,
            rlist=r, sizes="rlist"))
        timeit(f"  round3 warm={warm:>7}", gr, g2, rl, w8, eid8)
    pg.WARM_PASSES = 4


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
