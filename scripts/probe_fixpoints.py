"""Fixpoint cost probe: hybrid (warm+scan) vs step-only, per diameter.

Times compmin / label / value fixpoints to convergence on blocky label
fields of several block sizes (== component diameters) at a given
resolution, with WARM_PASSES at its production value vs effectively
infinite (step-only). Decides the warm/scan cutover and quantifies the
scan-pass payoff at large diameters.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.ops.pallas import gossip as pg


def fence(x):
    return int(jnp.max(x).astype(jnp.int32))


def block_labels(h, w, block):
    """Canonical min-flat-id labels of a block partition."""
    y = np.arange(h)[:, None] // block * block
    x = np.arange(w)[None, :] // block * block
    return (y * w + x).astype(np.int32)


def run(name, fn, out_idx, reps=4):
    out = fn()
    fence(out[out_idx])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        fence(out[out_idx])
        ts.append(time.perf_counter() - t0 - 0.030)
    print(f"  {name}: {min(ts)*1e3:7.2f} ms", flush=True)


def main(h=1080, w=1920):
    rng = np.random.default_rng(0)
    ms = 4 * (h + w)
    for block in (16, 64, 256):
        L = jnp.asarray(block_labels(h, w, block))
        bw = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        be = jnp.asarray(rng.integers(0, 1 << 20, (h, w)).astype(np.int32))
        sz = jnp.ones((h, w), jnp.int32)
        vid = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
        seed = jnp.where(L == vid, L, jnp.iinfo(jnp.int32).max)
        idf = jnp.zeros((h, w), jnp.float32)
        dist0 = jnp.where(L == vid, jnp.int32(0), jnp.int32(1 << 30))
        nbr = [gg_shift(L, dy, dx) for dy, dx in DIRS8]
        allow = [n == L for n in nbr]
        ab = jnp.zeros((h, w), jnp.int32)
        for d in range(8):
            ab = ab | (allow[d].astype(jnp.int32) << d)

        for warm, tag in ((pg.WARM_PASSES, "hybrid"), (1 << 20, "step-only")):
            pg.WARM_PASSES = warm
            print(f"block={block} [{tag}]", flush=True)
            run("compmin", jax.jit(
                lambda bw=bw: pg.compmin_gossip(L, bw, be, sz, ms)), 1)
            run("label  ", jax.jit(
                lambda ab=ab: pg.label_gossip(ab, L, idf, dist0, ms)), 0)
            run("value  ", jax.jit(
                lambda s=seed: pg.value_flood(L, s, ms)), 0)
        pg.WARM_PASSES = 4


from gseg_tpu.ops.grid_graph import DIRS8, shift_plane


def gg_shift(x, dy, dx):
    return shift_plane(x, dy, dx, -1)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
