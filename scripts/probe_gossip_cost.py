"""Per-pass cost + pass-count probe for the Pallas gossip fixpoints.

Times compmin_gossip at a fixed number of passes (max_sweeps = k*T) on a
blocky 1080p label field, separating fixed per-call/per-pass overhead from
compute, and reports pass counts to convergence. Drives the decision between
skip-converged-strips, bigger T, and fewer rounds (see CLAUDE.md cost model).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.ops.pallas import gossip as pg


def fence(x):
    return int(jnp.max(x).astype(jnp.int32))


def main(h=1080, w=1920, block=32):
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 1 << 20, (h // block + 1, w // block + 1))
    L = np.kron(blocks, np.ones((block, block), np.int32))[:h, :w]
    L = jnp.asarray(L.astype(np.int32))
    bw = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    be = jnp.asarray(rng.integers(0, 1 << 20, (h, w)).astype(np.int32))
    sz = jnp.ones((h, w), jnp.int32)

    for sweeps in (pg.T, 2 * pg.T, 4 * pg.T, 8 * pg.T):
        f = jax.jit(lambda b, e, s, ms=sweeps: pg.compmin_gossip(
            L, b, e, s, ms))
        out = f(bw, be, sz)
        fence(out[1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(bw, be, sz)
            fence(out[1])
            ts.append(time.perf_counter() - t0 - 0.030)
        print(f"passes={sweeps // pg.T}: {min(ts)*1e3:.2f} ms "
              f"({min(ts)*1e3 / (sweeps // pg.T):.2f} ms/pass)", flush=True)

    # converged input: every pass is a no-op sweep (measures floor)
    cb, ce, cs, _, _ = pg.compmin_gossip(L, bw, be, sz, 4 * (h + w))
    f = jax.jit(lambda b, e, s: pg.compmin_gossip(L, b, e, s, 4 * (h + w)))
    out = f(cb, ce, cs)
    fence(out[1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(cb, ce, cs)
        fence(out[1])
        ts.append(time.perf_counter() - t0 - 0.030)
    print(f"converged-input fixpoint (2 passes min): {min(ts)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
