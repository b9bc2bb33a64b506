"""True V-sized gather/scatter costs (corrected self-calibrating harness).

The round-1..4 cost model ("~7 ns/index dispatched, ~1.4 ns amortized")
came from probes that divided an unsubtracted ~30 ms tunnel round trip
by small n (harness audit, round 5). The corrected counting-scatter
number (0.34 ms @1080p = 0.17 ns/px) suggests V-sized gathers may be
10-20x cheaper than the model that shaped the no-gather design. This
probe measures, at (h, w):

  gather/comp   labels[p] = table[L[p]] with L piecewise-constant
                (the real final-map / flood-replacement pattern)
  gather/rand   same with a random permutation index (worst case)
  scatter-add   counting scatter (calibration vs probe_pieces)
  scatter-min   two-phase scatter-min (the compmin-replacement pattern)

Usage: python scripts/probe_gather.py [h w]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


def fence(x):
    x = jnp.asarray(x).astype(jnp.float32)
    return float(jnp.max(jnp.where(jnp.isfinite(x), x, 0.0)))


_BASE_CACHE = {}


def _baseline(carry, consts):
    key = (getattr(carry, "shape", None), len(tuple(consts)))
    if key in _BASE_CACHE:
        return _BASE_CACHE[key]
    ident = jax.jit(lambda c, cs: (c, cs)[0])
    fence(ident(carry, tuple(consts)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(ident(carry, tuple(consts)))
        ts.append(time.perf_counter() - t0)
    _BASE_CACHE[key] = min(ts)
    return _BASE_CACHE[key]


def timeloop(name, fn, n, carry, consts=(), reps=3):
    def body(_, st):
        c, cs = st
        return fn(c, *cs), cs

    looped = jax.jit(
        lambda c, cs: jax.lax.fori_loop(0, n, body, (c, cs))[0])
    fence(looped(carry, tuple(consts)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(looped(carry, tuple(consts)))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - _baseline(carry, consts), 0.0) / n * 1e3
    print(f"  {name}: {per:8.3f} ms/iter  (n={n})", flush=True)
    return per


def main(h=1080, w=1920):
    v = h * w
    rng = np.random.default_rng(0)
    # piecewise-constant labels: ~v/128 blob-ish components (gate-state)
    block = 16
    blocks = rng.integers(0, v, (h // block + 1, w // block + 1))
    Lnp = np.kron(blocks, np.ones((block, block), np.int64))[:h, :w]
    L = jnp.asarray((Lnp % v).astype(np.int32))
    perm = jnp.asarray(rng.permutation(v).astype(np.int32).reshape(h, w))
    table = jnp.asarray(rng.integers(0, v, (v,)).astype(np.int32))

    # unfoldable: carry = min(carry, gathered)
    def g_comp2(c, L, table):
        return jnp.minimum(c, table[L.reshape(-1)].reshape(c.shape))

    timeloop("gather/comp ", g_comp2, 10, L, (L, table))

    def g_rand(c, perm, table):
        return jnp.minimum(c, table[perm.reshape(-1)].reshape(c.shape))

    timeloop("gather/rand ", g_rand, 10, L, (perm, table))

    def s_add(c, L):
        S = jnp.zeros((v,), jnp.int32).at[L.reshape(-1)].add(
            1, mode="drop")
        return c | (S.reshape(c.shape) & 0)

    timeloop("scatter-add ", s_add, 10, L, (L,))

    def s_min(c, L):
        Sm = jnp.full((v,), jnp.int32(2**31 - 1)).at[L.reshape(-1)].min(
            c.reshape(-1), mode="drop")
        return c | (Sm.reshape(c.shape) & 0)

    timeloop("scatter-min ", s_min, 10, L, (L,))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
