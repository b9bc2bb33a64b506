"""Isolate Mosaic roll costs: lane rolls vs sublane rolls vs full compaction.

Times small pallas kernels that do K rolls of a (ROWS, 128) int32 VMEM array
along lanes (axis=1) and along sublanes (axis=0), plus the extract kernel's
_compact_tall on the same shape — to find where the 100x slowdown lives.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

ROWS = 960


def _mk(axis, k, shift):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for i in range(k):
            x = pltpu.roll(x, shift + i % 3, axis)
        o_ref[:] = x

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


def _mk_compact():
    from gseg_tpu.ops.pallas.extract import _compact_tall

    def kernel(x_ref, m_ref, o_ref):
        vals = [x_ref[:]]
        keep = m_ref[:] > 0
        (v,), kept, total = _compact_tall(vals, keep, ROWS)
        o_ref[:] = jnp.where(kept, v, -1)

    @jax.jit
    def f(x, m):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, m)
    return f


def bench(name, f, *args):
    out = f(*args)
    _ = int(jnp.max(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        _ = int(jnp.max(out))
        ts.append(time.perf_counter() - t0 - 0.030)
    print(f"{name}: {min(ts)*1e3:.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (ROWS, 128)).astype(np.int32))
    m = jnp.asarray((rng.random((ROWS, 128)) < 0.05).astype(np.int32))
    bench("17 lane rolls", _mk(1, 17, 3), x)
    bench("17 sublane rolls (small shift)", _mk(0, 17, 3), x)
    bench("17 sublane rolls (big shift)", _mk(0, 17, 240), x)
    bench("compact_tall 1 payload", _mk_compact(), x, m)


if __name__ == "__main__":
    main()
