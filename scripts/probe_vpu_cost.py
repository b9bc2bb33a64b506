"""Mosaic per-op throughput probe: adds vs lane rolls vs sublane rolls at
two shapes. Determines whether the extract kernel should minimize rolls,
grow strips, or whether Pallas elementwise here is overhead-bound."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

K = 64


def mk(shape, kind):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for i in range(K):
            if kind == "add":
                x = x + jnp.int32(i)
            elif kind == "laneroll":
                x = pltpu.roll(x, 3 + (i % 3), 1)
            elif kind == "subroll":
                x = pltpu.roll(x, 3 + (i % 3), 0)
            elif kind == "select":
                x = jnp.where(x > i, x, x + 1)
        o_ref[:] = x

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


def bench(name, f, x):
    out = f(x)
    _ = int(jnp.max(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(x)
        _ = int(jnp.max(out))
        ts.append(time.perf_counter() - t0 - 0.030)
    per_op_us = max(min(ts), 1e-9) * 1e6 / K
    print(f"{name}: {min(ts)*1e3:7.3f} ms total, {per_op_us:7.2f} us/op",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    for shape in [(960, 128), (256, 3968), (64, 3968)]:
        x = jnp.asarray(
            rng.integers(0, 1 << 20, shape).astype(np.int32)
        )
        n = shape[0] * shape[1]
        print(f"shape {shape} ({n/1e3:.0f}k elems):", flush=True)
        for kind in ("add", "select", "laneroll", "subroll"):
            bench(f"  {K} x {kind}", mk(shape, kind), x)


if __name__ == "__main__":
    main()
