"""Roll cost on WIDE arrays (multi-vreg lanes) vs shift size & axis.

The scan closures roll (slab, 1920) arrays by shifts up to wp/2; if
cross-vreg lane rotation cost grows with shift or is flat-but-huge, that
explains the measured ~20x closure-pass cost. K rolls per kernel call to
amortize dispatch.
"""
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

H, W = 64, 1920
K = 32


def mk(axis, shift):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for i in range(K):
            x = pltpu.roll(x, shift, axis) + 1
        o_ref[:] = x

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


def bench(name, f, x, inner=50):
    _ = int(jnp.max(f(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(inner):
            y = f(y)
        _ = int(jnp.max(y))
        ts.append((time.perf_counter() - t0 - 0.030) / inner)
    per_roll = min(ts) / K * 1e6
    print(f"  {name}: {min(ts)*1e3:6.3f} ms/call = {per_roll:6.2f} us/roll",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (H, W)).astype(np.int32))
    for shift in (1, 8, 64, 512, 1024):
        bench(f"lane roll s={shift:5}", mk(1, shift), x)
    for shift in (1, 8, 32):
        bench(f"subl roll s={shift:5}", mk(0, shift), x)


if __name__ == "__main__":
    main()
