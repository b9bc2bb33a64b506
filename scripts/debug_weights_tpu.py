"""Compare smoothed image + edge weight planes: TPU vs CPU backend, bitwise.

Locates the float divergence feeding the seed-5/19 parity failures.
Run on the tunnel (TPU visible); it spawns a CPU-backend subprocess for the
reference values.
"""
import os, subprocess, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HELPER = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gseg_tpu.ops.filters import gaussian_smooth
from gseg_tpu.ops.grid_graph import edge_weight_planes
from gseg_tpu.utils.datasets import synthetic_quality_set
samples = list(synthetic_quality_set(n=20))
name, image, _ = samples[int(sys.argv[1])]
sm = np.asarray(jax.jit(lambda x: gaussian_smooth(x, 0.8))(jnp.asarray(image)))
wts = np.asarray(jax.jit(lambda x: edge_weight_planes(gaussian_smooth(x, 0.8), 8, 0)[0])(jnp.asarray(image)))
np.savez(sys.argv[2], sm=sm, wts=wts)
"""


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu_out = f"/tmp/wts_cpu_{seed}.npz"
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", HELPER % {"repo": repo},
                    str(seed), cpu_out], check=True, env=env)

    import jax
    import jax.numpy as jnp
    from gseg_tpu.ops.filters import gaussian_smooth
    from gseg_tpu.ops.grid_graph import edge_weight_planes
    from gseg_tpu.utils.datasets import synthetic_quality_set

    samples = list(synthetic_quality_set(n=20))
    name, image, _ = samples[seed]
    sm_t = np.asarray(jax.jit(lambda x: gaussian_smooth(x, 0.8))(jnp.asarray(image)))
    wts_t = np.asarray(jax.jit(
        lambda x: edge_weight_planes(gaussian_smooth(x, 0.8), 8, 0)[0]
    )(jnp.asarray(image)))

    ref = np.load(cpu_out)
    sm_c, wts_c = ref["sm"], ref["wts"]
    sm_eq = np.array_equal(sm_t, sm_c)
    wt_eq = np.array_equal(wts_t, wts_c)
    print(f"{name}: smoothed bit-equal={sm_eq} weights bit-equal={wt_eq}")
    if not sm_eq:
        d = sm_t != sm_c
        print(f"  smoothed: {d.sum()} diff elems, max abs diff "
              f"{np.abs(sm_t - sm_c).max():.3e}, max ulp "
              f"{np.abs(sm_t.view(np.int32) - sm_c.view(np.int32)).max()}")
    if not wt_eq:
        d = wts_t != wts_c
        print(f"  weights: {d.sum()} diff elems, max abs diff "
              f"{np.nanmax(np.abs(wts_t - wts_c)):.3e}")


if __name__ == "__main__":
    main()
