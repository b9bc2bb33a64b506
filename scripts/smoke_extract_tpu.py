"""Smoke-test boundary_extract on the real chip (perf + sanity)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
from gseg_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import gseg_tpu.ops.grid_graph as gg
from gseg_tpu.ops.pallas.extract import boundary_extract

def main(h=512, w=768, block=16, cap=1 << 17):
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 300, (h // block, w // block)).astype(np.int32)
    L = np.kron(blocks, np.ones((block, block), np.int32))
    weights = rng.uniform(0.5, 9.0, (4, h, w)).astype(np.float32)
    for d, (dy, dx) in enumerate(gg.DIRS4):
        va = np.asarray(gg.valid_plane(h, w, dy, dx))
        weights[d][~va] = np.inf
    t0 = time.time()
    out = boundary_extract(jnp.asarray(L), jnp.asarray(weights), w, cap)
    n = int(out[4]); ovf = bool(out[5])
    print(f"RESULT compile+run {time.time()-t0:.1f}s count={n} overflow={ovf}", flush=True)
    for _ in range(3):
        t0 = time.time()
        out = boundary_extract(jnp.asarray(L), jnp.asarray(weights), w, cap)
        _ = int(out[4])
        print(f"RESULT rep {time.time()-t0-0.03:.4f}s", flush=True)
    lo = np.asarray(out[0]); hi = np.asarray(out[1])
    live = lo != np.iinfo(np.int32).max
    print("RESULT live entries", int(live.sum()), flush=True)
    print("RESULT lo<hi all:", bool((lo[live] < hi[live]).all()), flush=True)

if __name__ == "__main__":
    import sys
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
