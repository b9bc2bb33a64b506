"""Cold-process startup cost breakdown for the turbo path (VERDICT #5).

Measures, in a fresh process with a warm persistent compile cache:
  import -> trace -> lower -> compile(cache hit) -> first execute
so the per-process overhead can be attributed and attacked. Run AFTER any
run that populated the compile cache for the same shape.

Usage: python scripts/probe_startup.py [H W]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

t0 = time.perf_counter()
import numpy as np

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.utils.synthetic import blobs_image

t_import = time.perf_counter() - t0


def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    img = jax.device_put(jnp.asarray(
        blobs_image(h, w, num_blobs=max(8, (h * w) // 65536), noise=8.0,
                    seed=0)))
    _ = jnp.zeros(()).block_until_ready()  # backend init separated out
    t1 = time.perf_counter()
    traced = jax.jit(
        turbo.segment_turbo_impl, static_argnames=("cfg", "gossip_rounds")
    ).trace(img, cfg, 4)
    t_trace = time.perf_counter() - t1
    t1 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t1
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t1
    t1 = time.perf_counter()
    out = compiled(img)
    _ = int(jnp.max(out[0]))
    t_first = time.perf_counter() - t1
    print(
        f"import {t_import:.1f}s  trace {t_trace:.1f}s  "
        f"lower {t_lower:.1f}s  compile {t_compile:.1f}s  "
        f"first-exec {t_first:.2f}s  "
        f"TOTAL {t_import + t_trace + t_lower + t_compile + t_first:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
