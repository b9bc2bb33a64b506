"""Batch throughput probe: vmapped turbo over an image batch (one chip).

The reference is strictly one-image-at-a-time (SURVEY.md §2.4 S10); batch
parallelism is a capability it lacks. This measures images/s and MPix/s at
batch sizes 1..8 for 1080p — the production-serving number (BASELINE
config 5: vmapped video frames).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.parallel.batching import segment_batch
from gseg_tpu.utils.synthetic import blobs_image


def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    for b in (1, 2, 4, 8):
        imgs = np.stack([
            blobs_image(h, w, num_blobs=max(8, (h * w) // 65536),
                        noise=8.0, seed=s) for s in range(b)
        ])
        x = jax.device_put(jnp.asarray(imgs))
        out = segment_batch(x, cfg)
        _ = int(jnp.max(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = segment_batch(x, cfg)
            _ = int(jnp.max(out))
            ts.append(time.perf_counter() - t0 - 0.030)
        dt = min(ts)
        print(f"batch={b}: {dt*1e3:7.1f} ms total, {dt/b*1e3:7.1f} ms/img, "
              f"{b*h*w/1e6/dt:6.2f} MPix/s", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
