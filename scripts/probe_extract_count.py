"""Measure the real boundary-candidate pool count at the stage-2 handoff."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from gseg_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.utils.synthetic import blobs_image

def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    img = jax.device_put(jnp.asarray(
        blobs_image(h, w, num_blobs=max(8, (h*w)//65536), noise=8.0, seed=0)))
    @jax.jit
    def f(im):
        gst, weights, _ = turbo._stage_g(im, cfg, 2)
        ew4 = jnp.stack([weights[d] for d in range(4)], axis=-1).reshape(-1)
        la = jnp.stack([gst.L]*4, axis=-1).reshape(-1)
        import gseg_tpu.ops.grid_graph as gg
        lb = jnp.stack([gg.shift_plane(gst.L, dy, dx, -1) for dy, dx in gg.DIRS4], axis=-1).reshape(-1)
        live = jnp.isfinite(ew4) & (la != lb) & (lb >= 0)
        # run-dedup estimate: survivors after per-plane row-run dedup
        lo = jnp.where(live, jnp.minimum(la, lb), -1)
        hi = jnp.where(live, jnp.maximum(la, lb), -1)
        lo4 = lo.reshape(h, w, 4); hi4 = hi.reshape(h, w, 4); lv = live.reshape(h, w, 4)
        same = lv & jnp.roll(lv, 1, 1) & (lo4 == jnp.roll(lo4, 1, 1)) & (hi4 == jnp.roll(hi4, 1, 1))
        same = same.at[:, 0, :].set(False)
        runs = jnp.sum((lv & ~same).astype(jnp.int32))
        comps = jnp.sum((gst.L == jnp.arange(h*w, dtype=jnp.int32).reshape(h, w)).astype(jnp.int32))
        return jnp.sum(live.astype(jnp.int32)), runs, comps, gst.it
    live, runs, comps, it = f(img)
    print(f"live_slots={int(live)} run_candidates={int(runs)} comps={int(comps)} rounds={int(it)} v={h*w}", flush=True)

if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
