"""Quality-mode (wb16) gossip round-structure probe — CPU-valid.

The wb16 1080p rung measured 725 ms on chip vs 84.7 ms speed mode; the
bucket ramp forces one gossip round per bucket while the component count
sits above the v/GSEG_GATE_DIV_Q handoff gate. Per-round component counts,
bucket positions, and deduped boundary-pair counts are properties of the
PARTITION TRAJECTORY (backend-equal, sizes-scheme-independent), so this
probe runs the exact quality round recurrence one jit per round on the CPU
backend and prints, per round:

  round | bucket | components | unique boundary pairs | pairs vs pair caps

The pair column is the pair-extraction pool load IF stage 2 took over at
that round — it directly predicts (a) capacity overflow for a candidate
GSEG_GATE_DIV_Q and (b) the s2 entry cost (sorts are capacity-priced).

Run:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/probe_qrounds.py [H W]
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

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.ops import filters
from gseg_tpu.ops import grid_graph as gg
from gseg_tpu.utils.synthetic import blobs_image


def main(h=1080, w=1920, nb=16, content="blobs"):
    cfg = SegmentationConfig(k=300.0, min_size=100, weight_buckets=nb)
    v = h * w
    if content == "textured":
        from gseg_tpu.utils.synthetic import textured_image
        img = jnp.asarray(textured_image(h, w, seed=0))
    else:
        img = jnp.asarray(blobs_image(h, w, num_blobs=max(8, v // 65536),
                                      seed=0))
    max_sweeps = 4 * (h + w)

    @jax.jit
    def prep(im):
        smoothed = filters.gaussian_smooth(im, cfg.sigma)
        weights, _ = gg.edge_weight_planes(
            smoothed, cfg.connectivity, cfg.quantize_weight_bits)
        w8, eid8 = gg.incident_views(weights)
        thresholds = turbo.bucket_thresholds(weights, nb)
        return w8, eid8, thresholds

    w8, eid8, thresholds = prep(img)
    vid = jnp.arange(v, dtype=jnp.int32).reshape(h, w)

    gst = turbo.GossipState(
        L=vid, S=jnp.ones((h, w), jnp.int32),
        ID=jnp.zeros((h, w), jnp.float32),
        merged=jnp.bool_(True), it=jnp.int32(0), bucket=jnp.int32(0),
        flags=jnp.int32(0),
    )

    # One quality round, sizes="count" (the partition trajectory is
    # identical across sizes schemes — they differ only in how the exact
    # S is computed), closures=False (same fixpoints, fewer kernels).
    @jax.jit
    def qround(s):
        s2 = turbo._ground(
            s, w8, eid8, vid, cfg.k, cfg.min_size, "felz", max_sweeps,
            tau=thresholds[s.bucket], sizes="count", closures=False)
        more = s.bucket + 1 < nb
        return s2._replace(
            bucket=jnp.minimum(s.bucket + 1, nb - 1),
            merged=s2.merged | more)

    def pair_count(L):
        """Deduped cross-component boundary pair count (the pair-extraction
        pool load at a stage-2 handoff here), plus directed live edges."""
        Lf = np.asarray(L)
        pairs = set()
        directed = 0
        H, W = Lf.shape
        for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
            r0, r1 = max(0, -dy), H - max(0, dy)
            c0, c1 = max(0, -dx), W - max(0, dx)
            a = Lf[r0:r1, c0:c1]
            b = Lf[r0 + dy:r1 + dy, c0 + dx:c1 + dx]
            m = a != b
            directed += 2 * int(m.sum())
            lo = np.minimum(a[m], b[m]).astype(np.int64)
            hi = np.maximum(a[m], b[m]).astype(np.int64)
            pairs.update(np.unique(lo * v + hi).tolist())
        return len(pairs), directed

    gdq = turbo._gate_div_q()
    print(f"{h}x{w} v={v} nb={nb} gate=v/{gdq}={v // gdq}  "
          f"(pair caps: v/2={v // 2} v/6={v // 6})", flush=True)
    print("round bucket   comps    pairs  directed  sec", flush=True)
    fired = set()
    for r in range(1, 2 * nb + 8):
        t0 = time.time()
        gst = qround(gst)
        cnt = int(jnp.sum((gst.L == vid).astype(jnp.int32)))
        npairs, ndir = pair_count(gst.L)
        dt = time.time() - t0
        print(f"{r:5d} {int(gst.bucket):6d} {cnt:8d} {npairs:8d} "
              f"{ndir:9d} {dt:5.0f}", flush=True)
        # where each candidate GSEG_GATE_DIV_Q would exit the pixel loop
        for div in (2, 4, 8, 16, 32, 64):
            if div not in fired and r >= 2 and cnt <= v // div:
                fired.add(div)
                print(f"[gate v/{div} fires after round {r}: "
                      f"{npairs} pairs into stage 2, "
                      f"{nb - 1 - int(gst.bucket)} buckets left]",
                      flush=True)
        if not bool(gst.merged):
            print(f"[converged at round {r}]", flush=True)
            break
        if int(gst.flags):
            print(f"flags={int(gst.flags)}", flush=True)


if __name__ == "__main__":
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    content = sys.argv[3] if len(sys.argv) > 3 else "blobs"
    main(h, w, content=content)
