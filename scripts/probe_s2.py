"""Stage-2 per-round statistics probe (real chip).

Runs stage G + extract jitted, then iterates `_s2_round` one jit call per
round, printing per-round: live directed edges, live heads, hooks taken,
FROZEN components (min outgoing weight > own threshold — can never felz-
merge again; see models/turbo.py prune rule), and the prunable-edge
fraction. Sizes the static caps for the mid-phase prune+recompact.

Usage: python scripts/probe_s2.py [H W] [content]
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
from gseg_tpu.utils.synthetic import blobs_image, textured_image

INT32_MAX = np.iinfo(np.int32).max


def main(h=1080, w=1920, content="blobs"):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    v = h * w
    if content == "textured":
        img_np = textured_image(h, w, seed=0)
    else:
        img_np = blobs_image(h, w, num_blobs=max(8, v // 65536), seed=0)
    img = jax.device_put(jnp.asarray(img_np))

    @jax.jit
    def to_extract(im):
        gst, weights, thresholds = turbo._stage_g(im, cfg, 2)
        st, rm, r0 = turbo._extract_stage(gst, weights, cfg)
        return st, thresholds

    t0 = time.time()
    st, thresholds = to_extract(img)
    st.esrc.block_until_ready()
    print(f"[extract done in {time.time() - t0:.1f}s]", flush=True)

    comp_cap = max(v // 96, 16384)

    @jax.jit
    def stats(st):
        live = (st.esrc != st.edst) & jnp.isfinite(st.ew)
        k1 = jnp.where(live, st.esrc, INT32_MAX)
        kw = jnp.where(live, st.ew, jnp.inf)
        s_src, s_w = jax.lax.sort((k1, kw), num_keys=2)
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), s_src[1:] != s_src[:-1]]
        ) & (s_src != INT32_MAX)
        n_live = jnp.sum(live.astype(jnp.int32))
        n_heads = jnp.sum(head.astype(jnp.int32))
        # per-head min outgoing weight -> frozen bit in a V-table
        thr = st.IDf + jnp.float32(cfg.k) / jnp.maximum(
            st.SZf.astype(jnp.float32), 1.0
        )
        hsrc = jnp.where(head, s_src, v)
        hw = jnp.where(head, s_w, jnp.inf)
        frozen_t = jnp.zeros((v + 1,), jnp.bool_).at[hsrc].set(
            hw > thr[jnp.minimum(hsrc, v - 1)], mode="drop"
        )[:v]
        n_frozen = jnp.sum(frozen_t.astype(jnp.int32))
        small = st.SZf < cfg.min_size
        keep = live & (
            ~(frozen_t[st.esrc] & frozen_t[st.edst])
            | small[st.esrc]
        )
        n_keep = jnp.sum(keep.astype(jnp.int32))
        # heads surviving the prune
        kept_src = jnp.where(keep, st.esrc, INT32_MAX)
        ks = jax.lax.sort((kept_src,))[0]
        khead = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]]
        ) & (ks != INT32_MAX)
        n_kheads = jnp.sum(khead.astype(jnp.int32))
        return n_live, n_heads, n_frozen, n_keep, n_kheads

    @jax.jit
    def round_felz(st):
        return turbo._s2_round(st, v, comp_cap, cfg.k, cfg.min_size,
                               jnp.bool_(True), tau=thresholds[0])

    print(f"E_buf={st.esrc.shape[0]} comp_cap={comp_cap} v={v}")
    for r in range(12):
        n_live, n_heads, n_frozen, n_keep, n_kheads = (
            int(x) for x in stats(st)
        )
        print(
            f"round {r:2d}: live={n_live:8d} heads={n_heads:7d} "
            f"frozen={n_frozen:7d} keep={n_keep:8d} "
            f"kept_heads={n_kheads:7d}"
            f"  (live/V=1/{v // max(n_live, 1)}, "
            f"keep/V=1/{v // max(n_keep, 1)}, "
            f"kheads/V=1/{v // max(n_kheads, 1)})",
            flush=True,
        )
        st2 = round_felz(st)
        if not bool(st2.merged) and r > 0:
            print(f"felz converged after round {r}")
            break
        st = st2


if __name__ == "__main__":
    args = sys.argv[1:]
    h = int(args[0]) if len(args) > 0 else 1080
    w = int(args[1]) if len(args) > 1 else 1920
    content = args[2] if len(args) > 2 else "blobs"
    main(h, w, content)
