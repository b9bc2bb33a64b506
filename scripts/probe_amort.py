"""RT-immune stage/round/piece attribution of turbo @1080p (real chip).

Protocol (supersedes probe_pieces.py, whose per-iter numbers INCLUDE the
~30 ms tunnel fence round trip divided by n — at n=8 that's a +3.75 ms
floor under every piece; countsizes measured ~free once corrected):

- each target runs inside ONE jit as `fori_loop(0, n, body, c)` with n a
  TRACED argument — one executable serves every n, so
  (t(n_big) - t(n_small)) / (n_big - n_small) cancels dispatch + fence
  EXACTLY (same program, same transfer, different trip count only).
- carry c is a () int32; inputs get a fake dependency via `x | (c & 0)`
  (broadcast), outputs fold back via `c ^ (reduce(out) & 0)` — reductions
  can't be slice-narrowed, so nothing is DCE'd (same trick the measured
  probe_pieces pattern relies on; empirically XLA does not fold
  and(dyn, 0)).

Targets: the four pipeline stages, each production ground round
(r0->r1, r1->r2 subsum AND count), both rlist rounds, and the suspect
pieces inside round 2.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from gseg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models import turbo
from gseg_tpu.ops import filters
from gseg_tpu.ops import grid_graph as gg
from gseg_tpu.utils.synthetic import blobs_image

INT32_MAX = turbo.INT32_MAX


def fence(x):
    x = jnp.asarray(x).astype(jnp.float32)
    return float(jnp.max(jnp.where(jnp.isfinite(x), x, 0.0)))


def fold(c, *outs):
    for o in outs:
        o = jnp.asarray(o)
        if o.dtype == jnp.bool_:
            o = o.astype(jnp.int32)
        if o.dtype in (jnp.float32, jnp.float64):
            r = jnp.max(jnp.where(jnp.isfinite(o), o, 0.0)).astype(jnp.int32)
        else:
            r = jnp.max(o).astype(jnp.int32)
        c = c ^ (r & 0)
    return c


def timeloop(name, body, n_small=4, n_big=24, reps=4):
    looped = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, body, c))
    c0 = jnp.int32(0)
    fence(looped(c0, n_small))  # compile + warm

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(looped(c0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s, t_b = run(n_small), run(n_big)
    per = (t_b - t_s) / (n_big - n_small) * 1e3
    print(f"  {name:22s}: {per:8.3f} ms/iter  "
          f"(n={n_small}->{n_big})", flush=True)
    return per


def main(h=1080, w=1920):
    cfg = SegmentationConfig(k=300.0, min_size=100)
    v = h * w
    img = jax.device_put(jnp.asarray(
        blobs_image(h, w, num_blobs=max(8, v // 65536), noise=8.0, seed=0)))
    ms = 4 * (h + w)

    @jax.jit
    def prep(im):
        sm = filters.gaussian_smooth(im, cfg.sigma)
        weights, _ = gg.edge_weight_planes(sm, cfg.connectivity, 0)
        w8, eid8 = gg.incident_views(weights)
        return weights, w8, eid8

    weights, w8, eid8 = prep(img)
    fence(w8[0])
    vid = jnp.arange(v, dtype=jnp.int32).reshape(h, w)

    # --- stage-level ------------------------------------------------------
    def prep_body(_, c):
        sm = filters.gaussian_smooth(img + jnp.float32(c & 0), cfg.sigma)
        wts, _ = gg.edge_weight_planes(sm, cfg.connectivity, 0)
        return fold(c, wts)

    timeloop("prep(filter+graph)", prep_body)

    def stageg_body(_, c):
        g, wts, thr = turbo._stage_g(img + jnp.float32(c & 0), cfg, 2)
        return fold(c, g.L, g.S, g.ID, g.flags)

    timeloop("stage_g(total)", stageg_body, n_small=2, n_big=10)

    gst, weights2, thresholds = jax.jit(
        lambda im: turbo._stage_g(im, cfg, 2))(img)
    fence(gst.L)

    def extract_body(_, c):
        g = gst._replace(L=gst.L | (c & 0))
        st, rm, r0 = turbo._extract_stage(g, weights, cfg)
        return fold(c, st.esrc, st.edst, st.ew, st.SZf, st.fin, rm, r0)

    timeloop("extract_stage", extract_body)

    st0, rm0, r00 = jax.jit(
        lambda g: turbo._extract_stage(g, weights, cfg))(gst)
    fence(st0.esrc)
    nb = max(cfg.weight_buckets, 1)

    def s2_body(_, c):
        s = st0._replace(esrc=st0.esrc | (c & 0))
        s2 = turbo._s2_stage(s, v, cfg, thresholds, nb)
        return fold(c, s2.fin, s2.SZf, s2.flags)

    timeloop("s2_stage", s2_body)

    st2 = jax.jit(
        lambda s: turbo._s2_stage(s, v, cfg, thresholds, nb))(st0)
    fence(st2.fin)

    def final_body(_, c):
        g = gst._replace(L=gst.L | (c & 0))
        lab, unc = turbo._final_map(g, st2, rm0, r00, ms, closures=False)
        return fold(c, lab, unc)

    timeloop("final_map", final_body)

    # --- per-round --------------------------------------------------------
    g0 = turbo.GossipState(
        L=vid, S=jnp.ones((h, w), jnp.int32),
        ID=jnp.zeros((h, w), jnp.float32), merged=jnp.bool_(True),
        it=jnp.int32(0), bucket=jnp.int32(0), flags=jnp.int32(0),
    )

    def mk_ground(gfix, sizes, rl=None, nm=""):
        def body(_, c):
            s = gfix._replace(L=gfix.L | (c & 0))
            if sizes == "rlist":
                out, rl2 = turbo._ground(
                    s, w8, eid8, vid, cfg.k, cfg.min_size, "felz", ms,
                    rlist=rl, sizes="rlist", closures=False)
                return fold(c, out.L, out.S, out.ID, rl2)
            out = turbo._ground(
                s, w8, eid8, vid, cfg.k, cfg.min_size, "felz", ms,
                sizes=sizes, closures=False)
            return fold(c, out.L, out.S, out.ID)
        return body

    ground_sub = jax.jit(lambda s: turbo._ground(
        s, w8, eid8, vid, cfg.k, cfg.min_size, "felz", ms, sizes="subsum",
        closures=False))
    g1 = ground_sub(g0)
    g2 = ground_sub(g1)
    fence(g2.L)
    for tag, g in (("r0->r1", g0), ("r1->r2", g1)):
        timeloop(f"round {tag} subsum", mk_ground(g, "subsum"))
        timeloop(f"round {tag} count ", mk_ground(g, "count"))

    rcap = max(v // 4, 16384)
    rlist, _ = turbo._build_rlist(g2.L, rcap)
    ground_rl = jax.jit(lambda s, rl: turbo._ground(
        s, w8, eid8, vid, cfg.k, cfg.min_size, "felz", ms, rlist=rl,
        sizes="rlist", closures=False))
    g3, rl3 = ground_rl(g2, rlist)
    fence(g3.L)
    timeloop("round r2->r3 rlist", mk_ground(g2, "rlist", rlist))
    timeloop("round r3->r4 rlist", mk_ground(g3, "rlist", rl3))

    # --- pieces inside round 2 (the expensive peel round) ------------------
    from gseg_tpu.ops.pallas import gossip as pg

    L1, S1, ID1 = g1.L, g1.S, g1.ID

    def vmin_body(_, c):
        Lc = L1 | (c & 0)
        vminw, veid, nbrL = turbo._vertex_min_outgoing(Lc, w8, eid8)
        return fold(c, vminw, veid)

    timeloop("r2 vertexmin", vmin_body)

    vminw, veid, nbrL = jax.jit(
        lambda Lc: turbo._vertex_min_outgoing(Lc, w8, eid8))(L1)
    fence(veid)

    def compmin_body(_, c):
        Lc = L1 | (c & 0)
        cw, ce, SZ, unconv, np_ = pg.compmin_gossip(
            Lc, vminw, veid, S1, ms, closures=False, phase="peel")
        return fold(c, cw, ce, SZ)

    timeloop("r2 compmin", compmin_body)

    def count_body(_, c):
        Lc = L1 | (c & 0)
        Sn, _ = turbo._component_sizes(Lc)
        return fold(c, Sn)

    timeloop("r2 countsizes", count_body)

    def subtree_body(_, c):
        # real dist field from the subsum round's flood
        Lc = g2.L | (c & 0)
        d = jnp.where(Lc == vid, jnp.int32(0), turbo.BIGDIST)
        # NOT the converged dist — measures parent-dir build + 1st sweeps
        Sn, unc = turbo._subtree_sizes(Lc, d, ms)
        return fold(c, Sn, unc)

    timeloop("r2 subtree(d0)", subtree_body)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
