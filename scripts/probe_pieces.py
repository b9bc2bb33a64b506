"""Noise-free per-piece costs of a gossip round (real chip).

probe_rounds.py attributes round cost by fencing each piece, but the
~30 ms tunnel round trip swamps pieces under ~5 ms (several measured
negative). Here each piece runs N times inside ONE jit via a
carry-dependent fori_loop, so the fence cost amortizes to nothing and
the marginal per-iteration cost is exact.

Pieces (on the round-2 state of the 1080p bench image, where rounds are
most expensive):
  vertexmin   8-shift min over (w8, eid8) incident views
  maskchain   felz predicate + owner/pass/allow/hook masks + id_init
              (everything in _ground between compmin and the flood)
  compmin     Pallas compmin_gossip fixpoint
  flood       Pallas label_flood fixpoint (same-label allow approx)
  countsizes  flat counting scatter-add (_component_sizes)
  runsizes    run_extract + _sum_by_label at a given cap (the candidate
              replacement for countsizes/subsum in the peel rounds)
  subtree     Pallas subtree_sums convergecast on the round-1 dist field
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
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


def timeloop(name, fn, n, carry, consts=(), reps=3):
    """fn(carry, *consts) -> carry. consts are threaded as explicit jit
    ARGUMENTS (not closure constants): the axon tunnel compiles remotely
    and inlined multi-MB closure constants blow the request-size cap
    (HTTP 413 at 4K, round 5)."""
    def body(_, st):
        c, cs = st
        return fn(c, *cs), cs

    looped = jax.jit(
        lambda c, cs: jax.lax.fori_loop(0, n, body, (c, cs))[0])
    out = looped(carry, tuple(consts))
    fence(out if hasattr(out, "dtype") else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = looped(carry, tuple(consts))
        fence(out if hasattr(out, "dtype") else out[0])
        ts.append(time.perf_counter() - t0)
    # Subtract the measured dispatch+fence baseline (identity loop, same
    # carry): the ~30 ms tunnel round trip / n was silently inflating
    # every per-iter number by ~3 ms at n=10 (round-5 harness audit).
    per = max(min(ts) - _baseline(carry, consts), 0.0) / n * 1e3
    print(f"  {name}: {per:7.3f} ms/iter  (n={n})", flush=True)
    return per


_BASE_CACHE = {}


def _baseline(carry, consts):
    key = (getattr(carry, "shape", None), len(tuple(consts)))
    if key in _BASE_CACHE:
        return _BASE_CACHE[key]
    ident = jax.jit(lambda c, cs: (c, cs)[0])
    out = ident(carry, tuple(consts))
    fence(out if hasattr(out, "dtype") else out[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = ident(carry, tuple(consts))
        fence(out if hasattr(out, "dtype") else out[0])
        ts.append(time.perf_counter() - t0)
    _BASE_CACHE[key] = min(ts)
    return _BASE_CACHE[key]


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
    gst = turbo.GossipState(
        L=vid, S=jnp.ones((h, w), jnp.int32),
        ID=jnp.zeros((h, w), jnp.float32), merged=jnp.bool_(True),
        it=jnp.int32(0), bucket=jnp.int32(0), flags=jnp.int32(0),
    )
    ground = jax.jit(lambda s, w8_, eid8_: turbo._ground(
        s, w8_, eid8_,
        jnp.arange(v, dtype=jnp.int32).reshape(h, w),
        cfg.k, cfg.min_size, "felz", ms, sizes="count",
        closures=False))
    g1 = ground(gst, w8, eid8)
    g2 = ground(g1, w8, eid8)
    print(f"comps r1={int(jnp.sum((g1.L == vid).astype(jnp.int32)))} "
          f"r2={int(jnp.sum((g2.L == vid).astype(jnp.int32)))}", flush=True)

    for tag, g in (("r1", g1), ("r2", g2)):
        L, S, ID = g.L, g.S, g.ID

        # --- vertexmin (carry: L via a dependency trick - xor 0)
        def vmin_step(Lc, w8_, eid8_):
            vminw, veid, _ = turbo._vertex_min_outgoing(Lc, w8_, eid8_)
            # fold outputs back into the carry without changing it
            return Lc ^ (veid & 0)

        timeloop(f"{tag} vertexmin ", vmin_step, 20, L, (w8, eid8))

        # real vertexmin outputs for the downstream pieces
        vminw, veid, nbrL = jax.jit(
            turbo._vertex_min_outgoing)(L, w8, eid8)

        # --- compmin fixpoint (Pallas)
        from gseg_tpu.ops.pallas import gossip as pg

        def compmin_step(Lc, vminw_, veid_, S_):
            cw, ce, SZ, unconv, np_ = pg.compmin_gossip(
                Lc, vminw_, veid_, S_, ms, closures=False, phase="peel")
            return Lc ^ (ce & 0)

        timeloop(f"{tag} compmin   ", compmin_step, 8, L,
                 (vminw, veid, S))

        cw, ce, SZ, _, _ = jax.jit(
            lambda Lc, a, b, c: pg.compmin_gossip(
                Lc, a, b, c, ms, closures=False, phase="peel")
        )(L, vminw, veid, S)

        # --- mask chain: predicate + owner/pass/allow/hook + id_init
        def mask_step(IDc, SZ, cw, ce, nbrL, L, w8, eid8):
            kf = jnp.float32(cfg.k)
            SZf = SZ.astype(jnp.float32)
            my_ok = (cw - IDc) * SZf <= kf
            ID8 = jnp.stack(turbo._DENSE_COMM.shifts8(IDc, 0.0))
            SZ8 = jnp.stack(turbo._DENSE_COMM.shifts8(SZf, 0.0))
            owner8 = (nbrL != L[None]) & (w8 == cw[None]) & (eid8 == ce[None])
            pass8 = owner8 & my_ok[None] & ((cw[None] - ID8) * SZ8 <= kf)
            new_marks = []
            for dc, (dy, dx) in enumerate(gg.DIRS4):
                m = pass8[dc] | turbo._DENSE_COMM.shift(
                    pass8[dc + 4], dy, dx, False)
                new_marks.append(m)
            new_mark4 = jnp.stack(new_marks)
            allow = []
            for d in range(8):
                if d < 4:
                    am = new_mark4[d]
                else:
                    dy, dx = gg.DIRS4[d - 4]
                    am = turbo._DENSE_COMM.shift(
                        new_mark4[d - 4], -dy, -dx, False)
                allow.append((nbrL[d] == L) | am)
            allow8 = jnp.stack(allow)
            hook8 = allow8 & (nbrL != L[None])
            used_w8 = jnp.where(
                hook8, jnp.where(jnp.isfinite(w8), w8, 0.0), 0.0)
            id_init = jnp.maximum(IDc, jnp.max(used_w8, axis=0))
            bits = pg.pack_allow_bits(list(allow8))
            return IDc + (id_init * 0) + (bits & 0).astype(jnp.float32)

        timeloop(f"{tag} maskchain ", mask_step, 20, ID,
                 (SZ, cw, ce, nbrL, L, w8, eid8))

        # --- flood (same-label allow: converged -> measures per-call floor)
        @jax.jit
        def allow_bits_of(Lc):
            nbr = [gg.shift_plane(Lc, dy, dx, -1) for dy, dx in gg.DIRS8]
            bits = jnp.zeros_like(Lc)
            for d in range(8):
                bits = bits | ((nbr[d] == Lc).astype(jnp.int32) << d)
            return bits

        bits = allow_bits_of(L)

        def flood_step(Lc, bits_, ID_):
            Ln, IDn, unc, np_ = pg.label_flood(
                bits_, Lc, ID_, ms, closures=False, phase="peel",
                seed_mask=jnp.zeros_like(Lc, jnp.bool_))
            return jnp.minimum(Lc, Ln)

        timeloop(f"{tag} flood(cvg)", flood_step, 8, L, (bits, ID))

        # --- countsizes (flat scatter-add)
        def count_step(Lc):
            Sn, _ = turbo._component_sizes(Lc)
            return Lc ^ (Sn & 0)

        timeloop(f"{tag} countsizes", count_step, 10, L)

        # --- runsizes at a few caps
        from gseg_tpu.ops.pallas import extract as px

        lab0, cnt0, total0, ovf0 = jax.jit(
            functools.partial(px.run_extract, cap=v))(L)
        nruns = int(jnp.sum((lab0 != INT32_MAX).astype(jnp.int32)))
        print(f"  {tag} runs: {nruns} (V/{v // max(nruns, 1)}) "
              f"ovf={bool(ovf0)}", flush=True)
        for cap in (v // 2, v // 4):
            if nruns > cap:
                print(f"  {tag} runsizes cap=v/{v // cap}: SKIP "
                      f"(runs {nruns} > cap)", flush=True)
                continue

            def runs_step(Lc, cap=cap):
                lab, cnt, total, ovf = px.run_extract(Lc, cap)
                Sn, _ = turbo._sum_by_label(lab, cnt, h, w)
                return Lc ^ (Sn & 0)

            timeloop(f"{tag} runsizes v/{v // cap}", runs_step, 10, L)

    # --- subtree convergecast on the round-1 dist field (subsum scheme)
    dist0 = jnp.where(gst.L == vid, jnp.int32(0), turbo.BIGDIST)
    # regenerate round-1 allow bits + flood with dist to get a real dist
    g1d = jax.jit(lambda s, w8_, eid8_: turbo._ground(
        s, w8_, eid8_,
        jnp.arange(v, dtype=jnp.int32).reshape(h, w),
        cfg.k, cfg.min_size, "felz", ms,
        sizes="subsum", closures=False))(gst, w8, eid8)

    def subtree_step(Lc):
        vid_ = jnp.arange(Lc.size, dtype=jnp.int32).reshape(Lc.shape)
        Sn, unc = turbo._subtree_sizes(
            Lc, jnp.where(Lc == vid_, 0, 1), ms)
        return Lc ^ (Sn & 0)

    # NOTE: the fake dist makes every non-root a depth-1 child of nothing -
    # the fixpoint converges immediately; measures the per-call floor, not
    # a real convergecast. Real r1 subsum round cost comes from
    # probe_rounds.py round1 (subsum).
    timeloop("r1 subtree(floor)", subtree_step, 8, g1d.L)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
