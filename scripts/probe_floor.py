"""Decompose the fixpoint-call FLOOR (zero-pass overhead), real chip.

probe_pieces measured flood(cvg) — a label_flood whose seed mask is all
zeros, i.e. ZERO strip passes — at ~4.0 ms @1080p. That cannot be
bandwidth (pad+unpad of 4 fields is ~0.3 ms at v5e HBM speeds), so this
probe attributes it:

  pads        jnp.pad of the same 4 fields + slice back (no fixpoint)
  scans       the (nstrips,) activity schedule ops on top of pads
  flood0      full zero-pass label_flood call (seed_mask = zeros)
  compmin0    zero-pass compmin_gossip call (idle=True)
  floodpad    label_flood given PRE-PADDED fields would skip the pad
              cost entirely — modeled here as pads-subtracted flood0

If flood0 >> pads + scans, the overhead is in the while_loop / barrier /
dispatch structure, and "keep fields padded across the peel stage" is
the wrong fix; if flood0 ~= pads (+ scans), fusing pads across the
stage's 2+ fixpoint calls per round is worth ~one floor per call.

Usage: python scripts/probe_floor.py [h w]   (defaults 1080 1920)
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
from gseg_tpu.ops.pallas import gossip as pg
from gseg_tpu.utils.synthetic import blobs_image


def fence(x):
    x = jnp.asarray(x).astype(jnp.float32)
    return float(jnp.max(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeloop(name, looped, carry, n, consts=(), reps=3):
    # consts are explicit jit args, not closure constants: the axon
    # tunnel compiles remotely and inlined multi-MB constants blow its
    # request-size cap (HTTP 413 at 4K, round 5).
    out = looped(carry, tuple(consts))
    fence(out if hasattr(out, "dtype") else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = looped(carry, tuple(consts))
        fence(out if hasattr(out, "dtype") else out[0])
        ts.append(time.perf_counter() - t0)
    # Subtract the measured dispatch+fence baseline (identity jit, same
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
    n = 10

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
    L, ID = g1.L, g1.ID

    @jax.jit
    def allow_bits_of(Lc):
        nbr = [gg.shift_plane(Lc, dy, dx, -1) for dy, dx in gg.DIRS8]
        bits = jnp.zeros_like(Lc)
        for d in range(8):
            bits = bits | ((nbr[d] == Lc).astype(jnp.int32) << d)
        return bits
    bits = allow_bits_of(L)

    # the exact shapes _step_fixpoint would use for the flood
    t = pg._pick_t(w, "peel")
    wp = -(-w // 128) * 128
    s_rows = pg._pick_skip_rows(wp, h, 1, 2, t)
    hp = -(-h // s_rows) * s_rows
    nstrips = hp // s_rows
    print(f"shape {h}x{w}: t={t} s_rows={s_rows} nstrips={nstrips}",
          flush=True)

    # --- pads: pad 3 fields in (1 ro + 2 rw), slice 2 back out
    def pads_step(Lc, bits, ID):
        bp = pg._pad_field(bits, 0, t, hp, wp)
        lp = pg._pad_field(Lc, jnp.iinfo(jnp.int32).max, t, hp, wp)
        ip = pg._pad_field(ID, 0.0, t, hp, wp)
        lo = lp[t:t + h, :w]
        io = ip[t:t + h, :w]
        return jnp.minimum(Lc, lo + (bp[t:t + h, :w] & 0)
                           + (io.astype(jnp.int32) & 0))

    def _mkloop(step):
        def body(_, st):
            c, cs = st
            return step(c, *cs), cs
        return jax.jit(lambda c, cs: jax.lax.fori_loop(
            0, n, body, (c, cs))[0])

    timeloop("pads      ", _mkloop(pads_step), L, n, (bits, ID))

    # --- scans: pads + the activity-schedule ops
    def scans_step(Lc, bits, ID):
        mz = jnp.zeros((h, w), jnp.bool_)
        m = jnp.pad(mz, ((0, hp - h), (0, wp - w)))
        msk = jnp.max(m.reshape(nstrips, -1).astype(jnp.int32), axis=1)
        act0 = msk | jnp.concatenate(
            [msk[1:], jnp.zeros((1,), jnp.int32)]
        ) | jnp.concatenate([jnp.zeros((1,), jnp.int32), msk[:-1]])
        ia = jnp.arange(nstrips, dtype=jnp.int32)
        a = (act0 > 0).astype(jnp.int32)
        ord_ = jnp.cumsum(a) - a
        pidx = jnp.where(a > 0, ia, -1)
        prv = jax.lax.associative_scan(jnp.maximum, pidx)
        return pads_step(Lc, bits, ID) + (jnp.max(act0 + ord_ + prv) & 0)

    timeloop("pads+scans", _mkloop(scans_step), L, n, (bits, ID))

    # --- flood0: the full zero-pass label_flood
    def flood0_step(Lc, bits, ID):
        Ln, IDn, unc, np_ = pg.label_flood(
            bits, Lc, ID, ms, closures=False, phase="peel",
            seed_mask=jnp.zeros_like(Lc, jnp.bool_))
        return jnp.minimum(Lc, Ln)

    timeloop("flood0    ", _mkloop(flood0_step), L, n, (bits, ID))

    # --- compmin0: zero-pass compmin (idle=True)
    vminw, veid, _ = jax.jit(
        turbo._vertex_min_outgoing)(L, w8, eid8)
    S = g1.S

    def compmin0_step(Lc, vminw, veid, S):
        cw, ce, SZ, unconv, np_ = pg.compmin_gossip(
            Lc, vminw, veid, S, ms, closures=False, phase="peel",
            idle=jnp.bool_(True))
        return Lc ^ (ce & 0)

    timeloop("compmin0  ", _mkloop(compmin0_step), L, n,
             (vminw, veid, S))

    # --- one-pass flood for contrast (all strips active once):
    # seed one hook pixel per strip so every strip runs exactly pass 1.
    seed = jnp.zeros((h, w), jnp.bool_).at[::max(s_rows, 1), 0].set(True)

    def flood1_step(Lc, bits, ID, seed):
        Ln, IDn, unc, np_ = pg.label_flood(
            bits, Lc, ID, ms, closures=False, phase="peel",
            seed_mask=seed)
        return jnp.minimum(Lc, Ln)

    timeloop("flood1pass", _mkloop(flood1_step), L, n, (bits, ID, seed))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    if os.environ.get("GSEG_INTERPRET") == "1":  # CPU smoke (timings moot)
        from jax.experimental import pallas as _pl  # noqa: F401
        from jax.experimental.pallas import tpu as _pltpu

        with _pltpu.force_tpu_interpret_mode():
            main(*args)
    else:
        main(*args)
