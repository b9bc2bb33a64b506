"""DPP Superpixel Hierarchy, TPU-native (compact supervertex rounds).

Rebuild of the reference's superpixel variant (branch superpixel_gpu;
Report.pdf p.4 §3.2.4, after Wei et al. "Superpixel Hierarchy" [15]): the
FastMST hierarchy pipeline with edge weights RECOMPUTED every Boruvka round
as

    w(u, v) = sobel_edge_strength(u, v) * || avg_color(Cu) - avg_color(Cv) ||

where Sobel replaces the paper's Structured Forests (the reference measured
SF at 20x the cost of the whole segmentation, with no GPU implementation).
Rounds merge every component along its min outgoing edge (pure Boruvka, no
Felzenszwalb predicate), one hierarchy level per round; callers pick a
level (reference benchmarks use level 4, report-extract.txt:651-658).

TPU-first redesign (v2, mirroring models/fastmst.py): the only V-scale
round is the dense round 1; rounds 2+ run on a compacted edge list.
Per-pair dedup stays LOSSLESS under reweighting because the color term is
common to every parallel edge of a pair — the pair's min-weight edge in
ANY round is its min-STRENGTH edge, so extraction keeps the (strength,
eid)-min representative. Per-component size and average color are
maintained as (V,)-indexed root-slot arrays (the reference uses dedicated
kernels + thrust::inclusive_scan_by_key); merging accumulates them with
compact-width scatter-adds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SegmentationConfig
from ..ops import filters
from ..ops import grid_graph as gg
from ..ops.primitives import (
    INT32_MAX,
    pointer_double,
    remove_mutual_hooks,
    segment_sum,
)
from . import turbo


class SPCompact(NamedTuple):
    esrc: jnp.ndarray   # (E,) int32 current root of endpoint a
    edst: jnp.ndarray   # (E,) int32
    estr: jnp.ndarray   # (E,) float32 Sobel strength (+inf dead)
    eeid: jnp.ndarray   # (E,) int32 canonical edge id (tie-break)
    SZf: jnp.ndarray    # (V,) int32 sizes at root slots
    CSf: jnp.ndarray    # (V, 3) float32 color sums at root slots
    fin: jnp.ndarray    # (C,) int32 current root of each initial root
    merged: jnp.ndarray
    it: jnp.ndarray
    flags: jnp.ndarray


def _strength_planes(image: jnp.ndarray, cfg: SegmentationConfig):
    """Per canonical edge plane: mean of endpoint Sobel magnitudes."""
    sob = filters.sobel_magnitude(filters.gaussian_smooth(image, cfg.sigma))
    s = []
    for dy, dx in gg.DIRS4:
        nb = gg.shift_plane(sob, dy, dx, 0.0)
        s.append(0.5 * (sob + nb))
    return jnp.stack(s)  # (4, H, W), eid order: v*4 + d


def _round1_dense(image: jnp.ndarray, cfg: SegmentationConfig):
    """Dense pure-Boruvka round 1: initial weights are strength x pixel
    color distance; every vertex hooks along its min edge."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    smoothed = filters.gaussian_smooth(image, cfg.sigma)
    weights, valid = gg.edge_weight_planes(smoothed, cfg.connectivity)
    strength = _strength_planes(image, cfg)
    w0 = jnp.where(valid, strength * weights, jnp.inf)
    w8, eid8 = gg.incident_views(w0)
    vid = jnp.arange(v, dtype=jnp.int32).reshape(h, w)

    vminw = jnp.min(w8, axis=0)
    cand = jnp.where(w8 == vminw[None], eid8, INT32_MAX)
    veid = jnp.min(cand, axis=0)
    ok = jnp.isfinite(vminw)  # pure Boruvka: hook whenever possible

    a, b = gg.edge_endpoints(veid.reshape(-1), w)
    other = jnp.where(
        ok.reshape(-1), a + b - vid.reshape(-1), vid.reshape(-1)
    )
    succ = remove_mutual_hooks(other)
    used = succ != vid.reshape(-1)
    parent1 = pointer_double(succ)

    size1 = segment_sum(jnp.ones((v,), jnp.int32), parent1, v)
    csum1 = jnp.zeros((v, smoothed.shape[-1]), jnp.float32).at[
        parent1
    ].add(smoothed.reshape(v, -1), mode="drop")
    return (parent1.reshape(h, w), size1, csum1, strength,
            jnp.any(used), vid)


def _extract_compact(L1, strength, v: int):
    """Dense planes -> compact pair-deduped edge list carrying strengths.

    Dedup keeps the min-(strength, eid) edge per unordered pair — exactly
    the edge that realizes the pair's min weight in every future round."""
    h, w = L1.shape
    # 1.25 V: measured distinct pairs after an all-hook round-1 on ladder
    # content are 1.05-1.10 V (see models/fastmst.py _extract_compact).
    pair_cap = max(v + v // 4, 16384)
    comp_cap = max(v // 2, 16384)

    st4 = jnp.stack([strength[d] for d in range(4)], axis=-1).reshape(-1)
    la = jnp.stack([L1] * 4, axis=-1).reshape(-1)
    lb = jnp.stack(
        [gg.shift_plane(L1, dy, dx, -1) for dy, dx in gg.DIRS4], axis=-1
    ).reshape(-1)
    # validity: a slot is a real edge iff the neighbor exists (lb >= 0).
    eid4 = jnp.arange(4 * v, dtype=jnp.int32)
    live4 = (la != lb) & (lb >= 0)
    lo = jnp.where(live4, jnp.minimum(la, lb), INT32_MAX)
    hi = jnp.where(live4, jnp.maximum(la, lb), INT32_MAX)
    st4 = jnp.where(live4, st4, jnp.inf)
    pm, plo, phi, ps, pe, pair_ovf = turbo._chunked_pair_extract(
        lo, hi, st4, eid4, pair_cap
    )
    plo = jnp.where(pm, plo, 0)
    phi = jnp.where(pm, phi, 0)
    ps = jnp.where(pm, ps, jnp.inf)
    esrc = jnp.concatenate([plo, phi])
    edst = jnp.concatenate([phi, plo])
    estr = jnp.concatenate([ps, ps])
    eeid = jnp.concatenate([pe, pe])

    srt_src = jax.lax.sort(
        (jnp.where(jnp.isfinite(estr), esrc, INT32_MAX),)
    )[0]
    rhead = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), srt_src[1:] != srt_src[:-1]]
    ) & (srt_src != INT32_MAX)
    rm, (r0_arr,), root_ovf = turbo._select_compact(rhead, [srt_src],
                                                    comp_cap)
    r0 = jnp.where(rm, r0_arr, v)
    flags = (
        jnp.where(pair_ovf, jnp.int32(turbo.FLAG_PAIR_OVERFLOW),
                  jnp.int32(0))
        | jnp.where(root_ovf, jnp.int32(turbo.FLAG_COMP_OVERFLOW),
                    jnp.int32(0))
    )
    return esrc, edst, estr, eeid, jnp.where(rm, r0_arr, 0), rm, r0, flags


def _sp_round(st: SPCompact, v: int, comp_cap: int) -> SPCompact:
    """One compact pure-Boruvka round with reweighting.

    The DPP schedule of models/turbo.py `_s2_round` (sort by (component,
    w, eid), run-head min, compact-space pointer doubling, hook-sink
    labels) with the Felzenszwalb predicate replaced by always-merge and
    size/color-sum maintenance."""
    esrc, edst, estr, eeid = st.esrc, st.edst, st.estr, st.eeid
    live = (esrc != edst) & jnp.isfinite(estr)
    avg = st.CSf / jnp.maximum(st.SZf, 1).astype(jnp.float32)[:, None]
    da = avg[esrc] - avg[edst]
    ew = jnp.where(
        live, estr * jnp.sqrt(jnp.sum(da * da, axis=-1)), jnp.inf
    )
    k1 = jnp.where(live, esrc, INT32_MAX)
    s_src, s_w, s_eid, s_dst = jax.lax.sort(
        (k1, ew, eeid, edst), num_keys=3
    )
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), s_src[1:] != s_src[:-1]]
    ) & (s_src != INT32_MAX)
    hm, (hsrc, hw, hdst), head_ovf = turbo._select_compact(
        head, [s_src, s_w, s_dst], comp_cap
    )

    succ = jnp.where(hm, hdst, hsrc)  # always merge
    hsrc_safe = jnp.where(hm, hsrc, v)
    iota = jnp.arange(v, dtype=jnp.int32)
    S = iota.at[hsrc_safe].set(succ, mode="drop")
    s2 = S[succ]
    mutual = (s2 == hsrc) & (succ != hsrc)
    succ = jnp.where(mutual & (hsrc < succ), hsrc, succ)

    cap = hsrc.shape[0]
    cidx = jnp.arange(cap, dtype=jnp.int32)
    hidx = jnp.full((v,), INT32_MAX, jnp.int32).at[hsrc_safe].set(
        cidx, mode="drop"
    )
    csucc_raw = hidx[jnp.where(hm, succ, 0)]
    csucc = jnp.where(
        hm & (succ != hsrc) & (csucc_raw != INT32_MAX), csucc_raw, cidx
    )
    max_doubles = max(int(cap).bit_length() + 1, 4)
    croot, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < max_doubles),
        lambda c: (c[0][c[0]], jnp.any(c[0][c[0]] != c[0]),
                   c[2] + jnp.int32(1)),
        (csucc, jnp.bool_(True), jnp.int32(0)),
    )
    nr = hsrc[croot]
    changed = hm & (nr != hsrc)

    M = iota.at[hsrc_safe].set(nr, mode="drop")
    tgt = jnp.where(changed, nr, v)
    SZf = st.SZf.at[tgt].add(jnp.where(changed, st.SZf[hsrc], 0),
                             mode="drop")
    CSf = st.CSf.at[tgt].add(
        jnp.where(changed[:, None], st.CSf[hsrc], 0.0), mode="drop"
    )
    flags = st.flags | jnp.where(
        head_ovf, jnp.int32(turbo.FLAG_COMP_OVERFLOW), jnp.int32(0)
    )
    return SPCompact(
        esrc=M[esrc], edst=M[edst], estr=st.estr, eeid=st.eeid,
        SZf=SZf, CSf=CSf, fin=M[st.fin], merged=jnp.any(changed),
        it=st.it + jnp.int32(1), flags=flags,
    )


def _recompact(st: SPCompact, cap):
    o1, o2, ostr, oe, ovf = turbo._pair_dedup(
        st.esrc, st.edst, st.estr, st.eeid, cap
    )
    return st._replace(
        esrc=o1, edst=o2, estr=jnp.where(jnp.isfinite(ostr), ostr, jnp.inf),
        eeid=oe,
        flags=st.flags | jnp.where(
            ovf, jnp.int32(turbo.FLAG_RECOMPACT_OVERFLOW), jnp.int32(0)),
    )


def _run_rounds(image, cfg: SegmentationConfig, nrounds: int):
    """Round 1 dense + `nrounds` compact rounds, recompacting the edge
    buffers 2x smaller after the first compact round (component count at
    least halves every pure-Boruvka round).
    Returns (L1 plane, st, fins (max(nrounds,1), C), rm, r0)."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    comp_cap = max(v // 2, 16384)
    L1, size1, csum1, strength, merged1, vid = _round1_dense(image, cfg)
    esrc, edst, estr, eeid, fin, rm, r0, xflags = _extract_compact(
        L1, strength, v
    )
    st = SPCompact(
        esrc=esrc, edst=edst, estr=estr, eeid=eeid, SZf=size1, CSf=csum1,
        fin=fin, merged=merged1, it=jnp.int32(0), flags=xflags,
    )
    fins0 = jnp.zeros((max(nrounds, 1), fin.shape[0]), jnp.int32)
    if nrounds == 0:
        return L1, st, fins0, rm, r0

    # round 2 at entry capacity, then shrink the buffers (static shapes:
    # the recompaction changes array sizes, so it lives between loops).
    st = jax.lax.cond(
        st.merged, lambda x: _sp_round(x, v, comp_cap), lambda x: x, st
    )
    fins0 = fins0.at[0].set(st.fin)
    st = _recompact(st, max(v // 2, 16384))

    def body(i, carry):
        s, fins = carry
        s = jax.lax.cond(
            s.merged, lambda x: _sp_round(x, v, comp_cap), lambda x: x, s
        )
        fins = fins.at[i].set(s.fin)
        return s, fins

    st, fins = jax.lax.fori_loop(1, nrounds, body, (st, fins0))
    return L1, st, fins, rm, r0


def _render(L1, fin, rm, r0, h, w):
    """Root map -> (H, W) labels by seed scatter + value flood over the
    tiny-diameter round-1 components."""
    v = h * w
    vid2d = jnp.arange(v, dtype=jnp.int32).reshape(h, w)
    seed = jnp.where(L1 == vid2d, L1, INT32_MAX).reshape(-1)
    seed = seed.at[jnp.where(rm, r0, v)].set(fin, mode="drop")
    seed = seed.reshape(h, w)
    ms = 4 * (h + w)
    if turbo._use_pallas():
        from ..ops.pallas import gossip as pg

        return pg.value_flood(L1, seed, ms)[:2]
    return turbo._value_flood(L1, seed, ms)


def segment_superpixel_hierarchy_impl(image, cfg: SegmentationConfig):
    h, w = image.shape[0], image.shape[1]
    nrounds = max(cfg.max_iters - 1, 1)
    L1, st, fins, rm, r0 = _run_rounds(image, cfg, nrounds)

    def render(fin_l):
        return _render(L1, fin_l, rm, r0, h, w)

    levels, unconvs = jax.lax.map(render, fins)
    vid2d = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    out = jnp.concatenate([vid2d[None], L1[None], levels], axis=0)
    flags = st.flags | jnp.where(
        jnp.any(unconvs), jnp.int32(turbo.FLAG_GOSSIP_UNCONVERGED),
        jnp.int32(0),
    )
    return out, levels[nrounds - 1], flags


segment_superpixel_hierarchy_flagged = jax.jit(
    segment_superpixel_hierarchy_impl, static_argnames=("cfg",)
)


def segment_superpixel_hierarchy(image, cfg: SegmentationConfig):
    """Full superpixel hierarchy: (levels (max_iters+1, H, W), final).

    Level i has (roughly) half the superpixels of level i-1; the hierarchy
    bottoms out at a single component."""
    levels, final, flags = segment_superpixel_hierarchy_flagged(image, cfg)
    _check(flags, cfg)
    return levels, final


def segment_superpixel_impl(image, cfg: SegmentationConfig):
    h, w = image.shape[0], image.shape[1]
    lvl = cfg.hierarchy_levels if cfg.hierarchy_levels > 0 else 4
    lvl = min(lvl, cfg.max_iters)
    L1, st, _fins, rm, r0 = _run_rounds(image, cfg, max(lvl - 1, 0))
    if lvl == 0:
        return (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w),
                jnp.int32(0))
    if lvl == 1:
        return L1, st.flags
    labels, unconv = _render(L1, st.fin, rm, r0, h, w)
    flags = st.flags | jnp.where(
        unconv, jnp.int32(turbo.FLAG_GOSSIP_UNCONVERGED), jnp.int32(0)
    )
    return labels, flags


segment_superpixel_flagged = jax.jit(
    segment_superpixel_impl, static_argnames=("cfg",)
)


def _check(flags, cfg):
    flags = int(flags)
    if flags and cfg.on_overflow == "raise":
        raise RuntimeError(
            "superpixel capacity/budget violation: "
            f"{turbo.describe_flags(flags)}"
        )


def segment_superpixel(image, cfg: SegmentationConfig) -> jnp.ndarray:
    """Single level of the superpixel hierarchy, selected by
    cfg.hierarchy_levels (reference benchmark convention: level 4).

    Runs exactly `level` Boruvka rounds — identical to
    segment_superpixel_hierarchy(...)[0][level] without computing the
    remaining rounds or materializing the level stack."""
    labels, flags = segment_superpixel_flagged(image, cfg)
    _check(flags, cfg)
    return labels
