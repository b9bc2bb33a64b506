"""DPP/FastMST segmentation path, TPU-native.

Rebuild of the reference's data-parallel-primitive variants: the ground-up
and ported FastMST "DPP Segmentation Hierarchies" (branches
boruvka_fastMST_fixingSegments_v1 / fastmst_segment; Report.pdf p.3-4
§3.2.2-3.2.3, after Vineet et al. HPG'09). The reference maps each Boruvka
round onto Thrust primitives: radix sort of packed 64-bit edge keys
(26b src | 26b dst | 12b weight), segmented min via a custom scan,
pointer jumping, supervertex renumbering (sort + adjacent-diff + prefix
scan), and edge-list relabel/compaction.

TPU-first redesign:
  - Packed 64-bit keys are replaced by a multi-operand `jax.lax.sort` over
    (component, weight, edge-id) — full float32 weights, no 2^26-pixel
    capacity cap and no 12-bit weight quantization (SURVEY.md §6 hard parts).
  - Segmented min = sorted-run head detection (a boundary mask after the
    sort) — the custom segmented scan disappears.
  - Compaction keeps XLA-static shapes: live edges are partitioned to the
    front of fixed-capacity buffers by sorting on a liveness key (the
    prefix-scan + scatter idiom of `ops.primitives.compact_indices` inlined
    into the sort).
  - Self-edge removal after contraction = invalidation by weight=+inf, which
    the next round's sort pushes past every live edge.
  - The round loop lives in `lax.fori_loop`/`lax.while_loop` on device.

Merge semantics (min outgoing edge per component, Felzenszwalb predicate,
tie-break by canonical edge id, mutual-hook removal, Int/size updates) are
IDENTICAL to models/atomic_boruvka.py and the sequential oracle — the three
implementations must produce byte-identical label maps; only the schedule
differs (sort-based vs scatter-based segmented min), mirroring the
reference's N1-vs-N5 relationship.
"""

from __future__ import annotations

import functools
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
    segment_max,
    segment_sum,
)


class EdgeSoA(NamedTuple):
    """Directed edge list, static capacity. Invalid slots: w=+inf."""
    src: jnp.ndarray   # (E,) int32
    dst: jnp.ndarray   # (E,) int32
    w: jnp.ndarray     # (E,) float32
    eid: jnp.ndarray   # (E,) int32 canonical undirected edge id (tie-break)


class FastMSTState(NamedTuple):
    parent: jnp.ndarray
    size: jnp.ndarray
    intdiff: jnp.ndarray
    edges: EdgeSoA
    merged: jnp.ndarray
    it: jnp.ndarray


def build_directed_edges(weights: jnp.ndarray, valid: jnp.ndarray) -> EdgeSoA:
    """Directed edge list (both orientations) from canonical planes.

    The reference's Fast Graph Creation emits a compressed adjacency list
    with each edge stored in both endpoint rows (Report.pdf p.3 §3.2.1);
    here both orientations are two static interleaves of the canonical
    planes. Capacity 8*H*W, invalid slots w=+inf.
    """
    src, dst, w, va = gg.edge_list(weights, valid)
    e = src.shape[0]
    eid = jnp.arange(e, dtype=jnp.int32)
    src2 = jnp.concatenate([src, dst])
    dst2 = jnp.concatenate([dst, src])
    w2 = jnp.concatenate([w, w])
    eid2 = jnp.concatenate([eid, eid])
    w2 = jnp.where(jnp.concatenate([va, va]), w2, jnp.inf)
    return EdgeSoA(src=src2, dst=dst2, w=w2, eid=eid2)


def segmented_min_edge(edges: EdgeSoA, parent: jnp.ndarray, v: int):
    """Per-component min outgoing edge via sort (the DPP schedule).

    Sorts directed edges by (root(src), w, eid); run heads are each
    component's minimum. Returns (comp_minw, comp_eid, comp_other), each (V,)
    indexed by root id (+inf / INT32_MAX / self where absent).
    Replaces the reference's packed-key radix sort + segmented-min scan
    (Report.pdf p.3 §3.2.2) with one multi-operand lax.sort.
    """
    rs = parent[edges.src]
    rd = parent[edges.dst]
    outgoing = jnp.logical_and(jnp.isfinite(edges.w), rs != rd)
    key_root = jnp.where(outgoing, rs, jnp.int32(v))  # dead edges sort last
    key_w = jnp.where(outgoing, edges.w, jnp.inf)
    srt_root, srt_w, srt_eid, srt_other = jax.lax.sort(
        (key_root, key_w, edges.eid, rd), num_keys=3
    )
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), srt_root[1:] != srt_root[:-1]]
    )
    head = jnp.logical_and(head, srt_root < v)

    comp_minw = jnp.full((v,), jnp.inf, dtype=jnp.float32)
    comp_eid = jnp.full((v,), INT32_MAX, dtype=jnp.int32)
    comp_other = jnp.arange(v, dtype=jnp.int32)
    tgt = jnp.where(head, srt_root, v)  # unique per component; v = dropped
    comp_minw = comp_minw.at[tgt].set(srt_w, mode="drop")
    comp_eid = comp_eid.at[tgt].set(srt_eid, mode="drop")
    comp_other = comp_other.at[tgt].set(srt_other, mode="drop")
    return comp_minw, comp_eid, comp_other


def contract_edges(edges: EdgeSoA, parent: jnp.ndarray) -> EdgeSoA:
    """Relabel endpoints to supervertex roots and invalidate self-edges.

    The reference's "edge list relabel + self-edge removal + compaction"
    (Report.pdf p.3 §3.2.2). Compaction is implicit: invalid edges carry
    w=+inf and sort past live edges in the next round; shapes stay static.
    """
    rs = parent[edges.src]
    rd = parent[edges.dst]
    live = jnp.logical_and(jnp.isfinite(edges.w), rs != rd)
    return EdgeSoA(
        src=jnp.where(live, rs, 0),
        dst=jnp.where(live, rd, 0),
        w=jnp.where(live, edges.w, jnp.inf),
        eid=edges.eid,
    )


def _round(state: FastMSTState, v: int, k: float, min_size: int, mode: str,
           reweight_fn=None) -> FastMSTState:
    parent, size, intdiff = state.parent, state.size, state.intdiff
    edges = state.edges
    arange = jnp.arange(v, dtype=jnp.int32)

    if reweight_fn is not None:
        edges = reweight_fn(edges, state)

    comp_minw, comp_eid, other = segmented_min_edge(edges, parent, v)
    has = comp_eid != INT32_MAX

    if mode == "felz":
        thr = intdiff + k / size.astype(jnp.float32)
        ok = jnp.logical_and(comp_minw <= thr, comp_minw <= thr[other])
    elif mode == "minsize":
        ok = size < min_size
    elif mode == "always":  # superpixel-hierarchy pure-Boruvka rounds
        ok = jnp.ones((v,), jnp.bool_)
    else:  # pragma: no cover
        raise ValueError(mode)
    hook = jnp.logical_and(has, ok)

    succ = jnp.where(hook, other, arange)
    succ = remove_mutual_hooks(succ)
    used = succ != arange

    new_root_of = pointer_double(succ)
    parent_new = new_root_of[parent]

    is_root = parent == arange
    size_new = segment_sum(jnp.where(is_root, size, 0), parent_new, v)
    intdiff_new = segment_max(
        jnp.where(is_root, intdiff, 0.0), parent_new, v, fill=0.0
    )
    intdiff_new = intdiff_new.at[parent_new].max(
        jnp.where(used, comp_minw, 0.0), mode="drop"
    )

    edges_new = contract_edges(edges, parent_new)
    return FastMSTState(
        parent=parent_new,
        size=size_new,
        intdiff=intdiff_new,
        edges=edges_new,
        merged=jnp.any(used),
        it=state.it + jnp.int32(1),
    )


def _init_state(v: int, edges: EdgeSoA) -> FastMSTState:
    return FastMSTState(
        parent=jnp.arange(v, dtype=jnp.int32),
        size=jnp.ones((v,), dtype=jnp.int32),
        intdiff=jnp.zeros((v,), dtype=jnp.float32),
        edges=edges,
        merged=jnp.bool_(True),
        it=jnp.int32(0),
    )


def _run_phase(state, v, k, min_size, mode, max_iters, reweight_fn=None):
    def cond(s):
        return jnp.logical_and(s.merged, s.it < max_iters)

    def body(s):
        return _round(s, v, k, min_size, mode, reweight_fn)

    state = state._replace(merged=jnp.bool_(True), it=jnp.int32(0))
    return jax.lax.while_loop(cond, body, state)


def prepare_edges(image: jnp.ndarray, cfg: SegmentationConfig) -> EdgeSoA:
    smoothed = filters.gaussian_smooth(image, cfg.sigma)
    weights, valid = gg.edge_weight_planes(
        smoothed, cfg.connectivity, cfg.quantize_weight_bits
    )
    return build_directed_edges(weights, valid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def segment_fastmst(image: jnp.ndarray, cfg: SegmentationConfig) -> jnp.ndarray:
    """Sort-based DPP pipeline; must produce labels identical to
    segment_atomic (same merge semantics, different parallel schedule)."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    edges = prepare_edges(image, cfg)
    state = _init_state(v, edges)
    state = _run_phase(state, v, cfg.k, cfg.min_size, "felz", cfg.max_iters)
    if cfg.min_size > 1:
        state = _run_phase(
            state, v, cfg.k, cfg.min_size, "minsize", cfg.max_iters
        )
    return state.parent.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("cfg",))
def segment_fastmst_hierarchy(image: jnp.ndarray, cfg: SegmentationConfig):
    """DPP Segmentation Hierarchies: per-round label capture (reference Fast
    Hierarchy Creation input, Report.pdf p.4 §3.2.3).

    Returns (levels (max_iters+1, H, W), final labels (H, W))."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    edges = prepare_edges(image, cfg)
    state = _init_state(v, edges)
    levels0 = jnp.zeros((cfg.max_iters + 1, v), dtype=jnp.int32)
    levels0 = levels0.at[0].set(state.parent)

    def body(i, carry):
        state, levels = carry
        state = jax.lax.cond(
            state.merged,
            lambda s: _round(s, v, cfg.k, cfg.min_size, "felz"),
            lambda s: s,
            state,
        )
        levels = levels.at[i + 1].set(state.parent)
        return state, levels

    state, levels = jax.lax.fori_loop(0, cfg.max_iters, body, (state, levels0))
    if cfg.min_size > 1:
        state = _run_phase(
            state, v, cfg.k, cfg.min_size, "minsize", cfg.max_iters
        )
    return levels.reshape(cfg.max_iters + 1, h, w), state.parent.reshape(h, w)
