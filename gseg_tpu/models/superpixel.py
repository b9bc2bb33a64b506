"""DPP Superpixel Hierarchy, TPU-native.

Rebuild of the reference's superpixel variant (branch superpixel_gpu;
Report.pdf p.4 §3.2.4, after Wei et al. "Superpixel Hierarchy" [15]): the
FastMST hierarchy pipeline with edge weights RECOMPUTED every Boruvka round
as

    w(u, v) = sobel_edge_strength(u, v) * || avg_color(Cu) - avg_color(Cv) ||

where Sobel replaces the paper's Structured Forests (the reference measured
SF at 20x the cost of the whole segmentation, with no GPU implementation).
Per-component size and average color are maintained each round — the
reference uses dedicated kernels plus thrust::inclusive_scan_by_key; here
they are two `segment_sum` scatters keyed by root id.

Rounds merge every component along its min outgoing edge (pure Boruvka, no
Felzenszwalb predicate), emitting one hierarchy level per round; callers pick
a level (reference benchmarks use level 4, report-extract.txt:651-658).
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
    segment_sum,
)
from .fastmst import EdgeSoA, build_directed_edges, contract_edges, segmented_min_edge


class SuperpixelState(NamedTuple):
    parent: jnp.ndarray     # (V,) int32
    size: jnp.ndarray       # (V,) int32 at roots
    colorsum: jnp.ndarray   # (V, 3) float32 at roots
    edges: EdgeSoA          # w slot holds liveness (+inf = dead); recomputed
    strength: jnp.ndarray   # (E,) float32 per directed-edge Sobel strength
    merged: jnp.ndarray
    it: jnp.ndarray


def _edge_strengths(image: jnp.ndarray, cfg: SegmentationConfig):
    """Per canonical edge: mean of endpoint Sobel magnitudes (static)."""
    sob = filters.sobel_magnitude(filters.gaussian_smooth(image, cfg.sigma))
    s = []
    for dy, dx in gg.DIRS4:
        nb = gg.shift_plane(sob, dy, dx, 0.0)
        s.append(0.5 * (sob + nb))
    per_edge = jnp.stack(s, axis=-1).reshape(-1)  # eid order: v*4 + d
    return jnp.concatenate([per_edge, per_edge])  # both orientations


def _reweight(state: SuperpixelState) -> EdgeSoA:
    """w(e) = strength(e) * ||avg_color(Cs) - avg_color(Cd)|| on live edges."""
    edges = state.edges
    avg = state.colorsum / jnp.maximum(
        state.size.astype(jnp.float32), 1.0
    )[:, None]
    rs = state.parent[edges.src]
    rd = state.parent[edges.dst]
    diff = avg[rs] - avg[rd]
    cdist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    live = jnp.isfinite(edges.w)
    w = jnp.where(live, state.strength * cdist, jnp.inf)
    return edges._replace(w=w)


def _round(state: SuperpixelState, v: int) -> SuperpixelState:
    parent = state.parent
    arange = jnp.arange(v, dtype=jnp.int32)

    edges = _reweight(state)
    comp_minw, comp_eid, other = segmented_min_edge(edges, parent, v)
    hook = comp_eid != INT32_MAX  # pure Boruvka: merge whenever possible

    succ = jnp.where(hook, other, arange)
    succ = remove_mutual_hooks(succ)
    used = succ != arange

    new_root_of = pointer_double(succ)
    parent_new = new_root_of[parent]

    is_root = parent == arange
    size_new = segment_sum(jnp.where(is_root, state.size, 0), parent_new, v)
    colorsum_new = jnp.zeros_like(state.colorsum).at[parent_new].add(
        jnp.where(is_root[:, None], state.colorsum, 0.0), mode="drop"
    )

    edges_new = contract_edges(edges, parent_new)
    return SuperpixelState(
        parent=parent_new,
        size=size_new,
        colorsum=colorsum_new,
        edges=edges_new,
        strength=state.strength,
        merged=jnp.any(used),
        it=state.it + jnp.int32(1),
    )


def _init_state(image: jnp.ndarray, cfg: SegmentationConfig) -> SuperpixelState:
    h, w = image.shape[0], image.shape[1]
    v = h * w
    smoothed = filters.gaussian_smooth(image, cfg.sigma)
    weights, valid = gg.edge_weight_planes(smoothed, cfg.connectivity)
    edges = build_directed_edges(weights, valid)
    return SuperpixelState(
        parent=jnp.arange(v, dtype=jnp.int32),
        size=jnp.ones((v,), dtype=jnp.int32),
        colorsum=smoothed.reshape(v, -1).astype(jnp.float32),
        edges=edges,
        strength=_edge_strengths(image, cfg),
        merged=jnp.bool_(True),
        it=jnp.int32(0),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def segment_superpixel_hierarchy(image: jnp.ndarray, cfg: SegmentationConfig):
    """Full superpixel hierarchy: (levels (max_iters+1, H, W), final labels).

    Level i has (roughly) half the superpixels of level i-1; the hierarchy
    bottoms out at a single component (Boruvka merges to completion within
    ceil(log2(V)) <= max_iters rounds for connected grids)."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    state = _init_state(image, cfg)
    levels0 = jnp.zeros((cfg.max_iters + 1, v), dtype=jnp.int32)
    levels0 = levels0.at[0].set(state.parent)

    def body(i, carry):
        state, levels = carry
        state = jax.lax.cond(
            state.merged, lambda s: _round(s, v), lambda s: s, state
        )
        levels = levels.at[i + 1].set(state.parent)
        return state, levels

    state, levels = jax.lax.fori_loop(0, cfg.max_iters, body, (state, levels0))
    return levels.reshape(cfg.max_iters + 1, h, w), state.parent.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("cfg",))
def segment_superpixel(image: jnp.ndarray, cfg: SegmentationConfig) -> jnp.ndarray:
    """Single level of the superpixel hierarchy, selected by
    cfg.hierarchy_levels (reference benchmark convention: level 4).

    Runs exactly `level` Boruvka rounds — identical to
    segment_superpixel_hierarchy(...)[0][level] but without computing the
    remaining max_iters-level rounds or materializing the (L, V) level
    stack (the full collapse costs ~8x more than level 4 needs)."""
    h, w = image.shape[0], image.shape[1]
    v = h * w
    lvl = cfg.hierarchy_levels if cfg.hierarchy_levels > 0 else 4
    lvl = min(lvl, cfg.max_iters)
    state = _init_state(image, cfg)

    def body(i, s):
        return jax.lax.cond(s.merged, lambda s: _round(s, v), lambda s: s, s)

    state = jax.lax.fori_loop(0, lvl, body, state)
    return state.parent.reshape(h, w)
