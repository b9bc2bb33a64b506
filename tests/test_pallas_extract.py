"""boundary_extract kernel vs a NumPy reference, on CPU (interpret mode).

Checks the lossless-extraction contract (models/turbo.py handoff): for every
unordered component pair (lo, hi) present in the dense planes, the pair's
exact minimum (w, eid) edge must appear in the output pool; every output
entry must be a real live boundary edge; sentinel lanes carry
lo=hi=eid=INT32_MAX / w=+inf.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import gseg_tpu.ops.grid_graph as gg
from gseg_tpu.ops.pallas.extract import boundary_extract

INT32_MAX = np.iinfo(np.int32).max


def _dense_planes(rng, h, w, ncomp):
    """Random canonical-ish label field + weight planes with +inf invalid."""
    L = rng.integers(0, ncomp, (h, w)).astype(np.int32)
    weights = rng.uniform(0.5, 9.0, (4, h, w)).astype(np.float32)
    for d, (dy, dx) in enumerate(gg.DIRS4):
        va = np.asarray(gg.valid_plane(h, w, dy, dx))
        weights[d][~va] = np.inf
    return L, weights


def _reference_pairs(L, weights):
    """Exact min (w, eid) per unordered live pair, plus the full live set."""
    h, w = L.shape
    best = {}
    live = set()
    for d, (dy, dx) in enumerate(gg.DIRS4):
        for y in range(h):
            for x in range(w):
                if not np.isfinite(weights[d, y, x]):
                    continue
                la = int(L[y, x])
                lb = int(L[y + dy, x + dx])
                if la == lb:
                    continue
                key = (min(la, lb), max(la, lb))
                eid = (y * w + x) * 4 + d
                cand = (float(weights[d, y, x]), eid)
                live.add(key + cand)
                if key not in best or cand < best[key]:
                    best[key] = cand
    return best, live


@pytest.mark.parametrize("shape,ncomp", [((13, 70), 5), ((24, 150), 9),
                                         ((8, 128), 3),
                                         # multi-strip (strip rows <= 64);
                                         # random labels make ~every edge a
                                         # boundary, so size the pool for 4V
                                         ((150, 140), 11)])
def test_boundary_extract_lossless(shape, ncomp):
    h, w = shape
    rng = np.random.default_rng(h * 31 + w)
    L, weights = _dense_planes(rng, h, w, ncomp)
    cap = 1 << 14 if h * w <= 4096 else 1 << 17

    with pltpu.force_tpu_interpret_mode():
        lo, hi, wv, eid, count, overflow = boundary_extract(
            jnp.asarray(L), jnp.asarray(weights), w, cap
        )
    lo, hi, wv, eid = (np.asarray(x) for x in (lo, hi, wv, eid))
    assert not bool(overflow)
    n = int(count)
    assert n <= cap

    best, live = _reference_pairs(L, weights)

    got = set()
    for i in range(cap):
        if lo[i] == INT32_MAX:
            assert hi[i] == INT32_MAX and eid[i] == INT32_MAX
            assert not np.isfinite(wv[i])
            continue
        assert i < n  # live entries only below the reported count
        got.add((int(lo[i]), int(hi[i]), float(wv[i]), int(eid[i])))

    # every output entry is a real live boundary edge
    assert got <= live
    # the exact pair minimum survives for every pair
    for (plo, phi), (pw, pe) in best.items():
        assert (plo, phi, pw, pe) in got, (plo, phi, pw, pe)


def test_boundary_extract_overflow_flag():
    h, w = 16, 128
    rng = np.random.default_rng(0)
    # checkerboard labels: every edge live, no runs to dedup
    L = ((np.indices((h, w)).sum(axis=0) % 2) * (h * w)
         + np.arange(h * w).reshape(h, w)).astype(np.int32)
    weights = rng.uniform(0.5, 9.0, (4, h, w)).astype(np.float32)
    for d, (dy, dx) in enumerate(gg.DIRS4):
        va = np.asarray(gg.valid_plane(h, w, dy, dx))
        weights[d][~va] = np.inf
    with pltpu.force_tpu_interpret_mode():
        *_, overflow = boundary_extract(
            jnp.asarray(L), jnp.asarray(weights), w, 256
        )
    assert bool(overflow)


@pytest.mark.parametrize("cap", [7936, 8192])
def test_boundary_extract_near_capacity(cap):
    """Fill level within one staging window of capacity must never silently
    drop entries: either overflow is flagged, or the pool is lossless.

    Regression for the window-offset clip bug: with 7762 live edges,
    cap_rows=62 and win_rows=32, the final DMA window's offset used to be
    clipped down over previously-written live rows with overflow=False.
    cap=7936 reproduces that geometry (must now flag overflow at window
    granularity); cap=8192 has window headroom (must be lossless)."""
    h, w = 16, 128
    rng = np.random.default_rng(7)
    # all-distinct labels: every valid edge live, no run dedup
    L = np.arange(h * w, dtype=np.int32).reshape(h, w)
    weights = rng.uniform(0.5, 9.0, (4, h, w)).astype(np.float32)
    for d, (dy, dx) in enumerate(gg.DIRS4):
        va = np.asarray(gg.valid_plane(h, w, dy, dx))
        weights[d][~va] = np.inf

    with pltpu.force_tpu_interpret_mode():
        lo, hi, wv, eid, count, overflow = boundary_extract(
            jnp.asarray(L), jnp.asarray(weights), w, cap
        )
    if bool(overflow):
        assert cap == 7936  # headroom case must not flag
        return
    lo, hi, wv, eid = (np.asarray(x) for x in (lo, hi, wv, eid))
    best, live = _reference_pairs(L, weights)
    got = set()
    for i in range(cap):
        if lo[i] == INT32_MAX:
            continue
        got.add((int(lo[i]), int(hi[i]), float(wv[i]), int(eid[i])))
    assert got <= live
    for (plo, phi), (pw, pe) in best.items():
        assert (plo, phi, pw, pe) in got, (plo, phi, pw, pe)


@pytest.mark.parametrize("shape", [(23, 70), (40, 128)])
def test_run_extract_counts(shape):
    """run_extract pool sums by label == exact component pixel counts."""
    from gseg_tpu.ops.pallas.extract import run_extract

    h, w = shape
    rng = np.random.default_rng(h * 3 + w)
    L = rng.integers(0, 6, (h, w)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        lab, cnt, total, ovf = run_extract(jnp.asarray(L), 1 << 14)
    assert not bool(ovf)
    lab = np.asarray(lab)
    cnt = np.asarray(cnt)
    live = lab != np.iinfo(np.int32).max
    got = {}
    for l, c in zip(lab[live].tolist(), cnt[live].tolist()):
        got[l] = got.get(l, 0) + c
    for val in np.unique(L):
        assert got[int(val)] == int((L == val).sum())
    assert int(total) >= int(live.sum())
