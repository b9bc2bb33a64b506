"""Pallas multi-step gossip kernels vs the XLA sweeps, on CPU.

The kernels are the production TPU stage-G path; CI runs CPU-only, so they
are exercised here through Mosaic's TPU interpret mode
(`pltpu.force_tpu_interpret_mode`) and asserted bit-equal to the XLA sweep
implementations on randomized fields, including non-multiple-of-strip
heights/widths (halo shrink, roll wraparound, bitmask adjacency).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gseg_tpu.models import turbo
from gseg_tpu.ops.pallas import gossip as pg

# (h, w): deliberately not multiples of 8/128 to stress halo + column masks.
SHAPES = [(23, 70), (37, 150), (64, 128)]


def _rand_labels(rng, h, w, ncomp):
    """Random label field whose values are valid 'canonical min vertex ids'
    in spirit (any int32s work for the sweeps; keep them small + varied)."""
    return rng.integers(0, ncomp, (h, w)).astype(np.int32)


@pytest.mark.parametrize("closures", [True, False])
@pytest.mark.parametrize("shape", SHAPES)
def test_compmin_matches_xla(shape, closures):
    h, w = shape
    rng = np.random.default_rng(h * 1000 + w)
    L = jnp.asarray(_rand_labels(rng, h, w, 7))
    bw = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    be = jnp.asarray(rng.integers(0, 10_000, (h, w)).astype(np.int32))
    sz = jnp.asarray(rng.integers(1, 9, (h, w)).astype(np.int32))
    ms = 4 * (h + w)
    ref = turbo._compmin_gossip(L, bw, be, sz, ms)
    with pltpu.force_tpu_interpret_mode():
        got = pg.compmin_gossip(L, bw, be, sz, ms, closures=closures)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_label_flood_matches_xla(shape):
    h, w = shape
    rng = np.random.default_rng(h + w)
    L = jnp.asarray(_rand_labels(rng, h, w, 6))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    mark4 = rng.integers(0, 2, (4, h, w)).astype(bool)
    ms = 4 * (h + w)

    # Producer invariant (_ground): a mark never points out of bounds — an
    # out-of-bounds edge has +inf weight and can't be a component min edge.
    import gseg_tpu.ops.grid_graph as gg

    for d, (dy, dx) in enumerate(gg.DIRS4):
        mark4[d] &= np.asarray(gg.valid_plane(h, w, dy, dx))

    # XLA reference needs allow8 (same-label | mark adjacency, both dirs).
    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    allow = []
    for d in range(8):
        if d < 4:
            am = jnp.asarray(mark4[d])
        else:
            dy, dx = gg.DIRS4[d - 4]
            am = gg.shift_plane(jnp.asarray(mark4[d - 4]), -dy, -dx, False)
        allow.append((nbrL[d] == L) | am)
    allow8 = jnp.stack(allow)
    # random sparse dist seeds exercise the riding-BFS propagation paths
    dist0 = jnp.asarray(
        np.where(rng.random((h, w)) < 0.05, 0, 1 << 30).astype(np.int32)
    )
    ref = turbo._label_gossip(L, allow8, idf, dist0, ms)

    with pltpu.force_tpu_interpret_mode():
        got = pg.label_gossip(pg.pack_allow_bits(allow), L, idf, dist0, ms)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("closures", [True, False])
@pytest.mark.parametrize("shape", SHAPES[:2])
def test_label_flood_nodist_matches_xla(shape, closures):
    """Dist-free flood (rlist-sizes rounds) vs the XLA dist-free sweeps."""
    h, w = shape
    rng = np.random.default_rng(3 * h + w)
    L = jnp.asarray(_rand_labels(rng, h, w, 6))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    mark4 = rng.integers(0, 2, (4, h, w)).astype(bool)
    ms = 4 * (h + w)

    import gseg_tpu.ops.grid_graph as gg

    for d, (dy, dx) in enumerate(gg.DIRS4):
        mark4[d] &= np.asarray(gg.valid_plane(h, w, dy, dx))
    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    allow = []
    for d in range(8):
        if d < 4:
            am = jnp.asarray(mark4[d])
        else:
            dy, dx = gg.DIRS4[d - 4]
            am = gg.shift_plane(jnp.asarray(mark4[d - 4]), -dy, -dx, False)
        allow.append((nbrL[d] == L) | am)
    allow8 = jnp.stack(allow)
    rL, rI, _ = turbo._label_gossip_nd(L, allow8, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, _, _ = pg.label_flood(pg.pack_allow_bits(allow), L, idf, ms,
                                      closures=closures)
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))


def test_multistrip_wrap_leak_regression():
    """Regression for the round-3 slab-row-wrap bug: pltpu.roll is circular
    over the SLAB rows, and the chained 8-direction step moves values up to
    3 rows per step — an unmasked wrap read at a strip edge (mid-image,
    where vertical adjacency is legitimately allowed) leaked a smaller
    label through a forbidden edge, producing a stable-but-wrong fixpoint
    with clean flags. Trigger needs h > strip height (72) with thin
    horizontal components so the wrapped row belongs to a different
    component: every prior CI shape was single-strip (max h=64)."""
    import gseg_tpu.ops.grid_graph as gg

    h, w = 160, 140  # >= 2 strips at the 72-row floor
    rng = np.random.default_rng(7)
    # Components = 3-wide column stripes split horizontally at row 100:
    # TALL (so a leaked value propagates down into the strip interior
    # through dense vertical allow bits) yet DISJOINT across the ~s_rows
    # wrap distance (so the wrapped read at a strip's top slab row lands in
    # the OTHER component). Initial labels strictly DECREASE with depth —
    # every wrapped read offers a smaller label, a deterministic leak on
    # unmasked wraps (the leaked min persists: min-floods never revert).
    comp = (np.arange(w)[None, :] // 3) * 2 + (np.arange(h)[:, None] >= 100)
    L = jnp.asarray(np.broadcast_to(comp, (h, w)).astype(np.int32))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    Lc0 = jnp.asarray(
        ((h - np.arange(h))[:, None] * 1000
         + np.arange(w)[None, :]).astype(np.int32))
    ms = 4 * (h + w)
    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    allow8 = jnp.stack([nbrL[d] == L for d in range(8)])
    allow_l = [allow8[d] for d in range(8)]

    rL, rI, _ = turbo._label_gossip_nd(Lc0, allow_l, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, _, _ = pg.label_flood(
            pg.pack_allow_bits(allow_l), Lc0, idf, ms, closures=False
        )
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))

    # same hazard class for the in-slab same-bits kernels (compmin).
    bw = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    be = jnp.asarray(rng.integers(0, 10_000, (h, w)).astype(np.int32))
    sz = jnp.asarray(rng.integers(1, 9, (h, w)).astype(np.int32))
    ref = turbo._compmin_gossip(L, bw, be, sz, ms)
    with pltpu.force_tpu_interpret_mode():
        got = pg.compmin_gossip(L, bw, be, sz, ms, closures=False)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


def _canonicalize(L2d):
    """Connected-component relabel to min flat vertex id (NumPy BFS)."""
    h, w = L2d.shape
    vid = np.arange(h * w).reshape(h, w)
    lab = -np.ones((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            if lab[y, x] >= 0:
                continue
            stack = [(y, x)]
            members = []
            val = L2d[y, x]
            lab[y, x] = -2
            while stack:
                cy, cx = stack.pop()
                members.append((cy, cx))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = cy + dy, cx + dx
                        if (
                            0 <= ny < h and 0 <= nx < w
                            and lab[ny, nx] == -1 and L2d[ny, nx] == val
                        ):
                            lab[ny, nx] = -2
                            stack.append((ny, nx))
            root = min(vid[cy, cx] for cy, cx in members)
            for cy, cx in members:
                lab[cy, cx] = root
    return lab


def _bfs_dist(L, vid, ms):
    """BFS levels from the root pixel via the riding-dist label flood with
    same-label-only adjacency (labels already canonical, so no adoption)."""
    import gseg_tpu.ops.grid_graph as gg

    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    allow8 = nbrL == L[None]
    dist0 = jnp.where(L == vid, jnp.int32(0), jnp.int32(1 << 30))
    _, _, dist, _ = turbo._label_gossip(
        L, allow8, jnp.zeros_like(L, jnp.float32), dist0, ms
    )
    return dist


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_subtree_sizes_matches_xla(shape):
    h, w = shape
    rng = np.random.default_rng(h * 13 + w)
    L = jnp.asarray(_canonicalize(_rand_labels(rng, h, w, 4)))
    vid = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    ms = 4 * (h + w)
    dist = _bfs_dist(L, vid, ms)

    ref_s, ref_unconv = turbo._subtree_sizes(L, dist, ms)

    orig = turbo._use_pallas
    turbo._use_pallas = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            got_s, got_unconv = turbo._subtree_sizes(L, dist, ms)
    finally:
        turbo._use_pallas = orig
    assert np.array_equal(np.asarray(ref_s), np.asarray(got_s))
    assert bool(ref_unconv) == bool(got_unconv)
    # sizes at root pixels equal true component sizes
    Ln = np.asarray(L)
    got = np.asarray(got_s)
    for root in np.unique(Ln):
        ry, rx = divmod(int(root), w)
        assert got[ry, rx] == int((Ln == root).sum())


@pytest.mark.parametrize("closures", [True, False])
@pytest.mark.parametrize("shape", SHAPES[:2])
def test_value_flood_matches_xla_and_broadcasts(shape, closures):
    h, w = shape
    rng = np.random.default_rng(h * 7 + w)
    L = jnp.asarray(_canonicalize(_rand_labels(rng, h, w, 4)))
    vid = np.arange(h * w, dtype=np.int32).reshape(h, w)
    ms = 4 * (h + w)
    # seed each root pixel with an arbitrary value, sentinel elsewhere
    Ln = np.asarray(L)
    seed = np.full((h, w), np.iinfo(np.int32).max, np.int32)
    vals = {}
    for root in np.unique(Ln):
        ry, rx = divmod(int(root), w)
        vals[int(root)] = int(rng.integers(0, 1 << 20))
        seed[ry, rx] = vals[int(root)]
    seed = jnp.asarray(seed)

    ref_v, ref_unconv = turbo._value_flood(L, seed, ms)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_unconv, _ = pg.value_flood(L, seed, ms, closures=closures)
    assert np.array_equal(np.asarray(ref_v), np.asarray(got_v))
    assert bool(ref_unconv) == bool(got_unconv)
    # every pixel got its root's value
    got = np.asarray(got_v)
    expect = np.vectorize(lambda r: vals[int(r)])(Ln)
    assert np.array_equal(got, expect)


@pytest.mark.parametrize("t", [16, 32])
def test_multistrip_flood_at_larger_t(monkeypatch, t):
    """GSEG_T_LATE hardware A/B pre-validation: the multi-strip flood must
    stay bit-equal to the XLA sweeps at T=16/32 (larger T widens the slab
    halos — the same hazard class as the round-3 wrap bug)."""
    import gseg_tpu.ops.grid_graph as gg

    monkeypatch.setenv("GSEG_T", str(t))
    h, w = 160, 140
    rng = np.random.default_rng(7)
    comp = (np.arange(w)[None, :] // 3) * 2 + (np.arange(h)[:, None] >= 100)
    L = jnp.asarray(np.broadcast_to(comp, (h, w)).astype(np.int32))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    Lc0 = jnp.asarray(
        ((h - np.arange(h))[:, None] * 1000
         + np.arange(w)[None, :]).astype(np.int32))
    ms = 4 * (h + w)
    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    allow_l = [nbrL[d] == L for d in range(8)]

    rL, rI, _ = turbo._label_gossip_nd(Lc0, allow_l, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, _, _ = pg.label_flood(
            pg.pack_allow_bits(allow_l), Lc0, idf, ms, closures=False
        )
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_multistrip_flood_fuzz(seed):
    """Randomized multi-strip fuzz for the dist-free flood: random label
    fields (many small components) + random extra allow bits (mutually
    symmetrized, in-bounds) at heights above the 72-row strip floor, so
    strip-edge halo and wrap masking face irregular content, not just the
    deterministic stripe pattern of the wrap regression test."""
    import gseg_tpu.ops.grid_graph as gg

    rng = np.random.default_rng(seed)
    h = int(rng.integers(90, 200))
    w = int(rng.integers(100, 260))
    L = jnp.asarray(rng.integers(0, 37, (h, w)).astype(np.int32))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    Lc0 = jnp.asarray(rng.integers(0, 1 << 20, (h, w)).astype(np.int32))
    ms = 4 * (h + w)
    nbrL = jnp.stack([gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8])
    same = [nbrL[d] == L for d in range(8)]
    # extra random merge-mark bits, symmetrized (allow must be mutual and
    # never point out of bounds — the producer guarantees this in turbo).
    extra = [np.asarray(rng.uniform(0, 1, (h, w)) < 0.04) for _ in range(4)]
    allow_l = list(same)
    for d in range(4):
        dy, dx = gg.DIRS8[d]
        inb = np.asarray(gg.valid_plane(h, w, dy, dx))
        m = jnp.asarray(extra[d] & inb)
        allow_l[d] = allow_l[d] | m
        allow_l[d + 4] = allow_l[d + 4] | jnp.asarray(
            np.asarray(gg.shift_plane(m, -dy, -dx, False)))
    rL, rI, _ = turbo._label_gossip_nd(Lc0, allow_l, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, _, _ = pg.label_flood(
            pg.pack_allow_bits(allow_l), Lc0, idf, ms, closures=False
        )
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))


@pytest.mark.parametrize("seed", [11, 12])
def test_multistrip_variant_fuzz(seed):
    """Multi-strip fuzz for the remaining kernel variants (compmin, value
    flood, subtree sums) — random irregular fields above the 72-row strip
    floor, bit-equal to the XLA sweeps."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(90, 190))
    w = int(rng.integers(100, 240))
    ms = 4 * (h + w)
    L = jnp.asarray(rng.integers(0, 29, (h, w)).astype(np.int32))
    bw = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    be = jnp.asarray(rng.integers(0, 10_000, (h, w)).astype(np.int32))
    sz = jnp.asarray(rng.integers(1, 9, (h, w)).astype(np.int32))
    ref = turbo._compmin_gossip(L, bw, be, sz, ms)
    with pltpu.force_tpu_interpret_mode():
        got = pg.compmin_gossip(L, bw, be, sz, ms, closures=False)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))

    seedv = jnp.asarray(
        rng.integers(0, 1 << 20, (h, w)).astype(np.int32))
    rv, runc = turbo._value_flood(L, seedv, ms)
    with pltpu.force_tpu_interpret_mode():
        gv, gunc, _ = pg.value_flood(L, seedv, ms, closures=False)
    assert np.array_equal(np.asarray(rv), np.asarray(gv))

    # subtree sums need a consistent parent-dir field: derive from a BFS
    # dist like production (_subtree_sizes) on same-label adjacency.
    dist = _bfs_dist(L, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w),
                     ms)
    import gseg_tpu.ops.grid_graph as gg

    nL = [gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8]
    nd = [gg.shift_plane(dist, dy, dx, turbo.BIGDIST) for dy, dx in
          gg.DIRS8]
    pdir = jnp.full((h, w), jnp.int32(8))
    for d in range(7, -1, -1):
        ok = ((nL[d] == L) & (nd[d] == dist - 1) & (dist > 0)
              & (dist < turbo.BIGDIST))
        pdir = jnp.where(ok, jnp.int32(d), pdir)
    s0 = jnp.ones((h, w), jnp.int32)
    rs, _ = turbo._subtree_sizes(L, dist, ms)
    with pltpu.force_tpu_interpret_mode():
        gs, _ = pg.subtree_sums(pdir, s0, ms)
    assert np.array_equal(np.asarray(rs), np.asarray(gs))


@pytest.mark.parametrize("w", [3840, 5120, 7680])
def test_ladder_width_flood(w):
    """Ladder-width kernel configuration (wp lane tiling, strip sizing,
    T=16 at w>=2560) at multi-strip height, bit-equal to the XLA sweeps —
    pre-validates the 4K/5K/8K rungs' kernel config logic in interpret
    mode before hardware pays their Mosaic compiles."""
    import gseg_tpu.ops.grid_graph as gg

    h = 160
    rng = np.random.default_rng(w)
    L = jnp.asarray(rng.integers(0, 23, (h, w)).astype(np.int32))
    idf = jnp.asarray(rng.uniform(0, 5, (h, w)).astype(np.float32))
    Lc0 = jnp.asarray(rng.integers(0, 1 << 20, (h, w)).astype(np.int32))
    ms = 2 * (h + w)
    nbrL = [gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8]
    allow = [nbrL[d] == L for d in range(8)]
    rL, rI, _ = turbo._label_gossip_nd(Lc0, allow, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, _, _ = pg.label_flood(
            pg.pack_allow_bits(allow), Lc0, idf, ms, closures=False)
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))


def test_refined_wake_long_wave_and_seeding():
    """Refined wake protocol regression (round-4): strips self-reactivate
    only on LAST-in-VMEM-step change and wake neighbors only on halo-band
    (top/bottom t rows) changes, so a settled strip stops paying trailing
    certificate passes. Adversarial construction: a tall uniform-label
    pillar spans every strip (h=440 -> 6 strips at the 72-row floor); a
    single hook at the BOTTOM row injects a smaller label, so the flood
    wave must climb strip by strip in the Jacobi (upward) direction —
    missed band wakes or premature self-deactivation would freeze it
    mid-image. seed_mask marks only the hook pixels: every upper strip
    starts INACTIVE and is woken purely by bottom-band changes."""
    import gseg_tpu.ops.grid_graph as gg

    h, w = 440, 96
    row = np.arange(h)[:, None]
    col = np.arange(w)[None, :]
    # pillar (cols 0..9, all rows): label 500_000. bottom-right block:
    # label 7 (the future min). elsewhere: per-4x8-tile components.
    tile = (1000 + (row // 4) * 31 + col // 8).astype(np.int32)
    L = np.where(col < 10, 500_000, tile)
    L[h - 6:, 80:] = 7
    L = jnp.asarray(L.astype(np.int32))
    # production shape: Lc0 == L (uniform per component), idf uniform per
    # component with bumps only at hook pixels (id_init semantics).
    rng = np.random.default_rng(4)
    idf_np = (np.asarray(L) % 97).astype(np.float32)
    ms = 8 * (h + w)
    nbrL = [gg.shift_plane(L, dy, dx, -1) for dy, dx in gg.DIRS8]
    allow = [nbrL[d] == L for d in range(8)]
    # hook: connect block(7) to pillar along row h-1 via a same-row chain
    # of extra allow bits (cols 9..80 bridge through the tile components).
    hook = np.zeros((h, w), bool)
    hook[h - 1, 9:80] = True
    m = jnp.asarray(hook & np.asarray(gg.valid_plane(h, w, 0, 1)))
    allow[0] = allow[0] | m
    allow[4] = allow[4] | jnp.asarray(
        np.asarray(gg.shift_plane(m, 0, -1, False)))
    seed_plane = m | jnp.asarray(np.asarray(gg.shift_plane(m, 0, -1, False)))
    idf_np[h - 1, 9:81] += 3.0  # used_w8 bump at hook pixels
    idf = jnp.asarray(idf_np)
    Lc0 = L

    rL, rI, _ = turbo._label_gossip_nd(Lc0, allow, idf, ms)
    with pltpu.force_tpu_interpret_mode():
        gL, gI, gunc, _ = pg.label_flood(
            pg.pack_allow_bits(allow), Lc0, idf, ms, closures=False,
            seed_mask=seed_plane)
    assert not bool(gunc)
    # sanity: the pillar really adopted the injected min label everywhere
    # (the wave crossed all strips).
    assert int(np.asarray(gL)[0, 0]) == 7
    assert np.array_equal(np.asarray(rL), np.asarray(gL))
    assert np.array_equal(np.asarray(rI), np.asarray(gI))

    # empty seed mask == no hooks anywhere: flood must be an exact no-op
    # (zero passes) and still converged.
    same_allow = [nbrL[d] == L for d in range(8)]
    uni = jnp.asarray((np.asarray(L) * 7 + 3).astype(np.int32))
    idu = jnp.asarray((np.asarray(L) % 5).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        nL2, nI2, unc2, passes2 = pg.label_flood(
            pg.pack_allow_bits(same_allow), uni, idu, ms, closures=False,
            seed_mask=jnp.zeros((h, w), bool))
    assert not bool(unc2)
    assert int(passes2) == 0
    assert np.array_equal(np.asarray(nL2), np.asarray(uni))

    # value flood long-wave: one seeded root per converged component
    # (min flat index), everything else at the int32 sentinel.
    Ln = np.asarray(rL)
    Lnp = Ln.reshape(-1)
    first = {}
    for i, lab in enumerate(Lnp):
        first.setdefault(int(lab), i)
    roots = np.zeros((h * w,), bool)
    for lab, i in first.items():
        roots[i] = True
    vals = rng.integers(0, 1 << 20, (h * w,)).astype(np.int32)
    seedv = np.where(roots, vals, np.iinfo(np.int32).max).reshape(h, w)
    canon = jnp.asarray(Ln)
    rv, _ = turbo._value_flood(canon, jnp.asarray(seedv), ms)
    with pltpu.force_tpu_interpret_mode():
        gv, gunc3, _ = pg.value_flood(
            canon, jnp.asarray(seedv), ms, closures=False,
            seed_mask=jnp.asarray(roots.reshape(h, w)))
    assert not bool(gunc3)
    assert np.array_equal(np.asarray(rv), np.asarray(gv))
