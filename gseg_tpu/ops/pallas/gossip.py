"""Pallas gossip kernels: multi-step sweeps + segmented scan closures.

The turbo path's stage-G reductions are 8-neighbor propagation fixpoints
(lexmin component-min, min-label flood with BFS dist and Int riding, value
broadcast, subtree sums). In XLA each sweep is one full HBM pass, so
propagation over diameter-D components costs D passes. Two techniques make
these ~diameter-independent:

1. **Temporal blocking** (all variants): a row strip stays resident in VMEM
   with a T-row halo and the propagation iterates T times per HBM pass;
   after T in-VMEM steps exactly the interior S rows are valid.

2. **Segmented scan closures** (min/max variants): after the T steps, a
   staged-doubling segmented closure runs along BOTH in-VMEM axes — each
   pixel combines candidates from every pixel in its contiguous same-reach
   row interval (full padded width) and column interval (slab height) in
   log2(n) roll stages. Because these fixpoints are monotone and idempotent
   (min/max semilattices; min-plus for the riding BFS dist), propagating
   through *stale halo rows* is sound — intermediate values are always
   upper bounds that later passes tighten, and the fixpoint is unique. A
   pass with no change certifies the one-step sweep fixpoint (the pass's
   first stage dominates one full 8-direction step), so the surrounding
   while_loop converges to exactly the same fixpoint as the XLA sweeps —
   oracle parity is untouched.

3. **Orientation alternation**: passes alternate between row strips on the
   (H, W) layout and row strips on the TRANSPOSED (W, H) layout, so each
   iteration performs a full-width row closure and a full-height column
   closure. Convergence is then bounded by the component's "staircase
   complexity" (alternation count), not its diameter: blobs converge in
   2-3 iterations at ANY resolution.

Subtree sums are an affine (non-idempotent) fixpoint; they keep the plain
step kernel (converges in BFS-tree-depth steps; see models/turbo.py).

Reference parity note: this replaces the reference's per-component
atomicMin reductions and pointer-jumping flattens (Report.pdf p.2-3 §3.1,
Appendix A) with dense, deterministic propagation — the design the measured
v5e cost model demands (no V-sized gathers/scatters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import grid_graph as gg

import os as _os

# Steps per pass for the step-only kernels. More steps per pass amortize
# the per-strip DMA round trips over more compute (pass count ~ diameter/T)
# at the price of fatter halos (slab = s_rows + 2T: more recompute + VMEM).
# Measured on v5e (blobs, gossip phase): 1080p T=8 94 ms vs T=16 96 ms;
# 4K T=8 511 ms vs T=16 403 ms vs T=24 463 ms — wide images are pass-
# count-bound (DMA round trips per pass), small ones halo-bound, so T
# steps up with width. GSEG_T overrides for A/B sweeps.
T = int(_os.environ.get("GSEG_T", "8"))
T_SCAN = 4   # steps per pass when scan closures do the long-range work


def _pick_t(w: int, phase: str | None = None) -> int:
    """Steps per pass. Wide images are DMA-round-trip-bound per pass ->
    larger T; narrow ones halo-bound -> T=8 (measured, CLAUDE.md). GSEG_T
    overrides globally; GSEG_T_<PHASE> (PEEL / LATE / FINAL) overrides one
    gossip phase for A/B sweeps — late rounds have geometrically larger
    component diameters, so their optimum T can sit above the early
    rounds'."""
    if phase:
        ovp = _os.environ.get(f"GSEG_T_{phase.upper()}")
        if ovp:
            return int(ovp)
    ov = _os.environ.get("GSEG_T")
    if ov:
        return int(ov)
    return 16 if w >= 2560 else 8

_REV = [4, 5, 6, 7, 0, 1, 2, 3]
# DIRS8 index permutation under transposition ((dy, dx) -> (dx, dy)).
_TRANSPOSE_PERM = [1, 0, 2, 7, 5, 4, 6, 3]

# direction bit indices for the closure reach masks (DIRS8 order):
#   flow from the LEFT  into p: neighbor (0,-1) = bit 4
#   flow from the RIGHT into p: neighbor (0, 1) = bit 0
#   flow from ABOVE     into p: neighbor (-1,0) = bit 5
#   flow from BELOW     into p: neighbor (1, 0) = bit 1
_BIT_L, _BIT_R, _BIT_U, _BIT_D = 4, 0, 5, 1

# Lateral (non-diagonal) DIRS8 indices, horizontal pair first. Separable
# steps restrict propagation to these four after the pass's opening FULL
# 8-dir step (the no-change certificate), at a third of the roll cost
# (1 roll per lateral dir vs 2 per diagonal). MEASURED OFF by default:
# lateral-only steps halve per-pass L-inf reach on diagonal geodesics, and
# at T=8 per-pass fixed cost (strip DMA round trips) dominates roll
# compute, so the doubled pass count loses outright — 1080p stage G
# regressed 110 -> 156 ms with separable steps on. Kept behind GSEG_SEP=1
# for re-evaluation if per-pass fixed cost ever shrinks below compute.
_LATERAL_DIRS = (0, 4, 1, 5)


def _sep(fn):
    """Separable-step A/B gate (GSEG_SEP=1 enables — measurement knob)."""
    import os

    return fn if os.environ.get("GSEG_SEP", "0") == "1" else None


def _pick_strip_rows(wp: int) -> int:
    """Strip height for the CLOSURE kernels (_strip_call), sized against
    Mosaic's default 16 MiB scoped-vmem limit: the worst kernel (label+dist
    flood) keeps ~20 SLAB-height (s_rows + 2T) row-planes live (4 scratch
    slabs + step temporaries + staging; 19.4 measured from a 4K compile
    OOM), so solve planes * (s + 2T) * wp * 4 <= budget for s."""
    budget = 15 * 1024 * 1024
    planes = 20
    s = budget // (planes * wp * 4) - 2 * T
    s = min(max(int(s) // 8 * 8, 8), 256)
    return s


# The skip kernel raises the Mosaic scoped-VMEM limit well past the 16 MiB
# default (v5e has 128 MiB physical): fat strips cut the per-pass strip
# count (fewer serialized DMA round trips) AND the halo-recompute fraction
# (2T/slab). Budget covers the multi-buffered slabs + ~16 slab-height
# step-temporary planes (measured: 20 total at 4 single-buffered slabs).
SKIP_VMEM_BUDGET = 72 * 1024 * 1024
SKIP_VMEM_LIMIT = 110 * 1024 * 1024
TEMP_PLANES = 16


# Strip heights below 72 rows deterministically hang the pipelined skip
# kernel on real v5e hardware (s=48 and s=56 reproduce inside _stage_g at
# 1080p; s>=72 never has). The DMA/semaphore schedule balances on paper at
# any height, so this is treated as a timing-exposed Mosaic-level hazard
# and floored empirically. With the floor, the VMEM budget only drops s
# below 72 for padded widths > ~7680 (beyond the 8K ladder rung).
SKIP_MIN_ROWS = 72


def _pick_skip_rows(wp: int, h: int, n_ro: int, n_rw: int,
                    t_steps: int) -> int:
    """Strip height for the prefetch-pipelined skip kernel: ro slabs are
    double-buffered, rw slabs triple-buffered (see _strip_call_skip).
    Capped at ~h/13 (floor-8) so converged-strip skipping keeps useful
    granularity (steady-state pass cost scales with the ACTIVE area) and
    the height pad stays small — measured @1080p: s=80 beats both s=72
    and s=96. The VMEM bound only binds at large widths."""
    import os

    ov = os.environ.get("GSEG_SKIP_ROWS")
    if ov:
        return max(int(ov) // 8 * 8, 8)
    # +n_rw: the refined-wake epilogue keeps the pre-final-step values of
    # every rw field live alongside the final state (last-step change
    # detection).
    planes = 2 * n_ro + 4 * n_rw + TEMP_PLANES
    s = SKIP_VMEM_BUDGET // (planes * wp * 4) - 2 * t_steps
    cap = max(h // 13 // 8 * 8, SKIP_MIN_ROWS)
    s = min(max(int(s) // 8 * 8, SKIP_MIN_ROWS), cap, 512)
    return s


def _nbr(x, dy, dx, rows, wp):
    """x[y+dy, x+dx] via wrapping rolls (validity handled by halo shrink +
    column masks)."""
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % rows, 0)
    if dx:
        out = pltpu.roll(out, (-dx) % wp, 1)
    return out


def _row_variants(x, dirs, rows):
    """{dy: x rolled by dy rows} for every dy the dirs need.

    The three directions sharing each dy reuse ONE row roll (Mosaic CSE of
    identical rolls is not guaranteed): a full 8-direction sweep pays 8
    rolls per field (2 row + 6 lateral) instead of _nbr's 12, bit-identical
    to _nbr (rolls act on independent axes, same dy-then-dx order), and the
    front-loaded independent rolls feed the ~0.3 us amortized-ILP roll path
    (CLAUDE.md cost model). ONLY VALID for fields that are loop-invariant
    across the direction loop (prepare inputs, _subsum_step's s) — the
    flood steps' rw reads are chained (direction d must see the updates of
    directions < d), so they must keep per-direction _nbr reads."""
    dys = {gg.DIRS8[d][0] for d in dirs}
    return {dy: (x if dy == 0 else pltpu.roll(x, (-dy) % rows, 0))
            for dy in dys}


def _lat(x, dx, wp):
    """Lateral (lane-axis) roll of a row variant: x[., x+dx]."""
    return x if dx == 0 else pltpu.roll(x, (-dx) % wp, 1)


def _col_ok(dx, rows, wp):
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    if dx == 1:
        return col < wp - 1
    if dx == -1:
        return col > 0
    return jnp.ones((rows, wp), jnp.bool_)


def _row_ok(dy, rows, wp):
    """Mask off reads that wrap around the SLAB rows (pltpu.roll is
    circular). Column wraps are blocked by _col_ok / the globally-built
    allow bits, but slab-row edges are STRIP boundaries mid-image, where
    up/down adjacency is legitimately allowed — an unmasked wrap there
    reads a row ~s_rows away, and the chained 8-direction step moves the
    bogus value up to 3 rows per step, beating the t-row halo into the
    interior (root cause of the round-3 stable-but-wrong fixpoints: one
    leaked min label through a forbidden edge can never revert)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    if dy == 1:
        return row < rows - 1
    if dy == -1:
        return row > 0
    return jnp.ones((rows, wp), jnp.bool_)


def _dir_ok(dy, dx, rows, wp):
    ok = _col_ok(dx, rows, wp)
    if dy:
        ok = ok & _row_ok(dy, rows, wp)
    return ok


def _seg_closure(reach_lo, reach_hi, combine, fields, n, axis):
    """Bidirectional segmented interval closure along `axis`.

    reach_lo/reach_hi: (rows, wp) int32 0/1 — whether a value may flow from
    the index-1 / index+1 side into each position (pairwise adjacency;
    MUST be 0 at the axis boundary). combine(cands, fields, s, reach) is
    the monotone merge for candidates rolled from distance s. A forward
    then backward staged-doubling scan gives the exact closure over each
    contiguous reach interval.
    """
    for fwd, reach0 in ((True, reach_lo), (False, reach_hi)):
        rch = reach0
        s = 1
        while s < n:
            sh = s if fwd else (-s) % n
            cands = [pltpu.roll(f, sh, axis) for f in fields]
            fields = combine(cands, fields, s, rch)
            if 2 * s < n:
                rch = rch & pltpu.roll(rch, sh, axis)
            s *= 2
    return fields


def _closure_4dir(bits, combine, rw, rows, wp):
    """Full-width row closure using the lane-direction reach bits (the
    orientation-alternating driver supplies the column dimension via the
    transposed pass, where this same closure covers full height)."""
    lo_r = (bits >> _BIT_L) & 1
    hi_r = (bits >> _BIT_R) & 1
    return _seg_closure(lo_r, hi_r, combine, rw, wp, 1)


def _strip_call(prepare_fn, step_fn, closure_fn, ro_fields, rw_fields, h, w,
                s_rows, t_steps):
    """Run a sweep kernel over row strips: t_steps neighbor steps, then an
    optional scan closure, per HBM pass.

    ro_fields/rw_fields: lists of ((H, W) array, sentinel fill).
    Returns (new rw fields, changed flag ()bool).
    """
    wp = -(-w // 128) * 128
    hp = -(-h // s_rows) * s_rows
    nstrips = hp // s_rows
    slab = s_rows + 2 * t_steps

    def padded(x, fill):
        return jnp.pad(
            x, ((t_steps, hp - h + t_steps), (0, wp - w)),
            constant_values=fill,
        )

    if _fastpad_on(w):
        ins = _fast_pad_fields(ro_fields + rw_fields, t_steps, hp, wp)
    else:
        ins = [padded(x, f) for x, f in ro_fields + rw_fields]
    n_ro = len(ro_fields)
    n_rw = len(rw_fields)

    def kernel(*refs):
        in_refs = refs[:n_ro + n_rw]
        out_refs = refs[n_ro + n_rw : n_ro + 2 * n_rw]
        meta_ref = refs[n_ro + 2 * n_rw]
        scratch = refs[n_ro + 2 * n_rw + 1 : -2]
        acc = refs[-2]
        sems = refs[-1]
        i = pl.program_id(0)
        nstrips_ = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc[0] = 0

        cps = []
        for j in range(n_ro + n_rw):
            cp = pltpu.make_async_copy(
                in_refs[j].at[pl.ds(i * s_rows, slab), :], scratch[j],
                sems.at[j],
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        ro = [scratch[j][:] for j in range(n_ro)]
        rw = [scratch[n_ro + j][:] for j in range(n_rw)]
        pre = prepare_fn(ro, slab, wp)

        def step(_, rw):
            return step_fn(pre, list(rw), slab, wp)

        rw = jax.lax.fori_loop(0, t_steps, step, tuple(rw))
        if closure_fn is not None:
            rw = tuple(closure_fn(pre, list(rw), slab, wp))

        # in-kernel convergence: compare the interior against the input slab
        # (still intact in scratch). Pad rows/cols are excluded
        # (sentinel-filled pads can flip once).
        rowg = (
            jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0) + i * s_rows
        )
        colg = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
        valid = (rowg < h) & (colg < w)
        changed = jnp.int32(0)
        for j in range(n_rw):
            out_refs[j][:] = rw[j][t_steps : t_steps + s_rows, :]
            diff = rw[j][t_steps : t_steps + s_rows, :] != scratch[n_ro + j][
                t_steps : t_steps + s_rows, :
            ]
            changed = changed | jnp.max((diff & valid).astype(jnp.int32))
        acc[0] = acc[0] | changed

        @pl.when(i == nstrips_ - 1)
        def _():
            meta_ref[0, 0] = acc[0]

    out_shapes = [
        jax.ShapeDtypeStruct((hp, wp), x.dtype) for x, _ in rw_fields
    ] + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    out_specs = [
        pl.BlockSpec((s_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n_rw)
    ] + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    scratch_shapes = [
        pltpu.VMEM((slab, wp), x.dtype) for x, _ in ro_fields + rw_fields
    ] + [pltpu.SMEM((1,), jnp.int32), pltpu.SemaphoreType.DMA((n_ro + n_rw,))]

    outs = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (n_ro + n_rw),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
    )(*ins)
    if _fastpad_on(w):
        new_rw = _fast_unpad_fields(list(outs[:n_rw]), 0, h, w)
    else:
        new_rw = [o[:h, :w] for o in outs[:n_rw]]
    changed = outs[n_rw][0, 0] > 0
    return new_rw, changed


# Step-only passes before the scan-closure machinery engages. Measured on
# v5e: a step pass costs ~1 ms @1080p while a closure pass-pair costs
# ~15-20 ms @1080p (closure stages are serially-dependent multi-vreg lane
# rolls, ~1-6 us each with no ILP), so closures only pay off past ~512
# sweeps — extreme-diameter components (quality-mode thin shapes,
# pathological inputs) where step passes would need hundreds of HBM
# passes. 16 was measured too low: 4K late-round floods legitimately need
# ~20-30 passes and fell off the closure cliff (gossip 1.78 s vs step-only).
WARM_PASSES = 64


def _strip_call_skip(prepare_fn, step_fn, ro_pad, rw_pad, fills, act,
                     h, w, s_rows, t_steps, sep_fn=None):
    """One prefetch-pipelined pass over PADDED-resident fields with
    per-strip activity gating.

    ro_pad/rw_pad: (hp + 2*t_steps, wp) arrays (pad once per fixpoint, not
    per pass). act: (nstrips,) int32 — strips with act == 0 are skipped
    entirely (no DMA, no compute); their rows survive because the rw
    buffers are input/output aliased.

    Pipeline: each active strip, after waiting its own (long-prefetched)
    input slab, immediately starts the NEXT active strip's input DMA into
    a rotated buffer slot, so the HBM traffic rides under its own compute.
    ro slabs rotate over 2 slots; rw slabs over 3 (slot o+1 receives the
    prefetch while slot o-1's output DMA — waited only two strips later —
    may still be draining). Output DMAs are never waited on the issuing
    strip; the last active strip drains everything before kernel exit.

    Halo freshness: the next strip's TOP halo overlaps this strip's just-
    computed interior when adjacent, so the prefetch DMA covers only slab
    rows [t, slab) and the top t rows are either patched VMEM->VMEM from
    the freshly computed rows (adjacent case — Gauss-Seidel downward) or
    DMA'd separately from HBM (gap case; those rows belong to an inactive,
    therefore unchanged, strip). This keeps every HBM read disjoint from
    every in-flight HBM write, so the pass is deterministic. Upward
    propagation sees previous-pass bottom halos (Jacobi) — sound for
    monotone and nilpotent-affine fixpoints alike: the while_loop only
    exits on a full no-change pass, which then certifies the one-step
    fixpoint exactly as before.

    Returns (new rw_pad, per-strip changed (nstrips,) int32)."""
    wp = rw_pad[0].shape[1]
    hp = rw_pad[0].shape[0] - 2 * t_steps
    nstrips = hp // s_rows
    slab = s_rows + 2 * t_steps
    n_ro = len(ro_pad)
    n_rw = len(rw_pad)
    nf = n_ro + n_rw
    t = t_steps

    # Activity schedule: ordinal among active strips, previous / previous-
    # previous / next active strip index per strip (tiny (nstrips,) scans).
    ia = jnp.arange(nstrips, dtype=jnp.int32)
    a = (act > 0).astype(jnp.int32)
    ord_ = jnp.cumsum(a) - a
    pidx = jnp.where(a > 0, ia, -1)
    prv = jax.lax.associative_scan(jnp.maximum, pidx)
    prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv[:-1]])
    nidx = jnp.where(a > 0, ia, nstrips)
    nxt = jax.lax.associative_scan(jnp.minimum, nidx, reverse=True)
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), nstrips, jnp.int32)])
    prv2 = jnp.where(prv >= 0, prv[jnp.maximum(prv, 0)], -1)

    def slot_of(o, j):
        return o % 2 if j < n_ro else o % 3

    # GSEG_NO_PATCH=1 (debug): full-Jacobi halos — rw top halos always
    # DMA'd from the input buffer, no VMEM patch. Only sound together with
    # GSEG_NO_ALIAS=1 + GSEG_NO_SKIP=1 (input buffer = previous pass).
    no_patch = _os.environ.get("GSEG_NO_PATCH") == "1"
    # GSEG_SYNC=1 (debug): no prefetch, every DMA started and waited by the
    # strip that needs it; out-DMA waited in the issuing epilogue. Implies
    # the no-patch halo sourcing; requires NO_ALIAS + NO_SKIP like it.
    sync = _os.environ.get("GSEG_SYNC") == "1"
    if sync:
        no_patch = True

    def kernel(act_ref, ord_ref, prv_ref, prv2_ref, nxt_ref, *refs):
        in_refs = refs[:nf]
        out_refs = refs[nf : nf + n_rw]
        ch_ref = refs[nf + n_rw]
        scratch = refs[nf + n_rw + 1 : nf + n_rw + 1 + nf]
        body_sems = refs[nf + n_rw + 1 + nf]
        halo_sems = refs[nf + n_rw + 2 + nf]
        out_sems = refs[nf + n_rw + 3 + nf]
        i = pl.program_id(0)

        def body_dma(strip, j, slot):
            return pltpu.make_async_copy(
                in_refs[j].at[pl.ds(strip * s_rows + t, slab - t), :],
                scratch[j].at[slot, pl.ds(t, slab - t), :],
                body_sems.at[slot, j],
            )

        def halo_dma(strip, j, slot):
            return pltpu.make_async_copy(
                in_refs[j].at[pl.ds(strip * s_rows, t), :],
                scratch[j].at[slot, pl.ds(0, t), :],
                halo_sems.at[slot, j],
            )

        def out_dma(strip, j, slot):
            return pltpu.make_async_copy(
                scratch[n_ro + j].at[slot, pl.ds(t, s_rows), :],
                out_refs[j].at[pl.ds(t + strip * s_rows, s_rows), :],
                out_sems.at[slot, j],
            )

        @pl.when(act_ref[i] == 0)
        def _():
            ch_ref[i] = 0

        @pl.when(act_ref[i] > 0)
        def _():
            o = ord_ref[i]
            p1 = prv_ref[i]
            pp = prv2_ref[i]
            n1 = nxt_ref[i]
            first = p1 < 0

            if sync:
                # fully synchronous: self-start everything, every strip.
                for j in range(nf):
                    body_dma(i, j, slot_of(o, j)).start()
                    halo_dma(i, j, slot_of(o, j)).start()
            else:
                # 1. first active strip: nobody prefetched — self-start.
                @pl.when(first)
                def _():
                    for j in range(nf):
                        body_dma(i, j, slot_of(o, j)).start()
                        halo_dma(i, j, slot_of(o, j)).start()

            # 2. wait own input slab. rw halos were VMEM-patched (no DMA)
            # iff an adjacent active predecessor prefetched us.
            for j in range(nf):
                body_dma(i, j, slot_of(o, j)).wait()
            for j in range(n_ro):
                halo_dma(i, j, slot_of(o, j)).wait()
            for j in range(n_ro, nf):
                if no_patch:
                    halo_dma(i, j, slot_of(o, j)).wait()
                else:
                    @pl.when(first | (p1 != i - 1))
                    def _(j=j):
                        halo_dma(i, j, slot_of(o, j)).wait()

            # 3. prefetch the next active strip before computing.
            @pl.when(jnp.bool_(not sync) & (n1 < nstrips))
            def _():
                # rw target slot (o+1)%3 still has ordinal o-2's out-DMA.
                @pl.when(pp >= 0)
                def _():
                    for j in range(n_rw):
                        out_dma(pp, j, (o + 1) % 3).wait()
                for j in range(nf):
                    body_dma(n1, j, slot_of(o + 1, j)).start()
                for j in range(n_ro):
                    halo_dma(n1, j, slot_of(o + 1, j)).start()
                # adjacent rw halos come from this strip's fresh interior
                # (VMEM patch in the epilogue), never from HBM.
                if no_patch:
                    for j in range(n_ro, nf):
                        halo_dma(n1, j, slot_of(o + 1, j)).start()
                else:
                    @pl.when(n1 > i + 1)
                    def _():
                        for j in range(n_ro, nf):
                            halo_dma(n1, j, slot_of(o + 1, j)).start()

            # 4. compute t in-VMEM steps on this slot.
            ro = [scratch[j][slot_of(o, j)] for j in range(n_ro)]
            rw = [scratch[n_ro + j][slot_of(o, n_ro + j)]
                  for j in range(n_rw)]
            pre = prepare_fn(ro, slab, wp)

            # Step 0 is always the FULL step (the pass's no-change
            # certificate); remaining steps use the cheap separable
            # variant when one is provided (see _LATERAL_DIRS).
            rw = tuple(step_fn(pre, list(rw), slab, wp))

            def step(_, rw):
                return (sep_fn or step_fn)(pre, list(rw), slab, wp)

            # Refined wake (self-reactivation on LAST-step change): keep
            # the state before the final step alive so the epilogue can
            # tell "still propagating internally" (last step changed
            # something) from "settled this pass" (earlier steps changed,
            # final step a no-op == local fixpoint w.r.t. current halos;
            # steps are deterministic and `pre` is pass-constant, so one
            # more pass over the same inputs would be a full no-op — the
            # old certificate pass, now skipped). INVALID with a separable
            # step variant: a lateral-only no-op does not certify the FULL
            # 8-dir step, so sep runs keep whole-pass change as self-wake.
            refined = sep_fn is None and t_steps > 1
            if refined:
                prev = jax.lax.fori_loop(1, t_steps - 1, step, rw)
                rw = tuple(step(0, prev))
            else:
                rw = jax.lax.fori_loop(1, t_steps, step, rw)

            # 5. epilogue: change detection, write-back, out-DMA (no wait),
            # adjacent-halo patch for the prefetched strip. Per-strip flag
            # is a bitmask: bit0 self-wake (last-step change; whole-pass
            # change when not refined), bit1 top-band change (interior
            # rows [0, t) — the strip above reads them as its bottom
            # halo), bit2 bottom-band change (rows [s-t, s) — the strip
            # below's top halo). _step_fixpoint turns bands into neighbor
            # wakes; a band-quiet settled strip goes inactive immediately
            # instead of paying the old trailing certificate pass.
            rowg = (
                jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0)
                + i * s_rows
            )
            colg = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
            valid = (rowg < h) & (colg < w)
            rowl = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0)
            top_band = valid & (rowl < t)
            bot_band = valid & (rowl >= s_rows - t)
            ch_self = jnp.int32(0)
            ch_top = jnp.int32(0)
            ch_bot = jnp.int32(0)
            for j in range(n_rw):
                slot = slot_of(o, n_ro + j)
                new = rw[j][t : t + s_rows, :]
                diff = new != scratch[n_ro + j][slot, t : t + s_rows, :]
                ch_top = ch_top | jnp.max((diff & top_band).astype(jnp.int32))
                ch_bot = ch_bot | jnp.max((diff & bot_band).astype(jnp.int32))
                if refined:
                    dlast = new != prev[j][t : t + s_rows, :]
                    ch_self = ch_self | jnp.max(
                        (dlast & valid).astype(jnp.int32)
                    )
                else:
                    ch_self = ch_self | jnp.max(
                        (diff & valid).astype(jnp.int32)
                    )
                scratch[n_ro + j][slot, t : t + s_rows, :] = new
                out_dma(i, j, slot).start()
                if sync:
                    out_dma(i, j, slot).wait()

                if not no_patch:
                    @pl.when((n1 < nstrips) & (n1 == i + 1))
                    def _(j=j, slot=slot):
                        scratch[n_ro + j][
                            slot_of(o + 1, n_ro + j), 0:t, :
                        ] = scratch[n_ro + j][slot, s_rows : s_rows + t, :]
            ch_ref[i] = ch_self | (ch_top << 1) | (ch_bot << 2)

            # 6. last active strip: drain every outstanding out-DMA.
            @pl.when(jnp.bool_(not sync) & (n1 >= nstrips))
            def _():
                for j in range(n_rw):
                    out_dma(i, j, o % 3).wait()

                @pl.when(p1 >= 0)
                def _():
                    for j in range(n_rw):
                        out_dma(p1, j, (o + 2) % 3).wait()

                @pl.when(pp >= 0)
                def _():
                    for j in range(n_rw):
                        out_dma(pp, j, (o + 1) % 3).wait()

    outs = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        + [pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_rw
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype) for x in rw_pad
        ] + [jax.ShapeDtypeStruct((nstrips,), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2 if j < n_ro else 3, slab, wp),
                       (ro_pad + rw_pad)[j].dtype)
            for j in range(nf)
        ] + [
            pltpu.SemaphoreType.DMA((3, nf)),
            pltpu.SemaphoreType.DMA((3, nf)),
            pltpu.SemaphoreType.DMA((3, n_rw)),
        ],
        input_output_aliases=(
            {} if _os.environ.get("GSEG_NO_ALIAS") == "1"
            else {5 + n_ro + j: j for j in range(n_rw)}
        ),  # GSEG_NO_ALIAS=1 (debug): fresh outputs — only valid with
        # GSEG_NO_SKIP=1 (skipped strips' rows are never written)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=SKIP_VMEM_LIMIT,
        ),
    )(*jax.lax.optimization_barrier(
        (act, ord_, prv, prv2, nxt, *ro_pad, *rw_pad)
    ))
    return list(outs[:n_rw]), outs[n_rw]


def _pad_field(x, fill, t_steps, hp, wp):
    h, w = x.shape
    return jnp.pad(
        x, ((t_steps, hp - h + t_steps), (0, wp - w)), constant_values=fill
    )


FASTPAD_FB = 64  # fill-tile rows resident in VMEM per field


def _fastpad_on(w: int) -> bool:
    """DMA pad/unpad vs XLA pad+slice at fixpoint entry/exit.

    Measured end-to-end (r5 sweep, oracle-gated): the DMA path LOSES
    ~5 ms @1080p (per-call kernel-launch overhead beats the pad saving at
    8 MB fields) but cuts the 4K per-call floor ~2x (probe_pieces /
    probe_floor: flood floor 7.0 -> 3.2 ms; 33 MB fields amortize the
    launch). auto = on for wide images only. GSEG_FASTPAD: 0 = never,
    1 = always, unset/auto = width-gated."""
    v = _os.environ.get("GSEG_FASTPAD", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return w >= 2560


def _fast_pad_fields(fields, t_steps, hp, wp):
    """Pad k (h, w) fields to (hp + 2*t_steps, wp) — per-field fill values
    — in ONE Pallas program of HBM->HBM DMAs.

    XLA's pad+slice materialization costs ~2.5 ms per 3-field fixpoint
    entry @1080p (probe_floor r5) — far off DMA speed. v2 writes ONLY the
    actual pad regions (top band t rows, bottom band hp-h+t rows; the
    width pad is excluded by the gate) from a VMEM fill tile, then copies
    the data block: fill traffic drops from full-surface to a few hundred
    KB, so the data DMA dominates. Requires t_steps % 8 == 0 and
    h % 8 == 0 (Mosaic DMA row-offset tiling) and w == wp (lane-aligned
    width); otherwise falls back to the XLA pad.

    fields: [(x, fill), ...] with identical (h, w) shapes (mixed dtypes
    fine). Returns k arrays of (hp + 2*t_steps, wp).
    """
    k = len(fields)
    h, w = fields[0][0].shape
    hpad = hp + 2 * t_steps
    if hpad == h and wp == w:
        return [x for x, _ in fields]
    if t_steps % 8 or h % 8 or w != wp:
        return [_pad_field(x, f, t_steps, hp, wp) for x, f in fields]
    # fills must be PYTHON scalars: an array fill would be captured as a
    # kernel constant (pallas_call rejects those), and under an outer jit
    # it is a Tracer that cannot be converted at all.
    for _, f in fields:
        if not isinstance(f, (int, float)):
            raise TypeError(
                f"_fast_pad_fields fill must be a python scalar, got "
                f"{type(f)} — pass the fill statically")
    fills = [f for _, f in fields]
    dtypes = [x.dtype for x, _ in fields]
    bot0 = t_steps + h             # first bottom pad row
    nbot = hpad - bot0             # bottom pad rows (hp - h + t_steps)
    fb = max(t_steps, nbot)        # fill tile tall enough for both bands

    def kernel(*refs):
        in_refs = refs[:k]
        out_refs = refs[k:2 * k]
        fill_bufs = refs[2 * k:3 * k]
        band_sems = refs[3 * k]
        data_sems = refs[3 * k + 1]
        for j in range(k):
            fill_bufs[j][...] = jnp.full((fb, wp), fills[j], dtypes[j])

        def band_dmas(j):
            out = []
            if t_steps:
                out.append(pltpu.make_async_copy(
                    fill_bufs[j].at[pl.ds(0, t_steps), :],
                    out_refs[j].at[pl.ds(0, t_steps), :],
                    band_sems.at[j, 0],
                ))
            if nbot:
                out.append(pltpu.make_async_copy(
                    fill_bufs[j].at[pl.ds(0, nbot), :],
                    out_refs[j].at[pl.ds(bot0, nbot), :],
                    band_sems.at[j, 1],
                ))
            return out

        def data_dma(j):
            return pltpu.make_async_copy(
                in_refs[j],
                out_refs[j].at[pl.ds(t_steps, h), :],
                data_sems.at[j],
            )

        for j in range(k):
            for c in band_dmas(j):
                c.start()
            data_dma(j).start()
        for j in range(k):
            for c in band_dmas(j):
                c.wait()
            data_dma(j).wait()

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_shape=[
            jax.ShapeDtypeStruct((hpad, wp), dt) for dt in dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((fb, wp), dt) for dt in dtypes
        ] + [
            pltpu.SemaphoreType.DMA((k, 2)),
            pltpu.SemaphoreType.DMA((k,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*[x for x, _ in fields])
    return list(outs)


def _fast_unpad_fields(fields, t_steps, h, w):
    """Slice k (hp + 2t, wp) arrays back to (h, w) via HBM->HBM DMAs
    (the exit half of _fast_pad_fields; XLA slices share the pad's slow
    materialization)."""
    k = len(fields)
    if fields[0].shape == (h, w) and t_steps == 0:
        return list(fields)
    if t_steps % 8 or h % 8 or fields[0].shape[1] != w:
        return [x[t_steps:t_steps + h, :w] for x in fields]

    def kernel(*refs):
        in_refs = refs[:k]
        out_refs = refs[k:2 * k]
        sems = refs[2 * k]
        for j in range(k):
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(t_steps, h), pl.ds(0, w)],
                out_refs[j],
                sems.at[j],
            ).start()
        for j in range(k):
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(t_steps, h), pl.ds(0, w)],
                out_refs[j],
                sems.at[j],
            ).wait()

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), x.dtype) for x in fields
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*fields)
    return list(outs)


def _step_fixpoint(prepare_fn, step_fn, ro_row, rw_fields, h, w, max_passes,
                   t_steps=T, sep_fn=None, seed_mask=None, idle=None):
    """Step-only T-step passes with converged-strip skipping.

    Fields stay padded and resident across the whole fixpoint; each pass
    only recomputes strips whose slab range changed in the previous pass.
    Most fixpoint work concentrates on a few active regions after the
    first couple of passes, so steady-state pass cost scales with the
    active area, not the image.

    Wake protocol (see _strip_call_skip's epilogue bitmask): a strip
    reactivates itself only while its final in-VMEM step still changes
    something; neighbors reactivate only when the t halo-feeding interior
    rows they read actually changed. A skipped strip's rows cannot change
    (aliased outputs), so band quiescence certifies its last-computed
    local fixpoint stays valid — the loop exits at exactly the same global
    fixpoint as the old whole-pass-no-change protocol, minus the trailing
    certificate passes.

    seed_mask: optional (H, W) bool — pass-1 activity seed. CALLER
    CONTRACT: any strip whose slab (interior + one-strip dilation, which
    covers the t-row halos) contains no True pixel must already be at a
    local fixpoint of step_fn (e.g. label floods: labels/Int uniform per
    component away from hook edges). Such strips never run until a
    neighbor's band change wakes them. Returns (rw, unconverged, passes).

    idle: optional traced () bool — when True the WHOLE state is already
    at the global fixpoint and every strip starts inactive (zero passes,
    fields returned unchanged). CALLER CONTRACT mirrors seed_mask's: only
    pass True when the fixpoint holds by construction (e.g. compmin on a
    round-1 all-singleton label map has no same-label edges at all, so the
    identity is the fixpoint — models/turbo.py _ground idle_compmin).
    """
    wp = -(-w // 128) * 128
    s_rows = _pick_skip_rows(wp, h, len(ro_row), len(rw_fields), t_steps)
    hp = -(-h // s_rows) * s_rows
    nstrips = hp // s_rows
    if _fastpad_on(w):
        allp = _fast_pad_fields(ro_row + rw_fields, t_steps, hp, wp)
        ro_pad, rw_pad = allp[:len(ro_row)], allp[len(ro_row):]
    else:
        ro_pad = [_pad_field(x, f, t_steps, hp, wp) for x, f in ro_row]
        rw_pad = [_pad_field(x, f, t_steps, hp, wp) for x, f in rw_fields]
    fills = [f for _, f in rw_fields]

    def cond(st):
        act, it = st[0], st[1]
        return (jnp.max(act) > 0) & (it < max_passes)

    no_skip = _os.environ.get("GSEG_NO_SKIP") == "1"  # debug: all strips
    # active every pass (isolates skip-gating from DMA pipelining)

    def body(st):
        act, it, rw = st
        if no_skip:
            act = jnp.ones_like(act)
        rw, ch = _strip_call_skip(
            prepare_fn, step_fn, ro_pad, list(rw), fills, act,
            h, w, s_rows, t_steps, sep_fn=sep_fn,
        )
        slf = ch & 1
        top = (ch >> 1) & 1
        bot = (ch >> 2) & 1
        # my bottom halo = strip i+1's top t rows; my top halo = strip
        # i-1's bottom t rows.
        up = jnp.concatenate([top[1:], jnp.zeros((1,), jnp.int32)])
        dn = jnp.concatenate([jnp.zeros((1,), jnp.int32), bot[:-1]])
        return slf | up | dn, it + jnp.int32(1), tuple(rw)

    if seed_mask is not None and not no_skip:
        m = jnp.pad(seed_mask, ((0, hp - h), (0, 0)))
        ms = jnp.max(m.reshape(nstrips, -1).astype(jnp.int32), axis=1)
        act0 = ms | jnp.concatenate(
            [ms[1:], jnp.zeros((1,), jnp.int32)]
        ) | jnp.concatenate([jnp.zeros((1,), jnp.int32), ms[:-1]])
    else:
        act0 = jnp.ones((nstrips,), jnp.int32)
    if idle is not None and not no_skip:
        act0 = jnp.where(idle, jnp.zeros_like(act0), act0)
    st = (act0, jnp.int32(0), tuple(rw_pad))
    st = jax.lax.while_loop(cond, body, st)
    if _fastpad_on(w):
        out = _fast_unpad_fields(list(st[2]), t_steps, h, w)
    else:
        out = [x[t_steps : t_steps + h, :w] for x in st[2]]
    return out, jnp.max(st[0]) > 0, st[1]


def _hybrid_fixpoint(prepare_fn, step_fn, closure_fn, ro_row, ro_col,
                     rw_fields, h, w, max_passes, sep_fn=None, t_steps=T,
                     seed_mask=None, idle=None):
    """Two-phase fixpoint driver.

    Phase 1 — cheap T-step passes in row orientation only (no closures):
    components whose diameter fits a few T-step passes (the common case
    after the gossip gate at moderate resolutions) converge here at minimum
    cost. Phase 2 — if still unconverged, alternate (H, W) and transposed
    (W, H) scan-closure passes: each pair performs a full-width AND a
    full-height segmented closure, so convergence is bounded by the
    component's staircase complexity, not its diameter (the 4K/8K and
    quality-mode thin-component regime). Returns (rw, unconverged).
    """
    s_row = _pick_strip_rows(-(-w // 128) * 128)
    s_col = _pick_strip_rows(-(-h // 128) * 128)
    fills = [f for _, f in rw_fields]

    rw1, unconv1, p1 = _step_fixpoint(
        prepare_fn, step_fn, ro_row, rw_fields, h, w,
        min(max_passes, WARM_PASSES), t_steps=t_steps, sep_fn=sep_fn,
        seed_mask=seed_mask, idle=idle,
    )
    st = (unconv1, p1, tuple(rw1))

    def cond2(st):
        return st[0] & (st[1] < max_passes)

    def body2(st):
        _, it, rw = st
        rw, ch1 = _strip_call(
            prepare_fn, step_fn, closure_fn, ro_row,
            list(zip(rw, fills)), h, w, s_row, T_SCAN,
        )
        rw_t = [x.T for x in rw]
        rw_t, ch2 = _strip_call(
            prepare_fn, step_fn, closure_fn, ro_col,
            list(zip(rw_t, fills)), w, h, s_col, T_SCAN,
        )
        rw = tuple(x.T for x in rw_t)
        return ch1 | ch2, it + jnp.int32(1), rw

    st = jax.lax.while_loop(cond2, body2, st)
    # st[0] still True at exit <=> the pass budget ended the loop unconverged.
    return list(st[2]), st[0], st[1]


# ---------------------------------------------------------------------------
# variant bodies
# ---------------------------------------------------------------------------


def _same_bits(L, rows, wp):
    """Per-pixel bitmask: bit d set iff the dir-d neighbor has the same
    label (and the read does not wrap a slab edge — see _row_ok). Computed
    once per pass — L is constant across the in-VMEM iterations."""
    bits = jnp.zeros(L.shape, jnp.int32)
    rv = _row_variants(L, range(8), rows)
    for d, (dy, dx) in enumerate(gg.DIRS8):
        nL = _lat(rv[dy], dx, wp)
        ok = (nL == L) & _dir_ok(dy, dx, rows, wp)
        bits = bits | (ok.astype(jnp.int32) << d)
    return bits


def _compmin_prepare(ro, rows, wp):
    (L,) = ro
    return (_same_bits(L, rows, wp),)


def _compmin_step(pre, rw, rows, wp, dirs=tuple(range(8))):
    (bits,) = pre
    bw, be, sz = rw
    # NOTE: the rw reads are CHAINED (direction d sees the updates of
    # directions < d — that's what moves values up to 3 rows per step), so
    # row-roll sharing via _row_variants is INVALID here; only loop-
    # invariant fields (prepare inputs, _subsum_step's s) may share.
    for d in dirs:
        dy, dx = gg.DIRS8[d]
        same = ((bits >> d) & 1) > 0
        nbw = _nbr(bw, dy, dx, rows, wp)
        nbe = _nbr(be, dy, dx, rows, wp)
        nsz = _nbr(sz, dy, dx, rows, wp)
        take = same & ((nbw < bw) | ((nbw == bw) & (nbe < be)))
        bw = jnp.where(take, nbw, bw)
        be = jnp.where(take, nbe, be)
        sz = jnp.where(same & (nsz > sz), nsz, sz)
    return bw, be, sz


_compmin_sep = functools.partial(_compmin_step, dirs=_LATERAL_DIRS)


def _compmin_combine(cands, fields, s, rch):
    cw, ce, csz = cands
    bw, be, sz = fields
    ok = rch > 0
    take = ok & ((cw < bw) | ((cw == bw) & (ce < be)))
    bw = jnp.where(take, cw, bw)
    be = jnp.where(take, ce, be)
    sz = jnp.where(ok & (csz > sz), csz, sz)
    return [bw, be, sz]


def _compmin_closure(pre, rw, rows, wp):
    (bits,) = pre
    return _closure_4dir(bits, _compmin_combine, rw, rows, wp)


def _allow_prepare(ro, rows, wp):
    (allow,) = ro
    # Fold the slab-row wrap masks into the allow bits ONCE PER PASS:
    # pltpu.roll is circular, so dy=-1 reads wrap on slab row 0 and dy=+1
    # reads wrap on slab row rows-1 — strip boundaries mid-image, where
    # up/down adjacency is otherwise legitimately allowed (the round-3
    # stable-but-wrong-fixpoint leak, commit c9fccc6). Clearing those
    # direction bits here keeps the fix exact while the in-VMEM step loop
    # pays only the original single allow-bit test per direction: a
    # _row_ok call inside the step body would re-run its iota + compare +
    # and on EVERY fori_loop iteration (Mosaic does not hoist it).
    row = jax.lax.broadcasted_iota(jnp.int32, allow.shape, 0)
    up = jnp.int32(sum(1 << d for d, (dy, _) in enumerate(gg.DIRS8)
                       if dy < 0))
    dn = jnp.int32(sum(1 << d for d, (dy, _) in enumerate(gg.DIRS8)
                       if dy > 0))
    allow = jnp.where(row == 0, allow & ~up, allow)
    allow = jnp.where(row == rows - 1, allow & ~dn, allow)
    return (allow,)


def _label_step(pre, rw, rows, wp, dirs=tuple(range(8))):
    """Min-label flood with BFS dist riding along: adopting a smaller label
    overwrites dist with nd+1; equal labels relax dist. At the fixpoint dist
    is the exact BFS level from the new cluster root (labels only decrease,
    so a kept label pins its source neighbor's label too — the staleness
    argument in models/turbo.py _label_gossip)."""
    (allow,) = pre
    Lc, idf, dist = rw
    big = jnp.int32(1 << 30)
    for d in dirs:
        dy, dx = gg.DIRS8[d]
        # slab-row wraps are pre-masked in _allow_prepare (once per pass),
        # so a single allow-bit test suffices per step.
        ok = ((allow >> d) & 1) > 0
        nL = _nbr(Lc, dy, dx, rows, wp)
        nid = _nbr(idf, dy, dx, rows, wp)
        nd = _nbr(dist, dy, dx, rows, wp)
        cand = jnp.where(nd >= big, big, nd + 1)
        adopt = ok & (nL < Lc)
        relax = ok & (nL == Lc) & (cand < dist)
        dist = jnp.where(adopt, cand, jnp.where(relax, cand, dist))
        Lc = jnp.where(adopt, nL, Lc)
        idf = jnp.where(ok & (nid > idf), nid, idf)
    return Lc, idf, dist


_label_sep = functools.partial(_label_step, dirs=_LATERAL_DIRS)


def _labelnd_step(pre, rw, rows, wp, dirs=tuple(range(8))):
    """Dist-free min-label flood + Int max ride (see models/turbo.py
    _label_gossip_nd)."""
    (allow,) = pre
    Lc, idf = rw
    for d in dirs:
        dy, dx = gg.DIRS8[d]
        # slab-row wraps pre-masked in _allow_prepare (see _label_step).
        ok = ((allow >> d) & 1) > 0
        nL = _nbr(Lc, dy, dx, rows, wp)
        nid = _nbr(idf, dy, dx, rows, wp)
        adopt = ok & (nL < Lc)
        Lc = jnp.where(adopt, nL, Lc)
        idf = jnp.where(ok & (nid > idf), nid, idf)
    return Lc, idf


_labelnd_sep = functools.partial(_labelnd_step, dirs=_LATERAL_DIRS)


def _labelnd_combine(cands, fields, s, rch):
    cL, cid = cands
    Lc, idf = fields
    ok = rch > 0
    Lc = jnp.where(ok & (cL < Lc), cL, Lc)
    idf = jnp.where(ok & (cid > idf), cid, idf)
    return [Lc, idf]


def _labelnd_closure(pre, rw, rows, wp):
    (allow,) = pre
    return _closure_4dir(allow, _labelnd_combine, rw, rows, wp)


def _value_step(pre, rw, rows, wp, dirs=tuple(range(8))):
    """Min-value broadcast within same-label regions (final-map apply)."""
    (bits,) = pre
    (val,) = rw
    for d in dirs:
        dy, dx = gg.DIRS8[d]
        same = ((bits >> d) & 1) > 0
        nv = _nbr(val, dy, dx, rows, wp)
        val = jnp.where(same & (nv < val), nv, val)
    return (val,)


_value_sep = functools.partial(_value_step, dirs=_LATERAL_DIRS)


def _value_combine(cands, fields, s, rch):
    (cv,) = cands
    (val,) = fields
    return [jnp.where((rch > 0) & (cv < val), cv, val)]


def _value_closure(pre, rw, rows, wp):
    (bits,) = pre
    return _closure_4dir(bits, _value_combine, rw, rows, wp)


def _subsum_prepare(ro, rows, wp):
    (pdir,) = ro
    child = jnp.zeros(pdir.shape, jnp.int32)
    rv = _row_variants(pdir, range(8), rows)
    for d, (dy, dx) in enumerate(gg.DIRS8):
        np_ = _lat(rv[dy], dx, wp)
        ok = (np_ == _REV[d]) & _dir_ok(dy, dx, rows, wp)
        child = child | (ok.astype(jnp.int32) << d)
    return (child,)


def _subsum_step(pre, rw, rows, wp):
    (child,) = pre
    (s,) = rw
    total = jnp.ones_like(s)
    # s is loop-invariant across directions (only `total` accumulates), so
    # row-roll sharing is exact here — unlike the chained flood steps.
    rv = _row_variants(s, range(8), rows)
    for d, (dy, dx) in enumerate(gg.DIRS8):
        ns = _lat(rv[dy], dx, wp)
        total = total + jnp.where(((child >> d) & 1) > 0, ns, 0)
    return (total,)


# ---------------------------------------------------------------------------
# public entry points (drop-in for the XLA sweeps in models/turbo.py)
# ---------------------------------------------------------------------------


def pack_allow_bits(allow8_list):
    """(list of 8 (H, W) bool planes, DIRS8 order) -> packed int32 bits."""
    bits = jnp.zeros(allow8_list[0].shape, jnp.int32)
    for d in range(8):
        bits = bits | (allow8_list[d].astype(jnp.int32) << d)
    return bits


def transpose_allow_bits(bits):
    """Allow bitmask for the transposed layout: transpose the plane and
    permute direction bits under (dy, dx) -> (dx, dy)."""
    bt = bits.T
    out = jnp.zeros_like(bt)
    for d in range(8):
        out = out | (((bt >> _TRANSPOSE_PERM[d]) & 1) << d)
    return out


def compmin_gossip(L, bw, be, sz, max_sweeps, closures=True,
                   phase=None, idle=None):
    """Returns (bw, be, sz, unconverged, passes).

    idle: optional traced () bool — True when (bw, be, sz) is already the
    component-wide fixpoint by construction (round 1: L is all-singleton,
    so there are no same-label edges and the per-vertex values ARE the
    component reductions). Zero passes, ~5.9 ms @1080p / ~24 ms @4K of
    pure full-image certificate work saved (probe_pieces r4).

    closures=False runs step-only passes with the FULL pass budget instead
    of the two-phase hybrid: the speed path's components converge well
    inside the budget (diameters at the gossip gate are ~resolution-
    independent), converged-strip skipping keeps late passes active-area
    priced, and dropping the closure kernels (+ their transposed-layout
    twins) removes a large share of program compile time. Quality mode
    (thin high-diameter components) keeps the closure safety net."""
    h, w = L.shape
    t = _pick_t(w, phase)
    max_passes = -(-max_sweeps // t)
    rw = [(bw, jnp.inf), (be, jnp.iinfo(jnp.int32).max), (sz, 0)]
    if not closures:
        (bw, be, sz), unconv, passes = _step_fixpoint(
            _compmin_prepare, _compmin_step, [(L, -1)], rw, h, w,
            max_passes, t_steps=t, sep_fn=_sep(_compmin_sep), idle=idle,
        )
        return bw, be, sz, unconv, passes
    (bw, be, sz), unconv, passes = _hybrid_fixpoint(
        _compmin_prepare, _compmin_step, _compmin_closure,
        [(L, -1)], [(L.T, -1)], rw,
        h, w, max_passes, sep_fn=_sep(_compmin_sep), t_steps=t, idle=idle,
    )
    return bw, be, sz, unconv, passes


def label_gossip(allow_bits, Lc, idf, dist, max_sweeps, phase=None):
    """Returns (Lc, idf, dist, unconverged). allow_bits: packed DIRS8 allow
    adjacency (see pack_allow_bits — same-old-label | merge-mark edges).
    dist: BFS level from the new cluster root, seeded 0 at old roots / BIG
    elsewhere (rides the flood — one fused fixpoint, lexicographic with the
    label in the min-plus semiring).

    Precondition: allow bits never point across the image boundary for the
    mark component (the producer guarantees this — an out-of-bounds edge has
    +inf weight and is never a component min edge). Same-label bits are
    boundary-safe by the sentinel pad.
    """
    h, w = Lc.shape
    t = _pick_t(w, phase)
    max_passes = -(-max_sweeps // t)
    (Lc, idf, dist), unconv, passes = _step_fixpoint(
        _allow_prepare, _label_step,
        [(allow_bits, 0)],
        [(Lc, jnp.iinfo(jnp.int32).max), (idf, 0.0),
         (dist, 1 << 30)],
        h, w, max_passes, t_steps=t, sep_fn=_sep(_label_sep),
    )
    return Lc, idf, dist, unconv, passes


def label_flood(allow_bits, Lc, idf, max_sweeps, closures=True,
                phase=None, seed_mask=None):
    """Dist-free min-label flood. Returns (Lc, idf, unconverged, passes).

    The production stage-G flood for rounds sized by the root list
    (models/turbo.py): without the riding BFS dist the fields are pure
    min/max semilattices, so the scan closures converge in staircase
    complexity at any component diameter. closures=False: see
    compmin_gossip.

    seed_mask: optional (H, W) bool — True where a hook (cross-label
    allow) edge touches. Away from hooks Lc/idf are uniform per old
    component (the caller's converged state), so hook-free strips satisfy
    the _step_fixpoint local-fixpoint seeding contract."""
    h, w = Lc.shape
    t = _pick_t(w, phase)
    max_passes = -(-max_sweeps // t)
    rw = [(Lc, jnp.iinfo(jnp.int32).max), (idf, 0.0)]
    if not closures:
        (Lc, idf), unconv, passes = _step_fixpoint(
            _allow_prepare, _labelnd_step, [(allow_bits, 0)], rw, h, w,
            max_passes, t_steps=t, sep_fn=_sep(_labelnd_sep),
            seed_mask=seed_mask,
        )
        return Lc, idf, unconv, passes
    (Lc, idf), unconv, passes = _hybrid_fixpoint(
        _allow_prepare, _labelnd_step, _labelnd_closure,
        [(allow_bits, 0)], [(transpose_allow_bits(allow_bits), 0)],
        rw, h, w, max_passes, sep_fn=_sep(_labelnd_sep), t_steps=t,
        seed_mask=seed_mask,
    )
    return Lc, idf, unconv, passes


def value_flood(L, val, max_sweeps, closures=True, phase=None,
                seed_mask=None):
    """Min-value broadcast within same-L regions. Returns (val, unconverged,
    passes).

    Used by the turbo final-map apply: the final label is scattered onto each
    component's root pixel and flooded to the rest — replacing a V-sized
    random gather (~7 ns/index) with dense passes. closures=False: see
    compmin_gossip (final components can span the image, but the step-only
    wavefront is active-area priced while a 4K closure pass-pair is not).

    seed_mask: optional (H, W) bool — True where val is seeded below the
    sentinel (root slots). Seed-free strips hold uniform sentinel values,
    a local fixpoint of the min-broadcast step (seeding contract)."""
    h, w = L.shape
    t = _pick_t(w, phase)
    rw = [(val, jnp.iinfo(jnp.int32).max)]
    if not closures:
        (val,), unconv, passes = _step_fixpoint(
            _compmin_prepare, _value_step, [(L, -1)], rw, h, w,
            -(-max_sweeps // t), t_steps=t, sep_fn=_sep(_value_sep),
            seed_mask=seed_mask,
        )
        return val, unconv, passes
    (val,), unconv, passes = _hybrid_fixpoint(
        _compmin_prepare, _value_step, _value_closure,
        [(L, -1)], [(L.T, -1)],
        rw, h, w, -(-max_sweeps // t),
        sep_fn=_sep(_value_sep), t_steps=t, seed_mask=seed_mask,
    )
    return val, unconv, passes


def subtree_sums(pdir, s, max_sweeps, phase=None):
    """Returns (sums, unconverged). Affine fixpoint (not idempotent): plain
    step passes, single orientation — converges in BFS-tree-depth steps
    (skip-strips is sound here too: the fixpoint is unique by nilpotency
    and an unchanged-input strip recomputes to the same values)."""
    h, w = pdir.shape
    t = _pick_t(w, phase)
    (sv,), unconv, _ = _step_fixpoint(
        _subsum_prepare, _subsum_step, [(pdir, 8)], [(s, 0)], h, w,
        -(-max_sweeps // t), t_steps=t,
    )
    return sv, unconv
