"""Promote oracle-gated sweep winners into the evidence-campaign env.

Reads bench_out/sweep.jsonl (written by scripts/sweep_knobs.py on the real
chip) and emits shell `export` lines for knob configs that are SAFE and
FASTER, so `scripts/on_tunnel_up.sh` can run unattended: sweep -> promote
-> evidence, with no human in the loop (round-4 reality: the tunnel can
come back while no session is alive).

Promotion rules — deliberately conservative (CLAUDE.md round-3 rule: a
knob config wins by measured speed WITH an exact oracle partition, never
by speed alone):

  speed mode (weight_buckets=0 rows):
    - candidate must have a valid row (no error) with oracle_equal=true at
      EVERY shape where baseline has a valid row (>=1 shape required);
    - candidate must be faster than baseline at EVERY such shape by
      >2% (mean_ms); the single best candidate by geometric-mean speedup
      is promoted.

  quality mode (weight_buckets=16 rows):
    - same oracle/coverage requirements;
    - promoted if mean_ms <= 1.15x baseline AND compile_s <= 0.7x baseline
      (the wb16 lever is COMPILE cost — Mosaic aggregate, see
      docs/RESULTS_r4.md §3 — so a small runtime give-back is acceptable);
      ties broken by (compile_s + 5 * mean_s) across shapes.

Speed and quality winners touch disjoint GSEG_* variables, so their knob
dicts are unioned. Nothing is emitted (empty file) when no candidate
qualifies — the campaign then runs library defaults.

This promotes env FOR THE CAMPAIGN only; making a knob a code default
still requires scripts/check_tpu_parity.py under that env (the 20-seed
quality sweep is the strongest wrong-partition detector).

Usage: python scripts/promote_knobs.py [--sweep bench_out/sweep.jsonl]
           [--out bench_out/promoted_env.sh]
"""
import argparse
import json
import math
import os


def _load(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _valid(rows):
    """config -> {(h, w) -> best row}, oracle-verified timed rows only."""
    out = {}
    for r in rows:
        if "error" in r or "mean_ms" not in r:
            continue
        if not r.get("oracle_equal", False):
            continue
        shp = (r["height"], r["width"])
        cur = out.setdefault(r["config"], {})
        # keep the best (latest sweeps append; prefer min mean_ms)
        if shp not in cur or r["mean_ms"] < cur[shp]["mean_ms"]:
            cur[shp] = r
    return out


def pick_speed(rows):
    byc = _valid([r for r in rows if r.get("weight_buckets", 0) == 0])
    base = byc.get("baseline", {})
    if not base:
        return None, "no oracle-verified baseline rows"
    best, best_gain = None, 1.0
    for name, shapes in byc.items():
        if name == "baseline":
            continue
        if set(base) - set(shapes):
            continue  # must cover every baseline shape
        ratios = [base[s]["mean_ms"] / shapes[s]["mean_ms"] for s in base]
        if min(ratios) < 1.02:
            continue  # must win at EVERY shape by >2%
        gain = math.exp(sum(map(math.log, ratios)) / len(ratios))
        if gain > best_gain:
            best, best_gain = name, gain
    if best is None:
        return None, "no config beats baseline at every shape"
    return best, f"geomean speedup {best_gain:.3f}x over {len(base)} shapes"


def pick_quality(rows):
    byc = _valid([r for r in rows if r.get("weight_buckets", 0) == 16])
    base = byc.get("baseline", {})
    if not base:
        return None, "no oracle-verified wb16 baseline rows"

    def cost(shapes):
        return sum(shapes[s]["compile_s"] + 5.0 * shapes[s]["mean_ms"] / 1e3
                   for s in base)

    best, best_cost = None, cost(base)
    for name, shapes in byc.items():
        if name == "baseline" or set(base) - set(shapes):
            continue
        lean = all(  # compile-cost lever (Mosaic aggregate, RESULTS_r4 §3)
            shapes[s]["mean_ms"] <= 1.15 * base[s]["mean_ms"]
            and shapes[s]["compile_s"] <= 0.7 * base[s]["compile_s"]
            for s in base
        )
        fast = all(  # runtime lever (e.g. the gateq* handoff configs —
            # probe_qrounds: the v/32 gate runs ~3 pixel-scale rounds the
            # v/16 gate hands to pool-scale stage 2)
            shapes[s]["mean_ms"] <= 0.90 * base[s]["mean_ms"]
            and shapes[s]["compile_s"] <= 1.4 * base[s]["compile_s"]
            for s in base
        )
        if (lean or fast) and cost(shapes) < best_cost:
            best, best_cost = name, cost(shapes)
    if best is None:
        return None, ("no wb16 config cuts compile 30%+ within 15% runtime "
                      "or runtime 10%+ within 1.4x compile")
    return best, "wb16 winner (compile-lean or runtime)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="bench_out/sweep.jsonl")
    ap.add_argument("--out", default="bench_out/promoted_env.sh")
    ap.add_argument("--names-out", default="",
                    help="also write the winning config NAMES as JSON "
                         '({"speed": name-or-null, "quality": ...}) — '
                         "lets the campaign confirm a cheap-shape winner "
                         "at the expensive shape before final promotion")
    args = ap.parse_args()
    rows = _load(args.sweep)

    from sweep_knobs import CONFIGS  # same directory

    names = {}
    env = {}
    for picker, tag in ((pick_speed, "speed"), (pick_quality, "quality")):
        name, why = picker(rows)
        print(f"[promote:{tag}] {name or 'baseline (no promotion)'} — {why}")
        names[tag] = name
        if name:
            env.update(CONFIGS[name])

    if args.names_out:
        with open(args.names_out, "w") as f:
            json.dump(names, f)

    with open(args.out, "w") as f:
        f.write("# generated by scripts/promote_knobs.py — sweep-winning\n"
                "# knobs for the evidence campaign (oracle-gated).\n")
        for k, v in sorted(env.items()):
            f.write(f"export {k}={v}\n")
    print(f"[promote] wrote {args.out}: {env or '(defaults)'}")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
