"""A/B sweep of the trace-time perf knobs on the real chip.

Each config runs in a subprocess (knobs are read at trace time) with every
GSEG_* variable RESET first (a contaminated shell cannot skew "baseline"),
timing turbo end-to-end with the fenced protocol AND oracle-comparing the
partition (CLAUDE.md round-3 rule: flags cannot catch a leaked label — a
knob config that returns a stable-but-wrong fixpoint must lose the sweep
by failing, not win it on speed). The sequential-oracle labels are
computed once per shape on the host and cached under bench_out/.

Rows append to bench_out/sweep.jsonl. Default sweep: the round-3/4 levers —

  - baseline (all defaults)
  - live-pricing off (GSEG_S2_SMALL=0 GSEG_EX_SMALL=0 GSEG_RLIST_SPLIT=0)
  - early gate (GSEG_GATE_DIV=13/32)
  - late-round steps-per-pass (GSEG_T_LATE=16/32)
  - late-round scan closures (GSEG_LATE_CLOSURES=1)

Usage: python scripts/sweep_knobs.py [--shapes 1080x1920,2160x3840]
       [--configs baseline,nosmall,gate13,...] [--no-oracle]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "baseline": {},
    "nosmall": {"GSEG_S2_SMALL": "0", "GSEG_EX_SMALL": "0",
                "GSEG_RLIST_SPLIT": "0"},
    "gate13": {"GSEG_GATE_DIV": "13"},
    "gate32": {"GSEG_GATE_DIV": "32"},
    "tlate16": {"GSEG_T_LATE": "16"},
    "tlate32": {"GSEG_T_LATE": "32"},
    # winner-combo candidate: gate32 keeps 1-2 late gossip rounds, so the
    # late-round T bump composes with it (gate13 has no late rounds — a
    # T_LATE combo there would be a no-op).
    "gate32tlate16": {"GSEG_GATE_DIV": "32", "GSEG_T_LATE": "16"},
    "closures": {"GSEG_LATE_CLOSURES": "1"},
    # dist-free peel rounds: 2 rw flood fields instead of 3 + flat
    # counting scatter (~2.8 ms @1080p in-jit) instead of the subtree
    # convergecast fixpoint (~4.2 ms floor) — probe_pieces r4 cost model.
    "peelcount": {"GSEG_PEEL_SIZES": "count"},
    # fastpad A/B (round 5): DMA pad/unpad vs XLA pad+slice at every
    # fixpoint entry/exit — the measured per-call floor lever.
    "nofastpad": {"GSEG_FASTPAD": "0"},
    # 4K pass-cost levers (round 5): probe_pieces@4K shows the two real
    # fixpoints (compmin 23-28 ms, flood similar) dominating a 4K round;
    # wide images are DMA-round-trip-bound per pass, so fatter strips
    # (fewer serialized round trips; VMEM-bound at 128 rows @4K under the
    # default budget) and more steps per pass are the candidate levers.
    "rows160": {"GSEG_SKIP_ROWS": "160"},
    "rows192": {"GSEG_SKIP_ROWS": "192"},
    "tlate24": {"GSEG_T_LATE": "24"},
    "tpeel24": {"GSEG_T_PEEL": "24"},
    "rows160tlate24": {"GSEG_SKIP_ROWS": "160", "GSEG_T_LATE": "24"},
    # round-5 pending protocol A/Bs (oracle-exact, CI-covered; net sign
    # unknown on hardware under the dispatch-honest metric):
    "floodptr": {"GSEG_FLOOD_PTR": "1"},
    "finalgather": {"GSEG_FINAL_GATHER": "1"},
    "floodptr_fg": {"GSEG_FLOOD_PTR": "1", "GSEG_FINAL_GATHER": "1"},
    # quality-mode (run with --wb16):
    "gateq16": {"GSEG_GATE_DIV_Q": "16"},
    "gateq8": {"GSEG_GATE_DIV_Q": "8"},
    "qnoclosures": {"GSEG_Q_CLOSURES": "0"},
    "gateq8nc": {"GSEG_GATE_DIV_Q": "8", "GSEG_Q_CLOSURES": "0"},
}

CHILD = r"""
import sys, time, json, os
sys.path.insert(0, %(repo)r)
from gseg_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np
from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.turbo import segment_turbo, segment_turbo_flagged
from gseg_tpu.utils.synthetic import blobs_image

h, w = %(h)d, %(w)d
cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100, max_iters=32,
                         weight_buckets=%(wb)d)
img = jax.device_put(jnp.asarray(
    blobs_image(h, w, num_blobs=max(8, (h * w) // 65536), noise=8.0, seed=0)))
t0 = time.time()
_ = int(jnp.max(segment_turbo(img, cfg)))  # checked warmup (flags raise)
compile_s = time.time() - t0
row = {"compile_s": round(compile_s, 1)}
oracle_path = %(oracle)r
if oracle_path:
    from gseg_tpu.utils.labels import canonical_min_labels_np
    lab = np.asarray(segment_turbo_flagged(img, cfg, 2)[0])
    ok = bool(np.array_equal(canonical_min_labels_np(lab),
                             np.load(oracle_path)))
    row["oracle_equal"] = ok
    if not ok:
        print("ROW " + json.dumps(dict(row, error="ORACLE MISMATCH")),
              flush=True)
        sys.exit(0)
times = []
for _ in range(%(reps)d):
    t0 = time.perf_counter()
    _ = int(jnp.max(segment_turbo_flagged(img, cfg, 2)[0]))
    times.append(time.perf_counter() - t0)
mean_s = max(float(np.mean(times)) - 0.030, 1e-6)
row.update({
    "mean_ms": round(mean_s * 1e3, 1),
    "min_ms": round((min(times) - 0.030) * 1e3, 1),
    "mpix_per_s": round(h * w / 1e6 / mean_s, 2),
})
print("ROW " + json.dumps(row), flush=True)
"""

ORACLE_CHILD = r"""
import sys, numpy as np
sys.path.insert(0, %(repo)r)
from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.boruvka_cpu import segment_boruvka_np
from gseg_tpu.utils.labels import canonical_min_labels_np
from gseg_tpu.utils.synthetic import blobs_image

h, w = %(h)d, %(w)d
img = blobs_image(h, w, num_blobs=max(8, (h * w) // 65536), noise=8.0, seed=0)
cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100, max_iters=32,
                         weight_buckets=%(wb)d)
np.save(%(path)r, canonical_min_labels_np(segment_boruvka_np(img, cfg)))
print("oracle saved")
"""


def _clean_env(knobs):
    env = {k: v for k, v in os.environ.items() if not k.startswith("GSEG_")}
    env.update(knobs)
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="1080x1920,2160x3840")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--out", default="bench_out/sweep.jsonl")
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--wb16", action="store_true",
                    help="sweep quality mode (weight_buckets=16)")
    args = ap.parse_args()
    wb = 16 if args.wb16 else 0
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    for sh in args.shapes.split(","):
        h, w = (int(x) for x in sh.split("x"))
        oracle_path = ""
        if not args.no_oracle:
            oracle_path = os.path.join(
                os.path.dirname(args.out),
                f"oracle_bench_{h}x{w}_wb{wb}.npy")
            if not os.path.exists(oracle_path):
                print(f"[oracle] computing {h}x{w} on host "
                      "(one-time, cached)", flush=True)
                p = subprocess.run(
                    [sys.executable, "-c", ORACLE_CHILD % {
                        "repo": REPO, "h": h, "w": w, "path": oracle_path,
                        "wb": wb}],
                    env=_clean_env({}), timeout=14400)
                if p.returncode != 0:
                    print(f"[oracle] FAILED for {h}x{w}; rows will carry "
                          "no oracle check", flush=True)
                    oracle_path = ""
        for name in args.configs.split(","):
            knobs = CONFIGS[name]
            src = CHILD % {"repo": REPO, "h": h, "w": w, "reps": args.reps,
                           "oracle": oracle_path, "wb": wb}
            t0 = time.time()
            try:
                p = subprocess.run([sys.executable, "-c", src],
                                   env=_clean_env(knobs),
                                   capture_output=True, text=True,
                                   timeout=args.timeout)
                rows = [l for l in p.stdout.splitlines()
                        if l.startswith("ROW ")]
                if rows:
                    row = json.loads(rows[-1][4:])
                else:
                    err = (p.stderr.strip().splitlines() or ["no output"])[-1]
                    row = {"error": err[:300], "rc": p.returncode}
            except subprocess.TimeoutExpired:
                row = {"error": f"timeout {args.timeout}s"}
            row.update({"config": name, "knobs": knobs, "height": h,
                        "width": w, "weight_buckets": wb,
                        "wall_s": round(time.time() - t0, 1)})
            print(json.dumps(row), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
