"""One-command markdown summary of the evidence-campaign artifacts.

Turns bench_out/{perf,sweep,batch,bsds_quality}.jsonl into the tables the
round RESULTS doc needs, with the reference Fig.2 totals (BASELINE.md,
decoded from /root/reference README.md:25-28 / Report Fig.2) inlined as
per-rung speedup columns. Built so a campaign that lands while no session
is alive can be written up in one command:

    python scripts/summarize_evidence.py [--out bench_out] [> section.md]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reference totals by megapixels (gseg_tpu/bench/plots.py:REFERENCE_TOTALS)
REF_ATOMIC_S = {0.52: 0.0145, 2.07: 0.0513, 8.29: 0.182, 33.2: 0.7158}
REF_DPP_S = {0.52: 0.0294, 2.07: 0.0711, 8.29: 0.2422, 33.2: 0.9812}


def _load(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _ref_lookup(table, mpix):
    for k, v in table.items():
        if abs(k - mpix) / k < 0.12:
            return v
    return None


def perf_table(rows):
    out = ["| algorithm | content | resolution | MPix | total ms | MPix/s "
           "| vs ref atomic | vs ref DPP | knobs |",
           "|---|---|---|---|---|---|---|---|---|"]
    for r in rows:
        res = f"{r.get('width','?')}x{r.get('height','?')}"
        if "error" in r:
            out.append(f"| {r.get('algorithm')} | {r.get('content','blobs')} "
                       f"| {res} | | ERROR: {r['error'][:80]} | | | | |")
            continue
        h, w = r["height"], r["width"]
        mpix = h * w / 1e6
        ms = r["total"]["mean_s"] * 1e3
        mps = mpix / r["total"]["mean_s"]
        ra = _ref_lookup(REF_ATOMIC_S, mpix)
        rd = _ref_lookup(REF_DPP_S, mpix)
        va = f"{ra * 1e3 / ms:.2f}x" if ra else ""
        vd = f"{rd * 1e3 / ms:.2f}x" if rd else ""
        knobs = " ".join(f"{k.replace('GSEG_', '')}={v}"
                         for k, v in sorted(r.get("knobs", {}).items()))
        out.append(f"| {r['algorithm']} | {r.get('content','blobs')} | {res} "
                   f"| {mpix:.2f} | {ms:.1f} | {mps:.1f} | {va} | {vd} "
                   f"| {knobs} |")
    return "\n".join(out)


def sweep_table(rows):
    out = ["| config | shape | wb | compile s | mean ms | oracle | note |",
           "|---|---|---|---|---|---|---|"]
    for r in rows:
        shape = f"{r.get('width','?')}x{r.get('height','?')}"
        if "error" in r:
            out.append(f"| {r['config']} | {shape} | {r['weight_buckets']} "
                       f"| | | | {r['error'][:60]} |")
            continue
        out.append(f"| {r['config']} | {shape} | {r['weight_buckets']} "
                   f"| {r.get('compile_s','')} | {r.get('mean_ms','')} "
                   f"| {r.get('oracle_equal','')} | |")
    return "\n".join(out)


def quality_table(rows, label):
    algos = sorted({r["algorithm"] for r in rows if "asa" in r})
    out = [f"| algorithm | ASA median | UE median | n ({label}) |",
           "|---|---|---|---|"]
    for a in algos:
        asa = [r["asa"] for r in rows if r["algorithm"] == a and "asa" in r]
        ue = [r["ue"] for r in rows if r["algorithm"] == a and "ue" in r]
        out.append(f"| {a} | {np.median(asa):.4f} | {np.median(ue):.4f} "
                   f"| {len(asa)} |")
    errs = [r for r in rows if "error" in r]
    if errs:
        out.append(f"\n{len(errs)} errored rows.")
    return "\n".join(out)


def batch_table(rows):
    out = ["| resolution | batch | total ms | MPix/s |", "|---|---|---|---|"]
    for r in rows:
        if "error" in r:
            out.append(f"| {r['width']}x{r['height']} | {r['batch']} | "
                       f"ERROR: {r['error'][:60]} | |")
        else:
            out.append(f"| {r['width']}x{r['height']} | {r['batch']} | "
                       f"{r['total']['mean_s']*1e3:.1f} "
                       f"| {r['mpix_per_s']:.1f} |")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_out")
    args = ap.parse_args()
    o = args.out
    print("# Evidence summary\n")
    perf = _load(os.path.join(o, "perf.jsonl"))
    if perf:
        print("## Performance ladder (perf.jsonl)\n")
        print(perf_table(perf) + "\n")
        print("Reference totals: atomic 51.3 ms @1080p / 182 ms @4K / "
              "716 ms @8K; DPP 71.1 / 242 / 981 ms (BASELINE.md Fig.2).\n")
    sweep = _load(os.path.join(o, "sweep.jsonl"))
    if sweep:
        print("## Knob sweep (sweep.jsonl)\n")
        print(sweep_table(sweep) + "\n")
        pe = os.path.join(o, "promoted_env.sh")
        if os.path.exists(pe):
            knobs = [l.strip() for l in open(pe) if l.startswith("export")]
            print("Promoted campaign env: " + (", ".join(knobs) or "none")
                  + "\n")
    for fname, label in (("bsds_quality.jsonl", "BSDS-protocol stand-in"),
                         ("quality.jsonl", "synthetic exact-GT set")):
        rows = _load(os.path.join(o, fname))
        if rows:
            print(f"## Quality — {label} ({fname})\n")
            print(quality_table(rows, label) + "\n")
    batch = _load(os.path.join(o, "batch.jsonl"))
    if batch:
        print("## Batch throughput (batch.jsonl)\n")
        print(batch_table(batch) + "\n")


if __name__ == "__main__":
    main()
