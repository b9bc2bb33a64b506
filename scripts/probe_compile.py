"""Compile-cost probe: where does the 8K (7680x4320) compile blow up?

Background (round 3): the full-pipeline compile at 8K ran >70 min on the
TPU host and was killed; single Mosaic kernels compile fine at wp=7680
(~112 s each), so the blowup is the AGGREGATE. This probe isolates the
XLA side: trace + XLA-compile the full turbo program on the CPU backend
(where `_use_pallas()` is False, so the program contains the dense XLA
sweeps instead of Mosaic kernels) at each rung, reporting wall time and
peak RSS per stage. Run each shape in a subprocess so an OOM or hang
costs only that rung.

Usage: python scripts/probe_compile.py [--shapes 1080x1920,4320x7680]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import resource
import subprocess
import time

CHILD = r"""
import os, sys, time, json, resource
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gseg_tpu.config import SegmentationConfig
from gseg_tpu.models.turbo import segment_turbo_flagged

h, w = %(h)d, %(w)d
cfg = SegmentationConfig(sigma=0.8, k=300.0, min_size=100, max_iters=32)
img = jnp.zeros((h, w, 3), jnp.float32)

def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

t0 = time.time()
lowered = jax.jit(
    lambda im: segment_turbo_flagged(im, cfg, 2)
).lower(img)
t_trace = time.time() - t0
r_trace = rss_mb()
hlo_bytes = len(lowered.as_text())
t0 = time.time()
compiled = lowered.compile()
t_compile = time.time() - t0
print("RESULT " + json.dumps({
    "h": h, "w": w, "trace_s": round(t_trace, 1),
    "xla_compile_s": round(t_compile, 1), "hlo_mb": hlo_bytes // 2**20,
    "rss_after_trace_mb": r_trace, "rss_peak_mb": rss_mb(),
}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="1080x1920,2160x3840,4320x7680")
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sh in args.shapes.split(","):
        h, w = (int(x) for x in sh.split("x"))
        src = CHILD % {"repo": repo, "h": h, "w": w}
        env = dict(os.environ, PYTHONPATH="")  # strip the TPU plugin
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", src], env=env,
                               capture_output=True, text=True,
                               timeout=args.timeout)
            out = p.stdout + p.stderr
            line = [l for l in out.splitlines() if l.startswith("RESULT ")]
            if line:
                print(line[-1], flush=True)
            else:
                print(f"RESULT_FAIL {h}x{w} rc={p.returncode} "
                      f"({time.time()-t0:.0f}s): "
                      + out.strip().splitlines()[-1][:300] if out.strip()
                      else f"RESULT_FAIL {h}x{w} no output", flush=True)
        except subprocess.TimeoutExpired:
            print(f"RESULT_TIMEOUT {h}x{w} after {args.timeout}s", flush=True)


if __name__ == "__main__":
    main()
