"""Phase timing + profiler hooks.

Rebuild of the reference's observability layer (SURVEY.md §5): the CUDA code
wraps pipeline phases in C++ high_resolution_clock timers and uses nvprof
offline. Here: a PhaseTimer with device fencing (the axon TPU tunnel's
block_until_ready is unreliable — a scalar fetch is the only sound fence,
costing ~30 ms once per stop), and a jax.profiler trace context for xprof.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict

ROUND_TRIP_S = 0.030


def fence(x) -> None:
    """Force completion of a device value."""
    import jax.numpy as jnp

    if hasattr(x, "dtype"):
        _ = int(jnp.max(x).astype(jnp.int32))
    # host values need no fence


class PhaseTimer:
    """Accumulates per-phase wall times with device fencing.

    with timer.phase("segmentation", out_ref):  # fences out_ref at exit
        out_ref = run(...)
    """

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        holder = {}
        yield holder
        if "result" in holder:
            fence(holder["result"])
            dt = max(time.perf_counter() - t0 - ROUND_TRIP_S, 0.0)
        else:
            dt = time.perf_counter() - t0
        self.phases[name] = self.phases.get(name, 0.0) + dt

    def json(self) -> str:
        return json.dumps({k: round(v, 5) for k, v in self.phases.items()})


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/gseg_trace"):
    """jax.profiler trace for xprof/tensorboard (the nvprof analog)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
