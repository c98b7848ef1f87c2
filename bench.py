"""Benchmark: tracked frames/s per chip on the flagship tracking step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference must track in real time on an i7 — EuRoC runs at
20 Hz and the paper's i7 tracks 20-30 fps (BASELINE.md "real-time
tracking constraint"); vs_baseline is measured fps / 20.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()


def main():
    from __graft_entry__ import entry

    step, args = entry()
    jitted = jax.jit(step)
    # Warm-up / compile.
    out = jitted(*args)
    jax.block_until_ready(out)

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    baseline_fps = 20.0  # reference real-time requirement (EuRoC 20 Hz on i7)
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
