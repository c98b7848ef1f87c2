"""Per-stage timing instrumentation.

Parity with the reference's tracing (SURVEY.md §5.1): `SAVE_TIMES` spans
around preintegration / pose prediction / local-map track / KF decision
(`Tracking.cc:960-1065`) and LocalMapping's per-stage t0..t8 timers
(`LocalMapping.cc:113-289`). Here a process-global registry of named
accumulators; enable with `timing.enable()` and read
`timing.report()` — zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

_enabled = False
_acc: Dict[str, list] = defaultdict(list)


def enable(on: bool = True):
    global _enabled
    _enabled = on


def reset():
    _acc.clear()


@contextlib.contextmanager
def span(name: str):
    """Time a stage. Note: JAX dispatch is async — wrap only host-blocking
    sections, or call jax.block_until_ready inside for device truth."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _acc[name].append(time.perf_counter() - t0)


def report() -> Dict[str, dict]:
    """{stage: {n, total_s, mean_ms, max_ms}}."""
    out = {}
    for k, v in sorted(_acc.items()):
        if not v:
            continue
        out[k] = {
            "n": len(v),
            "total_s": round(sum(v), 3),
            "mean_ms": round(1e3 * sum(v) / len(v), 2),
            "max_ms": round(1e3 * max(v), 2),
        }
    return out


def print_report():
    for k, s in report().items():
        print(f"{k:32s} n={s['n']:5d} mean={s['mean_ms']:8.2f}ms max={s['max_ms']:8.2f}ms total={s['total_s']:7.2f}s")
