"""Opt-in wall-clock profiler (parity: gsplat/profile.py:8-59).

``timeit`` works as a decorator or context manager, accumulates wall time
per name into the global ``profiler`` dict, and is a no-op unless TIMEIT=1.
Device-synchronized via ``jax.block_until_ready`` on whatever the wrapped
function returns (the jax analogue of torch.cuda.synchronize bracketing).
"""

from __future__ import annotations

import functools
import os
import time
from collections import defaultdict
from typing import Any, Dict

import jax

profiler: Dict[str, float] = defaultdict(float)
profiler_counts: Dict[str, int] = defaultdict(int)

_ENABLED = os.environ.get("TIMEIT", "0") == "1"


class timeit:
    """Context manager / decorator accumulating wall time under a name."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if _ENABLED:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _ENABLED:
            profiler[self.name] += time.perf_counter() - self.t0
            profiler_counts[self.name] += 1
        return False

    def __call__(self, fn):
        if not _ENABLED:
            return fn

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            profiler[self.name] += time.perf_counter() - t0
            profiler_counts[self.name] += 1
            return out

        return wrapped


def report() -> str:
    lines = ["name\ttotal_s\tcalls\tper_call_ms"]
    for name, total in sorted(profiler.items(), key=lambda kv: -kv[1]):
        n = max(profiler_counts[name], 1)
        lines.append(f"{name}\t{total:.3f}\t{n}\t{total / n * 1000:.2f}")
    return "\n".join(lines)


def reset():
    profiler.clear()
    profiler_counts.clear()
