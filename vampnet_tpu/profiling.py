"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference scatters wall-clock timers (audiotools @timer, app.py:162,245,
unloop Timer, yappi in token telephone). The TPU-native story is structured:

  * `Timer` — the host-side wall-clock timer (tick/tock), same surface as the
    reference's unloop Timer.
  * `timer(name)` — decorator/context recording stage latencies into a global
    registry (p50/p95 summaries) — the audiotools @timer() equivalent.
  * `trace(...)` — context manager around `jax.profiler.trace` writing a
    TensorBoard-viewable XLA trace.
  * `start_server(port)` — live `jax.profiler` server for tensorboard capture.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, List, Optional


class Timer:
    """tick/tock wall timer (reference unloop/client.py:14-28)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    def tick(self, name: str):
        self.times[name] = time.time()

    def tock(self, name: str) -> float:
        toc = time.time() - self.times[name]
        print(f"{name} took {toc} seconds")
        return toc


_STAGE_TIMES: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def timing(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGE_TIMES[name].append(time.perf_counter() - t0)


def timer(name: Optional[str] = None):
    """Decorator recording each call's latency under `name` (defaults to the
    function name) — the audiotools @timer() counterpart (train.py:27)."""

    def deco(fn):
        label = name or fn.__name__

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with timing(label):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def summary() -> Dict[str, Dict[str, float]]:
    """p50/p95/mean/count for every recorded stage."""
    import numpy as np

    out = {}
    for k, v in _STAGE_TIMES.items():
        arr = np.asarray(v)
        out[k] = {
            "count": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }
    return out


def reset():
    _STAGE_TIMES.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vampnet-trace", create_perfetto_link: bool = False):
    """XLA/TPU trace around a region, viewable in TensorBoard's profile tab."""
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield log_dir


def start_server(port: int = 9999):
    """Live profiling server for `tensorboard --logdir` capture."""
    import jax

    return jax.profiler.start_server(port)
