"""Tracing and step-time instrumentation.

The reference's closest artifact is tqdm loss postfixes
(/root/reference/training/advanced_trainer.py:191-196); here profiling is a
first-class hook over ``jax.profiler``: capture XLA traces viewable in
TensorBoard/Perfetto, annotate named regions, and collect step-time
statistics without host syncs in the hot loop.
"""
import contextlib
import os
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region (TensorBoard format)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in captured traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time stats; syncs only when ``summary`` is called."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(int(n * 0.9), n - 1)],
            "max_s": ts[-1],
        }


def memory_stats() -> Dict[str, int]:
    """Per-device HBM usage where the backend reports it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            pass
    return out
