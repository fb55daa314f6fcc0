"""Profiling and observability helpers.

TPU-native upgrade over the reference's CUDA-event + psutil tracking
(SURVEY.md §5): jax.profiler traces viewable in TensorBoard/Perfetto, device
memory stats from the runtime, and a step-timer with true host-read
barriers (block_until_ready is unreliable through the axon relay).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Iterator, Optional

import jax

from ..core.utils import DeviceTimer, get_cpu_mem_mb, get_device_mem_mb, get_device_peak_mb


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/elit_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_snapshot(device: str = "tpu") -> Dict[str, Optional[float]]:
    return {
        "cpu_rss_mb": get_cpu_mem_mb(),
        "device_mb": get_device_mem_mb(device),
        "device_peak_mb": get_device_peak_mb(device),
    }


class StepTimer:
    """Accumulates per-step timings; reports mean/p50/p99 and tokens/s."""

    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def step(self, *sync_arrays):
        DeviceTimer.sync(*sync_arrays)
        t0 = time.perf_counter()
        yield
        DeviceTimer.sync(*sync_arrays)
        self.samples.append(time.perf_counter() - t0)

    def summary(self, tokens_per_step: int = 1) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        mean = sum(s) / n
        return {
            "n": n,
            "mean_ms": mean * 1e3,
            "p50_ms": s[n // 2] * 1e3,
            "p99_ms": s[min(n - 1, int(n * 0.99))] * 1e3,
            "tokens_per_sec": tokens_per_step / mean,
        }

    def dump(self) -> str:
        return json.dumps(self.summary())
