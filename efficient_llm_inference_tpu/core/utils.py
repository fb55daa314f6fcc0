"""Core utility functions: memory accounting and timing.

TPU-native counterpart of /root/reference/src/core/utils.py:10-71.
CUDA peak-memory tracking is replaced by `device.memory_stats()`; CUDA-event
timing is replaced by `block_until_ready`-bracketed wall-clock timing.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import psutil

    _PSUTIL = True
except ImportError:  # pragma: no cover
    _PSUTIL = False


def get_cpu_mem_mb() -> float:
    """Current process RSS in MB (reference: src/core/utils.py:10-13)."""
    if _PSUTIL:
        return psutil.Process(os.getpid()).memory_info().rss / (1024**2)
    # /proc fallback
    try:
        with open(f"/proc/{os.getpid()}/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / (1024**2)
    except OSError:  # pragma: no cover
        return 0.0


def _first_accel_device() -> Optional[jax.Device]:
    for d in jax.devices():
        if d.platform != "cpu":
            return d
    return None


# session peak (peak_bytes_in_use) observed at the last reset_device_peak()
# call, used to approximate per-window peaks (the TPU runtime has no reset)
_peak_at_reset: Optional[float] = None


def _read_stats() -> Optional[dict]:
    d = _first_accel_device()
    if d is None:
        return None
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    return stats or None


def reset_device_peak(device: str = "tpu") -> None:
    """Mark the start of a peak-measurement window.

    TPU analog of torch.cuda.reset_peak_memory_stats (reference:
    src/core/utils.py:16-21). The TPU runtime exposes no peak reset, so this
    snapshots the current session peak; `get_device_peak_mb` then reports a
    per-window estimate instead of the session-running peak (which would let
    method A's peak bleed into method B's report, unlike the reference's
    per-benchmark reset at benchmarker.py:689).
    """
    global _peak_at_reset
    if device == "cpu":
        return None
    stats = _read_stats()
    if stats is None:
        _peak_at_reset = None
        return None
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    _peak_at_reset = None if peak is None else float(peak)
    return None


def get_device_peak_mb(device: str = "tpu") -> Optional[float]:
    """Peak device memory in MB since the last `reset_device_peak`.

    If the session peak rose during the window, that IS the window's peak.
    Otherwise the high-water mark predates the window; the best available
    estimate is the current bytes-in-use (a lower bound on the window peak).
    Matches the reference's absolute-MB semantics (utils.py:23-34).
    """
    if device == "cpu":
        return None
    stats = _read_stats()
    if stats is None:
        return None
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    if peak is None:
        return None
    if _peak_at_reset is not None and float(peak) <= _peak_at_reset:
        used = stats.get("bytes_in_use")
        if used is not None:
            return used / (1024**2)
    return peak / (1024**2)


def get_device_mem_mb(device: str = "tpu") -> Optional[float]:
    """Current device bytes-in-use in MB."""
    d = _first_accel_device()
    if d is None or device == "cpu":
        return None
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    used = stats.get("bytes_in_use")
    return None if used is None else used / (1024**2)


# Aliases with the reference's GPU-flavored names so reference users find them.
reset_gpu_peak = reset_device_peak
get_gpu_peak_mb = get_device_peak_mb


def tensor_bytes(x) -> int:
    """Memory footprint of an array in bytes (reference: utils.py:37-46)."""
    return int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize if hasattr(x, "shape") else 0


def mb(num_bytes: int) -> float:
    """Bytes → MB (reference: utils.py:49-58)."""
    return num_bytes / (1024**2)


def kv_bytes_fp(k, v) -> int:
    """Total bytes of a K/V pair (reference: utils.py:61-71)."""
    return tensor_bytes(k) + tensor_bytes(v)


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (compiles survive restarts).

    XLA compilation is the one fixed cost this framework has that the eager
    reference doesn't; caching it makes repeated benchmark/CLI runs start
    hot.
    """
    import pathlib
    import tempfile

    if path is None:
        path = str(pathlib.Path(tempfile.gettempdir()) / "elit_xla_cache")
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


class DeviceTimer:
    """Wall-clock timer with device synchronization.

    TPU analog of the reference's CUDA-event timing bracket
    (/root/reference/src/benchmarking/benchmarker.py:692-699,791-797):
    `stop(result)` blocks on the given arrays before reading the clock so
    asynchronous dispatch doesn't under-report elapsed time.
    """

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    @staticmethod
    def sync(*arrays) -> None:
        """Force completion by reading one element back to the host.

        On the axon-tunneled TPU backend, block_until_ready can return
        before execution finishes; a device_get is the reliable barrier.
        """
        for a in arrays:
            for leaf in jax.tree.leaves(a):
                if hasattr(leaf, "shape"):
                    jax.device_get(jnp.ravel(leaf)[:1] if leaf.ndim else leaf)

    def start(self, *sync_arrays) -> "DeviceTimer":
        self.sync(*sync_arrays)
        self._t0 = time.perf_counter()
        return self

    def stop(self, *sync_arrays) -> float:
        self.sync(*sync_arrays)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed
