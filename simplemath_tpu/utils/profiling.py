"""Profiling / tracing utilities.

The reference has no tracing at all (SURVEY §5: only Google Benchmark
microbenches, benchmark/add.cpp:4-33).  TPU-native equivalents: wall timers
with device sync, ``jax.profiler`` trace capture (Perfetto-compatible), and
roofline math that scores kernels against HBM speed-of-light.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax

# HBM bandwidth per chip (bytes/s) for roofline scoring; override per
# platform.  v5e ~ 819 GB/s, v5p ~ 2765 GB/s.
HBM_BANDWIDTH = {
    "tpu v5 lite": 819e9,
    "tpu v5": 2765e9,
    "tpu v4": 1228e9,
    "cpu": 50e9,
}


def hbm_bandwidth_bytes_per_s() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_BANDWIDTH.items():
        if key in kind:
            return bw
    return 819e9 if jax.default_backend() == "tpu" else 50e9


@dataclasses.dataclass
class BenchResult:
    median_s: float
    best_s: float
    times_s: list
    bytes_moved: Optional[int] = None
    flops: Optional[int] = None

    @property
    def gbps(self) -> Optional[float]:
        if self.bytes_moved is None:
            return None
        return self.bytes_moved / self.median_s / 1e9

    @property
    def roofline_fraction(self) -> Optional[float]:
        """Fraction of HBM speed-of-light achieved (memory-bound ops)."""
        if self.bytes_moved is None:
            return None
        return (self.bytes_moved / self.median_s) / hbm_bandwidth_bytes_per_s()

    @property
    def tflops(self) -> Optional[float]:
        if self.flops is None:
            return None
        return self.flops / self.median_s / 1e12


def benchmark(
    fn: Callable,
    *args,
    warmup: int = 2,
    repeats: int = 5,
    bytes_moved: Optional[int] = None,
    flops: Optional[int] = None,
) -> BenchResult:
    """Time fn(*args) with device synchronization; median-of-repeats."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    st = sorted(times)
    return BenchResult(
        median_s=st[len(st) // 2],
        best_s=st[0],
        times_s=times,
        bytes_moved=bytes_moved,
        flops=flops,
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sm_trace"):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
