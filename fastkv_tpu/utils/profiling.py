"""Tracing / profiling / observability.

Replaces the reference's manual CUDA-event + max_memory_allocated instrumentation
(reference: benchmark/e2e.py:154-180, :266; nvtx pinned in requirements but never
imported) with:
  * jax.profiler trace capture (Perfetto/TensorBoard-compatible),
  * device memory stats,
  * roofline utilities for kernel efficiency accounting (v5e peak numbers),
  * structured per-phase timing records (TTFT / TPOT / tokens-per-sec) emitted
    as JSON lines for downstream aggregation.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional

import jax

# TPU v5e (per chip) public peak numbers
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
V5E_HBM_BYTES = 16 * 1024**3


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats(device=None) -> Dict[str, Any]:
    dev = device or jax.local_devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}


def peak_bytes(device=None) -> Optional[int]:
    s = memory_stats(device)
    return s.get("peak_bytes_in_use", s.get("bytes_in_use"))


@dataclass
class Roofline:
    """Speed-of-light accounting for one op/phase."""

    flops: float
    bytes_moved: float
    seconds: float
    peak_tflops: float = V5E_BF16_TFLOPS
    peak_gbps: float = V5E_HBM_GBPS

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def compute_bound(self) -> bool:
        return (self.flops / (self.peak_tflops * 1e12)) >= (
            self.bytes_moved / (self.peak_gbps * 1e9)
        )

    @property
    def ideal_seconds(self) -> float:
        return max(
            self.flops / (self.peak_tflops * 1e12),
            self.bytes_moved / (self.peak_gbps * 1e9),
        )

    @property
    def efficiency(self) -> float:
        return self.ideal_seconds / self.seconds

    def report(self) -> Dict[str, float]:
        return {
            "achieved_tflops": round(self.achieved_tflops, 2),
            "achieved_gbps": round(self.achieved_gbps, 1),
            "bound": "compute" if self.compute_bound else "memory",
            "ideal_s": round(self.ideal_seconds, 5),
            "measured_s": round(self.seconds, 5),
            "efficiency": round(self.efficiency, 3),
        }


def attention_prefill_roofline(
    seconds: float, s: int, d: int, num_heads: int, num_kv_heads: int,
    b: int = 1, causal: bool = True, dtype_bytes: int = 2,
) -> Roofline:
    denom = 2 if causal else 1
    flops = b * num_heads * 4 * s * s * d / denom
    bytes_moved = b * dtype_bytes * (
        num_heads * s * d * 2 + num_kv_heads * s * d * 2
    )
    return Roofline(flops=flops, bytes_moved=bytes_moved, seconds=seconds)


@dataclass
class PhaseLogger:
    """Structured JSONL logging of engine phases (queue/prefill/decode)."""

    stream: Any = field(default_factory=lambda: sys.stderr)

    def log(self, phase: str, **fields) -> Dict[str, Any]:
        rec = {"ts": time.time(), "phase": phase, **fields}
        print(json.dumps(rec), file=self.stream, flush=True)
        return rec

    def request_metrics(self, req) -> Dict[str, Any]:
        """Log a finished fastkv_tpu.engine.scheduler.Request."""
        return self.log("request_done", **req.metrics)
