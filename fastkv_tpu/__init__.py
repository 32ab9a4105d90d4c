"""fastkv_tpu — a TPU-native long-context inference engine with FastKV-style
Token-Selective Propagation and per-layer KV-cache compression.

This is a from-scratch JAX/XLA/Pallas implementation of the *capabilities* of the
FastKV reference codebase (arXiv 2502.01068): TSP context reduction, six KV-eviction
baselines (FullKV / SnapKV / H2O / StreamingLLM / GemFilter / PyramidInfer), the
LongBench / RULER / Needle-in-a-Haystack accuracy harnesses, and prefill / e2e
latency benchmarks — re-architected TPU-first:

  * static-shape compressed KV cache (XLA-friendly; no dynamic sequence mutation),
  * two-segment prefill: layers [0, tsp_idx] compiled at full length, layers
    (tsp_idx, L) compiled at the reduced TSP length,
  * Pallas kernels for flash prefill, observation-window scoring, and decode
    attention over the compressed cache,
  * pjit/shard_map parallelism over a jax.sharding.Mesh (data / model / seq axes).

Reference parity citations throughout point into the reference tree mounted at
/root/reference (dongwonjo/FastKV).
"""

__version__ = "0.1.0"

from fastkv_tpu.core.config import (  # noqa: F401
    ModelConfig,
    MethodConfig,
    ParallelConfig,
    EngineConfig,
)
