"""Chunked-admission memory envelope at 8B scale (VERDICT r4 task 10 bar:
'a measured max-bucket-on-chip number for chunked admission at 8B').

Chunked admission must RETAIN an uncompressed K/V scratch for the
pre-compression segment (layers [0, tsp_idx]) across the whole admission:
  sk+sv: 2 * seg(16) * KH(8) * d(128) * 2B = 64 KB/token
  hbuf:  d_model(4096) * 2B              =  8 KB/token   (single donated buffer)
plus int8 weights 8.04 GB and the scheduler's shared compressed decode cache.
Predicted envelope: bucket 65536 fits (~4.7 GB scratch), 131072 does not
(~9.4 GB scratch + 8 GB weights > arena).

Runs one chunked admission to completion through the Scheduler at the given
bucket (request A decoding while B admits chunk-wise), llama-3.1-8b int8
weights. A completion proves the whole pipeline (chunk programs + finish +
install) fits; an OOM is the boundary data point.

Usage: timeout 3600 python scripts/chunked_8b_envelope.py [bucket] [chunk]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, MODEL_PRESETS
    from fastkv_tpu.engine.scheduler import Scheduler
    from fastkv_tpu.models.llama import init_params_int8_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS["llama-3.1-8b"](dtype="bfloat16")
    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    params = init_params_int8_on_device(cfg, seed=0)
    force(params["final_norm"])
    print("8B int8 params resident", file=sys.stderr, flush=True)

    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional", retain_rate=0.1,
        tsp_rate=0.2, tsp_idx=15, window_size=8, kernel_size=7, pooling="maxpool",
    )
    ecfg = EngineConfig(
        prefill_buckets=(bucket,), use_pallas=True, prefill_chunk=chunk,
        mlp_chunk=8192,
    )
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=bucket,
                      max_new_tokens=32)
    rng = np.random.default_rng(0)
    a = sched.submit(list(rng.integers(0, cfg.vocab_size, 512)), 32)
    sched._admit(limit=1)
    for _ in range(4):
        sched._decode_one_step()
    t0 = time.perf_counter()
    b = sched.submit(list(rng.integers(0, cfg.vocab_size, bucket)), 4)
    done = {r.req_id: r for r in sched._run_loop()}
    assert set(done) == {a, b}
    n_chunks = sum(1 for e in sched.events if e[0] == "chunk")
    times = [t for (k, *rest) in sched.events if k == "decode" for t in rest]
    gaps = np.diff(times) if len(times) > 1 else np.array([0.0])
    scratch_gib = bucket * (64 + 8) * 1024 / 2**30
    print(
        f"8B chunked admission OK: bucket={bucket} chunk={chunk} "
        f"({n_chunks} chunks, scratch ~{scratch_gib:.1f} GiB), "
        f"B makespan {time.perf_counter()-t0:.1f}s, "
        f"max inter-token gap {gaps.max()*1e3:.0f}ms "
        f"(incl. compiles — envelope probe, not a latency protocol)",
        flush=True,
    )


if __name__ == "__main__":
    main()
