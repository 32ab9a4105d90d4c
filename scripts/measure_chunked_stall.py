"""Measure the inter-token stall a RUNNING request sees while a long request
is admitted — monolithic vs chunked admission (VERDICT r3 task 5 'done' bar:
a before/after p99 inter-token number for ROOFLINE.md §7).

Protocol (driver TPU, llama-3.2-1b): request A (short prompt) is admitted and
starts decoding; request B (long prompt = the full bucket) is then submitted.
Without chunking, A's token stream stalls for B's entire prefill; with
prefill_chunk, the stall is bounded by one chunk + the compression finish.
Gaps are deltas between consecutive decode-step completions (the scheduler
timestamps each decode event after its argmax fetch, which forces the step).

Usage: timeout 3000 python scripts/measure_chunked_stall.py [bucket] [chunk] [K]

K = EngineConfig.chunk_decode_steps (decode steps per chunk; default 1).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def run_mode(params, cfg, chunk, bucket, genlen=96, k_steps=1):
    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig
    from fastkv_tpu.engine.scheduler import Scheduler

    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional", retain_rate=0.1,
        tsp_rate=0.2, tsp_idx=cfg.num_layers // 2 - 1, window_size=8,
        kernel_size=7, pooling="maxpool",
    )
    ecfg = EngineConfig(
        prefill_buckets=(bucket,), use_pallas=True, prefill_chunk=chunk,
        chunk_decode_steps=k_steps,
    )
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=bucket,
                      max_new_tokens=genlen)
    rng = np.random.default_rng(0)

    # warm pass compiles every program on THIS scheduler (same jit wrappers),
    # then the measured pass sees steady-state gaps only
    for phase in ("warm", "measured"):
        sched.events.clear()
        a = sched.submit(list(rng.integers(0, cfg.vocab_size, 512)), genlen)
        sched._admit(limit=1)  # A admitted alone (idle phase)
        for _ in range(10):  # A is mid-decode when B arrives
            sched._decode_one_step()
        t0 = time.perf_counter()
        b = sched.submit(list(rng.integers(0, cfg.vocab_size, bucket)), 8)
        # _run_loop (not run(), which clears the event log): gaps must span
        # the pre-admission decode steps above AND the drain
        done = {r.req_id: r for r in sched._run_loop()}
        total = time.perf_counter() - t0
        assert set(done) == {a, b}
        if phase == "warm":
            continue
        times = [t for (kind, *rest) in sched.events if kind == "decode"
                 for t in rest]
        gaps = np.diff(times)
        label = f"chunk={chunk}" if chunk else "monolithic"
        if chunk and k_steps != 1:
            label += f" K={k_steps}"
        print(
            f"{label:>12}: decode steps={len(times)}  gap mean={gaps.mean()*1e3:.0f}ms "
            f"p50={np.percentile(gaps,50)*1e3:.0f}ms p99={np.percentile(gaps,99)*1e3:.0f}ms "
            f"max={gaps.max()*1e3:.0f}ms  makespan(B)={total:.1f}s  "
            f"A_tokens={len(done[a].tokens)} B_tokens={len(done[b].tokens)}",
            flush=True,
        )
        return gaps


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    k_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from fastkv_tpu.core.config import MODEL_PRESETS
    from fastkv_tpu.models.llama import init_params_int8_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS["llama-3.2-1b"](dtype="bfloat16")
    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    params = init_params_int8_on_device(cfg, seed=0)
    force(params["final_norm"])

    import os

    modes = [] if os.environ.get("STALL_SKIP_MONO") == "1" else [None]
    modes.append(chunk)
    for mode in modes:
        run_mode(params, cfg, mode, bucket, k_steps=k_steps if mode else 1)


if __name__ == "__main__":
    main()
