"""Headline benchmark: FastKV vs FullKV e2e decode speedup on one TPU chip.

Protocol mirrors the reference e2e benchmark (reference: benchmark/e2e.py:53-243):
synthetic prompt, greedy decode, prefill and decode timed separately; the
headline claim is decode speedup of FastKV (TSP + compressed cache) over
full-context decoding (README.md:16: up to 2.87x on GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
the measured decode speedup and vs_baseline normalizes by the reference's 2.87x.
Details go to stderr.

Context is chosen by a DESCENDING FALLBACK LADDER (default
196608 -> 163840 -> 131072), one SUBPROCESS per rung: any failure of a
rung — RESOURCE_EXHAUSTED, scoped-VMEM OOM, a TPU worker-process crash,
or a hang — drops to the next rung, so one failure never costs the
whole round its number (round 2 failed exactly that way). The JSON
line reports the largest rung that completed.

Env knobs: FASTKV_BENCH_CTX (pins a single context, ladder rungs below it
kept as fallbacks), FASTKV_BENCH_GEN (default 128), FASTKV_BENCH_MODEL
(default llama-3.2-1b), FASTKV_BENCH_CPU=1 for a tiny CPU smoke run,
FASTKV_BENCH_FUSION_AB=1 to additionally time the fused-TSP flash kernel
against the unfused XLA scoring pass, FASTKV_BENCH_QUANT=int8 to run both
methods with int8 weights (see ROOFLINE.md).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_DECODE_SPEEDUP = 2.87  # reference README.md:16
# 229376 crashed the TPU worker in rounds 2-3 but completed cleanly in round 4
# (measured 3.71x, 84% of its 4.43x ceiling — ROOFLINE.md §4) after the
# round-4 kernel/transient reductions, so it leads the ladder again. The
# subprocess-per-rung isolation makes the attempt safe: a crash drops one
# rung and 196608 (reliable since round 3, 3.43x) still beats the bar.
DEFAULT_LADDER = (229376, 196608, 163840, 131072)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_method(method_name, cfg, params, ctx, genlen, ecfg_kw, prefill_only=False):
    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig
    from fastkv_tpu.engine import decode as decode_mod
    from fastkv_tpu.engine import prefill as prefill_mod

    mcfg = MethodConfig(
        method=Method(method_name),
        eviction_mode="proportional",
        retain_rate=0.1,
        tsp_rate=0.2,
        # canonical operating point: tsp_idx=15 of 32 layers
        # (reference scripts/eval_longbench.sh), i.e. exactly HALF the layers
        # ((tsp_idx+1)/L = 16/32) run at full length before TSP. Apply the same
        # fraction at other depths: L//2 - 1 (16 layers -> tsp_idx 7).
        tsp_idx=min(max(1, cfg.num_layers // 2 - 1), cfg.num_layers - 2),
        window_size=8,
        kernel_size=7,
        pooling="maxpool",
    )
    ecfg = EngineConfig(
        prefill_buckets=(ctx,), max_new_tokens=genlen, **ecfg_kw
    )
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, ctx)
    tokens = jnp.ones((1, ctx), jnp.int32)  # synthetic, like e2e.py:55-56
    n_true = jnp.array([ctx], jnp.int32)

    pf = jax.jit(lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n))
    gg = jax.jit(
        lambda p, fl, c, n: decode_mod.greedy_generate(
            p, cfg, mcfg, shapes, fl, c, n, genlen, None, 1,
            use_pallas=ecfg.decode_pallas,
        ),
        donate_argnums=(2,),
    )

    from fastkv_tpu.utils.timing import force

    # warmup / compile (force() fetches a scalar: on the tunneled axon backend
    # block_until_ready returns at dispatch, so completion must be fetch-forced)
    t0 = time.perf_counter()
    logits, cache = pf(params, tokens, n_true)
    force(logits)
    log(f"[{method_name}] prefill compile+first-run {time.perf_counter()-t0:.1f}s")
    if not prefill_only:
        t0 = time.perf_counter()
        res, cache2 = gg(params, logits, cache, n_true)
        force(res.tokens)
        del cache2
        log(f"[{method_name}] decode compile+first-run {time.perf_counter()-t0:.1f}s")

    # measured
    prefill_times, decode_times = [], [0.0]
    runs = int(os.environ.get("FASTKV_BENCH_RUNS", "2"))
    for _ in range(runs):
        t0 = time.perf_counter()
        logits, cache = pf(params, tokens, n_true)
        force(logits)
        prefill_times.append(time.perf_counter() - t0)
        if prefill_only:
            continue
        t0 = time.perf_counter()
        res, cache2 = gg(params, logits, cache, n_true)
        force(res.tokens)
        decode_times.append(time.perf_counter() - t0)
        del cache2
    pt = float(np.mean(prefill_times))
    dt = float(np.mean(decode_times[1:])) if not prefill_only else 0.0
    tok_s = (genlen - 1) / dt if dt > 0 else float("inf")
    mem = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    except Exception:
        pass
    log(
        f"[{method_name}] prefill {pt*1000:.1f}ms  decode {dt*1000:.1f}ms for "
        f"{genlen-1} toks = {tok_s:.1f} tok/s  peak_mem={mem}"
    )
    cache_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(cache)
    )
    del cache
    return {
        "prefill_s": pt,
        "decode_s": dt,
        "tok_s": tok_s,
        "peak_mem": mem,
        "cache_bytes": cache_bytes,
    }


def _fusion_ab(cfg, params, ctx, genlen, ecfg_kw, rounds=3):
    """Interleaved fused-vs-unfused fastkv prefill timing at one context.

    Compiles both programs up front, then alternates timed runs
    (fused, unfused) x rounds so slow-start/host-state effects hit both arms
    equally. Returns (fused_mean_s, unfused_mean_s)."""
    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.utils.timing import force

    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional", retain_rate=0.1,
        tsp_rate=0.2,
        tsp_idx=min(max(1, cfg.num_layers // 2 - 1), cfg.num_layers - 2),
        window_size=8, kernel_size=7, pooling="maxpool",
    )
    tokens = jnp.ones((1, ctx), jnp.int32)
    n_true = jnp.array([ctx], jnp.int32)
    progs = {}
    for arm, fuse in (("fused", True), ("unfused", False)):
        ecfg = EngineConfig(
            prefill_buckets=(ctx,), max_new_tokens=genlen,
            **{**ecfg_kw, "fuse_window_scores": fuse},
        )
        shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, ctx)
        progs[arm] = jax.jit(
            lambda p, t, n, ecfg=ecfg, shapes=shapes: prefill_mod.prefill(
                p, cfg, mcfg, ecfg, shapes, t, n
            )
        )
        logits, cache = progs[arm](params, tokens, n_true)  # compile+warm
        force(logits)
        del cache
    times = {"fused": [], "unfused": []}
    for _ in range(rounds):
        for arm in ("fused", "unfused"):
            t0 = time.perf_counter()
            logits, cache = progs[arm](params, tokens, n_true)
            force(logits)
            times[arm].append(time.perf_counter() - t0)
            del cache
    return float(np.mean(times["fused"])), float(np.mean(times["unfused"]))


def run_rung(ctx: int) -> None:
    """Run both methods at one context length and print the JSON line.

    Executed in a SUBPROCESS per ladder rung (see main): a hard OOM on the
    tunneled TPU can kill the worker process outright (observed UNAVAILABLE
    "TPU worker process crashed", not a catchable RESOURCE_EXHAUSTED), which
    takes every device buffer with it — only process isolation survives all
    failure flavors.
    """
    cpu_smoke = os.environ.get("FASTKV_BENCH_CPU") == "1"
    if cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    from fastkv_tpu.core.config import MODEL_PRESETS

    if cpu_smoke:
        from fastkv_tpu.core.config import ModelConfig

        cfg = ModelConfig.tiny(num_layers=4)
        genlen = 16
        ecfg_kw = dict(use_pallas=False, capacity_align=8)
    else:
        name = os.environ.get("FASTKV_BENCH_MODEL", "llama-3.2-1b")
        cfg = MODEL_PRESETS[name](dtype="bfloat16")
        genlen = int(os.environ.get("FASTKV_BENCH_GEN", "128"))
        ecfg_kw = dict(use_pallas=os.environ.get("FASTKV_BENCH_PALLAS", "1") == "1")
        dp = os.environ.get("FASTKV_BENCH_DECODE_PALLAS")
        if dp is not None:
            ecfg_kw["decode_use_pallas"] = dp == "1"
        mc = os.environ.get("FASTKV_BENCH_MLP_CHUNK")
        if mc is not None:
            # explicit MLP sequence-chunk (caps the [s, intermediate] transient;
            # needed for 8B-class models whose unchunked MLP transients at 32K+
            # don't fit next to 8 GB of weights + the fullkv cache on a 16 GB v5e)
            ecfg_kw["mlp_chunk"] = int(mc)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, model: {cfg.name}, ctx={ctx}, genlen={genlen}")
    from fastkv_tpu.models.llama import (
        init_params_int8_on_device,
        init_params_on_device,
    )
    from fastkv_tpu.utils.timing import force, warmup_device

    log(f"device warmup {warmup_device():.1f}s")
    # int8 weight-only quantization (applied to BOTH methods, so the speedup
    # ratio stays a fair fastkv-vs-fullkv comparison): batch-1 decode streams
    # the weights every step, so int8 nearly halves the weight term of
    # bytes/token and raises the attainable speedup ceiling (ROOFLINE.md).
    # Initialization happens DIRECTLY in int8 (layer-at-a-time transients):
    # an 8B model's bf16 weights are 16 GB — init-then-quantize OOMs the v5e.
    quant_mode = "none" if cpu_smoke else os.environ.get("FASTKV_BENCH_QUANT", "int8")
    t0 = time.perf_counter()
    if quant_mode == "int8":
        params = init_params_int8_on_device(cfg, seed=0)
    else:
        params = init_params_on_device(cfg, seed=0)
    force(params["final_norm"])
    log(
        f"params initialised on device ({quant_mode}) in "
        f"{time.perf_counter()-t0:.1f}s"
    )
    if os.environ.get("FASTKV_BENCH_KV", "bf16") == "int8" and not cpu_smoke:
        ecfg_kw["kv_int8"] = True

    full = bench_method("fullkv", cfg, params, ctx, genlen, ecfg_kw)
    fast = bench_method("fastkv", cfg, params, ctx, genlen, ecfg_kw)

    speedup = full["decode_s"] / fast["decode_s"]
    prefill_ratio = full["prefill_s"] / fast["prefill_s"]
    log(
        f"ctx={ctx}: decode speedup {speedup:.2f}x  prefill ratio {prefill_ratio:.2f}x  "
        f"fastkv {fast['tok_s']:.1f} tok/s vs fullkv {full['tok_s']:.1f} tok/s"
    )

    # --- Fused-TSP kernel A/B (VERDICT r2 task 1) ---------------------------
    # Times the fastkv prefill with the observation-window scoring fused into
    # the Pallas flash kernel vs the separate O(W*s) XLA scoring pass. Runs at
    # the largest context where the fusion is active (beyond ~106K the engine
    # itself falls back to the XLA pass — flash_prefill.fusion_vmem_ok — so an
    # A/B at the headline context would time two identical programs).
    if os.environ.get("FASTKV_BENCH_FUSION_AB", "1") == "1" and ecfg_kw.get(
        "use_pallas", True
    ):
        try:
            ab_ctx = min(ctx, 98304)
            # EngineConfig.fuse_window_scores defaults to False (the fusion
            # measured as a loss, ROOFLINE.md §3) — the fused arm must opt in
            # explicitly or this A/B times two identical unfused programs.
            # Arms are INTERLEAVED (fused, unfused, fused, ...): this host's
            # documented first-measured-runs-~25%-slower effect (ROOFLINE §10)
            # would otherwise bias a fixed-order A/B at the few-percent level
            # the comparison is about (VERDICT r4 weak #7).
            fused_t, unfused_t = _fusion_ab(
                cfg, params, ab_ctx, genlen, ecfg_kw, rounds=3
            )
            log(
                f"fusion A/B at ctx={ab_ctx} (interleaved, n=3): fused prefill "
                f"{fused_t*1e3:.1f}ms vs unfused {unfused_t*1e3:.1f}ms "
                f"({unfused_t/fused_t:.3f}x gain from fusion)"
            )
        except Exception as e:  # never lose the headline JSON to the A/B
            log(f"fusion A/B failed: {type(e).__name__}: {e}")
            gc.collect()

    # --- Decode roofline (see ROOFLINE.md) ---------------------------------
    # Batch-1 decode is HBM-bandwidth-bound: every step must stream the model
    # weights plus the entire KV cache (+ position/validity metadata). The
    # attainable speedup is therefore the BYTES ratio, not the reference's
    # GPU-measured 2.87x, which was set on an 8B model whose cache:weights
    # ratio differs.
    weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
    bytes_full = weight_bytes + full["cache_bytes"]
    bytes_fast = weight_bytes + fast["cache_bytes"]
    ceiling = bytes_full / bytes_fast
    step_full = full["decode_s"] / (genlen - 1)
    step_fast = fast["decode_s"] / (genlen - 1)
    bw_full = bytes_full / step_full / 1e9
    bw_fast = bytes_fast / step_fast / 1e9
    log(
        f"roofline: weights {weight_bytes/1e9:.2f} GB; cache fullkv "
        f"{full['cache_bytes']/1e9:.2f} GB, fastkv {fast['cache_bytes']/1e9:.2f} GB"
        f" -> bytes/token {bytes_full/1e9:.2f} vs {bytes_fast/1e9:.2f} GB, "
        f"speedup ceiling {ceiling:.2f}x"
    )
    log(
        f"roofline: measured {speedup:.2f}x = {speedup/ceiling:.0%} of ceiling; "
        f"implied HBM read BW fullkv {bw_full:.0f} GB/s, fastkv {bw_fast:.0f} GB/s "
        f"(v5e peak 819 GB/s)"
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"fastkv_vs_fullkv_decode_speedup_ctx{ctx}_{cfg.name}"
                    + ("_int8w" if quant_mode == "int8" else "")
                    + ("_int8kv" if ecfg_kw.get("kv_int8") else "")
                ),
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / REF_DECODE_SPEEDUP, 3),
            }
        ),
        flush=True,
    )


def main():
    """Ladder orchestrator: one subprocess per context rung, largest first.

    Preferred ctx 224K: at 128K the 1B model's weights dominate decode
    bytes/token and cap the decode-speedup ceiling (ROOFLINE.md); 224K raises
    the fullkv cache:weights ratio so the ceiling clears the reference's
    2.87x. 224K is memory-tight on a 16 GB v5e (round 2 OOMed there; round 3
    observed the OOM kill the TPU worker process entirely), hence subprocess
    isolation per rung: any child failure — RESOURCE_EXHAUSTED, VMEM OOM,
    worker crash, hang — drops one rung, and the JSON line comes from the
    largest rung that completed.
    """
    if len(sys.argv) > 2 and sys.argv[1] == "--rung":
        run_rung(int(sys.argv[2]))
        return

    import subprocess

    if os.environ.get("FASTKV_BENCH_CPU") == "1":
        ladder = (512,)
    elif os.environ.get("FASTKV_BENCH_LADDER"):
        # explicit comma-separated rung list (e.g. the 8B ladder "49152,40960,32768"
        # — the DEFAULT_LADDER rungs assume a 1B-sized weight footprint)
        ladder = tuple(
            int(x) for x in os.environ["FASTKV_BENCH_LADDER"].split(",") if x
        )
    else:
        env_ctx = os.environ.get("FASTKV_BENCH_CTX")
        if env_ctx:
            c = int(env_ctx)
            ladder = (c,) + tuple(x for x in DEFAULT_LADDER if x < c)
        else:
            ladder = DEFAULT_LADDER
    # 2400s: a rung is ~11 min of work, but a fresh process attaching after a
    # worker restart can pay up to ~16 min of device warmup first (observed
    # round 4) — 1800s made the top rung time out exactly when a previous
    # rung's crash had forced a restart
    rung_timeout = int(os.environ.get("FASTKV_BENCH_RUNG_TIMEOUT", "2400"))

    for rung in ladder:
        log(f"=== ladder rung ctx={rung} (subprocess, timeout {rung_timeout}s) ===")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rung", str(rung)],
                stdout=subprocess.PIPE,
                timeout=rung_timeout,
            )
        except subprocess.TimeoutExpired:
            log(f"ctx={rung}: rung timed out — dropping one ladder rung")
            continue
        result = None
        for line in r.stdout.decode().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                    if "metric" in d:
                        result = line
                except json.JSONDecodeError:
                    pass
        if r.returncode == 0 and result:
            print(result, flush=True)
            return
        log(f"ctx={rung}: rung failed (rc={r.returncode}) — dropping one ladder rung")
    raise RuntimeError(f"every ladder rung failed: {ladder}")


if __name__ == "__main__":
    main()
