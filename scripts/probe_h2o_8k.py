"""Probe the H2O scorer's 8K pathology (VERDICT r4 next #7 / ROOFLINE §9).

Round-4 isolation: `ops.attention.h2o_scores` times 802 ms at s=8192 but
590 ms at s=32768 — 13x off the fp32-logit-traffic memory bound at the
SMALLER shape, invariant to row_block in {512..4096}. Every protocol-compliant
H2O run (capped at 7950 by model_max_len) eats this.

Hypothesis probed, kernel-level on the chip: the BUCKET SHAPE, not the
iteration structure. Run the same n<=8192 work inside buckets of different
widths (k padded, k_valid masks the tail — padded rows/columns contribute
exactly 0 mass).

MEASURED (v5e, 3-run means, one subprocess per config — an OOM poisons the
arena for later configs in the same process):

    bucket= 2048 n= 2048 rb=2048:  34.3 ms
    bucket= 4096 n= 4096 rb=2048:  31.1 ms
    bucket= 8192 n= 8192 rb=2048: 801.3 ms   <- pathological shape
    bucket= 8192 n= 4096 rb=2048: 801.1 ms   (n-invariant)
    bucket=16384 n= 8192 rb=2048: 166.4 ms   <- same true work, 4.8x faster
    bucket=16384 n= 8192 rb=4096: 165.5 ms   (row_block-invariant, again)
    bucket=16384 n=16384 rb=2048: 165.2 ms
    bucket=32768 n=32768 rb=2048: 587.9 ms

The pathology is exactly the s=8192 shape — independent of n and row_block —
so `h2o_scores` now auto-pads 8192 to 16384 (ops/attention.py, equivalence
test tests/test_policies.py::test_h2o_scores_padded_shape_equivalent).
A row_block=8192 single-iteration variant OOMs (the [1,32,8192,8192] fp32
logit block defeats the streaming) — not probed further.

Usage: timeout 2400 python scripts/probe_h2o_8k.py
(NOTE: runs configs in ONE process for convenience; the table above was
measured with one subprocess per config.)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastkv_tpu.ops.attention import h2o_scores
    from fastkv_tpu.utils.timing import force, warmup_device

    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    H, KH, d = 32, 8, 64  # llama-3.2-1b shapes
    rng = np.random.default_rng(0)

    def probe(s_bucket, n, row_block, runs=3):
        q = jnp.asarray(rng.standard_normal((1, H, s_bucket, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, KH, s_bucket, d)), jnp.bfloat16)
        k_valid = (jnp.arange(s_bucket) < n)[None, :]
        n_true = jnp.array([n], jnp.int32)
        # pad_to=0 disables the auto-workaround: probe the RAW shapes
        fn = jax.jit(lambda q, k, v: h2o_scores(q, k, v, n_true, 8,
                                                row_block=row_block, pad_to=0))
        out = fn(q, k, k_valid)
        force(out)  # compile
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(fn(q, k, k_valid))
            ts.append(time.perf_counter() - t0)
        ms = float(np.mean(ts)) * 1e3
        # fp32 logit traffic bound: [H, rb, s] blocks written+read ~2.5x
        bound_ms = H * n * s_bucket * 4 * 2.5 / 819e9 * 1e3
        print(f"bucket={s_bucket:6d} n={n:6d} rb={row_block:5d}: "
              f"{ms:7.1f} ms  (logit-traffic bound ~{bound_ms:.0f} ms, "
              f"{ms/max(bound_ms,1e-9):.1f}x off)", flush=True)
        return ms

    probe(4096, 4096, 2048)
    probe(8192, 8192, 2048)      # pathological baseline
    probe(16384, 8192, 2048)     # padded bucket, same true work
    probe(32768, 32768, 2048)    # round-4 fast point


if __name__ == "__main__":
    main()
