"""Sweep flash-prefill kernel block sizes on the driver TPU.

One kernel call per config at the headline shapes (llama-3.2-1b heads,
s=131072), 3 timed runs after compile. The default is 1024x1024
(ROOFLINE.md §6); this checks whether the round-4 mask reduction moved the
optimum (bigger q blocks amortize per-block scalar work; VMEM caps apply).

Usage: timeout 3000 python scripts/sweep_flash_blocks.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastkv_tpu.ops.flash_prefill import flash_attention
    from fastkv_tpu.utils.profiling import attention_prefill_roofline
    from fastkv_tpu.utils.timing import force, warmup_device

    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    b, h, kh, d, s = 1, 32, 8, 64, 131072
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    count = jnp.asarray([s], jnp.int32)

    for bq, bk in ((1024, 1024), (2048, 1024), (1024, 2048), (512, 1024),
                   (2048, 2048), (4096, 1024), (1024, 512)):
        try:
            out = flash_attention(q, k, v, pos, count, block_q=bq, block_k=bk)
            force(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = flash_attention(
                    q, k, v, pos, count, block_q=bq, block_k=bk
                )
                force(out)
                ts.append(time.perf_counter() - t0)
            rl = attention_prefill_roofline(
                float(np.mean(ts)), s=s, d=d, num_heads=h, num_kv_heads=kh
            )
            print(
                f"bq={bq} bk={bk}: {rl.seconds*1e3:.0f} ms  "
                f"{rl.achieved_tflops:.1f} TF/s  "
                f"({rl.efficiency:.0%} of roofline, {('compute' if rl.compute_bound else 'memory')}-bound)",
                flush=True,
            )
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
