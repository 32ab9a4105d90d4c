"""On-chip parity check of the Pallas flash-prefill kernel vs the XLA path.

The CPU test suite exercises the kernel in interpret mode; this script runs
the REAL Mosaic-compiled kernel on the driver TPU and asserts numerical
parity against ops.attention.chunked_causal_attention at a size where the XLA
path is safe (s=4096). Covers: plain causal, partial validity (n < s),
sliding window, and the GQA layout. Run after any kernel change.

Usage: timeout 1800 python scripts/tpu_kernel_parity.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def check(name, h, kh, d, s, n, sliding_window=None):
    from fastkv_tpu.ops import attention as att
    from fastkv_tpu.ops.flash_prefill import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, kh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, kh, s, d)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (1, s))
    count = jnp.asarray([n], jnp.int32)
    valid = pos < count[:, None]

    out_k = flash_attention(q, k, v, pos, count, sliding_window=sliding_window)
    out_x = att.chunked_causal_attention(
        q, k, v, pos, pos, valid, sliding_window=sliding_window
    )
    a = np.asarray(out_k[:, :, :n, :], np.float32)
    b = np.asarray(out_x[:, :, :n, :], np.float32)
    err = np.max(np.abs(a - b))
    ok = err < 2e-2 and np.isfinite(a).all()
    print(f"{name}: max_abs_err={err:.4f} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from fastkv_tpu.utils.timing import warmup_device

    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    ok = True
    ok &= check("causal full-valid", 32, 8, 64, 4096, 4096)
    ok &= check("causal partial-valid", 32, 8, 64, 4096, 3001)
    ok &= check("sliding-window", 32, 8, 128, 4096, 4096, sliding_window=1024)
    ok &= check("swa partial", 32, 8, 128, 4096, 2750, sliding_window=512)
    if not ok:
        sys.exit(1)
    print("ALL PARITY OK", flush=True)


if __name__ == "__main__":
    main()
