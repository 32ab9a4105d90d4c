"""Ring attention / Ulysses SP vs single-device attention (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastkv_tpu.core.config import ParallelConfig
from fastkv_tpu.ops import attention as att
from fastkv_tpu.parallel import ring_attention as ra
from fastkv_tpu.parallel.sharding import make_mesh

B, H, KH, D = 1, 8, 4, 16


def setup(s, count, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KH, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KH, s, D)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (B, s))
    cnt = jnp.asarray([count], jnp.int32)
    valid = jnp.arange(s)[None, :] < cnt[:, None]
    ref = att.chunked_causal_attention(q, k, v, positions, positions, valid, q_block=64)
    return q, k, v, positions, cnt, np.asarray(ref)


@pytest.mark.parametrize("seq,count", [(256, 256), (256, 200)])
def test_ring_matches_single_device(seq, count):
    mesh = make_mesh(ParallelConfig(data=1, model=2, seq=4))
    q, k, v, positions, cnt, ref = setup(seq, count)
    fn = ra.make_ring_attention(mesh, use_pallas=False)
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(q, k, v, positions, cnt)
    o = np.asarray(out)
    m = np.arange(seq) < count
    np.testing.assert_allclose(o[0][:, m], ref[0][:, m], atol=3e-5, rtol=3e-5)


def test_ulysses_matches_single_device():
    mesh = make_mesh(ParallelConfig(data=1, model=1, seq=8))
    q, k, v, positions, cnt, ref = setup(256, 230)
    fn = ra.make_ulysses_attention(mesh, use_pallas=False)
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(q, k, v, positions, cnt)
    o = np.asarray(out)
    m = np.arange(256) < 230
    np.testing.assert_allclose(o[0][:, m], ref[0][:, m], atol=3e-5, rtol=3e-5)


def test_merge_statistics_exact():
    """Splitting a softmax row into chunks and merging must equal the full row."""
    rng = np.random.default_rng(1)
    s1 = rng.standard_normal((2, 3, 5, 7)).astype(np.float32)
    s2 = rng.standard_normal((2, 3, 5, 9)).astype(np.float32)
    vv = rng.standard_normal((2, 3, 16, 4)).astype(np.float32)

    def softmax_out(logits, v):
        p = np.exp(logits - logits.max(-1, keepdims=True))
        l = p.sum(-1)
        m = logits.max(-1)
        o = (p / l[..., None]) @ v
        return o, m, l

    o1, m1, l1 = softmax_out(s1, vv[:, :, :7])
    o2, m2, l2 = softmax_out(s2, vv[:, :, 7:])
    o, m, l = ra._merge(
        jnp.asarray(o1), jnp.asarray(m1), jnp.asarray(l1),
        jnp.asarray(o2), jnp.asarray(m2), jnp.asarray(l2),
    )
    full_o, _, _ = softmax_out(np.concatenate([s1, s2], -1), vv)
    np.testing.assert_allclose(np.asarray(o), full_o, atol=1e-6)
