"""PyramidInfer tests: schedule math, pyramid shape plan, and e2e generation."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine import pyramid
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import init_params


def test_decay_schedule_matches_reference_formulas():
    mcfg = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_decay_strategy="cosine")
    L = 32
    for l in [0, 7, 31]:
        expect = (1.0 - 0.3) * (math.cos(math.pi * l / L) + 1) / 2 + 0.3
        assert pyramid.decay_ratio(mcfg, l, L) == pytest.approx(expect)
    mlin = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_decay_strategy="linear")
    assert pyramid.decay_ratio(mlin, 16, 32) == pytest.approx((1 - 0.3) * 0.5 + 0.3)


def test_layer_lengths_monotone_pyramid():
    cfg = ModelConfig.tiny(num_layers=8)
    mcfg = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_recent_ratio=0.1, pyramid_min_context_length=16)
    lengths = pyramid.plan_layer_lengths(cfg, mcfg, 1024, align=8)
    assert lengths[0] == 1024
    assert all(b <= a for a, b in zip(lengths, lengths[1:]))
    assert lengths[-1] < 1024  # actually compressed


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(
        method=Method.PYRAMIDINFER,
        pyramid_decay_ratio=0.4, pyramid_recent_ratio=0.1,
        pyramid_min_context_length=8, pyramid_sink_len=4,
        pyramid_distance_weight=1.2,
    )
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    return Engine(params, cfg, mcfg, ecfg), cfg


def test_pyramid_generates_and_cache_shrinks(tiny_engine):
    eng, cfg = tiny_engine
    prompt = list(np.random.default_rng(3).integers(0, cfg.vocab_size, 250))
    import jax

    fn = eng.prefill_fn(256, 8)
    toks = np.zeros((1, 256), np.int32)
    toks[0, :250] = prompt
    logits, cache = fn(eng.params, jnp.asarray(toks), jnp.array([250], jnp.int32))
    counts = np.asarray(cache.valid).sum(axis=(2, 3)) / cache.valid.shape[2]
    # per-layer cache contents form a (weakly) decreasing pyramid
    assert counts[0, 0] == 250
    assert counts[-1, 0] < counts[0, 0]
    assert all(b <= a + 1e-6 for a, b in zip(counts[:, 0], counts[1:, 0]))

    out = eng.generate([prompt], max_new_tokens=6)[0]
    assert len(out) == 6


def test_pyramid_sinks_survive(tiny_engine):
    eng, cfg = tiny_engine
    prompt = list(np.random.default_rng(4).integers(0, cfg.vocab_size, 250))
    fn = eng.prefill_fn(256, 8)
    toks = np.zeros((1, 256), np.int32)
    toks[0, :250] = prompt
    _, cache = fn(eng.params, jnp.asarray(toks), jnp.array([250], jnp.int32))
    pos = np.asarray(cache.pos)
    val = np.asarray(cache.valid)
    last = cfg.num_layers - 1
    kept_positions = set(pos[last, 0, 0][val[last, 0, 0]].tolist())
    assert {0, 1, 2, 3} <= kept_positions  # sink tokens pinned through the pyramid
    assert 249 in kept_positions  # most recent token survives


# ---------------------------------------------------------------------------
# Generation-stage golden test: a faithful dynamic-shape port of the reference
# forward (baselines/pyramidinfer/llama_model.py:903-1135) — list-based caches,
# eager attention, physical cache rewrites — run against the engine's static
# masked implementation on identical weights.
# ---------------------------------------------------------------------------

def _ref_pyramid_port(params, cfg, mcfg, prompt, gen_steps):
    """Reference-semantics pyramidinfer prefill+decode (dynamic shapes, batch 1).

    Mirrors the torch reference line-by-line: per-layer caches as lists,
    recent_attn_weights carried across steps (:1075,1080-1081,1131),
    past_kv_seq_lens (:1072-1073,1128), physical gather rewrite (:1104-1127).
    `recent_length` is frozen at int(n * ratio) — test params are chosen so the
    reference's growing int((n+e)*ratio) equals it for every step.
    """
    import jax
    import jax.numpy as jnp
    from fastkv_tpu.models import llama
    from fastkv_tpu.models.rope import compute_inv_freq

    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    eps = cfg.rms_norm_eps
    n = len(prompt)
    R = int(n * mcfg.pyramid_recent_ratio)
    sink = mcfg.pyramid_sink_len
    dw = mcfg.pyramid_distance_weight
    exceed = mcfg.pyramid_exceed_length_to_compress
    min_ctx = min(mcfg.pyramid_min_context_length, n - 1 - R)
    L = cfg.num_layers
    lays = [__import__("jax").tree_util.tree_map(lambda x: x[l], params["layers"])
            for l in range(L)]

    def eager_attn(q, k, v, qpos, kpos):
        H, d = q.shape[1], q.shape[-1]
        g = H // k.shape[1]
        kk, vv = jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1)
        logits = jnp.einsum("bhqd,bhsd->bhqs", q, kk) / (d ** 0.5)
        mask = kpos[None, None, None, :] <= qpos[None, None, :, None]
        p = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
        return jnp.einsum("bhqs,bhsd->bhqd", p, vv), p

    h = llama.embed(params, cfg, jnp.asarray([prompt], jnp.int32))
    sel_pos = jnp.arange(n, dtype=jnp.int32)
    K, V, POS, recent_aw, past_lens = [], [], [], [], []
    for l in range(L):
        lp = lays[l]
        hn = llama.rms_norm(h, lp["ln_attn"], eps)
        q, k, v = llama.qkv_proj(lp, cfg, hn)
        q, k = llama.rope_qk(q, k, sel_pos[None, :], inv_freq)
        out, p = eager_attn(q, k, v, sel_pos, sel_pos)
        h = h + llama.attn_out_proj(lp, out)
        h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], eps))
        K.append(k); V.append(v); POS.append(sel_pos)
        aw = p.mean(axis=1)
        r = pyramid.decay_ratio(mcfg, l, L)
        if (l % mcfg.pyramid_downsample_interval) == 0:
            rec2 = aw[:, -(1 + R):, :-(1 + R)]
            wvec = jnp.linspace(1.0, dw, rec2.shape[1])
            sc = (rec2 * wvec[None, :, None]).mean(axis=1)
            sc = sc.at[:, :sink].set(jnp.finfo(sc.dtype).max)
            ctx = sc.shape[-1]
            if ctx > min_ctx and r < 1.0:
                topk = int(ctx * r) if int(ctx * r) > min_ctx else ctx
                idx = jnp.sort(jax.lax.top_k(sc, topk)[1], axis=-1)[0]
                sel_pos = jnp.concatenate([sel_pos[idx], sel_pos[-(1 + R):]])
                h = jnp.concatenate([h[:, idx, :], h[:, -(1 + R):, :]], axis=1)
        past_lens.append(K[l].shape[2])
        recent_aw.append(aw[:, -(1 + R):])
    toks = [int(jnp.argmax(llama.unembed(params, cfg, h[:, -1:, :])[0, 0]))]

    for e in range(1, gen_steps):
        p_pos = jnp.asarray([n + e - 1], jnp.int32)
        h = llama.embed(params, cfg, jnp.asarray([[toks[-1]]], jnp.int32))
        for l in range(L):
            lp = lays[l]
            hn = llama.rms_norm(h, lp["ln_attn"], eps)
            q, k, v = llama.qkv_proj(lp, cfg, hn)
            q, k = llama.rope_qk(q, k, p_pos[None, :], inv_freq)
            K[l] = jnp.concatenate([K[l], k], axis=2)
            V[l] = jnp.concatenate([V[l], v], axis=2)
            POS[l] = jnp.concatenate([POS[l], p_pos])
            out, p = eager_attn(q, K[l], V[l], p_pos, POS[l])
            h = h + llama.attn_out_proj(lp, out)
            h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], eps))
            aw_new = p.mean(axis=1)  # [1, 1, len]
            raw = recent_aw[l]
            raw = jnp.concatenate(
                [raw, jnp.zeros((1, raw.shape[1], 1), raw.dtype)], axis=-1)
            aw = jnp.concatenate([raw, aw_new], axis=1)  # [1, R+2, len]
            cur = n + e  # DynamicCache.seen_tokens (layer-0 length)
            sched = pyramid.gen_decay_ratio(mcfg, l, L)
            if cur - R - past_lens[l] >= exceed:
                cands = aw[:, -(1 + R):, -(1 + R + exceed):-(1 + R)]
                wvec = jnp.linspace(1.0, dw, cands.shape[1])
                sc = (cands * wvec[None, :, None]).mean(axis=1)
                topk = max(int(exceed * mcfg.pyramid_gen_compress_ratio * sched), 1)
                idx = jnp.sort(jax.lax.top_k(sc, topk)[1], axis=-1)[0]

                def rewrite(x, ax):
                    lo = [slice(None)] * x.ndim; mid = [slice(None)] * x.ndim
                    hi = [slice(None)] * x.ndim
                    lo[ax] = slice(None, -(1 + R + exceed))
                    mid[ax] = slice(-(1 + R + exceed), -(1 + R))
                    hi[ax] = slice(-(1 + R), None)
                    g = jnp.take(x[tuple(mid)], idx, axis=ax)
                    return jnp.concatenate([x[tuple(lo)], g, x[tuple(hi)]], axis=ax)

                K[l] = rewrite(K[l], 2)
                V[l] = rewrite(V[l], 2)
                POS[l] = rewrite(POS[l], 0)
                aw = rewrite(aw, 2)
                past_lens[l] = K[l].shape[2] - R
            recent_aw[l] = aw[:, -(1 + R):]
        toks.append(int(jnp.argmax(llama.unembed(params, cfg, h)[0, 0])))
    return toks, [np.asarray(p) for p in POS]


def test_gen_stage_matches_reference_port():
    import jax.numpy as jnp

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(
        method=Method.PYRAMIDINFER,
        pyramid_decay_ratio=0.6, pyramid_recent_ratio=0.02,
        pyramid_min_context_length=8, pyramid_sink_len=4,
        pyramid_distance_weight=1.2,
        pyramid_exceed_length_to_compress=6,
        pyramid_gen_compress_ratio=0.9, pyramid_gen_decay_ratio=0.5,
        pyramid_gen_decay_strategy="cosine",
    )
    gen_steps = 45  # int((250+e)*0.02) == 5 for every step -> frozen R is exact
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=gen_steps,
                        use_pallas=False, capacity_align=8)
    eng = Engine(params, cfg, mcfg, ecfg)
    prompt = list(np.random.default_rng(11).integers(0, cfg.vocab_size, 250))

    ref_toks, ref_pos = _ref_pyramid_port(params, cfg, mcfg, prompt, gen_steps)

    toks = np.zeros((1, 256), np.int32); toks[0, :250] = prompt
    n_true = jnp.array([250], jnp.int32)
    logits, cache, pstate = eng._pyramid_prefill_fn(256, gen_steps)(
        eng.params, jnp.asarray(toks), n_true)
    res, cache2 = eng._pyramid_generate_fn(256, gen_steps, 0, 1)(
        eng.params, logits, cache, pstate, n_true, jnp.asarray([0], jnp.int32))
    got_toks = np.asarray(res.tokens)[0].tolist()
    assert got_toks == ref_toks

    pos = np.asarray(cache2.pos); val = np.asarray(cache2.valid)
    evicted_any = False
    for l in range(cfg.num_layers):
        got = sorted(pos[l, 0, 0][val[l, 0, 0]].tolist())
        want = sorted(ref_pos[l].tolist())
        assert got == want, f"layer {l}: kept-position sets differ"
        evicted_any |= len(want) < 250 + gen_steps - 1
    assert evicted_any  # the gen stage actually fired


def test_pyramidinfer_config_loader_and_presets():
    mcfg = MethodConfig().with_pyramidinfer_preset("Meta-Llama-3.1-8B-Instruct", 0.35)
    assert mcfg.method == Method.PYRAMIDINFER
    # reference asserts for the 35% llama config (baselines/monkeypatch.py:158-161)
    assert mcfg.pyramid_decay_ratio == 0.01 and mcfg.pyramid_recent_ratio == 0.01
    m60 = MethodConfig().with_pyramidinfer_preset("Ministral-8B-Instruct-2410", 0.6)
    assert m60.pyramid_decay_ratio == 0.75 and m60.pyramid_recent_ratio == 0.2
    assert m60.pyramid_exceed_length_to_compress == 16
    nemo = MethodConfig().with_pyramidinfer_preset("Mistral-Nemo-Instruct-2407", 0.6)
    assert nemo.pyramid_decay_ratio == 0.78
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        MethodConfig().with_pyramidinfer_preset("Meta-Llama-3.1-8B", 0.42)


def test_calibration_analytic_matches_engine():
    import jax.numpy as jnp
    from fastkv_tpu.bench.calibrate import analytic_retain_rate, empirical_retain_rate

    cfg = ModelConfig.tiny()
    mcfg = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_recent_ratio=0.1, pyramid_min_context_length=16)
    # align=1: static plan == dynamic reference schedule exactly
    a1 = analytic_retain_rate(cfg, mcfg, 512, align=1)
    e1 = empirical_retain_rate(cfg, mcfg, 512, align=1)
    assert abs(a1 - e1) < 1e-6
    # align>1 rounds static capacities up: measured <= analytic, within align/seq per layer
    a8 = analytic_retain_rate(cfg, mcfg, 512, align=8)
    e8 = empirical_retain_rate(cfg, mcfg, 512, align=8)
    assert e8 <= a8 + 1e-6 and a8 - e8 < 8 / 512
