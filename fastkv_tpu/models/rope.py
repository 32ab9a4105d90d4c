"""Rotary position embeddings (HF rotate-half convention, llama3 scaling).

TPU-first notes: cos/sin are computed on the fly from explicit position-id arrays
(never an implicit arange) because token-selective propagation keeps the *original*
positions of surviving tokens (reference: baselines/fastkv/llama_model.py:252-259,
368-371 — the TSP gather carries position_ids and the model re-derives rotary
embeddings for the reduced sequence). Everything is fp32 until application.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fastkv_tpu.core.config import ModelConfig, RopeScaling


def compute_inv_freq(cfg: ModelConfig) -> np.ndarray:
    """Inverse frequencies [head_dim//2], with optional llama3 wavelength scaling.

    Mirrors HF `ROPE_INIT_FUNCTIONS["llama3"]` semantics (public formula): low
    frequencies divided by `factor`, high frequencies kept, smooth interpolation
    between the wavelength thresholds.
    """
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    rs = cfg.rope_scaling
    if rs is not None and rs.rope_type == "llama3":
        low_freq_wavelen = rs.original_max_position_embeddings / rs.low_freq_factor
        high_freq_wavelen = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        # wavelen > low_freq_wavelen: scale down by factor
        scaled = np.where(wavelen > low_freq_wavelen, inv_freq / rs.factor, inv_freq)
        # between thresholds: smooth interpolation
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        interp = (1 - smooth) / rs.factor * inv_freq + smooth * inv_freq
        is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
        scaled = np.where(is_mid, interp, scaled)
        inv_freq = scaled
    return inv_freq.astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [..., s] int32 -> (cos, sin) each [..., s, head_dim//2] fp32."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., s, d/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding in the HF rotate-half layout.

    x: [b, heads, s, d]; cos/sin: [b, s, d/2] (broadcast over heads).
    rotate_half(x) = concat(-x2, x1) with x1 = x[..., :d/2], x2 = x[..., d/2:].
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    out1 = xf1 * c - xf2 * s
    out2 = xf2 * c + xf1 * s
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
