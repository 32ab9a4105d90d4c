"""Test fixtures: fabricate a complete local HF model directory (config.json +
safetensors + trained tiny tokenizer + chat template) so the whole stack —
weight loader, tokenizer, eval runners, scorers — runs hermetically offline.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


CHAT_TEMPLATE = (
    "{% for message in messages %}<|{{ message['role'] }}|>{{ message['content'] }}"
    "{% endfor %}{% if add_generation_prompt %}<|assistant|>{% endif %}"
)


def make_tiny_tokenizer(out_dir: str, corpus: Optional[list] = None):
    """Train a ~300-token BPE tokenizer and save in HF-fast format."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = corpus or [
        "The quick brown fox jumps over the lazy dog. " * 50,
        "San Francisco is a city. The best thing to do is eat a sandwich. " * 50,
        "Paris is the capital of France. Questions and answers. " * 50,
        "".join(chr(c) for c in range(32, 127)),
        "\n\n\n .,:;!?0123456789",
    ]
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=384,
        special_tokens=["<unk>", "<s>", "</s>", "<|user|>", "<|assistant|>", "<|im_start|>"],
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        pad_token="</s>",
    )
    fast.chat_template = CHAT_TEMPLATE
    fast.save_pretrained(out_dir)
    return fast


def make_tiny_model_dir(out_dir: str, seed: int = 0, num_layers: int = 2):
    """Write config.json + model.safetensors for a tiny Llama + tokenizer."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tokenizer = make_tiny_tokenizer(out_dir)
    vocab_size = max(512, tokenizer.vocab_size)
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": vocab_size,
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": num_layers,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "max_position_embeddings": 131072,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float32",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    rng = np.random.default_rng(seed)
    D, F, H, KH, dh = 64, 128, 4, 2, 16
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((vocab_size, D)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones((D,), np.float32),
        "lm_head.weight": rng.standard_normal((vocab_size, D)).astype(np.float32) * 0.02,
    }
    for i in range(num_layers):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = rng.standard_normal((H * dh, D)).astype(np.float32) * 0.02
        tensors[p + "self_attn.k_proj.weight"] = rng.standard_normal((KH * dh, D)).astype(np.float32) * 0.02
        tensors[p + "self_attn.v_proj.weight"] = rng.standard_normal((KH * dh, D)).astype(np.float32) * 0.02
        tensors[p + "self_attn.o_proj.weight"] = rng.standard_normal((D, H * dh)).astype(np.float32) * 0.02
        tensors[p + "mlp.gate_proj.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.02
        tensors[p + "mlp.up_proj.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.02
        tensors[p + "mlp.down_proj.weight"] = rng.standard_normal((D, F)).astype(np.float32) * 0.02
        tensors[p + "input_layernorm.weight"] = np.ones((D,), np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones((D,), np.float32)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    return out_dir
