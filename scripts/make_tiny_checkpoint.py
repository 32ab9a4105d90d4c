"""Build a tiny, fully offline HF-format Llama checkpoint + byte-level tokenizer.

No real model weights are obtainable in this environment (zero egress, no
checkpoint on disk — see README "Accuracy gate"), so the eval harness is
exercised end-to-end on this deterministic tiny model instead: the same
loader (core.weights.load_params), the same CLI (evals.longbench /
evals.ruler), the same scorers — producing the committed
results/longbench_tiny/results.csv proxy.

Tokenizer: byte-level BPE with no merges (vocab = 256 bytes + specials), so
any text tokenizes 1 byte -> 1 token, fully offline. A pass-through chat
template is attached so the runner's apply_chat_template path executes.

Usage: python scripts/make_tiny_checkpoint.py [out_dir] (default artifacts/tiny-llama)
"""

import os
import sys

import torch
import transformers
from tokenizers import Tokenizer, models, pre_tokenizers, decoders
from transformers import PreTrainedTokenizerFast

SEED = 0
VOCAB = 260  # 256 byte tokens + <eos> <pad> <unk> + 1 spare


def build_tokenizer() -> PreTrainedTokenizerFast:
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    for sp in ("<eos>", "<pad>", "<unk>"):
        vocab[sp] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<eos>", pad_token="<pad>",
        unk_token="<unk>",
    )
    # pass-through template: the harness protocol (wrap except few-shot/code
    # tasks) still executes, the tiny model just sees the raw bytes
    fast.chat_template = (
        "{% for message in messages %}{{ message['content'] }}{% endfor %}"
    )
    return fast


def main(out_dir="artifacts/tiny-llama"):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=131072,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(SEED)
    model = transformers.LlamaForCausalLM(cfg).eval()
    os.makedirs(out_dir, exist_ok=True)
    model.save_pretrained(out_dir, safe_serialization=True)
    build_tokenizer().save_pretrained(out_dir)
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {out_dir}: {n/1e6:.2f}M params, vocab {VOCAB}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
