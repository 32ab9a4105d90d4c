"""Typed configuration tree for the engine.

Replaces the reference's flat argparse namespaces duplicated across five CLIs
(reference: eval/run_longbench.py:252-296, benchmark/e2e.py:303-343) and the
per-layer attribute broadcast done by ``set_model`` / ``compress_fastkv``
(reference: baselines/monkeypatch.py:104-194, baselines/fastkv/utils.py:25-46)
with plain dataclasses plus pure derivation functions.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Optional, Tuple


class Method(str, enum.Enum):
    """KV-management methods, mirroring the reference method registry
    (reference: baselines/monkeypatch.py:12-57)."""

    FULLKV = "fullkv"
    FASTKV = "fastkv"
    SNAPKV = "snapkv"
    H2O = "h2o"
    STREAMINGLLM = "streamingllm"
    GEMFILTER = "gemfilter"
    PYRAMIDINFER = "pyramidinfer"


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Llama-3 style rope scaling (applied to inverse frequencies once).

    Matches the HF `rope_scaling` dict with `rope_type="llama3"`.
    """

    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    rope_type: str = "llama3"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for the Llama/Mistral model family.

    The reference supports Meta-Llama-3.1-8B-Instruct, Ministral-8B-Instruct-2410
    and Mistral-Nemo-Instruct-2407 (reference: scripts2/eval_prefill.sh:1,36,53).
    """

    name: str = "tiny"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rope_scaling: Optional[RopeScaling] = None
    rms_norm_eps: float = 1e-5
    sliding_window: Optional[int] = None  # Mistral-style SWA; None = global attention
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 131072
    # "bfloat16" on TPU (reference runs fp16 on GPU; bf16 is the TPU-native choice,
    # selection/softmax math stays fp32 either way).
    dtype: str = "bfloat16"

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    @classmethod
    def tiny(cls, **kw) -> "ModelConfig":
        """A CPU-runnable debug config used by unit tests."""
        base = dict(
            name="tiny",
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=4,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            rope_theta=10000.0,
            rope_scaling=None,
            rms_norm_eps=1e-6,
            max_position_embeddings=4096,
            dtype="float32",
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama_3_2_1b(cls, **kw) -> "ModelConfig":
        base = dict(
            name="llama-3.2-1b",
            vocab_size=128256,
            hidden_size=2048,
            intermediate_size=8192,
            num_layers=16,
            num_heads=32,
            num_kv_heads=8,
            head_dim=64,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(factor=32.0),
            tie_word_embeddings=True,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama_3_2_3b(cls, **kw) -> "ModelConfig":
        base = dict(
            name="llama-3.2-3b",
            vocab_size=128256,
            hidden_size=3072,
            intermediate_size=8192,
            num_layers=28,
            num_heads=24,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(factor=32.0),
            tie_word_embeddings=True,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama_3_1_8b(cls, **kw) -> "ModelConfig":
        base = dict(
            name="llama-3.1-8b",
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(factor=8.0),
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama_3_1_70b(cls, **kw) -> "ModelConfig":
        base = dict(
            name="llama-3.1-70b",
            vocab_size=128256,
            hidden_size=8192,
            intermediate_size=28672,
            num_layers=80,
            num_heads=64,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            rope_scaling=RopeScaling(factor=8.0),
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def ministral_8b(cls, **kw) -> "ModelConfig":
        # Ministral-8B-Instruct-2410: 36 layers, SWA 32768 (interleaved=every layer
        # in HF release), GQA 32/8, head_dim 128, vocab 131072.
        base = dict(
            name="ministral-8b",
            vocab_size=131072,
            hidden_size=4096,
            intermediate_size=12288,
            num_layers=36,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=100000000.0,
            sliding_window=32768,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def mistral_nemo_12b(cls, **kw) -> "ModelConfig":
        base = dict(
            name="mistral-nemo-12b",
            vocab_size=131072,
            hidden_size=5120,
            intermediate_size=14336,
            num_layers=40,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=1000000.0,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def from_hf_config(cls, hf_cfg, name: str = "hf") -> "ModelConfig":
        """Build from a transformers PretrainedConfig (or dict) for weight import."""
        if not isinstance(hf_cfg, dict):
            hf_cfg = hf_cfg.to_dict()
        rs = hf_cfg.get("rope_scaling")
        rope_scaling = None
        if rs and rs.get("rope_type", rs.get("type")) == "llama3":
            rope_scaling = RopeScaling(
                factor=rs["factor"],
                low_freq_factor=rs["low_freq_factor"],
                high_freq_factor=rs["high_freq_factor"],
                original_max_position_embeddings=rs["original_max_position_embeddings"],
            )
        num_heads = hf_cfg["num_attention_heads"]
        return cls(
            name=name,
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            intermediate_size=hf_cfg["intermediate_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=hf_cfg.get("num_key_value_heads", num_heads),
            head_dim=hf_cfg.get("head_dim") or hf_cfg["hidden_size"] // num_heads,
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
            sliding_window=hf_cfg.get("sliding_window"),
            tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
            max_position_embeddings=hf_cfg.get("max_position_embeddings", 131072),
        )


MODEL_PRESETS = {
    "tiny": ModelConfig.tiny,
    "llama-3.2-1b": ModelConfig.llama_3_2_1b,
    "llama-3.2-3b": ModelConfig.llama_3_2_3b,
    "llama-3.1-8b": ModelConfig.llama_3_1_8b,
    "llama-3.1-70b": ModelConfig.llama_3_1_70b,
    "ministral-8b": ModelConfig.ministral_8b,
    "mistral-nemo-12b": ModelConfig.mistral_nemo_12b,
}


@dataclasses.dataclass(frozen=True)
class MethodConfig:
    """KV-management method hyperparameters.

    Field semantics mirror the reference CLI flags (eval/run_longbench.py:276-296)
    and cluster attributes (baselines/fastkv/utils.py:49-78). Canonical operating
    point from scripts/eval_longbench.sh: method=fastkv, eviction=proportional,
    tsp_rate=0.2, retain_rate=0.1, tsp_idx=15 (Llama-3.1-8B).
    """

    method: Method = Method.FASTKV
    # SnapKV-style observation window (last W prompt tokens kept verbatim).
    window_size: int = 8
    # 1-D pooling over attention-mass scores before top-k.
    kernel_size: int = 7
    pooling: str = "maxpool"  # 'avgpool' | 'maxpool' (run_longbench.py:283 default)
    # 'constant' uses absolute budgets; 'proportional' derives them from seq len
    # (reference: fastkv/utils.py:86-87,123-124).
    eviction_mode: str = "proportional"
    max_capacity_prompt: int = 512  # constant-mode per-layer KV budget
    tsp_len: int = 2048  # constant-mode TSP propagation length
    retain_rate: float = 0.1  # proportional-mode KV budget = retain_rate * n
    tsp_rate: float = 0.2  # proportional-mode tsp_len = tsp_rate * n
    tsp_idx: int = 15  # layer whose output is token-selected (fastkv)
    filter_idx: int = 13  # gemfilter selection layer (scripts/eval_longbench.sh)
    # PyramidInfer knobs (reference: baselines/pyramidinfer/pyramidinfer_configs/*.json)
    pyramid_recent_ratio: float = 0.2
    pyramid_decay_ratio: float = 0.7
    pyramid_decay_strategy: str = "cosine"  # 'cosine' | 'linear'
    pyramid_min_context_length: int = 64
    pyramid_sink_len: int = 4
    pyramid_distance_weight: float = 1.2
    pyramid_downsample_interval: int = 1
    # generation-stage periodic re-compression (reference gen branch
    # baselines/pyramidinfer/llama_model.py:1076-1129 + "generation_stage" keys in
    # pyramidinfer_configs/*.json: gen_decay_ratio, gen_decay_strategy,
    # gen_compress_ratio, exceed_length_to_compress)
    pyramid_gen_decay_ratio: float = 1.0
    pyramid_gen_decay_strategy: str = "cosine"
    pyramid_gen_compress_ratio: float = 0.9
    pyramid_exceed_length_to_compress: int = 16

    def with_pyramidinfer_json(self, source) -> "MethodConfig":
        """Overlay a reference-format pyramidinfer config (path, dict or file).

        Schema: {"prefill_stage": {recent_ratio, prefill_decay_ratio,
        prefill_decay_strategy, min_context_length,
        layerwise_downsample_interval, streamingllm_sink_len, distance_weight},
        "generation_stage": {gen_decay_ratio, gen_decay_strategy,
        gen_compress_ratio, exceed_length_to_compress}} — the shape consumed by
        the reference's load_pyramid_config (baselines/pyramidinfer/utils.py:8-17)
        and shipped in baselines/pyramidinfer/pyramidinfer_configs/*.json.
        """
        if isinstance(source, str):
            with open(source) as f:
                data = json.load(f)
        elif hasattr(source, "read"):
            data = json.load(source)
        else:
            data = source
        p = data.get("prefill_stage", {})
        g = data.get("generation_stage", {})
        return dataclasses.replace(
            self,
            method=Method.PYRAMIDINFER,
            pyramid_recent_ratio=p.get("recent_ratio", self.pyramid_recent_ratio),
            pyramid_decay_ratio=p.get("prefill_decay_ratio", self.pyramid_decay_ratio),
            pyramid_decay_strategy=p.get(
                "prefill_decay_strategy", self.pyramid_decay_strategy),
            pyramid_min_context_length=p.get(
                "min_context_length", self.pyramid_min_context_length),
            pyramid_downsample_interval=p.get(
                "layerwise_downsample_interval", self.pyramid_downsample_interval),
            pyramid_sink_len=p.get("streamingllm_sink_len", self.pyramid_sink_len),
            pyramid_distance_weight=p.get(
                "distance_weight", self.pyramid_distance_weight),
            pyramid_gen_decay_ratio=g.get(
                "gen_decay_ratio", self.pyramid_gen_decay_ratio),
            pyramid_gen_decay_strategy=g.get(
                "gen_decay_strategy", self.pyramid_gen_decay_strategy),
            pyramid_gen_compress_ratio=g.get(
                "gen_compress_ratio", self.pyramid_gen_compress_ratio),
            pyramid_exceed_length_to_compress=g.get(
                "exceed_length_to_compress", self.pyramid_exceed_length_to_compress),
        )

    def with_pyramidinfer_preset(self, model_name: str, retain_rate: float) -> "MethodConfig":
        """Pick the shipped pyramidinfer config by (model family, retain rate),
        mirroring the reference's hard-coded path selection + asserts
        (baselines/monkeypatch.py:153-193)."""
        import os

        fam = "llama"
        low = model_name.lower()
        if "nemo" in low:
            fam = "nemo"
        elif "ministral" in low or "mistral" in low:
            fam = "ministral"
        key = f"{fam}_{int(round(retain_rate * 100))}"
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "pyramidinfer", key + ".json",
        )
        if not os.path.exists(path):
            raise NotImplementedError(
                f"No pyramidinfer config for model={model_name!r} "
                f"retain_rate={retain_rate} (looked for {path})"
            )
        return self.with_pyramidinfer_json(path)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout. Axes: data (DP/batch), model (TP heads/hidden), seq (SP),
    pipe (PP layer stages).

    The reference is strictly single-GPU (scripts pin CUDA_VISIBLE_DEVICES=0,
    e.g. scripts/eval_longbench.sh:12); this subsystem is new TPU scope.
    `pipe` > 1 enables PP layer-stage sharding: stages partition the stacked
    [L, ...] layer axis of BOTH weights and KV cache (parallel/sharding.py
    param_pspecs / cache_pspec), the TPU equivalent of the reference's
    device_map="auto" layer splitting (eval/run_longbench.py:311-318) — the
    route past the TP ceiling (model <= num_kv_heads) for >=70B multi-host.
    Exercised by tests/test_sharding.py and the driver dryrun's PP leg.
    Inference at 8B-class sizes runs pipe=1.
    """

    data: int = 1
    model: int = 1
    seq: int = 1
    pipe: int = 1
    # EP stub (SURVEY §2.4): the reference models are dense Llama/Mistral, so
    # no parameter ever shards on this axis — it exists so an MoE model family
    # can claim it without a mesh relayout. Must stay 1 for the dense models;
    # asserted inert in tests/test_sharding.py.
    expert: int = 1
    # 'ring' = blockwise ring attention over the seq axis; 'ulysses' = head/seq
    # all-to-all resharding; 'none' = no sequence parallelism.
    sp_mode: str = "none"

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.seq * self.pipe * self.expert


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Engine-level knobs: batching, shape bucketing, generation."""

    max_batch_size: int = 1
    # Prefill lengths are padded up to the nearest bucket so XLA compiles a small
    # closed set of shapes. Must be multiples of 128 (MXU/VPU lane alignment).
    prefill_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)
    max_new_tokens: int = 256
    # pad compressed-cache capacity to a multiple of this (lane alignment)
    capacity_align: int = 128
    greedy: bool = True
    use_pallas: bool = True  # use Pallas kernels on TPU; False = pure-XLA path
    # Decode attention kernel choice. None = XLA (the default even when
    # use_pallas is set): XLA's fused decode attention measures AT the HBM
    # roofline at 128K ctx on v5e (~800 GB/s effective; bench.py end-to-end
    # confirms), while the Pallas decode kernel regressed end-to-end decode
    # (fullkv 102 -> 20 tok/s at 128K). The kernel remains available opt-in
    # for experimentation (ops/experimental/decode_attn.py).
    decode_use_pallas: Optional[bool] = None
    decode_block: int = 256  # decode-cache growth granularity
    # Fuse the SnapKV/TSP observation-window scoring into the Pallas flash
    # prefill kernel (keys stream through VMEM once for attention AND scoring).
    # Default OFF after measurement (v5e, llama-3.2-1b, 3-run means; see
    # ROOFLINE.md): the fused kernel must run its query-block grid axis
    # sequentially (the score strip accumulates across q rows), which costs
    # more than the O(K-bytes) HBM re-read it saves on a compute-bound
    # prefill — fused/unfused prefill = 0.962x @8K, 0.975x @32K, 0.977x @64K,
    # 0.974x @96K; beyond ~106K the strip no longer fits scoped VMEM at full
    # attention blocks at all (flash_prefill.fusion_vmem_ok). The kernel stays
    # available opt-in and parity-tested (tests/test_flash_kernel.py).
    fuse_window_scores: bool = False
    # Store the KV cache as int8 with per-(head, slot) scales (core.quant):
    # halves decode cache bytes/token and prefill cache residency. Scales fold
    # into the attention math (ops.attention.decode_attention), so there is no
    # dequantized cache copy. Applies to the standard KVCache path; the
    # PyramidInfer engine manages its own buffers and ignores this flag.
    kv_int8: bool = False
    # Run the jitted prefill/generate programs under checkify float+index
    # instrumentation (utils.guards): the first NaN/Inf-producing op or OOB
    # index raises instead of silently propagating. Debug-only (adds
    # tracing/runtime cost).
    debug_checks: bool = False
    # Sequence-chunked MLP during prefill: caps the [s, intermediate]
    # activation footprint for very long contexts. 0 = never chunk;
    # None = auto (chunk at 32K when the bucket is >= 128K).
    mlp_chunk: Optional[int] = None
    # Chunked prefill ADMISSION in the Scheduler (engine.chunked): split the
    # admission prefill into this many tokens per chunk, interleaving one
    # decode step per chunk, so running requests' max inter-token stall is one
    # chunk (+ the compression finish step) instead of one full prefill.
    # None = monolithic admission. Must divide the scheduler bucket. Only
    # applies while other requests are decoding (idle admissions run the
    # monolithic program, which is strictly faster end-to-end).
    prefill_chunk: Optional[int] = None
    # Decode steps interleaved per admission chunk. 1 = the classic 1:1
    # interleave. Larger K amortizes the chunk cost over K running-request
    # tokens: only ~1/K of inter-token gaps pay a chunk, which pulls the gap
    # distribution's upper quantiles toward the decode floor while the MAX gap
    # stays one chunk (+ finish). The admitted request's makespan grows by
    # (K-1) extra decode steps per chunk — cheap while chunks dominate.
    # Measured tradeoff table: ROOFLINE.md §7.
    chunk_decode_steps: int = 1

    def mlp_chunk_for(self, s: int) -> int:
        if self.mlp_chunk is not None:
            chunk = self.mlp_chunk
        elif s >= 131072:
            chunk = 32768
        else:
            return 0
        # lax.map tiling needs chunk | s: shrink to the largest divisor
        while chunk > 1 and s % chunk:
            chunk //= 2
        return chunk if 1 < chunk < s else 0

    @property
    def decode_pallas(self) -> bool:
        if self.decode_use_pallas is None:
            return False
        return self.decode_use_pallas


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"sequence length {n} exceeds largest bucket {buckets[-1]}")


def to_json(cfg) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, enum.Enum):
            return o.value
        raise TypeError(o)

    return json.dumps(dataclasses.asdict(cfg), default=default, indent=2)
