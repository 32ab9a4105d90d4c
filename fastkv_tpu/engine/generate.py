"""High-level Engine: bucketing, jit caching, tokenizer-agnostic generation.

Replaces the reference's HF `model.generate()` entry point
(eval/run_longbench.py:217-226) with jitted prefill + scanned decode. The jit
cache is keyed on (bucket, method, max_new) so evaluation sweeps compile a small
closed set of programs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig, pick_bucket
from fastkv_tpu.engine import decode as decode_mod
from fastkv_tpu.engine import prefill as prefill_mod


class Engine:
    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        mcfg: MethodConfig,
        ecfg: Optional[EngineConfig] = None,
        pcfg=None,  # Optional[ParallelConfig]; sp_mode routes prefill through
        #   ring/Ulysses sequence parallelism (needs mesh)
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.mcfg = mcfg
        self.ecfg = ecfg or EngineConfig()
        self.pcfg = pcfg
        self.mesh = mesh
        self._prefill_cache: Dict[Tuple, Any] = {}
        self._gen_cache: Dict[Tuple, Any] = {}

    # -- compiled-program factories -------------------------------------------------

    def _jit(self, fn, **kw):
        """jax.jit, or checkify-instrumented jit under EngineConfig.debug_checks
        (NaN/Inf/OOB raise instead of propagating — utils.guards)."""
        if self.ecfg.debug_checks:
            from fastkv_tpu.utils.guards import checked_jit

            return checked_jit(fn, **kw)
        return jax.jit(fn, **kw)

    def shapes_for(self, bucket: int, max_new: int) -> prefill_mod.PrefillShapes:
        ecfg = dataclasses.replace(self.ecfg, max_new_tokens=max_new)
        return prefill_mod.plan_shapes(self.cfg, self.mcfg, ecfg, bucket)

    def prefill_fn(self, bucket: int, max_new: int):
        key = (bucket, max_new)
        if key not in self._prefill_cache:
            shapes = self.shapes_for(bucket, max_new)

            def run(params, tokens, n_true):
                return prefill_mod.prefill(
                    params, self.cfg, self.mcfg, self.ecfg, shapes, tokens, n_true,
                    pcfg=self.pcfg, mesh=self.mesh,
                )

            self._prefill_cache[key] = self._jit(run)
        return self._prefill_cache[key]

    def generate_fn(self, bucket: int, max_new: int, num_eos: int, min_new: int):
        """Compiled greedy-generation program for one shape key.

        NOTE: the returned function DONATES its `cache` argument (argnum 2) —
        the prefill cache buffer is consumed and must not be reused or read
        after the call. Callers needing to generate twice from one prefill
        must re-run prefill (or copy the cache first)."""
        key = (bucket, max_new, num_eos, min_new)
        if key not in self._gen_cache:
            shapes = self.shapes_for(bucket, max_new)

            def run(params, first_logits, cache, n_true, eos_ids):
                return decode_mod.greedy_generate(
                    params, self.cfg, self.mcfg, shapes, first_logits, cache,
                    n_true, max_new, eos_ids if num_eos else None, min_new,
                    use_pallas=self.ecfg.decode_pallas,
                )

            # the prefill cache is consumed by generation — donate it so decode
            # never holds two copies (at 128K+ fullkv that is multiple GB)
            self._gen_cache[key] = self._jit(run, donate_argnums=(2,))
        return self._gen_cache[key]

    # -- user API --------------------------------------------------------------------

    def _gemfilter_select_fn(self, bucket: int, capacity: int):
        key = ("gem", bucket, capacity)
        if key not in self._prefill_cache:
            from fastkv_tpu.engine import gemfilter

            def run(params, tokens, n_true):
                return gemfilter.select_tokens(
                    params, self.cfg, self.mcfg, self.ecfg, tokens, n_true, capacity
                )

            self._prefill_cache[key] = jax.jit(run)
        return self._prefill_cache[key]

    def _pyramid_prefill_fn(self, bucket: int, max_new: int):
        key = ("pyr", bucket, max_new)
        if key not in self._prefill_cache:
            from fastkv_tpu.engine import pyramid

            shapes = self.shapes_for(bucket, max_new)

            def run(params, tokens, n_true):
                return pyramid.prefill(
                    params, self.cfg, self.mcfg, self.ecfg, shapes, tokens,
                    n_true, want_decode_state=True,
                )

            self._prefill_cache[key] = jax.jit(run)
        return self._prefill_cache[key]

    def _pyramid_generate_fn(self, bucket: int, max_new: int, num_eos: int, min_new: int):
        key = ("pyr", bucket, max_new, num_eos, min_new)
        if key not in self._gen_cache:
            from fastkv_tpu.engine import pyramid

            shapes = self.shapes_for(bucket, max_new)

            def run(params, first_logits, cache, pstate, n_true, eos_ids):
                return pyramid.greedy_generate(
                    params, self.cfg, self.mcfg, shapes, first_logits, cache,
                    pstate, n_true, max_new, eos_ids if num_eos else None, min_new,
                )

            self._gen_cache[key] = jax.jit(run)
        return self._gen_cache[key]

    def _pass2_engine(self) -> "Engine":
        """FullKV-semantics engine for GemFilter's second pass."""
        if not hasattr(self, "_p2"):
            self._p2 = Engine(
                self.params,
                self.cfg,
                dataclasses.replace(self.mcfg, method=Method.FULLKV),
                self.ecfg,
            )
        return self._p2

    def generate(
        self,
        input_ids: Sequence[Sequence[int]],
        max_new_tokens: int,
        eos_ids: Sequence[int] = (),
        min_new_tokens: int = 1,
    ) -> List[List[int]]:
        """Greedy generation. Returns generated token ids per example
        (EOS included if produced)."""
        b = len(input_ids)
        lens = [len(x) for x in input_ids]
        bucket = pick_bucket(max(lens), self.ecfg.prefill_buckets)
        tokens = np.zeros((b, bucket), np.int32)
        for i, ids in enumerate(input_ids):
            tokens[i, : lens[i]] = np.asarray(ids, np.int32)
        n_true = jnp.asarray(lens, jnp.int32)
        tokens = jnp.asarray(tokens)

        if self.mcfg.method == Method.GEMFILTER:
            from fastkv_tpu.engine import gemfilter

            cap = gemfilter.filter_capacity(
                self.mcfg, bucket, self.ecfg.capacity_align
            )
            new_tokens, new_count, _ = self._gemfilter_select_fn(bucket, cap)(
                self.params, tokens, n_true
            )
            # pass 2: fresh short prompt through a FullKV engine
            eng2 = self._pass2_engine()
            logits, cache = eng2.prefill_fn(cap, max_new_tokens)(
                self.params, new_tokens, new_count
            )
            eos_arr = jnp.asarray(list(eos_ids) or [0], jnp.int32)
            result, _ = eng2.generate_fn(
                cap, max_new_tokens, len(eos_ids), min_new_tokens
            )(self.params, logits, cache, new_count, eos_arr)
        elif self.mcfg.method == Method.PYRAMIDINFER:
            logits, cache, pstate = self._pyramid_prefill_fn(bucket, max_new_tokens)(
                self.params, tokens, n_true
            )
            eos_arr = jnp.asarray(list(eos_ids) or [0], jnp.int32)
            result, _ = self._pyramid_generate_fn(
                bucket, max_new_tokens, len(eos_ids), min_new_tokens
            )(self.params, logits, cache, pstate, n_true, eos_arr)
        else:
            logits, cache = self.prefill_fn(bucket, max_new_tokens)(
                self.params, tokens, n_true
            )
            eos_arr = jnp.asarray(list(eos_ids) or [0], jnp.int32)
            result, _ = self.generate_fn(
                bucket, max_new_tokens, len(eos_ids), min_new_tokens
            )(self.params, logits, cache, n_true, eos_arr)
        toks = np.asarray(result.tokens)
        nums = np.asarray(result.num_generated)
        return [toks[i, : nums[i]].tolist() for i in range(b)]
