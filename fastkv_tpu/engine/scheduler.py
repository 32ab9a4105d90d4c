"""Continuous-batching scheduler: slot-based request admission over one shared
decode batch.

New TPU scope (the reference is strictly batch-1 offline evaluation; SURVEY.md
§2.4). Design:

  * `max_batch` decode slots share one stacked KVCache (capacity planned for
    the scheduler's LARGEST bucket). Every engine step runs a full-batch
    decode; inactive slots compute garbage that is never read.
  * Admission: a queued request is prefilled (batch-1 program at the smallest
    bucket that fits, from the same ladder Engine.generate uses) and its
    compressed cache is written into a free slot (padded up to the shared
    capacity; the gap slots are validity-masked). Slot-tagged per-example
    decode offsets use the per-example dynamic_update_slice path in
    fastkv_tpu.engine.decode.
  * Per-method admission/decode routing mirrors the reference e2e harness's
    per-method paths (reference benchmark/e2e.py:158,188-195,218-232):
    GEMFILTER admissions run the pass-1 token selection then a FullKV prefill
    of the reduced prompt (engine.gemfilter); PYRAMIDINFER admissions run the
    pyramid prefill with decode state, and decode steps run the pyramid step
    with generation-stage re-compression (engine.pyramid). Every other method
    uses the standard prefill/decode pair. No method silently degrades.
  * Over-length prompts: explicit policy — reference-protocol middle
    truncation (keep first half + last half, reference
    eval/run_longbench.py:201-207) or reject; never a silent tail drop.
  * Retirement: EOS or max_new_tokens frees the slot for the next queued
    request.
  * Observability: per-request queue time, TTFT, decode TPOT, and token counts
    (structured dicts; SURVEY.md §5 metrics/logging).

Sharded replicas: pass (pcfg, mesh) with params already placed via
parallel.sharding.shard_params and the scheduler runs its prefill/decode
programs over that mesh (TP/PP within one replica; the SPMD partitioner
inserts the collectives). On a pod slice a DP "replica" IS a TP mesh — this
joins the serving loop with the engine-level parallelism (SURVEY §5
'multi-host serving loop'); tests/test_serve.py covers TP=2 token parity.

This is the single-host core; DP replicas each run one Scheduler and a front
door assigns requests across replicas (multi-host serving loop: see
fastkv_tpu.engine.serve).
"""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.cache.kv_cache import KVCache, empty_cache
from fastkv_tpu.core.config import (
    EngineConfig,
    Method,
    MethodConfig,
    ModelConfig,
    pick_bucket,
)
from fastkv_tpu.engine import decode as decode_mod
from fastkv_tpu.engine import prefill as prefill_mod
from fastkv_tpu.policies.methods import cache_heads


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: List[int]
    max_new_tokens: int
    eos_ids: Sequence[int] = ()
    # filled by the scheduler
    submitted_at: float = 0.0
    prefill_done_at: float = 0.0
    finished_at: float = 0.0
    tokens: List[int] = dataclasses.field(default_factory=list)

    @property
    def metrics(self) -> Dict[str, Any]:
        n = len(self.tokens)
        decode_time = max(self.finished_at - self.prefill_done_at, 1e-9)
        return {
            "req_id": self.req_id,
            "prompt_len": len(self.prompt),
            "new_tokens": n,
            "ttft_s": self.prefill_done_at - self.submitted_at,
            "tpot_s": decode_time / max(n - 1, 1),
            "total_s": self.finished_at - self.submitted_at,
        }


class Scheduler:
    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        mcfg: MethodConfig,
        ecfg: Optional[EngineConfig] = None,
        max_batch: int = 4,
        bucket: int = 4096,
        max_new_tokens: int = 256,
        logger: Optional["PhaseLogger"] = None,
        events_cap: int = 1 << 16,
        overlength: str = "truncate_middle",  # 'truncate_middle' | 'reject'
        pcfg=None,  # Optional[ParallelConfig]: run this replica over a mesh
        mesh=None,  # required when pcfg is set (params must be pre-sharded)
    ):
        # per-request structured metrics (queue/TTFT/TPOT) as JSON lines —
        # SURVEY §5 observability row; see utils.profiling.PhaseLogger
        self.logger = logger
        self.params = params
        self.cfg = cfg
        self.mcfg = mcfg
        self.ecfg = ecfg or EngineConfig()
        self.ecfg = dataclasses.replace(
            self.ecfg, max_new_tokens=max_new_tokens, max_batch_size=max_batch
        )
        self.max_batch = max_batch
        self.bucket = bucket
        self.max_new = max_new_tokens
        if overlength not in ("truncate_middle", "reject"):
            raise ValueError(f"unknown overlength policy {overlength!r}")
        self.overlength = overlength
        self.pcfg = pcfg
        self.mesh = mesh
        self.method = mcfg.method

        # Admission bucket ladder: the same buckets Engine.generate picks from,
        # capped at this scheduler's capacity bucket (always included). The
        # PyramidInfer decode state's row count is bucket-dependent
        # (pyramid.decode_buffer_rows), so that method admits at the single
        # capacity bucket.
        if self.method == Method.PYRAMIDINFER:
            self.buckets = (bucket,)
        else:
            self.buckets = tuple(
                sorted({b for b in self.ecfg.prefill_buckets if b < bucket} | {bucket})
            )

        if self.method == Method.GEMFILTER:
            # the shared decode cache holds gemfilter's reduced PASS-2 prompt
            # (engine.gemfilter.filter_capacity of the largest bucket), decoded
            # with FullKV semantics — the Engine's pass-2 path
            from fastkv_tpu.engine import gemfilter

            self._decode_mcfg = dataclasses.replace(mcfg, method=Method.FULLKV)
            cap = gemfilter.filter_capacity(mcfg, bucket, self.ecfg.capacity_align)
            self.shapes = prefill_mod.plan_shapes(cfg, self._decode_mcfg, self.ecfg, cap)
        else:
            self._decode_mcfg = mcfg
            self.shapes = prefill_mod.plan_shapes(cfg, mcfg, self.ecfg, bucket)

        ch = cache_heads(self._decode_mcfg.method, cfg)
        self.cache = empty_cache(
            cfg.num_layers, max_batch, ch, self.shapes.total_capacity,
            cfg.head_dim, dtype=jnp.dtype(cfg.dtype), kv_int8=self.ecfg.kv_int8,
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from fastkv_tpu.parallel.sharding import cache_pspec

            spec = cache_pspec(quantized=self.ecfg.kv_int8)
            self.cache = KVCache(*(
                jax.device_put(x, NamedSharding(self.mesh, s))
                if x is not None else None
                for x, s in zip(self.cache, spec)
            ))
        self.tok = np.zeros(max_batch, np.int32)
        self.pos = np.zeros(max_batch, np.int32)
        self.steps = np.zeros(max_batch, np.int32)
        self.budget = np.zeros(max_batch, np.int32)
        self.active = np.zeros(max_batch, bool)
        self.slot_req: List[Optional[Request]] = [None] * max_batch

        self.queue: List[Request] = []
        self.finished: List[Request] = []
        self._next_id = 0
        # event log (chunk/decode/finish order) — asserted by the chunked-
        # admission interleaving test. Bounded: run() clears it at entry and
        # the deque caps within-run growth, so a long-lived serve_worker that
        # calls run() in an unbounded loop cannot leak one tuple per token.
        self.events: "collections.deque[tuple]" = collections.deque(
            maxlen=events_cap
        )

        # chunked admission (engine.chunked): bounds running requests' max
        # inter-token stall to one chunk + finish instead of one full prefill
        self._chunk_progs: Dict[int, Any] = {}
        self._chunk_ok = False
        self._adm = None
        if self.ecfg.prefill_chunk:
            from fastkv_tpu.engine import chunked

            self._chunk_ok = chunked.supported(mcfg)

        if self.method == Method.PYRAMIDINFER:
            from fastkv_tpu.engine import pyramid

            rr = pyramid.decode_buffer_rows(mcfg, bucket)
            L = cfg.num_layers
            self.pstate = pyramid.PyramidDecodeState(
                probs=jnp.zeros(
                    (L, max_batch, rr, self.shapes.total_capacity), jnp.float32
                ),
                row_stamp=jnp.full((L, max_batch, rr), -(2**30), jnp.int32),
                past=jnp.zeros((L, max_batch), jnp.int32),
                live=jnp.zeros((L, max_batch), jnp.int32),
            )
            # per-slot frozen recent length / original prompt length the
            # pyramid decode step consumes (engine.pyramid.decode_step)
            self.n_orig = np.zeros(max_batch, np.int32)
            self.r_dyn = np.zeros(max_batch, np.int32)
            self._step = jax.jit(
                lambda p, c, ps, tok, pos, slots, stamps, n_orig, r_dyn:
                pyramid.decode_step(
                    p, cfg, mcfg, c, ps, tok, pos, slots, stamps, n_orig, r_dyn
                ),
                donate_argnums=(1, 2),
            )
        else:
            self._step = jax.jit(
                lambda p, c, tok, pos, slots: decode_mod.decode_step(
                    p, cfg, self._decode_mcfg, c, tok, pos, slots,
                    use_pallas=self.ecfg.decode_pallas,
                ),
                donate_argnums=(1,),
            )

        self._prefill_progs: Dict[int, Any] = {}

    # -- compiled-program factories ---------------------------------------------------

    def _mesh_ctx(self):
        return jax.set_mesh(self.mesh) if self.mesh is not None else contextlib.nullcontext()

    def _prefill_for(self, bucket: int):
        """Admission program for one bucket (lazily jitted, cached)."""
        if bucket not in self._prefill_progs:
            cfg, mcfg, ecfg = self.cfg, self.mcfg, self.ecfg
            if self.method == Method.GEMFILTER:
                from fastkv_tpu.engine import gemfilter

                cap = gemfilter.filter_capacity(mcfg, bucket, ecfg.capacity_align)
                shapes_b = prefill_mod.plan_shapes(cfg, self._decode_mcfg, ecfg, cap)

                def run(p, tokens, n):
                    new_toks, new_count, _ = gemfilter.select_tokens(
                        p, cfg, mcfg, ecfg, tokens, n, cap
                    )
                    logits, cache1 = prefill_mod.prefill(
                        p, cfg, self._decode_mcfg, ecfg, shapes_b,
                        new_toks, new_count, pcfg=self.pcfg, mesh=self.mesh,
                    )
                    return logits, cache1, new_count

            elif self.method == Method.PYRAMIDINFER:
                from fastkv_tpu.engine import pyramid

                shapes_b = prefill_mod.plan_shapes(cfg, mcfg, ecfg, bucket)

                def run(p, tokens, n):
                    return pyramid.prefill(
                        p, cfg, mcfg, ecfg, shapes_b, tokens, n,
                        want_decode_state=True,
                    )

            else:
                shapes_b = prefill_mod.plan_shapes(cfg, mcfg, ecfg, bucket)

                def run(p, tokens, n):
                    return prefill_mod.prefill(
                        p, cfg, mcfg, ecfg, shapes_b, tokens, n,
                        pcfg=self.pcfg, mesh=self.mesh,
                    )

            self._prefill_progs[bucket] = jax.jit(run)
        return self._prefill_progs[bucket]

    def _chunk_progs_for(self, bucket: int):
        """Chunk programs for one bucket; None when the chunk doesn't tile it."""
        if bucket not in self._chunk_progs:
            from fastkv_tpu.engine import chunked

            chunk = self.ecfg.prefill_chunk
            if bucket % chunk:
                self._chunk_progs[bucket] = None
            else:
                shapes_b = prefill_mod.plan_shapes(self.cfg, self.mcfg, self.ecfg, bucket)
                self._chunk_progs[bucket] = chunked.make_programs(
                    self.cfg, self.mcfg, self.ecfg, shapes_b, chunk
                )
        return self._chunk_progs[bucket]

    # -- public API -----------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: Optional[int] = None,
               eos_ids: Sequence[int] = ()) -> int:
        prompt = list(prompt)
        cap = self.buckets[-1]
        if len(prompt) > cap:
            if self.overlength == "reject":
                raise ValueError(
                    f"prompt length {len(prompt)} exceeds the scheduler's "
                    f"largest bucket {cap} (overlength='reject')"
                )
            # reference-protocol middle truncation: keep the first and last
            # halves of the budget (eval/run_longbench.py:201-207)
            half = cap // 2
            prompt = prompt[:half] + prompt[len(prompt) - (cap - half):]
        req = Request(
            req_id=self._next_id, prompt=prompt,
            max_new_tokens=max_new_tokens or self.max_new, eos_ids=eos_ids,
            submitted_at=time.perf_counter(),
        )
        self._next_id += 1
        self.queue.append(req)
        return req.req_id

    def run(self) -> List[Request]:
        """Drain the queue; returns finished requests (with metrics).

        Admission is INTERLEAVED with decode: while any request is running, at
        most ONE queued request is prefilled per decode step, so a burst of N
        arrivals stalls running requests' token stream by at most one prefill
        at a time instead of N back-to-back (the max inter-token gap is one
        prefill; tests/test_scheduler.py asserts the interleaving order and
        the TPOT bound). Note on a single serial device total work is
        conserved — interleaving bounds the p99 inter-token gap, it cannot
        remove other requests' prefill time from a running request's wall
        clock. When nothing is running, all free slots admit immediately
        (pure-admission phase: there is nobody to stall).
        """
        self.events.clear()
        return self._run_loop()

    def _run_loop(self, intake=None) -> List[Request]:
        """Core drain loop. `intake` (streaming dispatch, engine.dispatch) is
        called once per iteration and may submit new requests; when provided,
        the loop also keeps running while intake reports more work pending."""
        while True:
            more = intake() if intake is not None else False
            if not (self.queue or self.active.any() or self._adm is not None or more):
                break
            if self._adm is not None:
                self._advance_admission()
            elif self.active.any() and self._chunk_ok and self.queue:
                self._start_chunked_admission()
            else:
                # idle (nobody to stall) or no chunk programs: monolithic
                self._admit(limit=1 if self.active.any() else self.max_batch)
            if self.active.any():
                # chunked admission amortization: K decode steps per chunk
                # shrink the share of inter-token gaps that pay a chunk
                # (ROOFLINE §7); plain admission keeps the 1:1 step
                k = self.ecfg.chunk_decode_steps if self._adm is not None else 1
                for _ in range(max(k, 1)):
                    if not self.active.any():
                        break
                    self._decode_one_step()
        out, self.finished = self.finished, []
        return out

    # -- internals ------------------------------------------------------------------

    def _admit(self, limit: Optional[int] = None) -> None:
        admitted = 0
        for slot in range(self.max_batch):
            if self.active[slot] or not self.queue:
                continue
            if limit is not None and admitted >= limit:
                break
            admitted += 1
            req = self.queue.pop(0)
            n = len(req.prompt)
            bucket = pick_bucket(max(n, 1), self.buckets)
            tokens = np.zeros((1, bucket), np.int32)
            tokens[0, :n] = req.prompt
            prog = self._prefill_for(bucket)
            pstate1 = None
            with self._mesh_ctx():
                out = prog(
                    self.params, jnp.asarray(tokens), jnp.asarray([n], jnp.int32)
                )
            if self.method == Method.GEMFILTER:
                logits, cache1, new_count = out
                n = int(np.asarray(new_count)[0])  # pass-2 prompt length
            elif self.method == Method.PYRAMIDINFER:
                logits, cache1, pstate1 = out
            else:
                logits, cache1 = out
            self.events.append(("prefill", req.req_id))
            self._install(slot, req, n, logits, cache1, pstate1)

    def _install(self, slot: int, req: Request, n: int, logits, cache1,
                 pstate1=None) -> None:
        """Write a prefilled request's cache/state into its decode slot.

        `n` is the effective prompt length decode positions continue from (the
        ORIGINAL length for most methods; gemfilter's reduced pass-2 count)."""
        first = int(np.asarray(jnp.argmax(logits[0])))
        req.prefill_done_at = time.perf_counter()
        req.tokens = [first]
        # a smaller-bucket admission produced a shorter cache: pad its slot
        # axis up to the shared capacity (the gap slots stay invalid-masked;
        # decode writes land at the shared prefill_capacity offset)
        pad = self.shapes.total_capacity - cache1.k.shape[3]
        if pad:
            cache1 = jax.tree_util.tree_map(
                lambda x: jnp.pad(
                    x, [(0, 0)] * 3 + [(0, pad)] + [(0, 0)] * (x.ndim - 4)
                ),
                cache1,
            )
        # install the request's compressed cache into its slot (covers the
        # int8 scale planes when present — tree_map skips None fields)
        with self._mesh_ctx():
            self.cache = jax.tree_util.tree_map(
                lambda dst, src: dst.at[:, slot].set(src[:, 0]),
                self.cache, cache1,
            )
            if pstate1 is not None:
                self.pstate = jax.tree_util.tree_map(
                    lambda dst, src: dst.at[:, slot].set(src[:, 0]),
                    self.pstate, pstate1,
                )
        if self.method == Method.PYRAMIDINFER:
            self.n_orig[slot] = n
            self.r_dyn[slot] = int(n * self.mcfg.pyramid_recent_ratio)
        self.tok[slot] = first
        self.pos[slot] = n
        self.steps[slot] = 0
        self.budget[slot] = req.max_new_tokens
        self.active[slot] = True
        self.slot_req[slot] = req
        if first in set(req.eos_ids) or req.max_new_tokens <= 1:
            self._retire(slot)

    def _start_chunked_admission(self) -> None:
        from fastkv_tpu.engine import chunked

        if not self.queue:
            return
        free = [s for s in range(self.max_batch) if not self.active[s]]
        if not free:
            return
        n = len(self.queue[0].prompt)
        progs = self._chunk_progs_for(pick_bucket(max(n, 1), self.buckets)) if n else None
        if progs is None:
            # empty prompt (the chunk pipeline never captures h_last — ADVICE
            # r4) or a bucket the chunk size doesn't tile: admit monolithically
            self._admit(limit=1)
            return
        req = self.queue.pop(0)
        self._adm = chunked.start_admission(progs, free[0], req, req.prompt)
        self._adm.progs = progs

    def _advance_admission(self) -> None:
        from fastkv_tpu.engine import chunked

        adm = self._adm
        with self._mesh_ctx():
            out = chunked.advance(adm.progs, self.params, adm)
        self.events.append(("chunk", adm.req.req_id))
        if out is None:
            return
        logits, cache1 = out
        self.events.append(("finish", adm.req.req_id))
        self._adm = None
        self._install(adm.slot, adm.req, adm.n, logits, cache1)

    def _decode_one_step(self) -> None:
        slots = self.shapes.prefill_capacity + self.steps
        with self._mesh_ctx():
            if self.method == Method.PYRAMIDINFER:
                logits, self.cache, self.pstate = self._step(
                    self.params, self.cache, self.pstate, jnp.asarray(self.tok),
                    jnp.asarray(self.pos), jnp.asarray(slots, jnp.int32),
                    jnp.asarray(self.steps + 1, jnp.int32),
                    jnp.asarray(self.n_orig), jnp.asarray(self.r_dyn),
                )
            else:
                logits, self.cache = self._step(
                    self.params, self.cache, jnp.asarray(self.tok),
                    jnp.asarray(self.pos), jnp.asarray(slots, jnp.int32),
                )
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        # timestamp AFTER the argmax fetch: the fetch forces step completion,
        # so deltas between consecutive decode events are the inter-token gaps
        # running requests actually observe (incl. interleaved admission work)
        self.events.append(("decode", time.perf_counter()))
        for slot in range(self.max_batch):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            tok = int(nxt[slot])
            req.tokens.append(tok)
            self.steps[slot] += 1
            self.pos[slot] += 1
            self.tok[slot] = tok
            if tok in set(req.eos_ids) or len(req.tokens) >= req.max_new_tokens:
                self._retire(slot)

    def _retire(self, slot: int) -> None:
        req = self.slot_req[slot]
        req.finished_at = time.perf_counter()
        self.finished.append(req)
        self.active[slot] = False
        self.slot_req[slot] = None
        if self.logger is not None:
            self.logger.request_metrics(req)
