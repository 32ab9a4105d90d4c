"""Continuous-batching scheduler: slot-based request admission over one shared
decode batch.

New TPU scope (the reference is strictly batch-1 offline evaluation; SURVEY.md
§2.4). Design:

  * `max_batch` decode slots share one stacked KVCache (capacity planned for
    the scheduler's bucket). Every engine step runs a full-batch decode;
    inactive slots compute garbage that is never read.
  * Admission: a queued request is prefilled (batch-1 program, any method —
    FastKV TSP included) and its compressed cache is written into a free slot.
    Slot-tagged per-example decode offsets use the per-example
    dynamic_update_slice path in fastkv_tpu.engine.decode.
  * Retirement: EOS or max_new_tokens frees the slot for the next queued
    request.
  * Observability: per-request queue time, TTFT, decode TPOT, and token counts
    (structured dicts; SURVEY.md §5 metrics/logging).

This is the single-host core; DP replicas each run one Scheduler and a front
door assigns requests across replicas (multi-host serving loop: see
fastkv_tpu.engine.serve).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.cache.kv_cache import KVCache, empty_cache
from fastkv_tpu.core.config import EngineConfig, MethodConfig, ModelConfig
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
        self.shapes = prefill_mod.plan_shapes(cfg, mcfg, self.ecfg, bucket)

        ch = cache_heads(mcfg.method, cfg)
        self.cache = empty_cache(
            cfg.num_layers, max_batch, ch, self.shapes.total_capacity,
            cfg.head_dim, dtype=jnp.dtype(cfg.dtype), kv_int8=self.ecfg.kv_int8,
        )
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
        # admission interleaving test; negligible cost otherwise
        self.events: List[tuple] = []

        # chunked admission (engine.chunked): bounds running requests' max
        # inter-token stall to one chunk + finish instead of one full prefill
        self._chunk_progs = None
        self._adm = None
        if self.ecfg.prefill_chunk:
            from fastkv_tpu.engine import chunked

            if chunked.supported(mcfg):
                self._chunk_progs = chunked.make_programs(
                    cfg, mcfg, self.ecfg, self.shapes, self.ecfg.prefill_chunk
                )

        self._prefill = jax.jit(
            lambda p, t, n: prefill_mod.prefill(
                p, cfg, mcfg, self.ecfg, self.shapes, t, n
            )
        )
        self._step = jax.jit(
            lambda p, c, tok, pos, slots: decode_mod.decode_step(
                p, cfg, mcfg, c, tok, pos, slots,
                use_pallas=self.ecfg.decode_pallas,
            ),
            donate_argnums=(1,),
        )

    # -- public API -----------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: Optional[int] = None,
               eos_ids: Sequence[int] = ()) -> int:
        req = Request(
            req_id=self._next_id, prompt=list(prompt),
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
        while self.queue or self.active.any() or self._adm is not None:
            if self._adm is not None:
                self._advance_admission()
            elif self.active.any() and self._chunk_progs is not None:
                self._start_chunked_admission()
            else:
                # idle (nobody to stall) or no chunk programs: monolithic
                self._admit(limit=1 if self.active.any() else self.max_batch)
            if self.active.any():
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
            tokens = np.zeros((1, self.bucket), np.int32)
            n = min(len(req.prompt), self.bucket)
            tokens[0, :n] = req.prompt[:n]
            logits, cache1 = self._prefill(
                self.params, jnp.asarray(tokens), jnp.asarray([n], jnp.int32)
            )
            self.events.append(("prefill", req.req_id))
            self._install(slot, req, n, logits, cache1)

    def _install(self, slot: int, req: Request, n: int, logits, cache1) -> None:
        """Write a prefilled request's cache/state into its decode slot."""
        first = int(np.asarray(jnp.argmax(logits[0])))
        req.prefill_done_at = time.perf_counter()
        req.tokens = [first]
        # install the request's compressed cache into its slot (covers the
        # int8 scale planes when present — tree_map skips None fields)
        self.cache = jax.tree_util.tree_map(
            lambda dst, src: dst.at[:, slot].set(src[:, 0]),
            self.cache, cache1,
        )
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
        req = self.queue.pop(0)
        self._adm = chunked.start_admission(
            self._chunk_progs, free[0], req, req.prompt
        )

    def _advance_admission(self) -> None:
        from fastkv_tpu.engine import chunked

        adm = self._adm
        out = chunked.advance(self._chunk_progs, self.params, adm)
        self.events.append(("chunk", adm.req.req_id))
        if out is None:
            return
        logits, cache1 = out
        self.events.append(("finish", adm.req.req_id))
        self._adm = None
        self._install(adm.slot, adm.req, adm.n, logits, cache1)

    def _decode_one_step(self) -> None:
        slots = self.shapes.prefill_capacity + self.steps
        logits, self.cache = self._step(
            self.params, self.cache, jnp.asarray(self.tok), jnp.asarray(self.pos),
            jnp.asarray(slots, jnp.int32),
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
