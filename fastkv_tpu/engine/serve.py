"""Multi-replica serving front door + multi-host runtime entry.

New TPU scope (the reference is strictly single-GPU offline evaluation —
every script pins CUDA_VISIBLE_DEVICES=0, reference scripts/eval_longbench.sh:12;
SURVEY.md §2.4/§5 define this subsystem for the build):

  * `FrontDoor` — data-parallel request dispatch over N `Scheduler` replicas
    (least-loaded assignment). Each replica drains its queue on a worker
    thread; JAX dispatch itself releases the GIL during device execution, so
    replica threads overlap when replicas sit on distinct devices/meshes.
  * Failure detection + elastic re-admission (SURVEY.md §5 'Failure
    detection' row): a replica whose drain loop dies (device loss, OOM,
    injected fault) is marked dead; its unfinished requests — queued AND
    in-flight — are re-admitted to surviving replicas. Re-admission is
    stateless re-execution from the prompt: compressed caches are
    deterministic functions of the prompt, so a restarted request produces
    identical output (greedy decoding).
  * `init_distributed` — the `jax.distributed.initialize` multi-controller
    entry: each host process runs the same program, builds schedulers over its
    addressable devices, and the front door partitions requests per host
    (DP over DCN; intra-replica sharding stays over ICI via ParallelConfig).

Measured (scripts/measure_serve_scaling.py, ROOFLINE.md §8): on ONE host the
replica threads cannot add throughput — virtual CPU devices share physical
cores (1→2 replicas = 0.95×, 1→4 = 0.98×) — and they are not meant to; the
threading buys failure isolation + GIL-released overlap, and real scaling
comes from distinct accelerators per replica (the 2-process multi-controller
test exercises that structure). Per-chip throughput itself scales with the
decode batch inside one Scheduler: see fastkv_tpu.bench.throughput
(fastkv 6.2× fullkv tokens/s/chip at 16K ctx).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax

from fastkv_tpu.engine.scheduler import Request, Scheduler


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> Dict[str, int]:
    """Initialize the JAX multi-controller runtime (no-op if single process).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU multi-process runs. Returns
    {process_index, process_count, local_device_count, global_device_count}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


@dataclasses.dataclass
class _Ticket:
    """Front-door view of one submitted request."""

    ticket_id: int
    prompt: List[int]
    max_new_tokens: int
    eos_ids: Sequence[int]
    replica: Optional[int] = None
    replica_req_id: Optional[int] = None
    result: Optional[Request] = None
    readmissions: int = 0


class _Replica:
    """One Scheduler + drain thread + health state."""

    def __init__(self, idx: int, scheduler: Scheduler):
        self.idx = idx
        self.scheduler = scheduler
        self.alive = True
        self.error: Optional[BaseException] = None
        self.assigned: Dict[int, _Ticket] = {}  # replica_req_id -> ticket

    @property
    def load(self) -> int:
        return len(self.assigned)

    def drain(self, fault: Optional[Callable[[int], None]] = None):
        """Run the scheduler until empty; capture any failure."""
        try:
            if fault is not None:
                fault(self.idx)
            return self.scheduler.run()
        except BaseException as e:  # device loss / OOM / injected fault
            self.error = e
            self.alive = False
            return []


class FrontDoor:
    """DP front door: dispatch requests across Scheduler replicas, detect
    replica failure, and re-admit orphaned requests to survivors."""

    def __init__(
        self,
        schedulers: Sequence[Scheduler],
        max_readmissions: int = 2,
        drain_timeout_s: Optional[float] = None,
    ):
        if not schedulers:
            raise ValueError("need at least one scheduler replica")
        self.replicas = [_Replica(i, s) for i, s in enumerate(schedulers)]
        self.max_readmissions = max_readmissions
        # Bound on one drain round: a replica whose drain thread has not
        # returned after this long is declared WEDGED (SURVEY §5 failure
        # detection — the hung-not-dead case: a TPU dispatch that never
        # completes keeps the thread alive forever) and its requests re-admit
        # to survivors. None = wait indefinitely (trusted local replicas).
        self.drain_timeout_s = drain_timeout_s
        self.tickets: List[_Ticket] = []
        self._next = 0

    # -- submission ------------------------------------------------------------

    def submit(
        self,
        prompt: Sequence[int],
        max_new_tokens: int = 32,
        eos_ids: Sequence[int] = (),
    ) -> int:
        t = _Ticket(self._next, list(prompt), max_new_tokens, eos_ids)
        self._next += 1
        self.tickets.append(t)
        self._assign(t)
        return t.ticket_id

    def _assign(self, t: _Ticket) -> None:
        live = [r for r in self.replicas if r.alive]
        if not live:
            raise RuntimeError("no live replicas")
        r = min(live, key=lambda r: r.load)
        rid = r.scheduler.submit(t.prompt, t.max_new_tokens, t.eos_ids)
        t.replica, t.replica_req_id = r.idx, rid
        r.assigned[rid] = t

    # -- draining with failure recovery ----------------------------------------

    def run(
        self, fault: Optional[Callable[[int], None]] = None
    ) -> List[Dict[str, Any]]:
        """Drain all replicas (each on its own thread). If a replica dies, its
        unfinished requests are re-admitted to the survivors and the drain
        repeats until everything completes. `fault` is a fault-injection hook
        (called with the replica index at drain start; raise to simulate a
        replica loss)."""
        pending = True
        while pending:
            results: Dict[int, List[Request]] = {}
            threads = []
            for r in self.replicas:
                if not r.alive or not r.assigned:
                    continue

                def work(r=r):
                    results[r.idx] = r.drain(fault)

                th = threading.Thread(target=work, daemon=True)
                threads.append((th, r))
                th.start()
            deadline = (
                None if self.drain_timeout_s is None
                else time.monotonic() + self.drain_timeout_s
            )
            for th, r in threads:
                th.join(
                    None if deadline is None
                    else max(deadline - time.monotonic(), 0.0)
                )
                if th.is_alive():
                    # wedged replica: the drain thread never returned within
                    # the bound (hung device, not a raised error). Mark it
                    # dead so its requests re-admit below; the zombie thread
                    # writes into THIS round's results dict at most — reads
                    # below see either nothing or a completed subset.
                    r.alive = False
                    r.error = TimeoutError(
                        f"replica {r.idx} drain exceeded "
                        f"{self.drain_timeout_s}s (wedged)"
                    )
            fault = None  # one-shot injection

            orphans: List[_Ticket] = []
            for r in self.replicas:
                done = {req.req_id: req for req in results.get(r.idx, [])}
                for rid, t in list(r.assigned.items()):
                    if rid in done:
                        t.result = done[rid]
                        del r.assigned[rid]
                if r.alive and r.idx in results and r.assigned and not done:
                    # a drain round completed ZERO of its assigned requests:
                    # treat the replica as wedged (a live replica making zero
                    # progress per round would otherwise spin this loop
                    # forever) and let re-admission move its requests. A
                    # partial-progress round keeps the replica alive — it
                    # drains its remainder on the next pass.
                    r.alive = False
                if not r.alive and r.assigned:
                    # failure detected: orphaned queued/in-flight requests
                    orphans.extend(r.assigned.values())
                    r.assigned.clear()
            for t in orphans:
                if t.readmissions >= self.max_readmissions:
                    raise RuntimeError(
                        f"request {t.ticket_id} exceeded {self.max_readmissions} "
                        f"re-admissions"
                    )
                t.readmissions += 1
                self._assign(t)
            pending = any(r.alive and r.assigned for r in self.replicas) or bool(
                orphans
            )

        out = []
        for t in self.tickets:
            m = t.result.metrics if t.result else {}
            out.append(
                {
                    "ticket_id": t.ticket_id,
                    "replica": t.replica,
                    "readmissions": t.readmissions,
                    "tokens": list(t.result.tokens) if t.result else None,
                    **m,
                }
            )
        return out


def local_front_door(
    params: Dict[str, Any],
    cfg,
    mcfg,
    ecfg=None,
    n_replicas: int = 1,
    logger=None,  # Optional[utils.profiling.PhaseLogger]: per-request JSONL
    #   (queue/TTFT/TPOT) emitted as each request retires — SURVEY §5
    #   observability; tests/test_serve.py asserts the records
    drain_timeout_s: Optional[float] = None,
    **sched_kw,
) -> FrontDoor:
    """Build a front door over n local Scheduler replicas (single process).

    In a multi-host run, call under `init_distributed()` on every process with
    this process's shard of the replicas; requests are partitioned per host.
    """
    scheds = [
        Scheduler(params, cfg, mcfg, ecfg, logger=logger, **sched_kw)
        for _ in range(n_replicas)
    ]
    return FrontDoor(scheds, drain_timeout_s=drain_timeout_s)
