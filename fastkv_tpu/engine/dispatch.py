"""Cross-host request dispatch: a real transport for the multi-host serving loop.

SURVEY.md §5 scopes a "multi-host serving loop"; `FrontDoor` covers DP
replicas inside one process, and this module adds the missing cross-process
leg (VERDICT r3 task 10): a coordinator-rank request queue that worker hosts
PULL from over TCP, with results streamed back and worker-death re-admission.

Topology (matches the jax.distributed multi-controller layout,
engine.serve.init_distributed): process 0 runs the `Coordinator` (a
newline-delimited-JSON TCP server on the DCN/loopback interface) and every
process — including 0 — runs `serve_worker`, which drains tickets through its
local Scheduler. The model runtime stays SPMD per host; only request/response
metadata crosses this socket (prompts + token ids, O(KB) — never tensors), so
the transport is latency-insensitive relative to prefill.

Failure semantics (SURVEY §5 failure-detection row: "missed-heartbeat
detection via coordinator"):
  * DEATH: a worker whose connection drops (process death, network partition)
    gets its outstanding tickets re-queued immediately.
  * HANG: every ticket handed out carries a LEASE. Workers heartbeat between
    scheduler steps — progress-gated, not thread-liveness-gated: the beat is
    sent from the scheduler's step loop, so a wedged device (run() stuck in a
    dispatch that never completes — the documented TPU failure mode) stops
    beating even though the process and socket stay alive. The coordinator
    re-admits tickets whose lease expires; a late result from a recovered
    worker is deduplicated first-wins (stateless greedy re-execution produces
    identical tokens).
A `max_readmissions` cap prevents a poison request from cycling forever.

Streaming: `serve_worker` feeds tickets into the Scheduler's step loop via
its `intake` hook (`Scheduler._run_loop`) — tickets that arrive while decode
is running join the running batch through the scheduler's own interleaved
(optionally chunked) admission, and finished results stream back per request.
Continuous batching does not stop at the host boundary.

Protocol (one JSON object per line, either direction):
  worker -> {"op": "hello", "name": str}
            {"op": "get", "n": int}           heartbeat + request <= n tickets
            {"op": "hb"}                      heartbeat only (no work wanted)
            {"op": "result", "items": [...]}  completed tickets
  coord  -> {"op": "work", "items": [{"tid", "prompt", "max_new_tokens",
             "eos_ids"}]}
            {"op": "wait"}                    nothing queued now, poll again
            {"op": "ok"}                      heartbeat ack
            {"op": "done"}                    sealed and fully drained: exit
"""

from __future__ import annotations

import json
import socket
import threading
import time
from typing import Any, Dict, List, Optional, Sequence


def _send(sock: socket.socket, obj: Dict[str, Any]) -> None:
    sock.sendall((json.dumps(obj) + "\n").encode())


class _LineReader:
    def __init__(self, sock: socket.socket):
        self.f = sock.makefile("r", encoding="utf-8")

    def read(self) -> Optional[Dict[str, Any]]:
        line = self.f.readline()
        if not line:
            return None
        return json.loads(line)


class Coordinator:
    """Rank-0 request queue + result sink for pull-based worker dispatch."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_readmissions: int = 2, lease_s: float = 120.0):
        # lease_s should exceed the worst-case single compiled-program latency
        # on the workers (one monolithic prefill: ~25 s for 8B at 128K, plus a
        # 20-60 s first-compile) — the heartbeat runs BETWEEN programs, so a
        # legitimately-busy worker inside one long program sends nothing.
        # Robustness to an under-sized lease: each expiry DOUBLES that
        # ticket's next lease (so a healthy-but-slow ticket converges instead
        # of cycling), and expiries track a separate, higher cap than death
        # re-admissions (an expiry duplicates work — first result wins — but
        # must not poison the run the way a worker-killing ticket does).
        self.max_readmissions = max_readmissions
        self.lease_s = lease_s
        self._lock = threading.Condition()
        self._queue: List[Dict[str, Any]] = []
        self._outstanding: Dict[int, Dict[str, Any]] = {}  # tid -> ticket
        self._lease: Dict[int, float] = {}  # tid -> monotonic deadline
        self._owner: Dict[int, int] = {}  # tid -> connection id of the holder
        self._lease_scale: Dict[int, float] = {}  # tid -> lease multiplier
        self._results: Dict[int, Dict[str, Any]] = {}
        self._readmits: Dict[int, int] = {}
        self._expiries: Dict[int, int] = {}  # lease-expiry count per ticket
        self._next = 0
        self._sealed = False
        self._closed = False
        self._failed: Optional[str] = None
        self._srv = socket.create_server((host, port))
        self.address = self._srv.getsockname()  # (host, port)
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)
        self._accept_thread.start()

    # -- host API -------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 32,
               eos_ids: Sequence[int] = ()) -> int:
        with self._lock:
            assert not self._sealed, "coordinator already sealed"
            tid = self._next
            self._next += 1
            self._queue.append({
                "tid": tid, "prompt": list(map(int, prompt)),
                "max_new_tokens": int(max_new_tokens),
                "eos_ids": list(map(int, eos_ids)),
            })
            self._lock.notify_all()
            return tid

    def seal(self) -> None:
        """No more submissions; workers exit once everything is drained."""
        with self._lock:
            self._sealed = True
            self._lock.notify_all()

    def wait_results(self, timeout: float = 300.0) -> List[Dict[str, Any]]:
        """Block until every submitted ticket has a result; returns them in
        submission order."""
        deadline = time.monotonic() + timeout
        with self._lock:
            while len(self._results) < self._next:
                self._reap_expired_locked()
                if self._failed:
                    raise RuntimeError(self._failed)
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise TimeoutError(
                        f"{self._next - len(self._results)} tickets unresolved "
                        f"(queued={len(self._queue)}, "
                        f"outstanding={len(self._outstanding)})"
                    )
                self._lock.wait(timeout=min(remaining, 1.0))
            return [self._results[t] for t in range(self._next)]

    def close(self) -> None:
        # Mark closed FIRST: handlers on still-open worker connections reply
        # 'done' to their next 'get' instead of polling 'wait' forever after a
        # wait_results timeout/failure left the queue non-empty (ADVICE r4).
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        try:
            self._srv.close()
        except OSError:
            pass

    # -- lease bookkeeping (all called under self._lock) ----------------------

    def _renew_locked(self, conn_id: int,
                      assigned: Dict[int, Dict[str, Any]]) -> None:
        """Renew leases of tickets this connection still OWNS; prune the rest
        (a lease expiry may have moved a ticket to another worker — renewing
        or requeuing on the old holder's behalf would corrupt the new
        holder's lease/readmission state)."""
        for tid in list(assigned):
            if self._owner.get(tid) != conn_id:
                del assigned[tid]  # stale: reassigned or completed elsewhere
            elif tid in self._lease:
                self._lease[tid] = (
                    time.monotonic()
                    + self.lease_s * self._lease_scale.get(tid, 1.0)
                )

    def _requeue_locked(self, tid: int, why: str, expiry: bool = False) -> None:
        """Move an outstanding ticket back to the queue (or fail on the cap).

        `expiry` distinguishes a missed-heartbeat lease expiry (duplicated
        work at worst: the next lease doubles, and a separate generous cap
        applies) from a worker DEATH (counts toward max_readmissions — the
        poison-ticket guard)."""
        it = self._outstanding.pop(tid, None)
        self._lease.pop(tid, None)
        self._owner.pop(tid, None)
        if it is None or tid in self._results:
            return
        if expiry:
            self._lease_scale[tid] = 2.0 * self._lease_scale.get(tid, 1.0)
            n = self._expiries.get(tid, 0) + 1
            self._expiries[tid] = n
            cap = 4 * (self.max_readmissions + 1)
            if n > cap:
                self._failed = f"ticket {tid} exceeded {cap} lease expiries ({why})"
                return
        else:
            n = self._readmits.get(tid, 0) + 1
            if n > self.max_readmissions:
                self._failed = (
                    f"ticket {tid} exceeded {self.max_readmissions} "
                    f"re-admissions ({why})"
                )
                return
            self._readmits[tid] = n
        self._queue.append(it)

    def _reap_expired_locked(self) -> None:
        now = time.monotonic()
        for tid in [t for t, d in self._lease.items() if d < now]:
            self._requeue_locked(
                tid, "lease expired: worker stopped heartbeating", expiry=True
            )
        if self._lease or self._queue:
            self._lock.notify_all()

    # -- server side ----------------------------------------------------------

    def _accept(self) -> None:
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:  # closed
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        name = "?"
        assigned: Dict[int, Dict[str, Any]] = {}  # this worker's in-flight
        conn_id = id(conn)
        reader = _LineReader(conn)
        try:
            while True:
                msg = reader.read()
                if msg is None:
                    break
                op = msg.get("op")
                if op == "hello":
                    name = msg.get("name", "?")
                elif op == "hb":
                    with self._lock:
                        self._renew_locked(conn_id, assigned)
                        self._reap_expired_locked()
                    _send(conn, {"op": "ok"})
                elif op == "get":
                    with self._lock:
                        self._renew_locked(conn_id, assigned)
                        self._reap_expired_locked()
                        if self._closed:
                            _send(conn, {"op": "done"})
                        elif self._failed:
                            # a poison ticket burned its re-admissions: stop
                            # handing out work so workers exit instead of
                            # polling forever (wait_results raises the error)
                            _send(conn, {"op": "done"})
                        elif self._queue:
                            items = self._queue[: max(1, int(msg.get("n", 1)))]
                            del self._queue[: len(items)]
                            for it in items:
                                tid = it["tid"]
                                self._outstanding[tid] = it
                                self._lease[tid] = (
                                    time.monotonic() + self.lease_s
                                    * self._lease_scale.get(tid, 1.0)
                                )
                                self._owner[tid] = conn_id
                                assigned[tid] = it
                            _send(conn, {"op": "work", "items": items})
                        elif self._sealed and not self._outstanding and (
                            len(self._results) >= self._next
                        ):
                            _send(conn, {"op": "done"})
                        else:
                            _send(conn, {"op": "wait"})
                elif op == "result":
                    with self._lock:
                        self._renew_locked(conn_id, assigned)
                        for it in msg["items"]:
                            tid = it["tid"]
                            assigned.pop(tid, None)
                            self._outstanding.pop(tid, None)
                            self._lease.pop(tid, None)
                            self._owner.pop(tid, None)
                            # a re-queued copy may still be waiting: drop it
                            self._queue = [q for q in self._queue
                                           if q["tid"] != tid]
                            if tid in self._results:
                                continue  # first result wins (greedy = same)
                            it["worker"] = name
                            it["readmissions"] = self._readmits.get(tid, 0)
                            it["lease_expiries"] = self._expiries.get(tid, 0)
                            self._results[tid] = it
                        self._lock.notify_all()
        except (OSError, ValueError, json.JSONDecodeError):
            pass
        finally:
            conn.close()
            # worker died (or left) with tickets in flight: re-admit those it
            # still OWNS — a lease expiry may already have moved some to
            # another worker, and requeuing those would double-count
            # re-admissions against the new holder (ownership check)
            with self._lock:
                for tid in assigned:
                    if tid in self._outstanding and self._owner.get(tid) == conn_id:
                        self._requeue_locked(tid, f"worker {name} disconnected")
                self._lock.notify_all()


def serve_worker(
    address,
    scheduler,
    name: str = "worker",
    batch: int = 2,
    poll_s: float = 0.05,
    max_batches: Optional[int] = None,
    hang_s: Optional[float] = None,
) -> int:
    """Streaming pull-run-report loop over one local Scheduler. Returns
    #tickets served.

    Tickets are pulled and results reported from INSIDE the scheduler's step
    loop (`Scheduler._run_loop` intake hook): arrivals join the running decode
    batch through the scheduler's interleaved admission instead of waiting for
    a full drain, and each poll doubles as the worker's heartbeat — the beat
    stops if the device wedges mid-step, so the coordinator's lease machinery
    re-admits this worker's tickets elsewhere.

    Fault-injection hooks for tests: `max_batches` makes the worker disconnect
    (simulating host death) after pulling that many work batches, leaving its
    in-flight tickets for the coordinator to re-admit; `hang_s` makes it stop
    heartbeating for that long while HOLDING tickets with the socket open
    (simulating a wedged device) after its first work batch."""
    sock = socket.create_connection(tuple(address))
    reader = _LineReader(sock)
    served = 0
    state = {"rounds": 0, "done": False, "dead": False, "last_poll": 0.0,
             "hung": False}
    rid2tid: Dict[int, int] = {}

    def report_finished() -> int:
        """Stream any finished requests back; returns how many were sent."""
        out = []
        while scheduler.finished:
            req = scheduler.finished.pop(0)
            tid = rid2tid.pop(req.req_id, None)
            if tid is None:
                continue
            out.append({
                "tid": tid,
                "tokens": list(map(int, req.tokens)),
                **{k: v for k, v in req.metrics.items() if k not in ("req_id",)},
            })
        if out:
            _send(sock, {"op": "result", "items": out})
        return len(out)

    def intake() -> bool:
        """Heartbeat + pull + stream results. Runs between scheduler steps."""
        nonlocal served
        if state["done"] or state["dead"]:
            return False
        served += report_finished()
        now = time.monotonic()
        busy = bool(scheduler.active.any()) or scheduler._adm is not None
        if busy and now - state["last_poll"] < poll_s:
            return True  # throttle polling while decoding
        state["last_poll"] = now
        free = scheduler.max_batch - int(scheduler.active.sum()) - len(scheduler.queue)
        want = max(0, min(batch, free)) if scheduler._adm is None else 0
        if want == 0:
            _send(sock, {"op": "hb"})
        else:
            _send(sock, {"op": "get", "n": want})
        msg = reader.read()
        if msg is None:
            state["dead"] = True
            return False
        if msg["op"] == "done":
            state["done"] = True
            return False
        if msg["op"] in ("ok", "wait"):
            if not busy and msg["op"] == "wait":
                time.sleep(poll_s)
            # busy: nothing more to pull right now, keep decoding (the active
            # set keeps _run_loop alive). idle ('wait'): return True so the
            # worker keeps polling from inside _run_loop at poll_s cadence
            # until work or 'done' arrives.
            return not busy
        # work
        if max_batches is not None and state["rounds"] >= max_batches:
            state["dead"] = True  # injected death: vanish holding the tickets
            return False
        state["rounds"] += 1
        for it in msg["items"]:
            rid = scheduler.submit(
                it["prompt"], it["max_new_tokens"], tuple(it["eos_ids"])
            )
            rid2tid[rid] = it["tid"]
        if hang_s is not None and not state["hung"]:
            state["hung"] = True  # injected wedge: hold tickets, no heartbeat
            time.sleep(hang_s)
        return True

    try:
        _send(sock, {"op": "hello", "name": name})
        while not (state["done"] or state["dead"]):
            scheduler.events.clear()
            # _run_loop swaps out scheduler.finished on return — requests that
            # retired after intake observed done/dead would otherwise vanish
            # unreported; put them back and report best-effort
            leftover = scheduler._run_loop(intake=intake)
            scheduler.finished.extend(leftover)
            try:
                served += report_finished()
            except OSError:
                state["dead"] = True  # coordinator gone mid-report
            if state["done"] or state["dead"]:
                break
            time.sleep(poll_s)
        return served
    finally:
        sock.close()
