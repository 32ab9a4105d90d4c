"""Cross-host request dispatch: a real transport for the multi-host serving loop.

SURVEY.md §5 scopes a "multi-host serving loop"; `FrontDoor` covers DP
replicas inside one process, and this module adds the missing cross-process
leg (VERDICT r3 task 10): a coordinator-rank request queue that worker hosts
PULL from over TCP, with results streamed back and worker-death re-admission.

Topology (matches the jax.distributed multi-controller layout,
engine.serve.init_distributed): process 0 runs the `Coordinator` (a
newline-delimited-JSON TCP server on the DCN/loopback interface) and every
process — including 0 — runs `serve_worker`, which drains batches through its
local Scheduler/FrontDoor. The model runtime stays SPMD per host; only
request/response metadata crosses this socket (prompts + token ids, O(KB) —
never tensors), so the transport is latency-insensitive relative to prefill.

Failure semantics mirror FrontDoor's elastic re-admission: a worker whose
connection drops (process death, network partition) gets its outstanding
tickets re-queued; stateless greedy re-execution produces identical tokens.
A `max_readmissions` cap prevents a poison request from cycling forever.

Protocol (one JSON object per line, either direction):
  worker -> {"op": "hello", "name": str}
            {"op": "get", "n": int}           request up to n tickets
            {"op": "result", "items": [...]}  completed tickets
  coord  -> {"op": "work", "items": [{"tid", "prompt", "max_new_tokens",
             "eos_ids"}]}
            {"op": "wait"}                    nothing queued now, poll again
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
                 max_readmissions: int = 2):
        self.max_readmissions = max_readmissions
        self._lock = threading.Condition()
        self._queue: List[Dict[str, Any]] = []
        self._outstanding: Dict[int, Dict[str, Any]] = {}  # tid -> ticket
        self._results: Dict[int, Dict[str, Any]] = {}
        self._readmits: Dict[int, int] = {}
        self._next = 0
        self._sealed = False
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
        try:
            self._srv.close()
        except OSError:
            pass

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
        reader = _LineReader(conn)
        try:
            while True:
                msg = reader.read()
                if msg is None:
                    break
                op = msg.get("op")
                if op == "hello":
                    name = msg.get("name", "?")
                elif op == "get":
                    with self._lock:
                        if self._failed:
                            # a poison ticket burned its re-admissions: stop
                            # handing out work so workers exit instead of
                            # polling forever (wait_results raises the error)
                            _send(conn, {"op": "done"})
                        elif self._queue:
                            items = self._queue[: max(1, int(msg.get("n", 1)))]
                            del self._queue[: len(items)]
                            for it in items:
                                self._outstanding[it["tid"]] = it
                                assigned[it["tid"]] = it
                            _send(conn, {"op": "work", "items": items})
                        elif self._sealed and not self._outstanding and (
                            len(self._results) >= self._next
                        ):
                            _send(conn, {"op": "done"})
                        else:
                            _send(conn, {"op": "wait"})
                elif op == "result":
                    with self._lock:
                        for it in msg["items"]:
                            tid = it["tid"]
                            it["worker"] = name
                            it["readmissions"] = self._readmits.get(tid, 0)
                            self._results[tid] = it
                            self._outstanding.pop(tid, None)
                            assigned.pop(tid, None)
                        self._lock.notify_all()
        except (OSError, ValueError, json.JSONDecodeError):
            pass
        finally:
            conn.close()
            # worker died (or left) with tickets in flight: re-admit
            with self._lock:
                for tid, it in assigned.items():
                    if tid in self._results:
                        continue
                    self._outstanding.pop(tid, None)
                    n = self._readmits.get(tid, 0) + 1
                    if n > self.max_readmissions:
                        self._failed = (
                            f"ticket {tid} exceeded {self.max_readmissions} "
                            f"re-admissions (worker {name} died repeatedly)"
                        )
                    else:
                        self._readmits[tid] = n
                        self._queue.append(it)
                self._lock.notify_all()


def serve_worker(
    address,
    scheduler,
    name: str = "worker",
    batch: int = 2,
    poll_s: float = 0.05,
    max_batches: Optional[int] = None,
) -> int:
    """Pull-run-report loop over one local Scheduler. Returns #tickets served.

    `max_batches` is a fault-injection hook for tests: the worker disconnects
    (simulating host death) after that many batches, leaving its in-flight
    tickets for the coordinator to re-admit."""
    sock = socket.create_connection(tuple(address))
    reader = _LineReader(sock)
    served = 0
    rounds = 0
    try:
        _send(sock, {"op": "hello", "name": name})
        while True:
            _send(sock, {"op": "get", "n": batch})
            msg = reader.read()
            if msg is None or msg["op"] == "done":
                return served
            if msg["op"] == "wait":
                time.sleep(poll_s)
                continue
            items = msg["items"]
            if max_batches is not None and rounds >= max_batches:
                return served  # injected death: vanish holding these tickets
            rounds += 1
            rid2tid = {}
            for it in items:
                rid = scheduler.submit(
                    it["prompt"], it["max_new_tokens"], tuple(it["eos_ids"])
                )
                rid2tid[rid] = it["tid"]
            done = scheduler.run()
            out = []
            for req in done:
                if req.req_id not in rid2tid:
                    continue
                out.append({
                    "tid": rid2tid[req.req_id],
                    "tokens": list(map(int, req.tokens)),
                    **{k: v for k, v in req.metrics.items()
                       if k not in ("req_id",)},
                })
            served += len(out)
            _send(sock, {"op": "result", "items": out})
    finally:
        sock.close()
