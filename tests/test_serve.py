"""Serving front door: DP dispatch over Scheduler replicas, failure
re-admission, and the 2-process multi-controller (jax.distributed) smoke test
(SURVEY.md §5 'Failure detection / elastic recovery' row).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.scheduler import Scheduler
from fastkv_tpu.engine.serve import FrontDoor
from fastkv_tpu.models.llama import init_params


@pytest.fixture(scope="module")
def stack():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)
    ecfg = EngineConfig(prefill_buckets=(256,), use_pallas=False, capacity_align=8)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=int(n)))
               for n in rng.integers(40, 200, size=6)]
    return cfg, params, mcfg, ecfg, prompts


def make_sched(stack, **kw):
    cfg, params, mcfg, ecfg, _ = stack
    return Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                     max_new_tokens=8, **kw)


def reference_tokens(stack):
    """Single-scheduler ground truth per prompt."""
    cfg, params, mcfg, ecfg, prompts = stack
    sched = make_sched(stack)
    ids = [sched.submit(p, 8) for p in prompts]
    done = {r.req_id: r.tokens for r in sched.run()}
    return [done[i] for i in ids]


def test_front_door_two_replicas_matches_single(stack):
    prompts = stack[-1]
    ref = reference_tokens(stack)
    fd = FrontDoor([make_sched(stack), make_sched(stack)])
    tids = [fd.submit(p, 8) for p in prompts]
    out = {r["ticket_id"]: r for r in fd.run()}
    # both replicas used
    assert {out[t]["replica"] for t in tids} == {0, 1}
    for t, want in zip(tids, ref):
        assert out[t]["tokens"] == want
        assert out[t]["ttft_s"] >= 0 and out[t]["tpot_s"] >= 0


def test_replica_failure_readmits_to_survivor(stack):
    prompts = stack[-1]
    ref = reference_tokens(stack)
    fd = FrontDoor([make_sched(stack), make_sched(stack)])
    tids = [fd.submit(p, 8) for p in prompts]

    def fault(idx):
        if idx == 0:
            raise RuntimeError("injected replica loss")

    out = {r["ticket_id"]: r for r in fd.run(fault=fault)}
    assert not fd.replicas[0].alive and fd.replicas[1].alive
    readmitted = [t for t in tids if out[t]["readmissions"] > 0]
    assert readmitted, "replica 0's requests must have been re-admitted"
    for t, want in zip(tids, ref):
        # stateless re-execution: greedy output identical after re-admission
        assert out[t]["tokens"] == want
        assert out[t]["replica"] == 1 or out[t]["readmissions"] == 0


def test_all_replicas_dead_raises(stack):
    fd = FrontDoor([make_sched(stack)])
    fd.submit(stack[-1][0], 4)

    def fault(idx):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        fd.run(fault=fault)


def test_dispatch_two_workers_matches_single(stack):
    """Coordinator socket queue: two pull-workers drain the same ticket queue;
    results match the single-scheduler ground truth (engine.dispatch)."""
    import threading

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    prompts = stack[-1]
    ref = reference_tokens(stack)
    coord = Coordinator()
    tids = [coord.submit(p, 8) for p in prompts]
    coord.seal()
    served = {}

    def work(name):
        served[name] = serve_worker(
            coord.address, make_sched(stack), name=name, batch=1
        )

    ts = [threading.Thread(target=work, args=(f"w{i}",)) for i in range(2)]
    for t in ts:
        t.start()
    res = coord.wait_results(timeout=120)
    for t in ts:
        t.join(timeout=60)
    coord.close()
    assert sum(served.values()) == len(prompts)
    assert len({r["worker"] for r in res}) == 2, "both workers must serve"
    for tid, want in zip(tids, ref):
        assert res[tid]["tokens"] == want


def test_dispatch_worker_death_readmits(stack):
    """A worker that vanishes holding tickets gets them re-queued; the
    survivor completes them with identical greedy tokens."""
    import threading

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    prompts = stack[-1]
    ref = reference_tokens(stack)
    coord = Coordinator()
    tids = [coord.submit(p, 8) for p in prompts]
    coord.seal()

    # dying worker grabs a batch and disconnects without reporting
    t_dead = threading.Thread(
        target=serve_worker,
        args=(coord.address, make_sched(stack)),
        kwargs=dict(name="dying", batch=2, max_batches=0),
    )
    t_dead.start()
    t_dead.join(timeout=60)

    t_ok = threading.Thread(
        target=serve_worker,
        args=(coord.address, make_sched(stack)),
        kwargs=dict(name="survivor", batch=2),
    )
    t_ok.start()
    res = coord.wait_results(timeout=120)
    t_ok.join(timeout=60)
    coord.close()
    assert any(r["readmissions"] > 0 for r in res), "death must re-admit"
    assert all(r["worker"] == "survivor" for r in res)
    for tid, want in zip(tids, ref):
        assert res[tid]["tokens"] == want


def test_dispatch_poison_request_capped(stack):
    """A ticket whose workers keep dying is re-admitted at most
    max_readmissions times, then surfaces as a coordinator failure instead of
    cycling forever."""
    import threading

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    coord = Coordinator(max_readmissions=1)
    coord.submit(stack[-1][0], 4)
    coord.seal()
    for i in range(3):  # every worker grabs the ticket and vanishes
        t = threading.Thread(
            target=serve_worker,
            args=(coord.address, make_sched(stack)),
            kwargs=dict(name=f"dying{i}", batch=1, max_batches=0),
        )
        t.start()
        t.join(timeout=60)
    with pytest.raises(RuntimeError, match="re-admissions"):
        coord.wait_results(timeout=30)
    coord.close()


def test_dispatch_close_releases_polling_workers(stack):
    """close() after a wait_results failure must release workers stuck in the
    wait-poll loop (they get 'done' on their next get) instead of leaving
    them polling forever (ADVICE r4)."""
    import threading

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    coord = Coordinator()
    # nothing submitted, not sealed: a worker would poll 'wait' forever
    t = threading.Thread(
        target=serve_worker, args=(coord.address, make_sched(stack)),
        kwargs=dict(name="poller", batch=1, poll_s=0.02),
    )
    t.start()
    import time

    time.sleep(0.3)  # worker is in its wait-poll loop
    coord.close()
    t.join(timeout=30)
    assert not t.is_alive(), "worker must exit after coordinator close()"


def test_dispatch_hung_worker_lease_readmits(stack):
    """SURVEY §5 failure-detection: 'missed-heartbeat detection via
    coordinator'. A worker that HANGS holding tickets — socket open, process
    alive, no progress (the wedged-TPU failure mode) — stops heartbeating;
    its ticket leases expire and the tickets complete on a healthy worker."""
    import threading

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    prompts = stack[-1]
    ref = reference_tokens(stack)
    coord = Coordinator(lease_s=0.4)  # doubles per expiry (backoff)
    tids = [coord.submit(p, 8) for p in prompts]
    coord.seal()

    # hung worker grabs tickets first, then stops heartbeating for 20s —
    # long enough that the survivor (including its compiles) finishes every
    # re-admitted ticket before the hung worker wakes
    t_hung = threading.Thread(
        target=serve_worker,
        args=(coord.address, make_sched(stack)),
        kwargs=dict(name="hung", batch=2, hang_s=20.0),
        daemon=True,
    )
    t_hung.start()
    import time

    time.sleep(0.3)  # let it claim a batch before the survivor connects
    t_ok = threading.Thread(
        target=serve_worker,
        args=(coord.address, make_sched(stack)),
        kwargs=dict(name="survivor", batch=2),
    )
    t_ok.start()
    res = coord.wait_results(timeout=120)
    t_ok.join(timeout=60)
    t_hung.join(timeout=60)
    coord.close()
    # expiries track separately from death re-admissions: a slow-but-healthy
    # ticket must not burn the poison-ticket cap
    assert any(r["lease_expiries"] > 0 for r in res), "lease expiry must re-admit"
    assert all(r["readmissions"] == 0 for r in res), res
    assert all(r["worker"] == "survivor" for r in res), [r["worker"] for r in res]
    for tid, want in zip(tids, ref):
        assert res[tid]["tokens"] == want


def test_dispatch_streaming_interleave(stack):
    """Tickets arriving mid-decode join the running batch through the
    scheduler's interleaved admission (serve_worker streams intake via
    Scheduler._run_loop) — continuous batching does not stop at the host
    boundary (VERDICT r4 weak #3)."""
    import threading
    import time

    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker

    cfg, params, mcfg, ecfg, prompts = stack

    def fresh(mn):
        return Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                         max_new_tokens=mn)

    # offline ground truth at the same generation lengths
    ref_sched = fresh(200)
    r0 = ref_sched.submit(prompts[0], 200)
    r1 = ref_sched.submit(prompts[1], 4)
    ref = {r.req_id: r.tokens for r in ref_sched.run()}

    sched = fresh(200)
    order = []
    orig_install, orig_step = sched._install, sched._decode_one_step
    # _install fires once per completed admission; _admit is called every
    # idle loop iteration regardless of queue state, so don't count it
    sched._install = lambda *a, **kw: (order.append("A"), orig_install(*a, **kw))[1]
    sched._decode_one_step = lambda: (order.append("D"), orig_step())[1]

    coord = Coordinator()
    t0 = coord.submit(prompts[0], 200)  # long-running first request
    worker = threading.Thread(
        target=serve_worker, args=(coord.address, sched),
        kwargs=dict(name="w", batch=1, poll_s=0.01),
    )
    worker.start()
    # wait until the first request is decoding, then submit the second
    deadline = time.monotonic() + 60
    while order.count("D") < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert order.count("D") >= 3, order
    t1 = coord.submit(prompts[1], 4)
    coord.seal()
    res = coord.wait_results(timeout=120)
    worker.join(timeout=60)
    coord.close()

    trace = "".join(order)
    first_d = trace.index("D")
    # the second admission happened BETWEEN decode steps of the first request
    assert "DAD" in trace[first_d:], trace
    assert trace.count("A") == 2, trace
    # token parity vs the offline scheduler at identical budgets
    assert res[t0]["tokens"] == ref[r0]
    assert res[t1]["tokens"] == ref[r1]


def test_front_door_wedged_replica_timeout(stack):
    """A replica whose drain thread never returns (hung device, no exception)
    is detected by the drain timeout and its requests re-admit to survivors
    (VERDICT r4 missing #3: FrontDoor joined without timeout)."""
    import time

    prompts = stack[-1]
    ref = reference_tokens(stack)
    wedged, ok = make_sched(stack), make_sched(stack)
    wedged.run = lambda: time.sleep(600)  # hung, not raising
    # pre-compile the survivor's programs: the drain timeout must catch the
    # WEDGE, not a healthy replica's first-compile latency under CI load
    ok.submit(prompts[0], 2)
    ok.run()
    fd = FrontDoor([wedged, ok], drain_timeout_s=10.0)
    tids = [fd.submit(p, 8) for p in prompts]
    out = {r["ticket_id"]: r for r in fd.run()}
    assert not fd.replicas[0].alive
    assert isinstance(fd.replicas[0].error, TimeoutError)
    assert any(out[t]["readmissions"] > 0 for t in tids)
    for t, want in zip(tids, ref):
        assert out[t]["tokens"] == want


def test_front_door_phase_logger_jsonl(stack):
    """PhaseLogger wiring (SURVEY §5 observability): every retired request
    emits one structured JSONL record through the front door's logger."""
    import io
    import json as _json

    from fastkv_tpu.engine.serve import local_front_door
    from fastkv_tpu.utils.profiling import PhaseLogger

    cfg, params, mcfg, ecfg, prompts = stack
    sio = io.StringIO()
    fd = local_front_door(
        params, cfg, mcfg, ecfg, n_replicas=1, logger=PhaseLogger(stream=sio),
        max_batch=2, bucket=256, max_new_tokens=4,
    )
    for p in prompts[:3]:
        fd.submit(p, 4)
    fd.run()
    recs = [_json.loads(l) for l in sio.getvalue().splitlines()]
    done = [r for r in recs if r["phase"] == "request_done"]
    assert len(done) == 3
    for r in done:
        assert {"ts", "req_id", "prompt_len", "new_tokens", "ttft_s",
                "tpot_s"} <= set(r)


def test_scheduler_sharded_replica_tp2(stack):
    """Serving over a sharded replica (VERDICT r4 missing #4): a Scheduler
    given (pcfg, mesh) with TP(+PP)-sharded params produces token-identical
    output to the single-device replica — on a pod slice a DP replica IS a
    TP mesh."""
    import jax

    from fastkv_tpu.core.config import ParallelConfig
    from fastkv_tpu.parallel import sharding as sh

    cfg, params, mcfg, ecfg, prompts = stack
    ref = reference_tokens(stack)

    for pcfg in (ParallelConfig(model=2), ParallelConfig(model=2, pipe=2)):
        mesh = sh.make_mesh(pcfg, jax.devices())
        params_s = sh.shard_params(params, mesh, cfg)
        sched = Scheduler(params_s, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                          max_new_tokens=8, pcfg=pcfg, mesh=mesh)
        ids = [sched.submit(p, 8) for p in prompts]
        done = {r.req_id: r.tokens for r in sched.run()}
        for rid, want in zip(ids, ref):
            assert done[rid] == want, (pcfg, rid)


_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    # platform comes from JAX_PLATFORMS=cpu in the env: jax.config.update
    # initializes the backend, which must not happen before distributed init
    port, pid = sys.argv[1], int(sys.argv[2])

    from fastkv_tpu.engine.serve import init_distributed, local_front_door
    info = init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert info["process_count"] == 2, info
    assert info["global_device_count"] == 2, info

    # cross-process collective through the multi-controller runtime
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
    x = jax.make_array_from_callback(
        (2,), NamedSharding(mesh, P("data")),
        lambda idx: np.asarray([float(jax.process_index() + 1)]),
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == 3.0, float(total)

    # per-host DP replica serving its shard of the request stream
    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
    from fastkv_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(num_layers=1)
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=0)
    ecfg = EngineConfig(prefill_buckets=(64,), use_pallas=False, capacity_align=8)
    fd = local_front_door(params, cfg, mcfg, ecfg, n_replicas=1,
                          max_batch=1, bucket=64, max_new_tokens=4)
    rng = np.random.default_rng(7)
    all_prompts = [list(rng.integers(0, cfg.vocab_size, size=30)) for _ in range(4)]
    mine = all_prompts[jax.process_index()::2]
    for p in mine:
        fd.submit(p, 4)
    res = fd.run()
    assert len(res) == len(mine) and all(r["tokens"] for r in res), res
    print(f"MULTIHOST_OK p{pid} served={len(res)}", flush=True)

    # cross-host dispatch: rank 0 runs the Coordinator feed; BOTH processes
    # pull work through it (engine.dispatch) — the actual multi-host serving
    # loop, not a by-convention partition
    import json
    from fastkv_tpu.engine.dispatch import Coordinator, serve_worker
    from fastkv_tpu.engine.scheduler import Scheduler

    dport = int(sys.argv[3])
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=1, bucket=64,
                      max_new_tokens=4)
    if pid == 0:
        coord = Coordinator(port=dport)
        tids = [coord.submit(p, 4) for p in all_prompts]
        coord.seal()
        served = serve_worker(coord.address, sched, name="p0", batch=1)
        res = coord.wait_results(timeout=120)
        coord.close()
        workers = {r["worker"] for r in res}
        assert workers == {"p0", "p1"}, workers
        print("DISPATCH_RESULTS " + json.dumps(
            [r["tokens"] for r in res]), flush=True)
    else:
        import time
        time.sleep(0.5)  # let rank 0 bind
        served = serve_worker(("127.0.0.1", dport), sched, name="p1", batch=1)
        assert served > 0, served
    print(f"DISPATCH_OK p{pid} served={served}", flush=True)
    """
)


def test_two_process_multicontroller_smoke(tmp_path):
    """Two OS processes under jax.distributed: global collective + per-host
    serving (this is the multi-host scaffolding smoke; real pods swap CPU for
    TPU workers with auto-detected topology)."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # the container's sitecustomize registers the axon TPU plugin (which
    # initializes the XLA backend) whenever PALLAS_AXON_POOL_IPS is set;
    # jax.distributed.initialize must run before any backend init
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        dport = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), str(dport)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MULTIHOST_OK p{i}" in out, out
        assert f"DISPATCH_OK p{i}" in out, out

    # cross-process dispatch token parity vs an in-process reference
    import json

    from fastkv_tpu.engine.scheduler import Scheduler as _S

    line = next(l for l in outs[0].splitlines()
                if l.startswith("DISPATCH_RESULTS "))
    got = json.loads(line.split(" ", 1)[1])
    cfg = ModelConfig.tiny(num_layers=1)
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=0)
    ecfg = EngineConfig(prefill_buckets=(64,), use_pallas=False, capacity_align=8)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=30)) for _ in range(4)]
    sched = _S(params, cfg, mcfg, ecfg, max_batch=1, bucket=64, max_new_tokens=4)
    ids = [sched.submit(p, 4) for p in prompts]
    ref = {r.req_id: r.tokens for r in sched.run()}
    assert got == [ref[i] for i in ids], (got, ref)
