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
