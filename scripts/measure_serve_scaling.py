"""Measure FrontDoor replica-drain overlap on the virtual CPU mesh.

SURVEY.md §2.4 DP row / VERDICT r2 item 10: the serving scaffolding needs a
measured datapoint, not just correctness tests.

What can honestly be measured on one host: N virtual CPU devices share the
same physical cores, so *absolute* throughput cannot scale with replica count
(measured: 1->2 replicas = 0.95x on this container — exactly the shared-FLOPs
expectation). What the FrontDoor threading is FOR is overlap: while one
replica's drain thread blocks in device execution (JAX releases the GIL),
another replica's host logic and device work proceed. So this script measures

    overlap = (serial drain of N replicas) / (threaded FrontDoor.run of N)

with each replica's params committed to a distinct CPU device and XLA ops
pinned single-threaded (so two 1-thread executions can genuinely co-run on
the container's 2 cores). overlap -> N is perfect; overlap ~ 1 means the
threading buys nothing. Numbers land in ROOFLINE.md §6. Run:

    python scripts/measure_serve_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must precede jax import: single-threaded op execution, 8 virtual devices.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from fastkv_tpu.core.config import (  # noqa: E402
    EngineConfig,
    Method,
    MethodConfig,
    ModelConfig,
)
from fastkv_tpu.engine.scheduler import Scheduler  # noqa: E402
from fastkv_tpu.engine.serve import FrontDoor  # noqa: E402
from fastkv_tpu.models.llama import init_params  # noqa: E402

N_REQUESTS = 16
MAX_NEW = 16


def build(n_replicas: int):
    # big enough that device execution dominates host scheduling
    cfg = ModelConfig.tiny(num_layers=4, hidden_size=256, intermediate_size=512)
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional",
        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1,
    )
    ecfg = EngineConfig(prefill_buckets=(512,), use_pallas=False, capacity_align=8)
    scheds = []
    for i in range(n_replicas):
        dev = jax.devices()[i]
        p_i = jax.device_put(params, dev)
        scheds.append(
            Scheduler(p_i, cfg, mcfg, ecfg, max_batch=4, bucket=512,
                      max_new_tokens=MAX_NEW)
        )
    return FrontDoor(scheds)


def submit_round_robin(fd, prompts):
    # bypass least-loaded placement so serial and threaded runs get the
    # identical per-replica request split
    for j, p in enumerate(prompts):
        r = fd.replicas[j % len(fd.replicas)]
        rid = r.scheduler.submit(p, MAX_NEW)
        from fastkv_tpu.engine.serve import _Ticket

        t = _Ticket(len(fd.tickets), list(p), MAX_NEW, ())
        t.replica, t.replica_req_id = r.idx, rid
        r.assigned[rid] = t
        fd.tickets.append(t)


def warmup(fd, prompt):
    for r in fd.replicas:
        r.scheduler.submit(prompt, 2)
        assert r.scheduler.run()
        r.assigned.clear()


def main():
    rng = np.random.default_rng(11)
    cfg_probe = ModelConfig.tiny(num_layers=4, hidden_size=256, intermediate_size=512)
    prompts = [
        list(rng.integers(0, cfg_probe.vocab_size, size=int(n)))
        for n in rng.integers(100, 400, size=N_REQUESTS)
    ]

    for n in (1, 2, 4):
        # Whichever mode runs first measures ~25% slower (cold allocator /
        # page-cache state — observed to flip the comparison entirely), so
        # run each mode twice interleaved and keep the warm (second) run.
        def run_serial():
            fd = build(n)
            warmup(fd, prompts[0])
            submit_round_robin(fd, prompts)
            t0 = time.perf_counter()
            for r in fd.replicas:
                if r.assigned:
                    r.drain()
                    r.assigned.clear()
            return time.perf_counter() - t0

        def run_threaded():
            fd = build(n)
            warmup(fd, prompts[0])
            submit_round_robin(fd, prompts)
            t0 = time.perf_counter()
            out = fd.run()
            dt = time.perf_counter() - t0
            assert len(out) == len(prompts) and all(o["tokens"] for o in out)
            return dt

        run_serial(); run_threaded()
        serial, threaded = run_serial(), run_threaded()

        print(
            f"replicas={n}: serial {serial:.2f}s, threaded {threaded:.2f}s, "
            f"overlap x{serial/threaded:.2f} "
            f"({len(prompts)/threaded:.2f} req/s threaded)",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
