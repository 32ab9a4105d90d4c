"""Persistent TPU worker: keeps one warmed-up process holding the TPU session
and executes queued python snippets in a shared namespace.

Why: the tunneled TPU in this container pays a multi-minute warmup per process;
iterating via fresh processes wastes most of the wall clock. Protocol:

  * submit:   write code to   /tmp/tpuq/NNN_name.py
  * result:   worker writes   /tmp/tpuq/NNN_name.out  (stdout+stderr+status)
  * shutdown: touch /tmp/tpuq/STOP

The namespace persists across snippets (params stay resident on device).
"""

import glob
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUEUE = "/tmp/tpuq"
os.makedirs(QUEUE, exist_ok=True)

ns = {"__name__": "__tpu_worker__"}

print("worker: warming up device...", flush=True)
t0 = time.time()
exec(
    "import jax, jax.numpy as jnp, numpy as np\n"
    "from fastkv_tpu.utils.timing import force, warmup_device, timed\n"
    "warm = warmup_device()\n",
    ns,
)
print(f"worker: ready (warmup {ns['warm']:.1f}s, total {time.time()-t0:.1f}s)", flush=True)

while True:
    if os.path.exists(os.path.join(QUEUE, "STOP")):
        print("worker: STOP", flush=True)
        break
    jobs = sorted(
        p for p in glob.glob(os.path.join(QUEUE, "*.py")) if not os.path.exists(p + ".done")
    )
    for job in jobs:
        out_path = job[:-3] + ".out"
        print(f"worker: running {job}", flush=True)
        buf = io.StringIO()
        t0 = time.time()
        status = "ok"
        old_out, old_err = sys.stdout, sys.stderr
        try:
            sys.stdout = sys.stderr = buf
            with open(job) as f:
                code = f.read()
            exec(compile(code, job, "exec"), ns)
        except Exception:
            status = "error"
            traceback.print_exc(file=buf)
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n== {status} in {time.time()-t0:.1f}s ==\n")
        open(job + ".done", "w").close()
        print(f"worker: {job} -> {status} ({time.time()-t0:.1f}s)", flush=True)
    time.sleep(0.5)
