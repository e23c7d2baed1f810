"""Multi-PROCESS distributed training correctness (SURVEY.md §2.4).

Launches 2 real OS processes x 4 virtual CPU devices each, joined into one
``jax.distributed`` runtime (Gloo collectives): every process steps its own
shard of the env fleet with a local jitted rollout and runs the learner
data-parallel over the GLOBAL 8-device mesh — the CI analog of a 2-host TPU
pod slice (the reference has no multi-node test infra at all; its
distribution is exercised in-process, SURVEY.md §4.7 — this goes further).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_training():
    port = _free_port()
    env = dict(os.environ)
    # the workers configure their own device counts/platform
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        _, loss0, loss_last, digest = lines[0].split()
        results.append((float(loss0), float(loss_last), float(digest)))

    # the gradient all-reduce keeps replicated params in lockstep: both
    # processes must observe IDENTICAL losses and end with IDENTICAL params
    assert results[0] == results[1], results
    # and training across the global batch actually learns
    assert results[0][1] < results[0][0], results[0]
