"""Multi-process distributed test: 2 OS processes, gloo collectives.

The virtual-mesh tests (test_dist*.py) run every device in ONE process;
this spawns two real processes, each owning one CPU device, connected by
`jax.distributed.initialize` — exercising `maybe_distributed_init`
(parallel/mesh.py) and cross-process ppermute, the actual multi-host
path SURVEY §5.8 claims.  ≙ testing multi-node without a cluster
(SURVEY §4's implication list, item c).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_halo_spmm():
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"OK process {pid}" in out
