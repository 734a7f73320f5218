"""Simulated multi-host (DCN) index sharding.

Two OS processes, each with 2 forced CPU devices, join one JAX
distributed runtime and serve ONE global FlatIndex where each process
loads only its own row range (parallel/multihost.py). The all_gather
top-k merge rides the inter-process collective backend — the CPU
simulation of a TPU pod's DCN. Asserts exact scores, ≥0.9 recall vs
brute force (inside the worker), and bit-identical results across the
two processes (here).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_flat(tmp_path):
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(WORKER)))
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2",
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    for pid in range(2):
        assert os.path.exists(tmp_path / f"ok_{pid}"), outs[pid][-3000:]
    # SPMD: both processes must see the identical merged result
    ids0 = np.load(tmp_path / "ids_0.npy")
    ids1 = np.load(tmp_path / "ids_1.npy")
    np.testing.assert_array_equal(ids0, ids1)
