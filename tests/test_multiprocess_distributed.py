"""Exercise the REAL jax.distributed.initialize branch (SURVEY.md 5.8).

Round 1 only tested initialize_distributed's single-process no-op path; here
two actual OS processes form a cluster over a localhost coordinator, build
the global 1-D data mesh, and psum the score histogram across processes --
the exact collective of the multi-host design (throughput.score_histogram_psum).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from poserisk_release_tpu.parallel.distributed import initialize_distributed

topo = initialize_distributed(coordinator, n_proc, pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map
from poserisk_release_tpu.throughput import score_histogram_psum

devices = np.asarray(jax.devices())
mesh = Mesh(devices, ("data",))

# Each process holds DIFFERENT local per-frame scores; the psum'd histogram
# must be identical on every process (global reduction across the cluster).
local_scores = jnp.asarray(np.full((4,), pid + 1, np.int32))  # proc 0 -> 1s, proc 1 -> 2s
global_scores = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local_scores)
)

hist_fn = shard_map(
    lambda s: score_histogram_psum(s, "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P(),
)
hist = np.asarray(jax.jit(hist_fn)(global_scores))
print("RESULT " + json.dumps({
    "topo": topo, "hist": hist.tolist(),
}), flush=True)
"""


def test_two_process_cluster_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))

    for pid, r in enumerate(results):
        assert r["topo"]["process_count"] == 2
        assert r["topo"]["process_index"] == pid
        assert r["topo"]["local_devices"] == 2
        assert r["topo"]["global_devices"] == 4

    # proc 0 contributed four 1-scores, proc 1 four 2-scores: the GLOBAL
    # histogram (identical on both processes) is [4, 4, 0, ...].
    want = [4.0, 4.0] + [0.0] * 10
    assert results[0]["hist"] == want
    assert results[1]["hist"] == want
