"""2 OS processes x 4 virtual CPU devices each: the v5e-8 multi-host analog.

The round-3 cluster test (test_multiprocess_distributed.py) runs 2x2; this
one scales to the 8-device mesh shape the dryrun uses (2 processes x 4
devices), and runs the THROUGHPUT configuration across it: the int8-PTQ
YOLO detector on the bf16 towers with detection stride 2 AND pose stride 2
(both strided slices cross process boundaries under pjit), plus the
cross-process psum score histogram. Every process-local shard is compared
against process 0's single-process whole-batch run of the same step.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

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

from poserisk_release_tpu.body.smpl import SMPLFamily
from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.models.detector import (
    calibrate_yolo_activations,
    fold_bn_params,
    init_yolo_params,
    quantize_yolo_params,
)
from poserisk_release_tpu.ops.crop import letterbox_device_rect
from poserisk_release_tpu.pipeline import PoseEstimator
from poserisk_release_tpu.throughput import (
    default_packed_infos,
    make_full_frame_step,
    score_histogram_psum,
)

devices = np.asarray(jax.devices())
assert devices.size == 8, f"want 8 global devices, have {devices.size}"
mesh = Mesh(devices, ("data",))
sharding = NamedSharding(mesh, P("data"))

# --- cross-process psum over the 8-device mesh ----------------------------
local_scores = jnp.asarray(np.full((8,), pid + 1, np.int32))
global_scores = jax.make_array_from_process_local_data(
    sharding, np.asarray(local_scores))
hist = np.asarray(jax.jit(shard_map(
    lambda s: score_histogram_psum(s, "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P(),
))(global_scores))

# --- the int8 + stride throughput step across the cluster -----------------
cfg = default_config()
est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
variables = jax.device_get(est.variables)          # deterministic init,
smpl_params = jax.device_get(est.smpl_params)      # identical per process
info_reba, info_rula = default_packed_infos()

folded = fold_bn_params(init_yolo_params())
calib = letterbox_device_rect(jnp.zeros((2, 64, 64, 3), jnp.uint8), 64)
qparams = jax.device_get(
    quantize_yolo_params(folded, calibrate_yolo_activations(folded, calib)))

step = jax.jit(make_full_frame_step(
    cfg.SPIN.ief_iters, est.parents, img_size=64,
    compute_dtype=jnp.bfloat16, det_stride=2, pose_stride=2))

B = 16
frames_full = np.random.RandomState(3).randint(
    0, 256, (B, 64, 64, 3)).astype(np.uint8)
boxes_full = np.tile(np.array([32.0, 32.0, 20.0, 20.0], np.float32), (B, 1))
per = B // n_proc
global_frames = jax.make_array_from_process_local_data(
    sharding, frames_full[pid * per:(pid + 1) * per])
global_boxes = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)),
    boxes_full[pid * per:(pid + 1) * per])

reba_d, rula_d, best_d = step(
    qparams, variables, smpl_params, global_frames, global_boxes,
    info_reba, info_rula)

shards = []
for s_r, s_u in zip(reba_d.addressable_shards, rula_d.addressable_shards):
    shards.append({
        "start": int(s_r.index[0].start or 0),
        "reba": np.asarray(s_r.data).tolist(),
        "rula": np.asarray(s_u.data).tolist(),
    })
result = {"topo": topo, "hist": hist.tolist(), "shards": shards, "B": B,
          "best_sum": float(np.asarray(jnp.sum(best_d.astype(jnp.float64))))}

if pid == 0:
    # Single-process whole-batch reference (replicated local inputs only).
    l_reba, l_rula, l_best = step(
        qparams, variables, smpl_params, frames_full, boxes_full,
        info_reba, info_rula)
    result["local_reba"] = np.asarray(l_reba).tolist()
    result["local_rula"] = np.asarray(l_rula).tolist()
    result["local_best_sum"] = float(np.asarray(l_best, np.float64).sum())

print("RESULT " + json.dumps(result), flush=True)
"""


def test_two_process_four_device_int8_stride_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, \
            f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))

    for pid, r in enumerate(results):
        assert r["topo"]["process_count"] == 2
        assert r["topo"]["process_index"] == pid
        assert r["topo"]["local_devices"] == 4
        assert r["topo"]["global_devices"] == 8

    # proc 0 contributed eight 1-scores, proc 1 eight 2-scores: the GLOBAL
    # histogram (identical on both processes) is [8, 8, 0, ...].
    want = [8.0, 8.0] + [0.0] * 10
    assert results[0]["hist"] == want
    assert results[1]["hist"] == want

    B = results[0]["B"]
    ref_reba = results[0]["local_reba"]
    ref_rula = results[0]["local_rula"]
    covered = set()
    for r in results:
        for shard in r["shards"]:
            start, n = shard["start"], len(shard["reba"])
            assert n > 0
            covered.update(range(start, start + n))
            # Integer scores from thresholded rules: exact equality between
            # the 2x4 cluster and the single-process whole-batch run.
            assert shard["reba"] == ref_reba[start:start + n]
            assert shard["rula"] == ref_rula[start:start + n]
        np.testing.assert_allclose(
            r["best_sum"], results[0]["local_best_sum"], rtol=1e-2)
    assert covered == set(range(B))
