"""Measured reference baseline: the post-detection hot loop on THIS host CPU.

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
vs_baseline has divided by a documented 30 fps GPU *estimate*. This tool
replaces the estimate's CPU half with a measurement: it runs the reference's
exact post-detection pipeline structure on this machine and reports frames/sec.

Workload — a faithful restatement of the reference hot loop (SURVEY.md §3.3 +
§3.4), built from the same oracle modules the parity tests trust:

  1. SPIN forward, torch CPU, batch 8 (the reference batch size,
     /root/reference/lib/core/config.py:32): tests/oracles/torch_hmr.TorchHMR
     in eval mode under no_grad, exactly like
     /root/reference/lib/core/base.py:217-222 (including the host pull of
     rotmats AND the `images.append(batch.cpu().numpy())` copy).
  2. Per-frame serial conversions (/root/reference/lib/core/base.py:225-233):
     rot_to_angle = 24x cv2.Rodrigues(rotmat->vec) per frame, then
     axis_angle_to_euler_angle = 24x cv2.Rodrigues(vec->mat) + XYZ Euler
     extraction + the reference's euler_to_rotMat round-trip consistency
     check per frame (/root/reference/lib/utils/coord_utils.py:24-30,83-95).
  3. get_joint_cam (/root/reference/lib/utils/coord_utils.py:7-21): one
     BATCH-1 torch SMPL forward per frame (tests/oracles/torch_smpl, the
     smpl_layer.py:65-158 restatement; computes the 6890-vertex mesh the
     reference also computes and discards), root pose forced to (3.14,0,0),
     zero betas, x1000 mm, root-centered.
  4. REBA + RULA per-frame Python rule chains
     (tests/oracles/reference_scoring.reba_frame/rula_frame, the restatement
     of /root/reference/lib/utils/reba.py:50-81 and rula.py:66-98).

Deliberately EXCLUDED — all of which the real reference also pays — so the
measured number is an UPPER bound on (i.e. favorable to) the reference:
video decode, the per-frame jpg disk round trip, YOLOv3 detection, SORT,
the crop warpAffine, rendering, and stats/plots.

--with-ours additionally measures this repo's fused pose+score step
(throughput.make_pose_and_score_step — the SAME four stages as one XLA
graph) on the SAME host CPU, giving a same-hardware architecture ratio with
identical weights-free synthetic inputs. Compile time is excluded (steady
state); the TPU numbers live in bench.py / docs/PERF.md.

Usage:  python tools/bench_reference_hotloop.py [--frames 64] [--with-ours]
Run it exclusively (this machine has one CPU core; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _smpl_arrays(model):
    return {
        "v_template": model.v_template,
        "shapedirs": model.shapedirs,
        "posedirs": model.posedirs,
        "J_regressor": model.J_regressor,
        "weights": model.weights,
        "kintree_parents": model.kintree_parents,
        "betas": model.betas,
    }


def measure_reference(frames: int, batch: int, seed: int) -> dict:
    import torch

    from poserisk_release_tpu.body.smpl import SMPLModel
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.spin import load_mean_params
    from tests.oracles import reference_geometry as geo
    from tests.oracles import reference_scoring as scoring
    from tests.oracles.torch_hmr import randomized_torch_hmr
    from tests.oracles.torch_smpl import smpl_forward

    cfg = default_config()
    mean_params = load_mean_params("")  # synthetic fallback, same as tests
    model = randomized_torch_hmr(mean_params, seed=seed)
    smpl = SMPLModel.load(cfg.SPIN.smpl_model_dir)  # synthetic 6890-vert model
    arrays = _smpl_arrays(smpl)
    info = json.load(open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "poserisk_release_tpu", "default_information.json")))

    rng = np.random.default_rng(seed)
    crops = rng.random((frames, 3, 224, 224), np.float32)  # [0,1], NCHW (torch)

    stages = {"spin": 0.0, "conversions": 0.0, "joint_cam": 0.0, "scoring": 0.0}
    t_total0 = time.perf_counter()

    # --- stage 1+2: base.py:211-240 loop structure -------------------------
    images = []
    result = []
    debug_result = []
    with torch.no_grad():
        for start in range(0, frames, batch):
            chunk = torch.from_numpy(crops[start:start + batch])
            t0 = time.perf_counter()
            pred_rotmat, _betas, _cam = model(chunk)
            pred_rotmat = pred_rotmat.cpu().numpy()
            images.append(chunk.cpu().numpy())
            stages["spin"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            for rotmat in pred_rotmat:
                # rot_to_angle: 24x cv2.Rodrigues mat->vec
                pose = np.stack([geo.rodrigues_mat_to_vec(p) for p in rotmat])
                debug_result.append(pose)
                # axis_angle_to_euler_angle: 24x Rodrigues vec->mat + Euler
                # + the reference's round-trip consistency check
                eulers = []
                for aa in pose:
                    R = geo.rodrigues_vec_to_mat(aa)
                    e = geo.euler_from_rotmat_xyz(R)
                    R2 = geo.rotmat_from_euler_zyx_composition(e[2], e[1], e[0])
                    if (R - R2).sum() > 0.1:
                        raise AssertionError("euler round trip")
                    eulers.append(e * 180.0 / np.pi)
                result.append(np.stack(eulers))
            stages["conversions"] += time.perf_counter() - t0
    result = np.stack(result)
    images = np.concatenate(images)

    # --- stage 3: get_joint_cam, BATCH-1 SMPL forward per frame ------------
    t0 = time.perf_counter()
    joint_cam = []
    init_pose = np.array([3.14, 0.0, 0.0], np.float32)
    for pose in debug_result:
        p = pose.copy()
        p[0] = init_pose
        _verts, joints = smpl_forward(arrays, p.reshape(1, -1))
        j = joints[0] * 1000.0
        joint_cam.append(j - j[0, None])
    joint_cam = np.stack(joint_cam)
    stages["joint_cam"] += time.perf_counter() - t0

    # --- stage 4: per-frame Python REBA + RULA rule chains -----------------
    t0 = time.perf_counter()
    reba_scores = [scoring.reba_frame(p, info["REBA"])[0] for p in result]
    rula_scores = [scoring.rula_frame(p, info["RULA"])[0] for p in result]
    stages["scoring"] += time.perf_counter() - t0

    elapsed = time.perf_counter() - t_total0
    assert len(reba_scores) == frames and len(rula_scores) == frames
    assert joint_cam.shape == (frames, 24, 3) and images.shape[0] == frames
    return {"elapsed_s": elapsed, "fps": frames / elapsed, "stages_s": stages}


def measure_ours_cpu(frames: int, seed: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # relay shim overrides env vars
    import jax.numpy as jnp

    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_pose_and_score_step,
    )

    cfg = default_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())
    step = jax.jit(make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents))

    rng = np.random.default_rng(seed)
    crops = jnp.asarray(rng.random((frames, 224, 224, 3), np.float32))
    args = (est.variables, est.smpl_params, crops, info_reba, info_rula)

    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))  # real barrier on XLA:CPU
    compile_s = time.perf_counter() - t0

    passes = 3
    t0 = time.perf_counter()
    for _ in range(passes):
        jax.block_until_ready(step(*args))
    elapsed = (time.perf_counter() - t0) / passes
    return {"elapsed_s": elapsed, "fps": frames / elapsed,
            "compile_s": compile_s}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8,
                    help="reference SPIN batch size (config.py:32)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--with-ours", action="store_true",
                    help="also measure this repo's fused pose+score step on "
                         "the same host CPU (XLA:CPU, compile excluded)")
    args = ap.parse_args()

    ref = measure_reference(args.frames, args.batch, args.seed)
    print(f"reference hot loop (torch CPU, batch {args.batch}, "
          f"{args.frames} frames; decode/detect/crop EXCLUDED):")
    for name, sec in ref["stages_s"].items():
        print(f"  {name:12s} {sec:7.2f} s  ({sec / args.frames * 1000:7.1f} ms/frame)")
    print(f"  total        {ref['elapsed_s']:7.2f} s -> {ref['fps']:.2f} fps "
          f"(UPPER bound on the reference's e2e fps on this host)")

    out = {"metric": "reference_hotloop_fps_host_cpu",
           "value": round(ref["fps"], 3),
           "frames": args.frames,
           "stages_ms_per_frame": {k: round(v / args.frames * 1000, 2)
                                   for k, v in ref["stages_s"].items()}}
    if args.with_ours:
        ours = measure_ours_cpu(args.frames, args.seed)
        print(f"ours, same host CPU (one XLA graph, steady state; compile "
              f"{ours['compile_s']:.1f} s excluded): {ours['fps']:.2f} fps")
        print(f"same-hardware architecture ratio: "
              f"{ours['fps'] / ref['fps']:.1f}x")
        out["ours_fps_host_cpu"] = round(ours["fps"], 2)
        out["same_host_ratio"] = round(ours["fps"] / ref["fps"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
