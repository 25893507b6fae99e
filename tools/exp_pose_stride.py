"""A/B the pose-stride throughput mode on the product full-frame step.

SpinConfig.pose_stride runs crop+SPIN on every Nth frame only, with the
skipped frames' joint rotations slerp-interpolated between anchors on
device (throughput.make_pose_core); after the detection stride removed
most of the detector cost, SPIN (~9-12 of ~18 ms per 128 frames at det
stride 8, docs/PERF.md round 3) is the dominant stage this mode divides.
Measures the real step (throughput.make_full_frame_step: letterbox +
detect[::D] + crop[::P] + SPIN[::P] + slerp + scoring, rect canvas, int8
detector, bf16 compute, fused resample with its frame-stride HBM read
mode) over a pose-stride sweep at the production detection stride 8, plus
pose stride alone (det 1) and the max configuration (+ int8 SPIN),
interleaved in ONE process per the measurement discipline in docs/PERF.md.

Usage: python tools/exp_pose_stride.py
Run EXCLUSIVELY (single-tenant TPU; 8 remote compiles incl. the batch-512
variant -- budget 60-90 min cold through the relay).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poserisk_release_tpu.utils.profiling import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # share bench.py's on-disk executable cache

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 128
MEASURE = 24
FRAME_HW = (450, 800)


def one_pass(fn, args) -> float:
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(MEASURE)]
    acc = jnp.float32(0)
    for o in outs:
        for leaf in jax.tree_util.tree_leaves(o):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
    float(acc)
    return (time.perf_counter() - t0) / MEASURE * 1000.0


def main() -> None:
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.detector import (
        calibrate_yolo_activations,
        fold_bn_params,
        init_yolo_params,
        quantize_yolo_params,
    )
    from poserisk_release_tpu.models.spin import (
        cast_backbone_params,
        quantize_spin_backbone,
    )
    from poserisk_release_tpu.ops.crop import letterbox_device_rect
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_full_frame_step,
    )

    cfg = default_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    spin_bf16 = jax.device_put(cast_backbone_params(est.variables))
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())
    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, *FRAME_HW, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    bboxes = jnp.asarray(
        np.tile(np.array([400.0, 225.0, 220.0, 220.0], np.float32), (B, 1)))

    folded = fold_bn_params(init_yolo_params())
    calib = letterbox_device_rect(frames[:16], 416)
    yolo = jax.device_put(quantize_yolo_params(
        folded, calibrate_yolo_activations(folded, calib)))
    calib_crops = jax.random.uniform(
        jax.random.PRNGKey(1), (8, 224, 224, 3), jnp.float32)
    quant_spin = jax.device_put(
        quantize_spin_backbone(est.variables, calib_crops))

    def build(det_s, pose_s, spin_q=False):
        return jax.jit(make_full_frame_step(
            cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
            quant_backbone=quant_spin if spin_q else None,
            fused_resample=True, det_stride=det_s, pose_stride=pose_s))

    # batch-512 variant of the max config: at det8/pose8 only B/8 frames
    # reach SPIN, and a 16-crop backbone batch underfills the MXU; 512
    # frames keep the anchor batch at 64 (HBM: 512 x 450x800x3 u8 = 553 MB
    # of frames, fine).
    B2 = 512
    frames_512 = jax.jit(
        lambda k: jax.random.randint(k, (B2, *FRAME_HW, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(2))
    bboxes_512 = jnp.asarray(
        np.tile(np.array([400.0, 225.0, 220.0, 220.0], np.float32), (B2, 1)))

    steps = {
        "det1/pose1": build(1, 1),
        "det1/pose8": build(1, 8),
        "det8/pose1": build(8, 1),
        "det8/pose2": build(8, 2),
        "det8/pose4": build(8, 4),
        "det8/pose8": build(8, 8),
        "det8/pose8/int8spin": build(8, 8, spin_q=True),
        "det8/pose8/int8spin/b512": build(8, 8, spin_q=True),
    }

    def args_for(name):
        if name.endswith("/b512"):
            return (yolo, spin_bf16, est.smpl_params, frames_512, bboxes_512,
                    info_reba, info_rula)
        return (yolo, spin_bf16, est.smpl_params, frames, bboxes,
                info_reba, info_rula)

    print(f"backend {jax.devices()[0].platform}; batch {B} (+{B2} variant); "
          f"full step (int8 detector, rect, bf16, fused resample), "
          f"interleaved", flush=True)
    for name, fn in steps.items():
        out = fn(*args_for(name))
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        float(acc)
        print(f"  compiled {name}", flush=True)

    times = {name: [] for name in steps}
    for _ in range(2):
        for name, fn in steps.items():
            times[name].append(one_pass(fn, args_for(name)))

    print("\n| config | ms / batch | fps/chip | vs det8/pose1 |")
    print("|---|---|---|---|")
    base = min(times["det8/pose1"])
    for name in steps:
        ms = min(times[name])
        n = B2 if name.endswith("/b512") else B
        print(f"| {name} | {ms:.2f} | {n / ms * 1000:.0f} | "
              f"{(base / B) / (ms / n):.2f}x |", flush=True)


if __name__ == "__main__":
    main()
