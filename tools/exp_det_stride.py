"""A/B the detection-stride throughput mode on the product full-frame step.

DetectorConfig.detection_stride runs the detector on every Nth frame only
(SORT interpolates the skipped boxes on host -- tracking/mpt); on the fused
device step that removes (1 - 1/N) of the detector forward, which is ~70%
of the per-frame cost at the int8 ceiling (~29 of ~42 ms per 128 frames,
docs/PERF.md round 3). This measures the real step (throughput.
make_full_frame_step: letterbox + detect[::N] + crop + SPIN + scoring,
rect canvas, int8 detector, bf16 compute) at strides 1/2/4/8, interleaved
in ONE process per the measurement discipline in docs/PERF.md.

Usage: python tools/exp_det_stride.py
Run EXCLUSIVELY (single-tenant TPU; 4 remote compiles).
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
STRIDES = (1, 2, 4, 8)


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
    from poserisk_release_tpu.models.spin import cast_backbone_params
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

    # fused = the strided fused letterbox+crop kernel (letterbox computed
    # only on stride-multiple programs, one HBM pass over the frames);
    # unfused = separate letterbox(frames[::N]) + crop_batch(frames).
    steps = {}
    for s in STRIDES:
        steps[f"{s}/fused"] = jax.jit(make_full_frame_step(
            cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
            fused_resample=True, det_stride=s))
        if s > 1:
            steps[f"{s}/unfused"] = jax.jit(make_full_frame_step(
                cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
                fused_resample=False, det_stride=s))
    args = (yolo, spin_bf16, est.smpl_params, frames, bboxes,
            info_reba, info_rula)

    print(f"backend {jax.devices()[0].platform}; batch {B}; full step "
          f"(int8 detector, rect, bf16), interleaved", flush=True)
    for name, fn in steps.items():
        out = fn(*args)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        float(acc)
        print(f"  compiled {name} (det_best covers {out[2].shape[0]} frames)",
              flush=True)

    times = {name: [] for name in steps}
    for _ in range(2):
        for name, fn in steps.items():
            times[name].append(one_pass(fn, args))

    print("\n| det stride | ms / 128 frames | fps/chip | vs stride 1 |")
    print("|---|---|---|---|")
    base = min(times["1/fused"])
    for name in steps:
        ms = min(times[name])
        print(f"| {name} | {ms:.2f} | {B / ms * 1000:.0f} | {base / ms:.2f}x |",
              flush=True)


if __name__ == "__main__":
    main()
