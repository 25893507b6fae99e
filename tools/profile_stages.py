"""Reproducible per-stage profiler: regenerates docs/PERF.md's stage table.

Times every device stage of the pipeline in ONE process on the current
backend with the bench's measurement discipline (loop-inside-process,
best-of-two passes, device-side accumulation + one scalar readback as the
completion barrier -- jax.block_until_ready is a no-op through the remote
relay used in this environment, see utils/profiling.device_sync):

  letterbox (rect canvas)      ops.crop.letterbox_device_rect
  crop 224                     ops.crop.crop_batch
  fused letterbox+crop         ops.resample_pallas.fused_letterbox_crop
  crop 224 (pallas)            ops.resample_pallas.crop_batch_pallas
  YOLOv3 fwd (bf16)            models.detector.yolo_forward
  YOLOv3 fwd (int8 PTQ)        quantize_yolo_params + yolo_forward
  pose+score step (bf16)       throughput.make_pose_and_score_step
  FULL step (strides 1/1)      throughput.make_full_frame_step
  FULL step (det8/pose8)       the bench's default throughput config

Usage: python tools/profile_stages.py [batch]   (default 128; ~10 min of
remote compiles on first run). Prints a markdown table.

Run it EXCLUSIVELY: the TPU is single-tenant and the relay shares the
1-core host -- a concurrent pytest/bench process inflates stage timings
well beyond the relay's usual ~10% jitter (bandwidth-bound stages up to
~2x).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MEASURE = 24
FRAME_HW = (450, 800)


def _sync_expr(out):
    """Device-side accumulation over every output leaf (no readback)."""
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def timeit(fn, args, sync) -> float:
    sync(fn(*args))
    sync(fn(*args))

    def one_pass() -> float:
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(MEASURE)]
        acc = jnp.float32(0)
        for o in outs:
            acc = acc + _sync_expr(o)
        float(acc)
        return time.perf_counter() - t0

    return min(one_pass(), one_pass()) / MEASURE * 1000.0


def main() -> None:
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.detector import (
        calibrate_yolo_activations,
        fold_bn_params,
        init_yolo_params,
        quantize_yolo_params,
        yolo_forward,
    )
    from poserisk_release_tpu.models.spin import cast_backbone_params
    from poserisk_release_tpu.ops.crop import crop_batch, letterbox_device_rect
    from poserisk_release_tpu.ops.resample_pallas import (
        crop_batch_pallas,
        fused_letterbox_crop,
    )
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_full_frame_step,
        make_pose_and_score_step,
    )

    def sync(out):
        return float(_sync_expr(out))

    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, *FRAME_HW, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    bboxes = jnp.asarray(
        np.tile(np.array([400.0, 225.0, 220.0, 220.0], np.float32), (B, 1))
    )

    cfg = default_config()
    estimator = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    spin_bf16 = cast_backbone_params(estimator.variables)
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())

    folded = fold_bn_params(init_yolo_params())
    folded_bf16 = fold_bn_params(init_yolo_params(), jnp.bfloat16)
    letter_bf16 = jax.jit(
        lambda f: letterbox_device_rect(f, 416, compute_dtype=jnp.bfloat16)
    )(frames)
    qparams = jax.device_put(
        quantize_yolo_params(
            folded, calibrate_yolo_activations(folded, letter_bf16[:16].astype(jnp.float32))
        )
    )
    folded_bf16 = jax.device_put(folded_bf16)

    pose_step = jax.jit(
        make_pose_and_score_step(cfg.SPIN.ief_iters, estimator.parents, jnp.bfloat16)
    )
    full_step = jax.jit(
        make_full_frame_step(cfg.SPIN.ief_iters, estimator.parents,
                             compute_dtype=jnp.bfloat16, fused_resample=True)
    )
    # The bench's default throughput configuration (det stride 8 + pose
    # stride 8, docs/PERF.md round 3) next to the strict strides-1 contract.
    full_step_strided = jax.jit(
        make_full_frame_step(cfg.SPIN.ief_iters, estimator.parents,
                             compute_dtype=jnp.bfloat16, fused_resample=True,
                             det_stride=8, pose_stride=8)
    )

    rows = []

    def add(label, fn, args):
        ms = timeit(fn, args, sync)
        rows.append((label, ms))
        print(f"  {label}: {ms:.2f} ms / {B} frames", flush=True)

    print(f"profiling on {jax.devices()[0].platform}, batch {B}", flush=True)
    add("letterbox rect (bf16)",
        jax.jit(lambda f: letterbox_device_rect(f, 416, compute_dtype=jnp.bfloat16)),
        (frames,))
    add("crop 224 (bf16 jnp)",
        jax.jit(lambda f, b: crop_batch(f, b, scale=1.2, out_size=224,
                                        compute_dtype=jnp.bfloat16)),
        (frames, bboxes))
    add("fused letterbox+crop (pallas)",
        jax.jit(lambda f, b: fused_letterbox_crop(f, b, compute_dtype=jnp.bfloat16)),
        (frames, bboxes))
    add("crop 224 (pallas)",
        jax.jit(lambda f, b: crop_batch_pallas(f, b, compute_dtype=jnp.bfloat16)),
        (frames, bboxes))
    add("YOLOv3 fwd rect (bf16)",
        jax.jit(lambda p, x: yolo_forward(p, x, 416, compute_dtype=jnp.bfloat16)),
        (folded_bf16, letter_bf16))
    add("YOLOv3 fwd rect (int8)",
        jax.jit(lambda p, x: yolo_forward(p, x, 416, compute_dtype=jnp.bfloat16)),
        (qparams, letter_bf16))
    crops = jax.jit(
        lambda f, b: crop_batch(f, b, scale=1.2, out_size=224,
                                compute_dtype=jnp.float32)
    )(frames, bboxes)
    add("pose+score step (bf16)", pose_step,
        (spin_bf16, estimator.smpl_params, crops, info_reba, info_rula))
    add("FULL step (strict strides 1/1)", full_step,
        (qparams, spin_bf16, estimator.smpl_params, frames, bboxes,
         info_reba, info_rula))
    add("FULL step (bench default det8/pose8)", full_step_strided,
        (qparams, spin_bf16, estimator.smpl_params, frames, bboxes,
         info_reba, info_rula))

    print("\n| stage | ms / %d frames | fps |" % B)
    print("|---|---|---|")
    for label, ms in rows:
        print(f"| {label} | {ms:.2f} | {B / ms * 1000:.0f} |")

    # Serving latency: per-step time of the FULL graph at small batches,
    # measured with the loop INSIDE one jit (lax.fori_loop threading the
    # step output back into the input signal) -- the only formulation whose
    # small-batch numbers reflect the chip rather than the relay's
    # 10-100 ms per-dispatch round trip. The loop index perturbs the frames
    # so XLA cannot hoist the body out of the loop.
    STEPS = 16
    # Two configs side by side (docs/PERF.md serving table): the fast
    # benchmark config AND the strict-parity f32 Predictor default, so the
    # product-default number is always published next to the headline.
    full_step_f32 = jax.jit(
        make_full_frame_step(cfg.SPIN.ief_iters, estimator.parents,
                             compute_dtype=jnp.float32, fused_resample=False)
    )
    serving_cfgs = [
        ("fast (bf16+int8+fused)", full_step, qparams, spin_bf16),
        ("strict f32 default", full_step_f32, jax.device_put(folded),
         estimator.variables),
    ]
    print("\n| serving latency (full step, loop-in-jit) | "
          + " | ".join(name for name, *_ in serving_cfgs) + " |")
    print("|" + "---|" * (len(serving_cfgs) + 1))
    for b in (1, 8, 32):
        if b > B:
            print(f"| batch {b} | (skipped: tool batch arg is {B}) |")
            continue
        fr = frames[:b]
        bb = bboxes[:b]
        cols = []
        for _name, step_fn, yp, sv in serving_cfgs:

            def looped(fr, bb, qp, sv, sp, ir, iu, step_fn=step_fn):
                # params enter as arguments (not jit-captured constants)
                def body(i, acc):
                    f = fr + i.astype(jnp.uint8)  # wraps mod 256; breaks hoisting
                    reba, rula, det = step_fn(qp, sv, sp, f, bb, ir, iu)
                    # Consume EVERY output: dropping rula would let XLA
                    # dead-code-eliminate the RULA scoring chain from the
                    # loop graph and under-report the step's latency.
                    return acc + jnp.sum(reba) + jnp.sum(rula) + jnp.sum(det)
                return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))

            fn = jax.jit(looped)
            args = (fr, bb, yp, sv, estimator.smpl_params,
                    info_reba, info_rula)

            def fn_call():
                return fn(*args)

            float(fn_call())  # compile + warm

            def one() -> float:
                t0 = time.perf_counter()
                float(fn_call())
                return time.perf_counter() - t0

            cols.append(min(one(), one()) / STEPS * 1000)
        print(f"| batch {b} | " + " | ".join(f"{ms:.2f}" for ms in cols) + " |",
              flush=True)


if __name__ == "__main__":
    main()
