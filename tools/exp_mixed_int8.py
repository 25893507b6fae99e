"""A/B the round-3 mixed-precision / q8-handoff detector configs on TPU.

The per-layer roofline (docs/PERF.md round 3; tools/roofline_detector.py)
predicted: (a) quantizing layers above downsample factor 8 LOSES time (the
early activation tensors are too large to quantize profitably), (b) q8
handoff -- sole-consumer quantized convs emitting the next conv's int8
input directly -- halves inter-layer HBM traffic, which IS the measured
"glue share". This experiment validates both on the product graph
(models.detector.yolo_forward, rect 288x416 canvas, batch 128, bf16
compute), interleaved in ONE process per the measurement discipline in
docs/PERF.md (cross-process comparisons are relay-jitter-dominated).

Configs:
  full     int8 whole tower (round-2 product config: min_downsample=1, no q8)
  mixed    int8 only at factor >= 8 (early tower bf16)
  mixed+q8 the round-3 default (mixed + q8 handoff)
  bf16     no quantization (context)
Plus the FULL bench step (detector + letterbox/crop + SPIN + scoring) with
the old vs new qparams.

Usage: python tools/exp_mixed_int8.py [--skip-full-step]
Run EXCLUSIVELY (single-tenant TPU).
"""
from __future__ import annotations

import argparse
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


def _sync(out) -> float:
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return float(acc)


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-full-step", action="store_true")
    args = ap.parse_args()

    from poserisk_release_tpu.models.detector import (
        calibrate_yolo_activations,
        fold_bn_params,
        init_yolo_params,
        quantize_yolo_params,
        yolo_forward,
    )
    from poserisk_release_tpu.ops.crop import letterbox_device_rect

    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, *FRAME_HW, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    letter_bf16 = jax.jit(
        lambda f: letterbox_device_rect(f, 416, compute_dtype=jnp.bfloat16)
    )(frames)

    folded = fold_bn_params(init_yolo_params())
    scales = calibrate_yolo_activations(
        folded, letter_bf16[:16].astype(jnp.float32))
    configs = {
        "full": dict(min_downsample=1, q8_handoff=False),
        "mixed": dict(min_downsample=8, q8_handoff=False),
        "mixed+q8": dict(min_downsample=8, q8_handoff=True),
    }
    qp = {
        name: jax.device_put(quantize_yolo_params(folded, scales, **kw))
        for name, kw in configs.items()
    }
    folded_bf16 = jax.device_put(fold_bn_params(init_yolo_params(), jnp.bfloat16))

    fwd = jax.jit(lambda p, x: yolo_forward(p, x, 416, compute_dtype=jnp.bfloat16))
    runs = [(name, qp[name]) for name in configs] + [("bf16", folded_bf16)]

    print(f"backend {jax.devices()[0].platform}; batch {B}; rect canvas; "
          f"detector forward, interleaved", flush=True)
    # Warm every variant first (compiles), then interleave two measurement
    # rounds so relay drift hits all configs equally.
    for name, p in runs:
        _sync(fwd(p, letter_bf16))
        print(f"  compiled {name}", flush=True)
    times = {name: [] for name, _ in runs}
    for _ in range(2):
        for name, p in runs:
            times[name].append(one_pass(fwd, (p, letter_bf16)))
    print("\n| config | ms / 128 frames | vs full |")
    print("|---|---|---|")
    base = min(times["full"])
    for name, _ in runs:
        ms = min(times[name])
        print(f"| {name} | {ms:.2f} | {base / ms:.2f}x |", flush=True)

    if args.skip_full_step:
        return

    # FULL bench step, old vs new qparams.
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.spin import cast_backbone_params
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_full_frame_step,
    )

    cfg = default_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    spin_bf16 = cast_backbone_params(est.variables)
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())
    bboxes = jnp.asarray(
        np.tile(np.array([400.0, 225.0, 220.0, 220.0], np.float32), (B, 1)))
    step = jax.jit(make_full_frame_step(
        cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
        fused_resample=True))
    full_runs = [("step/full-int8", qp["full"]), ("step/mixed+q8", qp["mixed+q8"])]
    for name, p in full_runs:
        _sync(step(p, spin_bf16, est.smpl_params, frames, bboxes,
                   info_reba, info_rula))
        print(f"  compiled {name}", flush=True)
    stimes = {name: [] for name, _ in full_runs}
    for _ in range(2):
        for name, p in full_runs:
            stimes[name].append(one_pass(
                step, (p, spin_bf16, est.smpl_params, frames, bboxes,
                       info_reba, info_rula)))
    print("\n| full step | ms / 128 frames | fps/chip |")
    print("|---|---|---|")
    for name, _ in full_runs:
        ms = min(stimes[name])
        print(f"| {name} | {ms:.2f} | {B / ms * 1000:.0f} |", flush=True)


if __name__ == "__main__":
    main()
