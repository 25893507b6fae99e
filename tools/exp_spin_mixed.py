"""A/B the mixed-stage int8 SPIN backbone configs on the product graph.

The per-stage roofline (tools/roofline_spin.py; docs/PERF.md round 3) shows
int8 pays only in the deep stages (layer3 1.74x, layer4 1.93x) while stages
1-2 are bandwidth/ceiling-bound (0.99x/1.04x). SpinConfig.int8_min_stage
exposes that boundary (models/resnet_int8.quantize_resnet50); this
experiment decides the default by measuring, on the PRODUCT pose step
(throughput.make_pose_and_score_step, batch 128, bf16 compute), both sides
of the trade per config:

  speed  ms / 128 crops, every config interleaved in ONE process (the
         measurement discipline of docs/PERF.md: cross-process comparisons
         are relay-jitter-dominated)
  drift  median |euler delta| vs the f32 backbone on the same crops -- the
         surface the integer-degree scoring thresholds live on

Configs: bf16 (no quant), int8 whole tower (min_stage=0), int8 deep-only
(min_stage=3), int8 last-stage (min_stage=4). All with PTQ bias correction
(the product default).

Usage: python tools/exp_spin_mixed.py
Run EXCLUSIVELY (single-tenant TPU; 5 remote compiles of the pose step:
bf16 + 3 int8 configs + the f32 drift reference).
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
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.spin import (
        cast_backbone_params,
        quantize_spin_backbone,
    )
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_pose_and_score_step,
    )

    cfg = default_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    spin_bf16 = jax.device_put(cast_backbone_params(est.variables))
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())

    # Crops generated on device (bulk uploads crawl at ~4 MB/s through the
    # relay); calibration uses a host copy of the first 8.
    crops = jax.jit(
        lambda k: jax.random.uniform(k, (B, 224, 224, 3), jnp.float32)
    )(jax.random.PRNGKey(0))
    calib = np.asarray(crops[:8])

    configs = {"int8-whole": 0, "int8-deep": 3, "int8-last": 4}
    qb = {
        name: jax.device_put(
            quantize_spin_backbone(est.variables, calib, min_stage=ms))
        for name, ms in configs.items()
    }

    steps = {"bf16": jax.jit(make_pose_and_score_step(
        cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16))}
    for name in configs:
        steps[name] = jax.jit(make_pose_and_score_step(
            cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
            quant_backbone=qb[name]))

    print(f"backend {jax.devices()[0].platform}; batch {B}; pose+score step, "
          f"interleaved", flush=True)

    # Drift reference: the f32 backbone on the same crops.
    step_f32 = jax.jit(make_pose_and_score_step(
        cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.float32))
    euler_ref = np.asarray(step_f32(
        est.variables, est.smpl_params, crops, info_reba, info_rula)[2])

    def run_args(name):
        variables = est.variables if name != "bf16" else spin_bf16
        return (variables, est.smpl_params, crops, info_reba, info_rula)

    drift = {}
    for name, fn in steps.items():
        out = fn(*run_args(name))
        _sync(out)
        drift[name] = float(np.median(np.abs(np.asarray(out[2]) - euler_ref)))
        print(f"  compiled {name}", flush=True)

    times = {name: [] for name in steps}
    for _ in range(2):
        for name, fn in steps.items():
            times[name].append(one_pass(fn, run_args(name)))

    print("\n| config | ms / 128 crops | fps/chip | vs bf16 | med |d euler| deg |")
    print("|---|---|---|---|---|")
    base = min(times["bf16"])
    for name in steps:
        ms = min(times[name])
        print(f"| {name} | {ms:.2f} | {B / ms * 1000:.0f} | "
              f"{base / ms:.2f}x | {drift[name]:.3f} |", flush=True)


if __name__ == "__main__":
    main()
