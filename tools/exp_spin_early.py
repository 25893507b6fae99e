"""Attack the SPIN early tower (stem + maxpool + 56x56 stage) in situ.

The round-3 roofline (tools/roofline_spin.py; docs/PERF.md) bounded the
56x56 stage at 31% MXU utilisation (bandwidth-bound) and left the
stem/maxpool/projections as unprofiled remainder. VERDICT r3 asks for the
detector playbook here: one in-situ A/B per candidate, interleaved in ONE
process on the PRODUCT pose+score step (batch 128, bf16 -- the bench
configuration's pose tower).

Candidates:
  * space-to-depth stem (models/resnet.StemConv s2d=True): the 7x7/s2
    stem conv computed as s2d(2) + 4x4/s1 with exactly rearranged
    weights -- 12 input channels instead of 3 per MXU pass, 16 taps over
    a quarter the positions. Zero numerics cost (same conv, different
    loop order).
  * maxpool pad-fusion: already adopted unconditionally (reduce_window
    padding instead of a materialised -inf pad; models/resnet.py) -- its
    effect is inside the baseline here, bounded by the r3->r4 baseline
    delta.
  * 56x56 stage in-situ chain slope: layers=(1,4,6,3) drops layer1's two
    shape-preserving blocks from the applied graph (their params simply
    go unused); (t_base - t_ablated)/2 is the true in-situ marginal cost
    per 56x56 block, the number a fused VMEM-resident bottleneck kernel
    would have to beat. Compare against the isolated chain-slope 0.903
    ms/block and the stage's bandwidth speed-of-light (~0.35 ms/block:
    3 body tensors x 56x56x256 x 2B read+write at 819 GB/s, batch 128).

Usage: python tools/exp_spin_early.py   (run EXCLUSIVELY on the TPU)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poserisk_release_tpu.utils.profiling import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(os.environ.get("EXP_B", "128"))
MEASURE = int(os.environ.get("EXP_MEASURE", "24"))


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
    import flax.linen as nn

    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.resnet import ResNet50
    from poserisk_release_tpu.models.spin import HMR, cast_backbone_params
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.scoring.reba import reba_frame_scores
    from poserisk_release_tpu.scoring.rula import rula_frame_scores
    from poserisk_release_tpu.throughput import (
        default_packed_infos,
        make_pose_and_score_step,
    )

    cfg = default_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    spin_bf16 = jax.device_put(cast_backbone_params(est.variables))
    info_reba, info_rula = map(jnp.asarray, default_packed_infos())
    crops = jax.jit(
        lambda k: jax.random.uniform(k, (B, 224, 224, 3), jnp.float32)
    )(jax.random.PRNGKey(0))

    steps = {
        "baseline": jax.jit(make_pose_and_score_step(
            cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16)),
        "s2d-stem": jax.jit(make_pose_and_score_step(
            cfg.SPIN.ief_iters, est.parents, compute_dtype=jnp.bfloat16,
            stem_s2d=True)),
    }

    # In-situ 56x56 chain slope: same product step, backbone applied with
    # layer1 truncated to its projection block (the two dropped blocks'
    # params are simply unused by flax apply).
    class HMRAblate(HMR):
        @nn.compact
        def __call__(self, x):
            from poserisk_release_tpu.models.spin import NPOSE, ief_head

            xf = ResNet50(layers=(1, 4, 6, 3), dtype=self.dtype,
                          name="backbone")(x)
            Bn = x.shape[0]
            init_pose = self.param("init_pose", nn.initializers.zeros, (1, NPOSE))
            init_shape = self.param("init_shape", nn.initializers.zeros, (1, 10))
            init_cam = self.param("init_cam", nn.initializers.zeros, (1, 3))
            modules = {
                "fc1": nn.Dense(1024, name="fc1"),
                "fc2": nn.Dense(1024, name="fc2"),
                "decpose": nn.Dense(NPOSE, name="decpose"),
                "decshape": nn.Dense(10, name="decshape"),
                "deccam": nn.Dense(3, name="deccam"),
            }
            return ief_head(
                lambda name, t: modules[name](t), xf,
                jnp.broadcast_to(init_pose, (Bn, NPOSE)),
                jnp.broadcast_to(init_shape, (Bn, 10)),
                jnp.broadcast_to(init_cam, (Bn, 3)), self.n_iter)

    ablate_model = HMRAblate(n_iter=cfg.SPIN.ief_iters, dtype=jnp.bfloat16)

    def ablated_step(variables, smpl_params, crops_in, ir, iu):
        # Mirror make_pose_and_score_step but with the truncated backbone.
        from poserisk_release_tpu.ops.lbs import joints_only
        from poserisk_release_tpu.ops.rotations import (
            rotmat_to_axis_angle,
            rotmat_to_euler_deg,
        )
        from poserisk_release_tpu.throughput import ROOT_POSE

        rotmat, _b, _c = ablate_model.apply(variables, crops_in)
        euler = rotmat_to_euler_deg(rotmat)
        aa = rotmat_to_axis_angle(rotmat)
        aa = aa.at[:, 0, :].set(jnp.asarray(ROOT_POSE, aa.dtype))
        joints = joints_only(smpl_params, aa.reshape(aa.shape[0], -1),
                             est.parents) * 1000.0
        jc = joints - joints[:, :1]
        return (reba_frame_scores(euler, ir)["score"],
                rula_frame_scores(euler, iu)["score"], euler, jc)

    steps["layer1-ablated(2blk)"] = jax.jit(ablated_step)

    args = (spin_bf16, est.smpl_params, crops, info_reba, info_rula)
    print(f"backend {jax.devices()[0].platform}; batch {B}; product "
          f"pose+score step, interleaved", flush=True)

    euler_base = None
    for name, fn in steps.items():
        out = fn(*args)
        e = np.asarray(out[2], np.float64)
        if name == "baseline":
            euler_base = e
            drift = 0.0
        else:
            drift = float(np.median(np.abs(e - euler_base)))
        print(f"  compiled {name} (med |d euler| vs baseline: {drift:.4f} deg)",
              flush=True)

    times = {name: [] for name in steps}
    for _ in range(3):
        for name, fn in steps.items():
            times[name].append(one_pass(fn, args))

    print("\n| config | ms / 128 crops | fps/chip | vs baseline |")
    print("|---|---|---|---|")
    base = min(times["baseline"])
    for name in steps:
        ms = min(times[name])
        print(f"| {name} | {ms:.2f} | {B / ms * 1000:.0f} | {base / ms:.2f}x |",
              flush=True)
    abl = min(times["layer1-ablated(2blk)"])
    print(f"\nin-situ 56x56 marginal cost: {(base - abl) / 2:.3f} ms/block "
          f"(isolated chain-slope was 0.903; bandwidth SoL ~0.35)", flush=True)


if __name__ == "__main__":
    main()
