"""Pipeline parallelism: the HMR forward as a microbatched `stage` pipeline.

The GPipe-style schedule, written the TPU way (shard_map over a ``stage``
mesh axis + `lax.ppermute` hops + one `lax.scan` over ticks — the
scaling-book recipe), over the natural 4-way split of the SPIN regressor:

  stage 0: stem conv + bn + maxpool + layer1   (ResNet-50 stage 1)
  stage 1: layer2
  stage 2: layer3
  stage 3: layer4 + global pool + IEF head  -> (rotmat, betas, cam)

Each stage is a Flax module built from the SAME classes as models/resnet.
ResNet50 (StemConv / nn.BatchNorm / Bottleneck) with the SAME submodule
names, applied to the shared backbone subtree — so stage numerics are
*identical* to the monolithic HMR.apply, not a reimplementation. Stage
activations have different shapes, so the inter-stage carry is one
fixed-size f32 buffer (the max flattened activation); each device
`lax.switch`-es into its own stage, reshapes, computes, and re-flattens.

Schedule: with S stages and M microbatches, the scan runs S+M-1 ticks;
device s processes microbatch t-s at tick t (bubble ticks compute on a
zero buffer and are masked out). The last stage accumulates its outputs
and a final masked psum over ``stage`` replicates them.

Parameter placement: stage trees are shape-heterogeneous, so they enter
the shard_map replicated (`P()`); what this module validates is the
pipeline *schedule* — the ppermute hand-offs, the bubble masking, and the
stage split's numerical parity (tests/test_parallelism.py). A deployment
would additionally device_put each stage subtree onto its stage row;
that placement is orthogonal to the compiled schedule.

The reference has no model-parallel story at all (single GPU, SURVEY.md
section 2); this is a TPU-native extension for scaling the pose tower
past one chip's HBM/compute.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from poserisk_release_tpu.models.resnet import BN_EPS, Bottleneck, StemConv
from poserisk_release_tpu.models.spin import NPOSE, ief_head

STAGE_AXIS = "stage"
_LAYERS = (3, 4, 6, 3)
_PLANES = (64, 128, 256, 512)
# flattened (rotmat 24*9, betas 10, cam 3) per sample
_OUT_F = 24 * 9 + 10 + 3


class _Stage0(nn.Module):
    """stem + bn1 + relu + maxpool + layer1 (names mirror ResNet50)."""

    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = StemConv(64, dtype=self.dtype, s2d=self.stem_s2d, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for block in range(_LAYERS[0]):
            x = Bottleneck(planes=_PLANES[0], stride=1,
                           has_downsample=(block == 0), dtype=self.dtype,
                           name=f"layer1_{block}")(x)
        return x


class _StageMid(nn.Module):
    """One residual stage (layer2/layer3/layer4), stride-2 entry block."""

    stage: int  # 2, 3, or 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for block in range(_LAYERS[self.stage - 1]):
            x = Bottleneck(planes=_PLANES[self.stage - 1],
                           stride=2 if block == 0 else 1,
                           has_downsample=(block == 0), dtype=self.dtype,
                           name=f"layer{self.stage}_{block}")(x)
        return x


def _backbone_vars(variables: Dict) -> Dict:
    out = {"params": variables["params"]["backbone"]}
    stats = variables.get("batch_stats", {}).get("backbone")
    if stats:
        out["batch_stats"] = stats
    return out


def _head(variables: Dict, xf: jnp.ndarray, n_iter: int):
    """IEF head on pooled features, reading weights straight from the tree
    (same dense math as flax nn.Dense; shared loop via spin.ief_head)."""
    p = variables["params"]
    B = xf.shape[0]
    pose = jnp.broadcast_to(jnp.asarray(p["init_pose"]), (B, NPOSE))
    shape = jnp.broadcast_to(jnp.asarray(p["init_shape"]), (B, 10))
    cam = jnp.broadcast_to(jnp.asarray(p["init_cam"]), (B, 3))

    def dense(name, t):
        return t @ jnp.asarray(p[name]["kernel"]) + jnp.asarray(p[name]["bias"])

    return ief_head(dense, xf, pose, shape, cam, n_iter)


def hmr_stage_shapes(hw: int) -> Tuple[Tuple[int, int, int], ...]:
    """Per-stage input (H, W, C) for square hw-pixel crops (hw % 32 == 0)."""
    q = hw // 4  # stem /2 + maxpool /2
    return (
        (hw, hw, 3),
        (q, q, 256),
        (q // 2, q // 2, 512),
        (q // 4, q // 4, 1024),
    )


def make_hmr_pipeline(mesh: Mesh, hw: int, microbatch: int,
                      n_microbatches: int, n_iter: int = 3,
                      compute_dtype=jnp.float32, stem_s2d: bool = False,
                      data_axis: str | None = None):
    """Build the pipelined HMR forward over mesh axis ``stage`` (size 4).

    Returns fn(variables, crops) -> (rotmat, betas, cam) for crops of shape
    (n_microbatches * microbatch, hw, hw, 3) [per data shard when data_axis
    is set]. Jit-ready: shard_map over the stage (and optional data) axis.
    """
    S = mesh.shape[STAGE_AXIS]
    if S != 4:
        raise ValueError(f"HMR pipeline is a 4-stage split, stage axis = {S}")
    M = n_microbatches
    m = microbatch
    shapes = hmr_stage_shapes(hw)
    flat_sizes = [m * int(np.prod(s)) for s in shapes]
    buff = max(max(flat_sizes), m * _OUT_F)

    stage0 = _Stage0(dtype=compute_dtype, stem_s2d=stem_s2d)
    stage_mods = [stage0] + [_StageMid(stage=i, dtype=compute_dtype)
                             for i in (2, 3)]

    def run_stage(i, v, flat):
        x = flat[: flat_sizes[i]].reshape((m,) + shapes[i])
        bvars = _backbone_vars(v)
        if i < 3:
            y = stage_mods[i].apply(bvars, x)
            out = y.astype(jnp.float32).reshape(-1)
        else:
            y = _StageMid(stage=4, dtype=compute_dtype).apply(bvars, x)
            xf = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            rotmat, betas, cam = _head(v, xf, n_iter)
            out = jnp.concatenate(
                [rotmat.reshape(m, -1), betas, cam], axis=1).reshape(-1)
        return jnp.zeros((buff,), jnp.float32).at[: out.shape[0]].set(out)

    perm = [(i, i + 1) for i in range(S - 1)]

    def pipelined(v, crops):
        s = lax.axis_index(STAGE_AXIS)

        def tick(carry, t):
            buf, out = carry
            mb = lax.dynamic_slice_in_dim(
                crops, jnp.minimum(t, M - 1) * m, m, 0)
            fresh = jnp.zeros((buff,), jnp.float32
                              ).at[: flat_sizes[0]].set(mb.reshape(-1))
            x = jnp.where(s == 0, fresh, buf)
            y = lax.switch(s, [lambda f, i=i: run_stage(i, v, f)
                               for i in range(S)], x)
            # last stage: bank microbatch t-(S-1) when it is a real one
            j = t - (S - 1)
            write = jnp.logical_and(s == S - 1,
                                    jnp.logical_and(j >= 0, j < M))
            upd = lax.dynamic_update_slice_in_dim(
                out, y[: m * _OUT_F].reshape(m, _OUT_F),
                jnp.clip(j, 0, M - 1) * m, 0)
            out = jnp.where(write, upd, out)
            buf = lax.ppermute(y, STAGE_AXIS, perm)
            return (buf, out), None

        init = (jnp.zeros((buff,), jnp.float32),
                jnp.zeros((M * m, _OUT_F), jnp.float32))
        (_, out), _ = lax.scan(tick, init, jnp.arange(M + S - 1))
        # replicate the last stage's bank across the stage axis
        out = lax.psum(jnp.where(s == S - 1, out, 0.0), STAGE_AXIS)
        B = M * m
        return (out[:, : 24 * 9].reshape(B, 24, 3, 3),
                out[:, 24 * 9: 24 * 9 + 10], out[:, -3:])

    if data_axis is None:
        in_specs = (P(), P(None, None, None, None))
        out_specs = (P(None, None, None, None), P(None, None), P(None, None))
    else:
        in_specs = (P(), P(data_axis, None, None, None))
        out_specs = (P(data_axis, None, None, None),
                     P(data_axis, None), P(data_axis, None))
    return shard_map(pipelined, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)
