"""SPIN human-mesh regressor (HMR): ResNet-50 + iterative-error-feedback head.

TPU-native rebuild of the external SPIN model the reference constructs and
queries at /root/reference/lib/core/base.py:81-84, 220 (contract in SURVEY.md
section 2.10): input (B, 224, 224, 3) floats in [0, 1] (the reference applies
NO ImageNet normalisation), output (pred_rotmat (B, 24, 3, 3), pred_betas
(B, 10), pred_camera (B, 3)).

Architecture (nkolot/SPIN models/hmr.py behavioural spec):
  * ResNet-50 -> 2048-d pooled feature xf;
  * regressor state (pose 24x6 rot6d, shape 10, cam 3) initialised from
    smpl_mean_params.npz;
  * n_iter=3 refinement steps: xc = [xf, pose, shape, cam] -> fc1(1024) ->
    fc2(1024) -> three linear heads added residually to the state
    (dropout layers are identity at inference);
  * rot6d -> rotation matrices via Gram-Schmidt (ops.rotations.rot6d_to_rotmat).

The IEF loop is unrolled (n_iter is a compile-time constant), so the whole
model is one XLA graph; batch dimension shards across the device mesh.
"""

from __future__ import annotations

import os.path as osp
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from poserisk_release_tpu.models.resnet import ResNet50
from poserisk_release_tpu.ops.rotations import rot6d_to_rotmat

NPOSE = 24 * 6


def ief_head(dense, xf, pred_pose, pred_shape, pred_cam, n_iter):
    """THE single IEF-head definition (SPIN hmr.py:66-90 semantics).

    `dense(name, t)` abstracts the layer application so the flax module
    path (HMR.__call__) and the raw-weight int8 path (hmr_forward_quant)
    share one loop -- a head change cannot desynchronise them (same policy
    as throughput.make_pose_core). SPIN's regressor applies
    fc1 -> dropout -> fc2 -> dropout with NO activations; dropout is
    identity at inference. Inputs are the already-broadcast (B, .) initial
    states; returns (rotmat (B,24,3,3), betas (B,10), camera (B,3))."""
    B = xf.shape[0]
    for _ in range(n_iter):
        xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam], axis=1)
        xc = dense("fc2", dense("fc1", xc))
        pred_pose = dense("decpose", xc) + pred_pose
        pred_shape = dense("decshape", xc) + pred_shape
        pred_cam = dense("deccam", xc) + pred_cam
    rotmat = rot6d_to_rotmat(pred_pose.reshape(B * 24, 6)).reshape(B, 24, 3, 3)
    return rotmat, pred_shape, pred_cam


class HMR(nn.Module):
    """SPIN regressor. __call__ returns (rotmat, betas, camera).

    `dtype` selects the backbone computation precision (bfloat16 for the TPU
    fast path); the IEF head and rot6d decode always run in float32.
    """

    n_iter: int = 3
    dtype: jnp.dtype = jnp.float32
    # remat=True rematerialises the backbone activations in the backward
    # pass (jax.checkpoint via nn.remat) -- trades ~1/3 more FLOPs for the
    # activation memory of 53 conv layers; the training-step default.
    remat: bool = False
    # Space-to-depth stem layout (models/resnet.StemConv): same weights
    # and outputs, different conv loop order for the MXU.
    stem_s2d: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = x.shape[0]
        backbone_cls = nn.remat(ResNet50) if self.remat else ResNet50
        xf = backbone_cls(dtype=self.dtype, stem_s2d=self.stem_s2d,
                          name="backbone")(x)

        init_pose = self.param("init_pose", nn.initializers.zeros, (1, NPOSE))
        init_shape = self.param("init_shape", nn.initializers.zeros, (1, 10))
        init_cam = self.param("init_cam", nn.initializers.zeros, (1, 3))

        pred_pose = jnp.broadcast_to(init_pose, (B, NPOSE))
        pred_shape = jnp.broadcast_to(init_shape, (B, 10))
        pred_cam = jnp.broadcast_to(init_cam, (B, 3))

        modules = {
            "fc1": nn.Dense(1024, name="fc1"),
            "fc2": nn.Dense(1024, name="fc2"),
            "decpose": nn.Dense(NPOSE, name="decpose"),
            "decshape": nn.Dense(10, name="decshape"),
            "deccam": nn.Dense(3, name="deccam"),
        }
        return ief_head(lambda name, t: modules[name](t), xf,
                        pred_pose, pred_shape, pred_cam, self.n_iter)


def hmr_forward_quant(qbackbone: dict, variables: dict, x: jnp.ndarray,
                      n_iter: int = 3, compute_dtype=jnp.bfloat16):
    """HMR forward with the int8-PTQ backbone (models/resnet_int8).

    Identical IEF head math to HMR.__call__ (weights read straight from the
    Flax variables; the head always runs f32); only the ResNet feature
    extractor goes through the folded/quantized functional path. Returns
    (rotmat, betas, camera) like HMR.apply."""
    from poserisk_release_tpu.models.resnet_int8 import resnet50_forward

    B = x.shape[0]
    p = variables["params"]
    xf = resnet50_forward(qbackbone, x, compute_dtype)

    pred_pose = jnp.broadcast_to(jnp.asarray(p["init_pose"]), (B, NPOSE))
    pred_shape = jnp.broadcast_to(jnp.asarray(p["init_shape"]), (B, 10))
    pred_cam = jnp.broadcast_to(jnp.asarray(p["init_cam"]), (B, 3))

    def dense(name, t):
        return t @ jnp.asarray(p[name]["kernel"], jnp.float32) + jnp.asarray(
            p[name]["bias"], jnp.float32
        )

    return ief_head(dense, xf, pred_pose, pred_shape, pred_cam, n_iter)


def quantize_spin_backbone(variables: dict, sample_crops,
                           percentile: float | None = None,
                           bias_correct: bool = True,
                           min_stage: int = 0) -> dict:
    """Fold + calibrate + quantize the SPIN backbone in one step.

    sample_crops: a small representative (N, 224, 224, 3) [0,1] batch.
    percentile: activation-scale calibration. None (default) = absmax.
    A high percentile (99.9-99.999) enables saturating PTQ -- the standard
    remedy for trained networks whose outlier activations stretch the int8
    grid. On this image's random-init weights it measures NEUTRAL (gaussian
    activations have no outlier tail: absmax median drift 0.289 deg vs
    p99.999's 0.289), so absmax stays the default until real weights can be
    measured (models/resnet_int8.calibrate_resnet50).
    min_stage (default 0 = whole backbone) quantizes only residual stages
    >= min_stage; min_stage=3 is the accuracy-preferable mixed config (the
    per-stage roofline shows int8 pays only at 14x14/7x7 -- see
    resnet_int8.quantize_resnet50).
    bias_correct (default True) folds the expected per-channel quantization
    error on the calibration batch into the biases -- free at runtime and
    HALVES the drift (median angle drift 0.314 -> 0.167 deg, feature MAE
    2.6x lower, measured on this image's random weights;
    resnet_int8.bias_correct_resnet50)."""
    from poserisk_release_tpu.models.resnet_int8 import (
        bias_correct_resnet50,
        calibrate_resnet50,
        fold_resnet50_params,
        quantize_resnet50,
    )

    folded = fold_resnet50_params(variables)
    scales = calibrate_resnet50(folded, sample_crops, percentile=percentile)
    q = quantize_resnet50(folded, scales, min_stage=min_stage)
    if bias_correct:
        q = bias_correct_resnet50(folded, q, sample_crops)
    return q


def load_mean_params(path: str) -> dict:
    """smpl_mean_params.npz -> {init_pose (1,144), init_shape (1,10), init_cam (1,3)}.

    Falls back to a deterministic synthetic set (neutral-ish rot6d identity
    blocks) when the asset is absent, keeping every flow runnable.
    """
    if path and osp.isfile(path):
        with np.load(path) as data:
            return {
                "init_pose": data["pose"].astype(np.float32).reshape(1, NPOSE),
                "init_shape": data["shape"].astype(np.float32).reshape(1, 10),
                "init_cam": data["cam"].astype(np.float32).reshape(1, 3),
            }
    # Identity rotation in 6D. rot6d_to_rotmat reshapes the 6 values to
    # (3, 2) row-major and reads COLUMNS: a1 = (v0, v2, v4), a2 = (v1, v3,
    # v5). Identity needs a1 = (1,0,0), a2 = (0,1,0) -> flat (1,0,0,1,0,0).
    # (The previous (1,0,0,0,1,0) interleaving decoded to a rank-1 det-0
    # matrix, seeding every asset-free IEF run at a degenerate non-rotation.)
    ident6 = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24)
    return {
        "init_pose": ident6.reshape(1, NPOSE),
        "init_shape": np.zeros((1, 10), np.float32),
        "init_cam": np.array([[0.9, 0.0, 0.0]], np.float32),
    }


def cast_backbone_params(variables: dict, dtype=jnp.bfloat16) -> dict:
    """Store the ResNet backbone's params/stats in the compute dtype.

    With f32-stored params and a bf16-computing backbone, XLA re-casts all
    ~25 MB of weights every step; pre-casting once measured 54 -> 12.8 ms for
    the full pose+score step at batch 128 with ZERO score changes. The IEF
    head and regressor state stay f32.
    """
    import jax

    def cast(tree):
        return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)

    params = dict(variables["params"])
    if "backbone" in params:
        params["backbone"] = cast(params["backbone"])
    out = {"params": params}
    stats = dict(variables.get("batch_stats", {}))
    if stats:
        if "backbone" in stats:
            stats["backbone"] = cast(stats["backbone"])
        out["batch_stats"] = stats
    return out


def init_spin_params(rng_key, mean_params: dict, n_iter: int = 3):
    """Random-init HMR params with the mean-params state injected."""
    import jax

    model = HMR(n_iter=n_iter)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(rng_key, dummy)
    params = variables["params"]
    params = dict(params)
    for key in ("init_pose", "init_shape", "init_cam"):
        params[key] = jnp.asarray(mean_params[key])
    variables = dict(variables)
    variables["params"] = params
    return variables
