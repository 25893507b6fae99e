"""Fused whole-clip device graphs for benchmarking and mesh dry-runs.

This is the "long-video throughput mode" (BASELINE.json config 5): the
per-frame compute path -- detector forward, crop, SPIN, rotation conversions,
SMPL joints, REBA+RULA scoring -- expressed as ONE jit graph over a frame
batch, with the batch axis sharded across the device mesh. The host only
does video decode and SORT association between the two device stages.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from poserisk_release_tpu.models.spin import HMR
from poserisk_release_tpu.ops.crop import crop_batch
from poserisk_release_tpu.ops.lbs import joints_only
from poserisk_release_tpu.ops.rotations import rotmat_to_axis_angle, rotmat_to_euler_deg
from poserisk_release_tpu.scoring.reba import reba_frame_scores
from poserisk_release_tpu.scoring.rula import rula_frame_scores

ROOT_POSE = (3.14, 0.0, 0.0)


def make_pose_core(n_iter: int, parents: Tuple[int, ...], compute_dtype=jnp.float32,
                   quant_backbone: Dict | None = None, pose_stride: int = 1,
                   stem_s2d: bool = False, spin_forward_override=None,
                   expert_joints=None):
    """THE pose step shared by the product pipeline and the fused bench graph
    (one definition so the subtle ordering can't desynchronise): SPIN forward
    -> Euler from the ORIGINAL rotmats -> axis-angle with the root forced to
    ROOT_POSE (the reference mutates its buffer in place, coord_utils.py:12-13)
    -> SMPL joints in mm, root-centered.

    quant_backbone: int8-PTQ backbone params (models.spin.quantize_spin_
    backbone) -- routes the ResNet through the s8 MXU path; the IEF head and
    everything downstream are unchanged.

    pose_stride > 1 is the pose-stride throughput mode (SpinConfig.
    pose_stride): `crops` are the ANCHOR crops (every pose_stride-th frame
    of the clip) and SPIN runs only on them; the intermediate frames' 24
    joint rotations are geodesically interpolated between the surrounding
    anchors on device (ops.rotations.slerp_rotmat -- anchors sit at t == 0,
    so anchor poses are bit-exact vs stride 1), and Euler/axis-angle/joints/
    scoring still cover every frame. Frames after the LAST anchor hold its
    pose (the next anchor lives in the next chunk). Deviation bounds:
    docs/PARITY.md.

    spin_forward_override: alternate fn(spin_variables, crops) ->
    (rotmat, betas, cam) replacing the monolithic HMR.apply -- the
    pipeline-parallel hook (parallel.pipeline builds a GPipe-scheduled
    forward over the ``stage`` mesh axis whose spin_variables are the
    stage-sharded parameter buffer, not the HMR tree). Mutually exclusive
    with quant_backbone.

    expert_joints: alternate joints computation for expert parallelism
    (parallel.expert.make_expert_joints): when set, ``smpl_params`` is the
    STACKED gendered tree plus a scalar int32 leaf ``gender_id`` selecting
    this batch's expert, and joints come from the dense-dispatch routed
    shard_map (numerics per expert are exactly joints_only_from_rotmats --
    the same function the default path reduces to).

    Returns core(spin_variables, smpl_params, crops) ->
    (euler_deg (B, 24, 3), joint_cam_mm (B, 24, 3), aa_forced (B, 24, 3)),
    where B = crops.shape[0] * pose_stride.
    """
    if pose_stride < 1:
        raise ValueError(f"pose_stride must be >= 1, got {pose_stride}")
    if spin_forward_override is not None and quant_backbone is not None:
        raise ValueError(
            "spin_forward_override (pipeline parallelism) and quant_backbone "
            "(int8 SPIN) are mutually exclusive")
    # stem_s2d: space-to-depth stem layout (models/resnet.StemConv) --
    # same weights/outputs, measured A/B in docs/PERF.md round 4. Applies
    # to the float/bf16 tower; the int8 path keeps its own raw-weight stem.
    model = None if spin_forward_override is not None else HMR(
        n_iter=n_iter, dtype=compute_dtype, stem_s2d=stem_s2d)

    def spin_forward(spin_variables, crops):
        if spin_forward_override is not None:
            return spin_forward_override(spin_variables, crops)
        if quant_backbone is not None:
            from poserisk_release_tpu.models.spin import hmr_forward_quant

            return hmr_forward_quant(
                quant_backbone, spin_variables, crops, n_iter, compute_dtype
            )
        return model.apply(spin_variables, crops)

    def core(spin_variables, smpl_params, crops):
        rotmat, _betas, _cam = spin_forward(spin_variables, crops)
        if pose_stride > 1:
            from poserisk_release_tpu.ops.rotations import slerp_rotmat

            anchors = rotmat.shape[0]
            n_frames = anchors * pose_stride
            grp = jnp.arange(n_frames) // pose_stride
            t = (jnp.arange(n_frames) % pose_stride).astype(jnp.float32)
            rotmat = slerp_rotmat(
                rotmat[grp],
                rotmat[jnp.minimum(grp + 1, anchors - 1)],
                (t / pose_stride)[:, None, None],
            )
        euler = rotmat_to_euler_deg(rotmat)
        aa = rotmat_to_axis_angle(rotmat)
        aa_forced = aa.at[:, 0, :].set(jnp.asarray(ROOT_POSE, aa.dtype))
        if expert_joints is None:
            joints = joints_only(
                smpl_params, aa_forced.reshape(aa.shape[0], -1), parents)
        else:
            from poserisk_release_tpu.ops.rotations import axis_angle_to_rotmat_smpl

            stacked = {k: v for k, v in smpl_params.items() if k != "gender_id"}
            gids = jnp.broadcast_to(
                jnp.asarray(smpl_params["gender_id"], jnp.int32),
                (aa_forced.shape[0],))
            joints = expert_joints(
                stacked, axis_angle_to_rotmat_smpl(aa_forced), gids)
        joints = joints * 1000.0
        joint_cam = joints - joints[:, :1]
        return euler, joint_cam, aa_forced

    return core


def make_pose_and_score_step(n_iter: int, parents: Tuple[int, ...],
                             compute_dtype=jnp.float32,
                             quant_backbone: Dict | None = None,
                             pose_stride: int = 1, stem_s2d: bool = False):
    """Returns step(spin_variables, smpl_params, crops, info_reba, info_rula)
    -> (reba_scores, rula_scores, euler_deg, joint_cam_mm). Jittable; the
    crops batch axis is the sharding axis. compute_dtype=bfloat16 selects the
    MXU-native backbone fast path (rotations/scoring stay f32). With
    pose_stride > 1 `crops` are anchor crops and every output covers
    crops.shape[0] * pose_stride frames (see make_pose_core)."""

    core = make_pose_core(n_iter, parents, compute_dtype, quant_backbone,
                          pose_stride=pose_stride, stem_s2d=stem_s2d)

    def step(spin_variables, smpl_params, crops, info_reba, info_rula):
        euler, joint_cam, _aa = core(spin_variables, smpl_params, crops)
        reba = reba_frame_scores(euler, info_reba)["score"]
        rula = rula_frame_scores(euler, info_rula)["score"]
        return reba, rula, euler, joint_cam

    return step


def make_full_frame_step(n_iter: int, parents: Tuple[int, ...],
                         yolo_params: Dict | None = None, img_size: int = 416,
                         compute_dtype=jnp.float32, rect: bool = True,
                         quant_backbone: Dict | None = None,
                         fused_resample: bool = False,
                         det_stride: int = 1,
                         pose_stride: int = 1,
                         fused_interpret: bool = False,
                         stem_s2d: bool = False):
    """Full per-frame device path including the detector forward.

    step(yolo_params, spin_variables, smpl_params, frames_u8, bboxes,
    info_reba, info_rula) -> (reba, rula, det_best_score). frames are raw
    clip frames; the detector runs on a device-side letterbox; crops use the
    provided (tracked) bboxes -- mirroring the real two-stage pipeline where
    SORT sits between detection and cropping on host.

    rect=True (throughput default) letterboxes onto the rectangular canvas
    (ops.crop.rect_canvas_geometry: 416x288 for 800x450 ingest, 1.44x fewer
    detector FLOPs); rect=False keeps the square canvas contract.

    fused_resample=True (requires rect) computes the letterbox AND the crop
    in one Pallas kernel that reads each frame from HBM once
    (ops.resample_pallas.fused_letterbox_crop); numerics match the jnp pair
    to bf16 rounding (tests/test_resample_pallas.py).

    det_stride > 1 models the detection-stride throughput mode
    (DetectorConfig.detection_stride): the detector forward runs only on
    every Nth frame of the batch (crops/pose/scoring still cover every
    frame -- in production SORT interpolates the skipped boxes on host).
    det_best then has shape (ceil(B / det_stride),).

    pose_stride > 1 additionally runs crop+SPIN only on every Nth frame and
    slerp-interpolates the skipped frames' joint rotations on device
    (make_pose_core); scoring still covers every frame. B must be a
    multiple of pose_stride (the bench/dryrun batches are). When both
    strides are set the fused kernel touches only every
    gcd(det_stride, pose_stride)-th frame in HBM.

    fused_interpret=True lowers the fused kernel in Pallas interpret mode
    (tests/dryrun off-TPU only).
    """
    import math

    from poserisk_release_tpu.models.detector import yolo_forward
    from poserisk_release_tpu.ops.crop import letterbox_device, letterbox_device_rect

    if fused_resample and not rect:
        raise ValueError("fused_resample implements the rect-canvas contract")
    if pose_stride < 1:
        raise ValueError(f"pose_stride must be >= 1, got {pose_stride}")

    # (frame dimensions are read from the runtime batch; the device letterbox
    # is shape-polymorphic)
    letterbox = letterbox_device_rect if rect else letterbox_device
    pose_step = make_pose_and_score_step(n_iter, parents, compute_dtype,
                                         quant_backbone, pose_stride=pose_stride,
                                         stem_s2d=stem_s2d)

    def step(yolo_p, spin_variables, smpl_params, frames, bboxes, info_reba, info_rula):
        if pose_stride > 1 and frames.shape[0] % pose_stride:
            raise ValueError(
                f"batch {frames.shape[0]} is not a multiple of "
                f"pose_stride {pose_stride}")
        if fused_resample:
            from poserisk_release_tpu.ops.resample_pallas import fused_letterbox_crop

            # One HBM pass, and under strides only every gcd-th frame is
            # read at all: the kernel's grid walks frames[::frame_stride],
            # letterboxing every (det_stride/g)-th of those and cropping
            # every (pose_stride/g)-th (both gated in-kernel, so neither
            # stage's matmuls nor HBM writes run on skipped programs).
            g = math.gcd(det_stride, pose_stride)
            letter, crops = fused_letterbox_crop(
                frames, bboxes, img_size, 224, 1.2,
                compute_dtype=compute_dtype, det_stride=det_stride // g,
                crop_stride=pose_stride // g, frame_stride=g,
                interpret=fused_interpret,
            )
        else:
            det_frames = frames[::det_stride] if det_stride > 1 else frames
            letter = (
                letterbox(det_frames, img_size, compute_dtype=compute_dtype)
                if rect
                else letterbox(det_frames, img_size)
            )
            pose_frames = frames[::pose_stride] if pose_stride > 1 else frames
            pose_boxes = bboxes[::pose_stride] if pose_stride > 1 else bboxes
            crops = crop_batch(pose_frames, pose_boxes, scale=1.2, out_size=224,
                               compute_dtype=compute_dtype)
        det = yolo_forward(yolo_p, letter, img_size, compute_dtype=compute_dtype)
        det_best = jnp.max(det[..., 4], axis=1)

        reba, rula, _euler, _jc = pose_step(
            spin_variables, smpl_params, crops, info_reba, info_rula
        )
        return reba, rula, det_best

    if yolo_params is None:
        return step

    def bound(spin_variables, smpl_params, frames, bboxes, info_reba, info_rula):
        return step(yolo_params, spin_variables, smpl_params, frames, bboxes,
                    info_reba, info_rula)

    return bound


def score_histogram_psum(scores: jnp.ndarray, axis_name: str, max_score: int = 12) -> jnp.ndarray:
    """Per-shard score histogram reduced across the mesh with psum -- the
    metric-reduction collective of the distributed design (SURVEY.md 5.8)."""
    onehot = jax.nn.one_hot(jnp.clip(scores - 1, 0, max_score - 1), max_score)
    local = jnp.sum(onehot, axis=0)
    return jax.lax.psum(local, axis_name)


def default_packed_infos() -> Tuple[np.ndarray, np.ndarray]:
    import json
    import os.path as osp

    from poserisk_release_tpu.scoring import reba as reba_mod
    from poserisk_release_tpu.scoring import rula as rula_mod

    path = osp.join(osp.dirname(__file__), "default_information.json")
    with open(path) as f:
        info = json.load(f)
    return reba_mod.pack_info(info), rula_mod.pack_info(info)
