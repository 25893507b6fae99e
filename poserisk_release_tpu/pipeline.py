"""End-to-end video -> ergonomic-risk pipeline (the reference Predictor, TPU-native).

Reference contract: Predictor.__init__/__call__
(/root/reference/lib/core/base.py:76-209) -- video ingest, multi-person
tracking, target selection, 224x224 crops, SPIN pose regression, joint-angle
extraction, neutral-SMPL joint positions, REBA/RULA scoring, stats, plots,
annotated video, result txts, and the three debug dump families.

TPU-native differences (behaviour-preserving):
  * frames stay in memory (no per-frame jpg round trip);
  * crop -> SPIN -> rotation conversions -> SMPL joints run as ONE jitted
    graph per fixed-size frame chunk (static shapes; last chunk padded);
  * with a device mesh, the chunk's frame axis shards across chips
    (parallel.mesh), parameters replicated;
  * scoring is vectorised over all frames (scoring.reba / scoring.rula).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from poserisk_release_tpu.body.smpl import SMPLFamily
from poserisk_release_tpu.config import Config, default_config
from poserisk_release_tpu.io.video import read_video_parallel
from poserisk_release_tpu.models import convert as model_convert
from poserisk_release_tpu.models.detector import StubDetector, YoloDetector
from poserisk_release_tpu.models.spin import init_spin_params, load_mean_params
from poserisk_release_tpu.ops.crop import crop_batch
from poserisk_release_tpu.ops.lbs import LBS, smpl_params_to_jax
from poserisk_release_tpu.outputs.render import render_result_video, vis_3d_pose
from poserisk_release_tpu.outputs.stats import (
    post_process_scores,
    print_result_summary,
    scores_summary_block,
    write_result_txt,
)
from poserisk_release_tpu.outputs.writers import (
    pose_to_str,
    save_csv_pose_log,
    save_eval_pose_log_csv,
    save_obj,
    save_score_log_csv,
)
from poserisk_release_tpu.parallel import mesh as pmesh
from poserisk_release_tpu.scoring.reba import REBAScorer
from poserisk_release_tpu.scoring.rula import RULAScorer
from poserisk_release_tpu.tracking.mpt import (
    MultiPersonTracker,
    detect_frames,
    filter_and_select_target,
)



def load_spin_variables(cfg: Config) -> Dict:
    """SPIN weights resolution: converted-npz cache > torch checkpoint
    (converted once, init_* filled from mean params, then cached) > random
    init with mean params. THE single conversion path -- tools that ingest
    a checkpoint (e.g. tools/validate_real_assets.py) reuse this so the
    logic cannot drift from the Predictor's."""
    npz_path = cfg.SPIN.checkpoint + ".flax.npz"
    have_ckpt = osp.isfile(cfg.SPIN.checkpoint)
    # Staleness guard: an operator dropping NEW weights over the old
    # checkpoint path must not be silently shadowed by the cached
    # conversion of the previous ones. The cache embeds the source
    # checkpoint's (size, mtime_ns) stamp; ANY mismatch -- including
    # timestamp-preserving installs (cp -p, rsync -a, tar) that a bare
    # mtime '>' ordering would miss -- triggers re-conversion. Pre-stamp
    # caches (stamp is None) fall back to the mtime ordering.
    if osp.isfile(npz_path):
        fresh = not have_ckpt
        if have_ckpt:
            stamp = model_convert.cached_source_stamp(npz_path)
            if stamp is not None:
                fresh = bool(np.array_equal(
                    stamp, model_convert.source_stamp(cfg.SPIN.checkpoint)))
            else:
                fresh = not (os.path.getmtime(cfg.SPIN.checkpoint)
                             > os.path.getmtime(npz_path))
        if fresh:
            return model_convert.load_flax_variables(npz_path)
    if have_ckpt:
        variables = model_convert.load_spin_checkpoint(cfg.SPIN.checkpoint)
        mean = load_mean_params(cfg.SPIN.smpl_mean_params)
        params = dict(variables["params"])
        for key in ("init_pose", "init_shape", "init_cam"):
            params.setdefault(key, jnp.asarray(mean[key]))
        variables["params"] = params
        model_convert.save_flax_variables(variables, npz_path,
                                          source=cfg.SPIN.checkpoint)
        return variables
    return init_spin_params(
        jax.random.PRNGKey(0), load_mean_params(cfg.SPIN.smpl_mean_params),
        n_iter=cfg.SPIN.ief_iters,
    )


class PoseEstimator:
    """Crops -> (euler deg, joint_cam mm, axis-angle) in one jitted graph."""

    def __init__(self, cfg: Config, smpl_family: SMPLFamily,
                 mesh: Optional[object] = None, variables: Optional[Dict] = None,
                 gender: str = "neutral", fast: bool = False,
                 spin_int8: bool = False):
        """fast=True runs the SPIN backbone in bfloat16 with bf16-stored
        params (4.2x on the pose step, <0.1 deg angle drift); the default is
        the strict f32 parity configuration.

        spin_int8=True additionally routes the ResNet-50 backbone through
        the int8 MXU path (models/resnet_int8), PTQ-calibrated with bias
        correction on the FIRST batch of crops this estimator processes
        (same implicit lifecycle as the int8 detector). Opt-in: with this
        image's random weights the induced angle drift is median ~0.17 deg
        against integer-degree scoring thresholds (docs/PERF.md).

        Parallel axes are CONFIG-driven (ParallelConfig): when any of
        PARALLEL.{model,spatial,stage,expert} is > 1 and no mesh is passed,
        the estimator builds the N-D mesh itself (spmd.mesh_from_config)
        and places parameters/inputs accordingly -- Megatron tp sharding of
        the HMR tree, crop-height spatial partitioning, a stage-sharded
        GPipe pipeline (each device holds only its stage's parameters), and
        gendered-SMPL expert routing. An explicitly passed 1-D data mesh
        keeps the historical dp behaviour."""
        from poserisk_release_tpu.parallel import spmd as pspmd

        self.cfg = cfg
        self._dtype = dtype = jnp.bfloat16 if fast else jnp.float32
        pcfg = cfg.PARALLEL
        if mesh is None and (pspmd.model_axes_from_config(pcfg)
                             or int(pcfg.num_devices) > 1):
            # Config-reachable meshes: any model axis, or an explicit
            # multi-device data axis, makes the estimator build the mesh
            # itself. num_devices == 0 keeps the historical default (no
            # mesh unless one is passed) so single-device callers are
            # untouched.
            mesh = pspmd.mesh_from_config(pcfg)
        self.mesh = mesh
        axis_names = () if mesh is None else mesh.axis_names
        self._data_axis = pcfg.data_axis if pcfg.data_axis in axis_names else None
        if mesh is not None and self._data_axis is None:
            raise ValueError(
                f"mesh axes {axis_names} lack the configured data axis "
                f"{pcfg.data_axis!r}")
        self._tp = pspmd.MODEL_AXIS in axis_names
        self._sp = pspmd.SPATIAL_AXIS in axis_names
        self._pp = "stage" in axis_names
        self._ep = "expert" in axis_names
        if self._pp and (self._tp or self._sp or self._ep):
            raise ValueError(
                "PARALLEL.stage (pipeline parallelism) cannot combine with "
                "the model/spatial/expert axes in one mesh")
        if spin_int8 and (self._tp or self._pp):
            raise ValueError(
                "spin_int8 cannot combine with model or stage parallelism: "
                "the quantized backbone pytree has its own layout; pick one "
                "of int8 / tp / pp for the backbone")

        self._family = smpl_family
        self.gender = gender
        neutral = smpl_family[gender]
        parents = np.asarray(neutral.kintree_parents).copy()
        parents[0] = 0
        self.parents = tuple(int(p) for p in parents)

        # --- SMPL parameter placement (expert-routed when ep is on) -------
        expert_joints = None
        if self._ep:
            from poserisk_release_tpu.parallel.expert import (
                GENDERS, make_expert_joints, stack_gender_experts)

            # The gendered tables live sharded one-expert-per-device-row
            # ONCE; switching tracks' genders only swaps a scalar id (no
            # parameter re-upload, no recompile -- the productized form of
            # the reference's resident layer dict, lib/utils/smpl.py).
            stacked = dict(stack_gender_experts(smpl_family, mesh))
            stacked["gender_id"] = jax.device_put(
                jnp.asarray(GENDERS.index(gender), jnp.int32),
                pmesh.replicated(mesh))
            self.smpl_params = stacked
            expert_joints = make_expert_joints(
                mesh, self.parents, data_axis=self._data_axis)
        else:
            self.smpl_params = smpl_params_to_jax(neutral)
            if mesh is not None:
                self.smpl_params = pmesh.replicate_tree(mesh, self.smpl_params)

        # Pose-stride throughput mode (SpinConfig.pose_stride): SPIN runs on
        # every Nth tracked frame; skipped frames slerp between anchors on
        # device. 1 (default) is the reference's pose-every-frame contract.
        self._pose_stride = int(cfg.SPIN.pose_stride)
        self._stem_s2d = bool(cfg.SPIN.stem_s2d)
        self._expert_joints = expert_joints

        self.variables = variables if variables is not None else self._load_variables(cfg)
        # Keep the f32 tree for PTQ folding (BN stats fold in f32 even when
        # the live variables are bf16-stored) -- only while int8 needs it;
        # otherwise fast mode must be able to release the f32 copy.
        self._variables_f32 = self.variables if spin_int8 else None
        self._spin_int8 = bool(spin_int8)
        self._quant_backbone = None
        if fast:
            from poserisk_release_tpu.models.spin import cast_backbone_params

            self.variables = cast_backbone_params(self.variables)

        # --- SPIN parameter placement -------------------------------------
        self._spin_forward_override = None
        if self._pp:
            # Stage-sharded pipeline placement: split/flattening metadata
            # come from the live tree once; self.variables becomes the
            # (S, maxlen) P('stage') buffer -- each device row holds ONLY
            # its stage's parameters (parallel.pipeline).
            from poserisk_release_tpu.parallel.pipeline import (
                balanced_split, place_stage_params, stage_param_entries)

            self._pp_split = balanced_split(self.variables, mesh.shape["stage"])
            self._pp_entries, self._pp_sizes = stage_param_entries(
                self.variables, self._pp_split)
            self.variables = place_stage_params(
                mesh, self.variables, self._pp_split,
                self._pp_entries, self._pp_sizes)
            self._spin_forward_override = self._make_pp_spin_forward()
        elif self._tp:
            specs = pspmd.spin_tp_specs(self.variables)
            self.variables = pspmd.shard_tree(mesh, self.variables, specs)
        elif mesh is not None:
            self.variables = pmesh.replicate_tree(mesh, self.variables)

        from poserisk_release_tpu.throughput import make_pose_core

        self._pose_core = make_pose_core(
            cfg.SPIN.ief_iters, self.parents, dtype,
            pose_stride=self._pose_stride, stem_s2d=self._stem_s2d,
            spin_forward_override=self._spin_forward_override,
            expert_joints=self._expert_joints)
        # fast mode on real TPU crops through the Pallas kernel (one VMEM
        # pass per frame, bf16 output -- same tolerance class as the bf16
        # backbone it feeds); the strict-parity f32 default and all CPU runs
        # keep the jnp separable-matmul crop.
        self._pallas_crop = bool(
            fast and jax.devices()[0].platform == "tpu" and mesh is None
        )
        self._step = jax.jit(self._pose_step)
        self._step_frames = jax.jit(self._pose_step_from_frames)

    def _make_pp_spin_forward(self):
        """Shape-polymorphic pipelined SPIN forward over the placed stage
        buffer: one GPipe schedule per (anchor batch, resolution), cached --
        trace-time construction, so every jit signature reuses its pipeline."""
        from poserisk_release_tpu.parallel.pipeline import (
            make_hmr_pipeline_from_entries)

        mesh = self.mesh
        data_axis = self._data_axis
        n_data = int(mesh.shape[data_axis])
        M = int(self.cfg.PARALLEL.stage_microbatches)
        n_iter = int(self.cfg.SPIN.ief_iters)
        pipes: Dict = {}

        def pp_forward(buffer, crops):
            B, hw = int(crops.shape[0]), int(crops.shape[1])
            key = (B, hw)
            if key not in pipes:
                if B % (n_data * M):
                    raise ValueError(
                        f"pipeline parallelism needs the anchor batch ({B}) "
                        f"divisible by data axis * stage_microbatches "
                        f"({n_data} * {M}); production_chunk guarantees this "
                        f"for the chunked paths")
                pipes[key] = make_hmr_pipeline_from_entries(
                    mesh, self._pp_entries, self._pp_split, hw=hw,
                    microbatch=B // (n_data * M), n_microbatches=M,
                    n_iter=n_iter, compute_dtype=self._dtype,
                    stem_s2d=self._stem_s2d, data_axis=data_axis)
            return pipes[key](buffer, crops)

        return pp_forward

    def _load_variables(self, cfg: Config) -> Dict:
        return load_spin_variables(cfg)

    def _ensure_spin_quantized(self, calib_crops) -> None:
        """spin_int8 lifecycle: fold+calibrate+bias-correct the backbone on
        the first crops this estimator sees, then rebuild the jitted steps
        around the quantized core. No-op once quantized (or if disabled)."""
        if not self._spin_int8 or self._quant_backbone is not None:
            return
        from poserisk_release_tpu.models.spin import quantize_spin_backbone
        from poserisk_release_tpu.throughput import make_pose_core

        calib = jnp.asarray(calib_crops, jnp.float32)[:8]
        quant = quantize_spin_backbone(
            self._variables_f32, calib,
            min_stage=int(self.cfg.SPIN.int8_min_stage))
        if self.mesh is not None:
            quant = pmesh.replicate_tree(self.mesh, quant)
        else:
            quant = jax.device_put(quant)
        self._quant_backbone = quant
        # Folding is done, so the f32 copy can normally be released -- but
        # the per-video recalibration lifecycle needs it again for the next
        # fold (reset_calibration), so that flag keeps it resident.
        if not self.cfg.DETECTOR.recalibrate_per_video:
            self._variables_f32 = None
        self._pose_core = make_pose_core(
            self.cfg.SPIN.ief_iters, self.parents, self._dtype,
            quant_backbone=quant, pose_stride=self._pose_stride,
            stem_s2d=self._stem_s2d, expert_joints=self._expert_joints,
        )
        self._step = jax.jit(self._pose_step)
        self._step_frames = jax.jit(self._pose_step_from_frames)

    def reset_calibration(self) -> None:
        """Drop the int8 SPIN backbone so the NEXT crops (or an explicit
        calibrate_spin call) re-derive the activation scales -- the per-video
        lifecycle hook for estimators shared across videos with different
        exposure statistics (DetectorConfig.recalibrate_per_video), the SPIN
        counterpart of YoloDetector.reset_calibration. No-op when spin_int8
        is off or nothing is quantized yet."""
        if not self._spin_int8 or self._quant_backbone is None:
            return
        if self._variables_f32 is None:
            # The f32 tree was released at quantization time (the estimator
            # was not constructed under recalibrate_per_video), so there is
            # nothing left to re-fold from.
            raise RuntimeError(
                "cannot reset spin_int8 calibration: the f32 parameter tree "
                "was released; construct the estimator with "
                "DETECTOR.recalibrate_per_video=True to keep it resident")
        from poserisk_release_tpu.throughput import make_pose_core

        self._quant_backbone = None
        self._pose_core = make_pose_core(
            self.cfg.SPIN.ief_iters, self.parents, self._dtype,
            pose_stride=self._pose_stride, stem_s2d=self._stem_s2d,
            expert_joints=self._expert_joints)
        self._step = jax.jit(self._pose_step)
        self._step_frames = jax.jit(self._pose_step_from_frames)

    def calibrate_spin(self, crops) -> None:
        """Explicit spin_int8 calibration on representative person crops
        ((N, 224, 224, 3) float [0,1]); preferred over the implicit
        first-batch lifecycle when the opening frames of a video are not
        representative (dark intro) or when the estimator is shared across
        videos. No-op if spin_int8 is off or already quantized."""
        if self._spin_int8 and self._quant_backbone is None and len(crops):
            self._ensure_spin_quantized(np.asarray(crops)[:8])

    @property
    def spin_needs_calibration(self) -> bool:
        return self._spin_int8 and self._quant_backbone is None

    def set_gender(self, gender: str) -> None:
        """Switch the SMPL body model between tracks (per-person genders,
        Predictor --person_genders). Under expert parallelism this swaps
        only the routing scalar -- the gendered tables stay resident,
        sharded one per expert row; otherwise the selected gender's tree is
        re-placed (same shapes, so no recompile either way)."""
        if gender == self.gender:
            return
        if self._ep:
            from poserisk_release_tpu.parallel.expert import GENDERS

            gid = GENDERS.index(gender)  # raises ValueError on unknown
            self.smpl_params = dict(self.smpl_params)
            self.smpl_params["gender_id"] = jax.device_put(
                jnp.asarray(gid, jnp.int32), pmesh.replicated(self.mesh))
        else:
            params = smpl_params_to_jax(self._family[gender])
            if self.mesh is not None:
                params = pmesh.replicate_tree(self.mesh, params)
            self.smpl_params = params
        self.gender = gender

    def _constrain_crops(self, crops):
        """Spatial partitioning (PARALLEL.spatial): pin the crop HEIGHT axis
        sharding mid-graph; XLA's SPMD partitioner inserts the conv halo
        exchanges. No-op on non-spatial meshes."""
        if self._sp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            crops = jax.lax.with_sharding_constraint(
                crops, NamedSharding(
                    self.mesh, P(self._data_axis, "spatial", None, None)))
        return crops

    def _pose_step(self, variables, smpl_params, crops):
        # Single source of truth for the ordering-sensitive pose math:
        # throughput.make_pose_core (shared with the fused bench graph).
        return self._pose_core(variables, smpl_params, self._constrain_crops(crops))

    def _pose_step_from_frames(self, variables, smpl_params, frames_u8, bboxes):
        # Crop fused into the pose graph: the host uploads raw uint8 frames
        # ONCE and downloads only angles/joints. The split path moved three
        # image-sized tensors per frame (frames up, f32 crops down, f32
        # crops up again); this moves one.
        if self._pallas_crop:
            from poserisk_release_tpu.ops.resample_pallas import crop_batch_pallas

            crops = crop_batch_pallas(
                frames_u8, bboxes,
                scale=float(self.cfg.DATASET.bbox_scale),
                out_size=int(self.cfg.MODEL.input_shape[0]),
            )
        else:
            crops = crop_batch(
                frames_u8, bboxes,
                scale=float(self.cfg.DATASET.bbox_scale),
                out_size=int(self.cfg.MODEL.input_shape[0]),
            )
        return self._pose_core(variables, smpl_params, self._constrain_crops(crops))

    def run(self, crops: np.ndarray, chunk: int = 0):
        """crops: (F, 224, 224, 3) float32 [0,1]. Chunked + padded execution.

        chunk == 0 picks frames_per_step * mesh_size (static shapes, one
        compile); the final partial chunk is edge-padded then trimmed.
        Under pose_stride > 1 only every Nth crop is uploaded (the anchors);
        outputs still cover every frame (throughput.make_pose_core).
        """
        if crops.shape[0]:
            self._ensure_spin_quantized(crops[:8])
        stride = self._pose_stride
        return self._run_chunked(
            crops.shape[0],
            lambda start, size: (crops[start : start + size : stride],),
            self._step,
            chunk,
        )

    def run_from_frames(self, frames_rgb: np.ndarray, frame_ids: np.ndarray,
                        bboxes: np.ndarray, chunk: int = 0):
        """Fused crop+pose execution straight from raw uint8 frames.

        Uploads only the tracked uint8 frames and downloads only
        angles/joints -- the crop tensor never exists on the host, removing
        the split path's crop download + re-upload (two extra image-sized
        f32 transfers per frame). This is the Predictor's production path;
        `run` remains for callers that already hold crops. Under
        pose_stride > 1 only every Nth tracked frame is uploaded at all
        (upload volume and crop+SPIN cost divide by the stride)."""
        frame_ids = np.asarray(frame_ids)
        bboxes = np.asarray(bboxes, np.float32)
        if self._spin_int8 and self._quant_backbone is None and len(frame_ids):
            calib = crop_batch(
                jnp.asarray(frames_rgb[frame_ids[:8]]),
                jnp.asarray(bboxes[:8]),
                scale=float(self.cfg.DATASET.bbox_scale),
                out_size=int(self.cfg.MODEL.input_shape[0]),
            )
            self._ensure_spin_quantized(calib)
        stride = self._pose_stride
        return self._run_chunked(
            len(frame_ids),
            lambda start, size: (
                frames_rgb[frame_ids[start : start + size : stride]],
                bboxes[start : start + size : stride],
            ),
            self._step_frames,
            chunk,
        )

    def production_chunk(self, chunk: int = 0) -> int:
        """THE chunk-size rule of the chunked execution paths: the requested
        (or configured frames_per_step * n_data) chunk rounded up so it stays
        shardable AND, under a pose stride, keeps the anchor phase aligned
        across chunks with the anchor batch itself shardable (the step's
        crops input has chunk/stride rows): a multiple of
        n_data * pose_stride -- where n_data is the DATA axis size (frames
        shard over data only; the model/spatial/stage/expert axes divide the
        per-frame work instead). Under pipeline parallelism the quantum
        additionally folds in stage_microbatches so every chunk's per-shard
        anchor batch splits evenly into microbatches. Public so the
        streaming scorer can accumulate a track into EXACTLY this structure
        (same boundaries, same anchor phase) and stay bit-identical to the
        batch path at pose_stride > 1."""
        n_data = 1 if self.mesh is None else int(self.mesh.shape[self._data_axis])
        if chunk <= 0:
            chunk = self.cfg.PARALLEL.frames_per_step * n_data
        q = n_data * self._pose_stride
        if self._pp:
            q *= int(self.cfg.PARALLEL.stage_microbatches)
        return ((chunk + q - 1) // q) * q

    def _run_chunked(self, num_items: int, host_chunk, step_fn, chunk: int = 0):
        chunk = self.production_chunk(chunk)

        def upload(start: int):
            parts = host_chunk(start, chunk)
            # n_valid counts FRAMES (the step's output rows); under a pose
            # stride the uploaded parts are the anchor subsample, so their
            # length is ceil(n_valid / stride), not n_valid.
            n_valid = min(chunk, num_items - start)
            batches = []
            for part in parts:
                # A device part (jax.Array -- e.g. a gather from the
                # streaming scorer's shared per-window upload) is padded on
                # device; np.asarray here would pull it back to host.
                if not isinstance(part, jax.Array):
                    part = np.asarray(part)
                padded, _ = pmesh.pad_to_multiple(
                    part, chunk // self._pose_stride)
                batch = jnp.asarray(padded)
                if self.mesh is not None:
                    batch = pmesh.shard_batch(self.mesh, batch, self._data_axis)
                batches.append(batch)
            return batches, n_valid

        if num_items == 0:
            # Empty-in/empty-out, matching the detector's pinned empty-call
            # contract (a bare np.concatenate([]) would raise instead).
            empty = np.zeros((0, 24, 3), np.float32)
            return empty, empty.copy(), empty.copy()

        # Fetch with per-chunk fault isolation: a transient device/transfer
        # failure retries that chunk once before surfacing with context (the
        # reference has no failure handling at all -- SURVEY.md section 5.3).
        eulers, jcams, aas = [], [], []

        def fetch(out, start, n_valid, idx):
            try:
                e, jc, aa = (np.asarray(x) for x in out)
            except Exception:
                try:
                    batches, _ = upload(start)
                    out = step_fn(self.variables, self.smpl_params, *batches)
                    e, jc, aa = (np.asarray(x) for x in out)
                except Exception as exc:  # pragma: no cover - device-specific
                    raise RuntimeError(
                        f"pose-estimation chunk {idx} (frames "
                        f"{start}..{start + n_valid - 1}) failed twice"
                    ) from exc
            eulers.append(e[:n_valid])
            jcams.append(jc[:n_valid])
            aas.append(aa[:n_valid])

        # Bounded pipelining: dispatch runs ahead of the fetches so the
        # device overlaps chunks, but at most MAX_IN_FLIGHT chunks'
        # dispatched-but-unfetched input buffers coexist in HBM -- an
        # unbounded dispatch-all-then-fetch loop would pin every chunk's
        # uint8 frames on the chip at once for long tracks. Only
        # (results, start, n_valid) is retained on host; the rare retry
        # path re-uploads its chunk from the host array instead.
        MAX_IN_FLIGHT = 4
        pending = []
        for start in range(0, num_items, chunk):
            # Drain BEFORE dispatching: popping after the append let a 5th
            # chunk's buffers coexist with the bound's 4.
            if len(pending) >= MAX_IN_FLIGHT:
                out, s, nv = pending.pop(0)
                fetch(out, s, nv, len(eulers))
            batches, n_valid = upload(start)
            pending.append(
                (step_fn(self.variables, self.smpl_params, *batches), start, n_valid)
            )
            del batches
        for out, s, nv in pending:
            fetch(out, s, nv, len(eulers))
        return (
            np.concatenate(eulers),
            np.concatenate(jcams),
            np.concatenate(aas),
        )


def validate_rotation_roundtrip(axis_angles) -> None:
    """Host-side euler round-trip guard mirroring the reference's
    coord_utils assert -- THE shared check behind --validate_rotations for
    both the batch Predictor and the streaming scorer.

    Joints 1..23 carry the SPIN rotmats faithfully through the axis-angle
    dump; joint 0 is excluded because its axis-angle is root-forced to
    (3.14, 0, 0) (the reference's buffer mutation, coord_utils.py:12-13)
    while its euler keeps the original rotmat. Frame axis padded to the
    scoring bucket so clip length does not recompile the check (zero
    axis-angle -> identity -> defect 0)."""
    from poserisk_release_tpu.ops.rotations import (
        assert_euler_roundtrip,
        axis_angle_to_rotmat,
    )
    from poserisk_release_tpu.scoring.common import score_chunk_size

    aa = np.asarray(axis_angles)[:, 1:, :]
    bucket = score_chunk_size(aa.shape[0])
    n_pad = -(-max(aa.shape[0], 1) // bucket) * bucket
    padded = np.zeros((n_pad,) + aa.shape[1:], aa.dtype)
    padded[: aa.shape[0]] = aa
    assert_euler_roundtrip(axis_angle_to_rotmat(padded))


def build_detector(cfg: Config):
    """The Predictor's detector policy as a shared factory (also used by the
    CLI's --streaming path): YOLOv3 from DETECTOR.weights when the file
    exists, else the full-frame StubDetector that keeps weight-free
    environments runnable."""
    if osp.isfile(cfg.DETECTOR.weights):
        return YoloDetector.from_weights(
            cfg.DETECTOR.weights,
            img_size=cfg.DETECTOR.img_size,
            detection_threshold=cfg.DETECTOR.detection_threshold,
            nms_threshold=cfg.DETECTOR.nms_threshold,
            batch_size=cfg.DETECTOR.batch_size,
            rect=cfg.DETECTOR.rect_letterbox,
            int8=cfg.DETECTOR.int8,
            int8_min_downsample=cfg.DETECTOR.int8_min_downsample,
            max_device_dets=cfg.DETECTOR.max_device_dets,
        )
    print("[poserisk] no detector weights found; using full-frame stub detector")
    return StubDetector()


def load_add_info(cfg: Config, info_path: str) -> Dict:
    """Additional-information JSON with the reference's default fallback
    (base.py:137-142): a missing --info path silently falls back to the
    packaged default_information.json."""
    path = info_path if osp.isfile(info_path) else cfg.DATASET.default_information
    with open(path) as f:
        return json.load(f)


def apply_explicit_calibration(cfg: Config, detector, pose_estimator) -> None:
    """Production int8 calibration lifecycle (DetectorConfig.calibration):
    derive activation scales from an operator-supplied representative
    source BEFORE any video frame is seen, so a dark opening window can
    never pin them (the implicit first-window path remains the fallback).
    The same frames also calibrate the int8 SPIN backbone: the freshly
    calibrated detector proposes person boxes (MPT squared-cxcywh
    convention; full-frame fallback when nothing clears the threshold) and
    the resulting crops feed quantize_spin_backbone.

    Module-level so EVERY entry point shares one lifecycle: the batch
    Predictor and the streaming CLI path both route through here."""
    src = cfg.DETECTOR.calibration
    if not src:
        return
    needs_det = getattr(detector, "needs_calibration", False)
    needs_spin = pose_estimator.spin_needs_calibration
    if not (needs_det or needs_spin):
        return
    from poserisk_release_tpu.io.video import load_calibration_frames

    frames = load_calibration_frames(src, cfg.DETECTOR.calibration_frames)
    if needs_det:
        detector.calibrate(frames)
    if needs_spin:
        sample = frames[:: max(1, len(frames) // 8)][:8]
        H, W = sample.shape[1:3]
        from poserisk_release_tpu.tracking.mpt import squared_cxcywh

        boxes = []
        for dets in detect_frames(detector, sample):
            if len(dets):
                best = dets[np.argmax(
                    (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
                )]
                # ONE squaring rule with the production crop geometry.
                boxes.append(squared_cxcywh(best[0], best[1], best[2], best[3]))
            else:
                side = float(max(H, W))
                boxes.append([W / 2.0, H / 2.0, side, side])
        crops = crop_batch(
            jnp.asarray(sample), jnp.asarray(np.asarray(boxes, np.float32)),
            scale=float(cfg.DATASET.bbox_scale),
            out_size=int(cfg.MODEL.input_shape[0]),
        )
        pose_estimator.calibrate_spin(np.asarray(crops))


class Predictor:
    """Reference-compatible orchestrator. See module docstring."""

    def __init__(
        self,
        cfg: Config | None = None,
        score_type: str = "REBA,RULA",
        debug: bool = False,
        debug_joints: str = "",
        debug_frame: int = -1,
        visualize: bool = True,
        detector=None,
        mesh=None,
        spin_variables=None,
        allow_synthetic_assets: bool = True,
        gender: str = "neutral",
        multi_person: bool = False,
        person_genders: Optional[Dict] = None,
        fast: bool = False,
        spin_int8: bool = False,
        validate_rotations: bool = False,
    ):
        self.cfg = cfg or default_config()
        self.smpl = SMPLFamily(self.cfg.SPIN.smpl_model_dir, allow_synthetic=allow_synthetic_assets)
        self.gender = gender
        self.multi_person = multi_person
        # Per-track SMPL gender overrides for --multi_person ({person_id:
        # gender}, falling back to `gender`). Pairs with PARALLEL.expert:
        # under expert parallelism a gender switch between tracks swaps only
        # a routing scalar (PoseEstimator.set_gender).
        self.person_genders = {
            int(pid): g for pid, g in (person_genders or {}).items()
        }
        for g in self.person_genders.values():
            if g not in ("neutral", "male", "female"):
                raise ValueError(f"Invalid gender: {g}")
        self._lbs_cache: Dict[str, LBS] = {}
        self.lbs_neutral = self._lbs(gender)
        self.pose_estimator = PoseEstimator(
            self.cfg, self.smpl, mesh=mesh, variables=spin_variables, gender=gender,
            fast=fast, spin_int8=spin_int8,
        )

        if detector is None:
            detector = build_detector(self.cfg)
        self.tracker = MultiPersonTracker(
            detector, detection_stride=int(self.cfg.DETECTOR.detection_stride),
            adaptive=bool(self.cfg.DETECTOR.adaptive_stride),
            adaptive_tol=float(self.cfg.DETECTOR.adaptive_tol))

        self.reba, self.rula = REBAScorer(debug), RULAScorer(debug)
        scores = score_type.replace(" ", "").upper().split(",")
        self.run_reba = "REBA" in scores
        self.run_rula = "RULA" in scores

        self.debugging = debug
        self.debug_frame = debug_frame
        self.visualize = visualize
        joints = debug_joints.replace(" ", "").split(",")
        if joints == [""]:
            self.debug_joints = None
        else:
            for joint in joints:
                if joint.upper() not in self.smpl.joints_name_upper:
                    raise ValueError(f"Invalid Joint name: {joint}")
            self.debug_joints = joints

        # Opt-in mirror of the reference's per-conversion euler round-trip
        # assert (coord_utils.py:90-91); off by default since it forces a
        # host sync per track.
        self.validate_rotations = validate_rotations

        self.timings: Dict[str, float] = {}

    # ------------------------------------------------------------------
    def _lbs(self, gender: str) -> LBS:
        """Gender-keyed LBS cache for the debug mesh path (obj export uses
        the CURRENT track's body model under --person_genders)."""
        if gender not in self._lbs_cache:
            self._lbs_cache[gender] = LBS(self.smpl[gender])
        return self._lbs_cache[gender]

    def _apply_explicit_calibration(self) -> None:
        apply_explicit_calibration(self.cfg, self.tracker.detector,
                                   self.pose_estimator)

    def __call__(self, input_path: str, info_path: str, output_path: str):
        os.makedirs(output_path, exist_ok=True)
        # Per-run stage timings: a shared warm Predictor serves many clips
        # (cli.py directory mode), so accumulating keys must not leak across.
        self.timings = {}

        # Shared-instance lifecycle: optionally re-derive int8 scales per
        # video instead of inheriting the previous video's exposure stats.
        # (With an explicit calibration source the scales are a pure
        # function of that static source -- proven byte-identical across
        # derivations by test_explicit_calibration_is_source_determined --
        # so resetting just to re-derive the same scales would waste a full
        # float-tower calibration pass per video; recalibrate_per_video
        # only matters for the implicit first-window path.)
        if self.cfg.DETECTOR.recalibrate_per_video and not self.cfg.DETECTOR.calibration:
            if hasattr(self.tracker.detector, "reset_calibration"):
                self.tracker.detector.reset_calibration()
            # The SPIN half of the same lifecycle: an int8 backbone quantized
            # on a previous video's crops must not leak into this one.
            self.pose_estimator.reset_calibration()
        self._apply_explicit_calibration()

        # --- ingest + tracking -------------------------------------------
        # Default: decode on a background thread with one-window lookahead
        # while the detector consumes finished windows (device detect overlaps
        # host decode; the reference runs them strictly sequentially,
        # base.py:47-59). The jpeg_ingest parity mode keeps the reference's
        # sequential decode -> jpg round trip -> detect order.
        print("\n===> Data preprocessing...")
        if self.cfg.DATASET.jpeg_ingest:
            t0 = time.time()
            # decode_workers is honored here too: read_video_parallel is
            # bit-identical to read_video, and the jpg round trip below runs
            # on the assembled clip either way, so the parity contract holds.
            clip = read_video_parallel(
                input_path, self.cfg.DATASET.decode_workers)
            from poserisk_release_tpu.io.video import jpeg_roundtrip

            # Reference-parity ingest: frames take the '%09d.jpg' disk round
            # trip (funcs_utils.py:42) before detection/cropping; the tmp
            # tree is removed like the reference's rm -rf (base.py:184).
            tmp = osp.join(output_path, "tmp")
            clip = jpeg_roundtrip(clip, tmp_path=tmp)
            shutil.rmtree(tmp, ignore_errors=True)
            self.timings["decode"] = time.time() - t0

            t0 = time.time()
            print("\n===> Get human tracking results...")
            tracking_results = self.tracker(clip.frames)
            self.timings["track"] = time.time() - t0
        else:
            t0 = time.time()
            print("\n===> Get human tracking results (overlapped with decode)...")
            clip, tracking_results = self._ingest_and_track_overlapped(input_path)
            self.timings["decode+track (overlapped)"] = time.time() - t0

        if self.multi_person:
            # Extension over the reference (BASELINE config 4): score every
            # track surviving the min-frames filter, one output dir each.
            from poserisk_release_tpu.tracking.mpt import surviving_tracks

            survivors = surviving_tracks(
                tracking_results, clip.num_frames,
                self.cfg.DATASET.min_frame_ratio,
            )
            if not survivors:
                raise ValueError("no person tracks found in the clip")
            summaries = {}
            try:
                for pid, track in survivors.items():
                    person_out = osp.join(output_path, f"person_{pid}")
                    os.makedirs(person_out, exist_ok=True)
                    # Per-track SMPL gender: under PARALLEL.expert this flips
                    # a routing scalar; otherwise it re-places the gender's
                    # tree.
                    self.pose_estimator.set_gender(
                        self.person_genders.get(int(pid), self.gender))
                    summaries[pid] = self._process_track(
                        clip, track["bbox"], track["frames"], info_path,
                        person_out
                    )
            finally:
                # A failed track must not leave the shared warm estimator
                # stuck on ITS gender for the caller's next video.
                self.pose_estimator.set_gender(self.gender)
            return summaries

        bboxes, frames = filter_and_select_target(
            tracking_results, clip.num_frames,
            self.cfg.DATASET.min_frame_ratio,
        )
        return self._process_track(clip, bboxes, frames, info_path, output_path)

    def _ingest_and_track_overlapped(self, input_path: str,
                                     window: int | None = None):
        """Decode windows on a background thread (streaming._window_stream)
        and feed them straight into the tracker: the YOLO forward of window k
        runs while window k+1 decodes. Frames are retained for the crop and
        render stages, so peak memory matches the sequential path.

        The window size follows DETECTOR.batch_size (the knob that exists to
        amortise device dispatch latency) so raising it actually widens the
        detector batches."""
        import itertools

        from poserisk_release_tpu.io.video import VideoClip
        from poserisk_release_tpu.streaming import _window_stream

        if window is None:
            window = int(self.cfg.DETECTOR.batch_size)
        fps = 0.0
        pieces = []

        def windows():
            nonlocal fps
            for item in _window_stream(input_path, window, None,
                                       self.cfg.DATASET.decode_workers):
                if item[0] == "meta":
                    fps = float(item[1])
                elif item[0] == "window":
                    pieces.append(item[2])
                    yield item[1], item[2]

        gen = iter(windows())
        if getattr(self.tracker.detector, "needs_calibration", False):
            # int8 PTQ lifecycle under windowed ingest: the detector's
            # implicit whole-call calibration would otherwise complete after
            # window 1 anyway (and leave that window detected by the float
            # graph -- inconsistent within one video). Calibrate explicitly
            # on the first decoded window, then detect EVERY window incl.
            # the first through the int8 path. For production, prefer an
            # explicit detector.calibrate() over representative frames --
            # a dark opening window pins the scales either way.
            first = next(gen, None)
            if first is not None:
                self.tracker.detector.calibrate(first[1])
                gen = itertools.chain([first], gen)
        tracking_results = self.tracker.track_windows(gen)
        if not pieces:
            raise ValueError(f"video decoded to zero frames: {input_path}")
        clip = VideoClip(frames=np.concatenate(pieces), fps=fps)
        return clip, tracking_results

    def _process_track(self, clip, bboxes, frames, info_path, output_path):
        debug_path = osp.join(output_path, "debug")
        shutil.rmtree(debug_path, ignore_errors=True)
        os.makedirs(debug_path, exist_ok=True)
        timestamp = (0, frames, clip.num_frames)

        # Per-track stage keys start fresh: under --multi_person this method
        # runs once per person within one __call__, and the accumulating
        # score.* keys would otherwise sum across earlier persons while
        # 'pose'/'score' held only the last -- each person_<id>/
        # run_summary.json now carries ITS track's timings (the shared
        # decode/track entries remain whole-clip, which they are).
        for key in ("pose", "score", "score.device", "score.render"):
            self.timings.pop(key, None)

        # --- crops + pose estimation --------------------------------------
        t0 = time.time()
        print("\n===> Estimate human pose...")
        # Fused crop+pose from raw frames: only uint8 frames go to the device
        # and only angles/joints come back (no crop-tensor host round trip).
        result, joint_cam, axis_angles = self.pose_estimator.run_from_frames(
            clip.frames, frames, bboxes
        )
        self.timings["pose"] = time.time() - t0

        if self.validate_rotations:
            validate_rotation_roundtrip(axis_angles)

        # --- single-frame debug branch ------------------------------------
        if self.debugging and self.debug_frame >= 0:
            print(f"\n===> Debug Result at frame #{self.debug_frame}")
            self._visualize_joint_cam_mesh(axis_angles, joint_cam, frames, debug_path)
            print("\n Debug files are saved in : ", debug_path)
            return None

        # --- additional info ------------------------------------------------
        add_info = load_add_info(self.cfg, info_path)

        pose_str = pose_to_str(result)
        if self.debugging and self.debug_joints is not None:
            save_csv_pose_log(
                pose_str, timestamp, self.debug_joints,
                self.smpl.joints_name_upper, debug_path,
            )

        print("\n===> Post Processing...")
        summary = {}
        t0 = time.time()
        for title, scorer, enabled in (
            ("REBA", self.reba, self.run_reba),
            ("RULA", self.rula, self.run_rula),
        ):
            if not enabled:
                continue
            t1 = time.time()
            results = scorer(result, joint_cam, add_info)
            self.timings["score.device"] = (
                self.timings.get("score.device", 0.0) + time.time() - t1
            )
            final_scores, scores, logs = post_process_scores(
                results, timestamp, output_path, title=title
            )
            if self.visualize:
                t1 = time.time()
                render_result_video(
                    clip.frames, bboxes, timestamp, clip.fps,
                    scores, scorer.eval_items, logs, output_path, title=title,
                )
                self.timings["score.render"] = (
                    self.timings.get("score.render", 0.0) + time.time() - t1
                )
            if self.debugging:
                save_score_log_csv(timestamp, scores, scorer.eval_items, logs, debug_path, title)
                save_eval_pose_log_csv(timestamp, scorer.log, debug_path, title)

            action_level, action_name = scorer.action_level(final_scores[4])
            write_result_txt(output_path, title, final_scores, action_level, action_name)
            summary[title] = (final_scores, action_level, action_name)
        self.timings["score"] = time.time() - t0

        # Structured run summary (extension over the reference: machine-
        # readable observability alongside the parity text files).
        with open(osp.join(output_path, "run_summary.json"), "w") as f:
            json.dump(
                {
                    "frames_total": int(timestamp[2]),
                    "frames_tracked": int(len(frames)),
                    "timings_sec": {k: round(v, 4) for k, v in self.timings.items()},
                    # Shared schema with stream_summary.json; NaN -> null
                    # (outputs.stats.scores_summary_block).
                    "scores": scores_summary_block(summary),
                },
                f,
                indent=2,
            )

        print("\n\n===> DONE!")
        print("Result files saved in ", output_path)
        print_result_summary(summary)
        return summary

    # ------------------------------------------------------------------
    def _visualize_joint_cam_mesh(self, axis_angles, joint_cam, frames, output_path):
        hits = np.flatnonzero(np.asarray(frames) == self.debug_frame)
        if hits.size == 0:
            raise ValueError(
                f"--debug_frame {self.debug_frame} is not among the selected "
                f"track's frames ({len(frames)} tracked frames in "
                f"[{int(np.min(frames))}, {int(np.max(frames))}])"
            )
        idx = int(hits[0])
        pose = axis_angles[idx].reshape(1, -1)
        # The CURRENT track's gender (person_genders switches it per track).
        verts, _ = self._lbs(self.pose_estimator.gender)(
            jnp.asarray(pose, jnp.float32))
        verts = np.asarray(verts, np.float32).reshape(-1, 3) * 1000
        save_obj(verts, self.smpl.face, osp.join(output_path, "smpl_model.obj"))
        vis_3d_pose(
            joint_cam[idx], self.smpl.skeleton,
            osp.join(output_path, "joint_3d.png"), frame=self.debug_frame,
        )
