"""Frozen dataclass configuration with strict-key YAML/flag override.

Key/value parity with the reference global config
(/root/reference/lib/core/config.py:17-85): the same section names
(DATASET / MODEL / SPIN / AUG / TEST) and defaults (workers=16, batch_size=8,
min_frame_ratio=0.33, bbox_scale=1.2, input_shape=(224,224), FOCAL_LENGTH=5000,
IMG_RES=224), and the same strict-key check on override (unknown keys raise
ValueError, mirroring update_config at config.py:63-85).

Unlike the reference's mutable global EasyDict, this is an immutable tree of
dataclasses: jit-compiled functions can safely close over it.
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from dataclasses import dataclass, field
from typing import Any, Mapping, Tuple

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


@dataclass(frozen=True)
class DatasetConfig:
    workers: int = 16
    batch_size: int = 8
    min_frame_ratio: float = 0.33
    bbox_scale: float = 1.2
    default_information: str = osp.join(
        _REPO_ROOT, "poserisk_release_tpu", "default_information.json"
    )
    # JPEG round-trip ingest parity mode: route every decoded frame through
    # '{output}/tmp/%09d.jpg' exactly like the reference (funcs_utils.py:42,
    # demo_dataset.py:59) so detector/SPIN inputs carry the same JPEG
    # artifacts. Off by default (the in-memory path is cleaner and faster);
    # turn on when byte-level input parity against the reference matters.
    jpeg_ingest: bool = False
    # Video-decode threads. 1 (default) = the serial one-window-lookahead
    # decoder. > 1 splits the clip into window-aligned segments decoded by
    # that many capture threads (io.video.iter_windows_parallel) -- frames
    # are guaranteed bit-identical to serial decode (guarded seek, automatic
    # serial fallback). At the device pipeline's measured throughput
    # (docs/PERF.md round 3) one decode thread is the production wall-clock
    # bottleneck; this is the TPU-native counterpart of the reference's
    # DataLoader workers (lib/core/config.py:31, base.py:123), which parallelised
    # crop loading but never the decode.
    decode_workers: int = 1

    def __post_init__(self) -> None:
        if self.decode_workers < 1:
            raise ValueError(
                f"DATASET.decode_workers must be >= 1, got {self.decode_workers}")


@dataclass(frozen=True)
class ModelConfig:
    input_shape: Tuple[int, int] = (224, 224)


@dataclass(frozen=True)
class SpinConfig:
    spin_dir: str = osp.join(_REPO_ROOT, "data", "spin_data")
    smpl_mean_params: str = osp.join(_REPO_ROOT, "data", "spin_data", "smpl_mean_params.npz")
    checkpoint: str = osp.join(_REPO_ROOT, "data", "spin_data", "model_checkpoint.pt")
    smpl_model_dir: str = osp.join(_REPO_ROOT, "data", "human_models")
    focal_length: float = 5000.0
    img_res: int = 224
    # Number of iterative-error-feedback refinement steps in the HMR head.
    ief_iters: int = 3
    # Mixed-precision boundary for the opt-in int8 SPIN backbone
    # (--spin_int8): quantize only ResNet stages >= this. 0 (whole
    # backbone) measured fastest in situ (1.29x vs bf16); 3 trades ~11%
    # throughput for 7% less angle drift (tools/exp_spin_mixed.py,
    # docs/PERF.md round 3).
    int8_min_stage: int = 0
    # Opt-in throughput mode (the SPIN-stage counterpart of
    # DETECTOR.detection_stride, for after the detector stride has made
    # SPIN the dominant stage): run crop+SPIN only on every Nth tracked
    # frame and geodesically interpolate (slerp) the skipped frames' joint
    # rotations between the surrounding anchors on device; Euler/joints/
    # scoring still cover every frame. 1 = the reference's
    # pose-every-frame contract. A behavioural deviation when > 1
    # (docs/PARITY.md): interpolated rotations approximate fast motion,
    # and the last N-1 frames of each processing chunk hold their anchor
    # pose instead of interpolating into the next chunk.
    pose_stride: int = 1
    # Space-to-depth stem layout (models/resnet.StemConv): the SAME 7x7/s2
    # stem convolution computed as s2d(2) + 4x4/s1 over exactly rearranged
    # weights -- 12 input channels per MXU pass instead of 3. Same outputs
    # to accumulation rounding (tests/test_spin.py: 2e-5 f32, inside the
    # 2e-4 torch-parity band); measured 1.03x on the product pose step
    # (tools/exp_spin_early.py, docs/PERF.md round 4). Applies to the
    # float/bf16 tower; the int8 backbone keeps its own raw-weight stem.
    stem_s2d: bool = True

    def __post_init__(self) -> None:
        if self.pose_stride < 1:
            raise ValueError(
                f"SPIN.pose_stride must be >= 1, got {self.pose_stride}")


@dataclass(frozen=True)
class AugConfig:
    flip: bool = False
    rotate_factor: float = 0.0


@dataclass(frozen=True)
class TestConfig:
    pass


@dataclass(frozen=True)
class DetectorConfig:
    """YOLOv3 person detector settings (reference: lib/core/base.py:38-46)."""

    img_size: int = 416
    detection_threshold: float = 0.1
    nms_threshold: float = 0.45
    weights: str = osp.join(_REPO_ROOT, "data", "detector", "yolov3.weights")
    # Detection is batch-invariant per frame; 64 amortises dispatch latency
    # on TPU (the reference used 8 to fit a GPU; lib/core/base.py:41).
    batch_size: int = 64
    # Rectangular detector canvas (ops.crop.rect_canvas_geometry): ~1.44x
    # fewer conv FLOPs on 800x450 ingest, same content scale/anchors/grid
    # congruence. Off by default: the strict square-canvas contract of the
    # upstream MPT detector (SURVEY.md 2.9); throughput mode turns it on.
    rect_letterbox: bool = False
    # int8 post-training quantization of the conv tower (1.43x over bf16;
    # models/detector.quantize_yolo_params). Opt-in, like rect_letterbox.
    int8: bool = False
    # Mixed-precision boundary for int8: only convs whose input sits at
    # >= this downsample factor quantize; shallower layers stay bf16.
    # Whole tower (1) measured fastest in situ (docs/PERF.md round 3);
    # 8 trades ~5% speed for 10 fewer quantized layers (accuracy).
    int8_min_downsample: int = 1
    # Device-side top-k detection pre-selection: the host pulls (B, k, 5)
    # instead of all ~10k decoded anchors (~40x less device->host traffic).
    # Results stay identical to the full pull -- chunks whose k-th score
    # still clears the threshold re-pull unfiltered. 0 disables.
    max_device_dets: int = 256
    # Opt-in throughput mode: run the detector only on every Nth frame
    # (global index stride) and fill each track's gaps by linear bbox
    # interpolation (tracking/mpt.interpolate_track_gaps). 1 = the
    # reference's detect-every-frame contract. A behavioural deviation
    # when > 1 (docs/PARITY.md): skipped frames get interpolated, not
    # detected, boxes -- the 1.2x bbox_scale crop margin absorbs small
    # box error, but fast in-plane motion can drift crops between
    # detections.
    detection_stride: int = 1
    # Motion-adaptive upgrade of detection_stride (opt-in,
    # tracking/mpt.adaptive_window_detections): detection_stride becomes
    # the MAX interval; intervals whose endpoint boxes move probe their
    # midpoint and keep bisecting while the midpoint detection disagrees
    # with linear interpolation by more than adaptive_tol of the box side.
    # Detections concentrate where the fixed stride's interpolation would
    # silently drift (reversals, accelerations, entrances); a static scene
    # costs exactly the fixed stride. Requires detection_stride > 1.
    adaptive_stride: bool = False
    adaptive_tol: float = 0.2
    # Explicit int8 calibration source (io/video.load_calibration_frames):
    # a video file, an image directory, or a .npy/.npz of (N, H, W, 3)
    # uint8 frames. When set, activation scales for the int8 detector (and
    # crops for the int8 SPIN backbone) come from these representative
    # frames BEFORE any video is processed -- a dark opening window can no
    # longer pin the scales (pipeline.py's implicit first-window lifecycle
    # remains the fallback when empty).
    calibration: str = ""
    # Frames drawn (evenly) from the calibration source.
    calibration_frames: int = 64
    # Shared-instance lifecycle: drop the int8 scales at the start of every
    # Predictor.__call__ so each video re-calibrates (from `calibration` if
    # set, else its own first window) instead of inheriting the previous
    # video's exposure statistics.
    recalibrate_per_video: bool = False

    def __post_init__(self) -> None:
        # Validated here (not only in MultiPersonTracker) so every consumer
        # of the config -- including the streaming scorer, which builds its
        # own window selection -- inherits the guard: stride 0 would divide
        # by zero in the phase computation and a negative stride would
        # silently select no frames at all.
        if self.detection_stride < 1:
            raise ValueError(
                f"DETECTOR.detection_stride must be >= 1, got {self.detection_stride}")
        if self.adaptive_stride and self.detection_stride <= 1:
            raise ValueError(
                "DETECTOR.adaptive_stride needs detection_stride > 1 (the "
                "stride is the adaptive schedule's MAX interval)")


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout (SURVEY.md section 5.8). The frame axis of a clip is
    data-parallel over chips; the remaining axes are the config-reachable
    model-parallel extensions (parallel/{spmd,pipeline,expert}.py). Setting
    any of them > 1 makes PoseEstimator build the N-D mesh itself
    (parallel.spmd.mesh_from_config) and place parameters/inputs
    accordingly -- no library plumbing needed; CLI flags --tp/--sp/--pp/--ep
    map straight onto these fields."""

    data_axis: str = "data"
    # Data-axis size. 0 => all devices left over after the model axes.
    num_devices: int = 0
    # On-device micro-batch of crops per step (frames per data shard per step).
    frames_per_step: int = 64
    # Tensor parallelism (axis 'model'): Megatron-style sharding of the HMR
    # parameter tree (parallel.spmd.spin_tp_specs). 1 = off.
    model: int = 1
    # Spatial partitioning (axis 'spatial'): the crop HEIGHT axis shards
    # across chips; XLA inserts the conv halo exchanges. 1 = off.
    spatial: int = 1
    # Pipeline parallelism (axis 'stage'): the HMR forward as a GPipe
    # schedule over a parameter-balanced block split, each device holding
    # ONLY its stage's parameters (parallel.pipeline). 1 = off.
    stage: int = 1
    # Microbatches per chunk under pipeline parallelism (the bubble
    # amortisation dial: S+M-1 ticks for M microbatches over S stages).
    stage_microbatches: int = 4
    # Expert parallelism (axis 'expert'): the gendered SMPL tables sharded
    # one-expert-per-row with dense-dispatch routing (parallel.expert);
    # pairs with per-track genders (--person_genders). 1 = off.
    expert: int = 1

    def __post_init__(self) -> None:
        for name in ("model", "spatial", "stage", "expert",
                     "stage_microbatches"):
            if getattr(self, name) < 1:
                raise ValueError(
                    f"PARALLEL.{name} must be >= 1, got {getattr(self, name)}")
        if self.expert > 1 and self.expert < 3:
            raise ValueError(
                "PARALLEL.expert must be >= 3 when enabled (one row per "
                f"gendered SMPL model), got {self.expert}")


@dataclass(frozen=True)
class Config:
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    SPIN: SpinConfig = field(default_factory=SpinConfig)
    AUG: AugConfig = field(default_factory=AugConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    DETECTOR: DetectorConfig = field(default_factory=DetectorConfig)
    PARALLEL: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **sections: Mapping[str, Any]) -> "Config":
        """Return a new Config with per-section field overrides.

        Strict-key semantics: an unknown section or field raises ValueError,
        matching the reference's update_config behaviour.
        """
        updates = {}
        for section_name, section_overrides in sections.items():
            if not hasattr(self, section_name):
                raise ValueError(f"{section_name} not exist in config")
            section = getattr(self, section_name)
            if dataclasses.is_dataclass(section) and isinstance(section_overrides, Mapping):
                valid = {f.name for f in dataclasses.fields(section)}
                for key in section_overrides:
                    if key not in valid:
                        raise ValueError(f"{section_name}.{key} not exist in config")
                updates[section_name] = dataclasses.replace(section, **section_overrides)
            else:
                raise ValueError(f"{section_name} override must be a mapping of fields")
        return dataclasses.replace(self, **updates)


def default_config() -> Config:
    return Config()


def load_yaml_config(path: str, base: Config | None = None) -> Config:
    """Load a YAML override file onto the default config (strict keys).

    Section keys are case-insensitive aliases of the dataclass sections so the
    reference's upper-case YAML section names keep working.
    """
    import yaml

    base = base or default_config()
    with open(path) as f:
        overrides = yaml.safe_load(f) or {}

    canonical = {f.name.upper(): f.name for f in dataclasses.fields(base)}
    mapped = {}
    for key, value in overrides.items():
        name = canonical.get(str(key).upper())
        if name is None:
            raise ValueError(f"{key} not exist in config")
        mapped[name] = value
    return base.replace(**mapped)
