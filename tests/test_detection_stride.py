"""Detection-stride throughput mode (DetectorConfig.detection_stride).

Opt-in deviation from the reference's detect-every-frame contract
(/root/reference/lib/core/base.py:38-46 runs YOLO on every dumped frame):
detect only every Nth frame globally, track on the downsampled clip, and
fill each surviving track's gaps by linear bbox interpolation
(tracking/mpt.interpolate_track_gaps -- same gap policy as the reference's
keypoint-path smooth_bbox interpolation, lib/utils/smooth_bbox.py).
"""

import numpy as np
import pytest

from poserisk_release_tpu.tracking.mpt import (
    MultiPersonTracker,
    filter_and_select_target,
    interpolate_track_gaps,
)


def make_clip(n=40, H=120, W=160):
    """Bright rectangle translating 1 px/frame horizontally, 0.5 px/frame
    vertically -- linear motion, so interpolated boxes are exact."""
    frames = np.zeros((n, H, W, 3), np.uint8)
    for i in range(n):
        x, y = 20 + i, 10 + i // 2
        frames[i, y : y + 60, x : x + 30] = 200
    return frames


class PixelDetector:
    """Perfect detector: reads the rectangle from the pixels, so it works on
    any frame subset (scripted stubs replay by call order and would
    desynchronise under subsampling)."""

    def __init__(self):
        self.seen = []  # (H-sum fingerprints unused; records call batch sizes)

    def __call__(self, frames_rgb):
        self.seen.append(len(frames_rgb))
        out = []
        for f in frames_rgb:
            ys, xs = np.nonzero(f[..., 0] > 100)
            out.append(
                np.array(
                    [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1, 0.9]],
                    np.float32,
                )
            )
        return out


def true_box_cxcywh(i):
    x, y = 20 + i, 10 + i // 2
    side = 60.0  # squared to max(30, 60)
    return np.array([x + 15.0, y + 30.0, side, side])


class TestInterpolateTrackGaps:
    def test_endpoints_exact_midpoints_linear(self):
        tr = {
            1: {
                "frames": np.array([0, 4]),
                "bbox": np.array([[10.0, 20.0, 30.0, 30.0],
                                  [18.0, 28.0, 38.0, 38.0]]),
            }
        }
        out = interpolate_track_gaps(tr)[1]
        assert out["frames"].tolist() == [0, 1, 2, 3, 4]
        np.testing.assert_allclose(out["bbox"][0], tr[1]["bbox"][0])
        np.testing.assert_allclose(out["bbox"][-1], tr[1]["bbox"][1])
        np.testing.assert_allclose(out["bbox"][2], [14.0, 24.0, 34.0, 34.0])

    def test_gapless_and_single_frame_tracks_unchanged(self):
        tr = {
            1: {"frames": np.array([3, 4, 5]),
                "bbox": np.tile([5.0, 5.0, 9.0, 9.0], (3, 1))},
            2: {"frames": np.array([7]),
                "bbox": np.array([[1.0, 2.0, 3.0, 3.0]])},
        }
        out = interpolate_track_gaps(tr)
        for pid in (1, 2):
            np.testing.assert_array_equal(out[pid]["frames"], tr[pid]["frames"])
            np.testing.assert_array_equal(out[pid]["bbox"], tr[pid]["bbox"])

    def test_squared_boxes_stay_squared(self):
        tr = {
            1: {
                "frames": np.array([0, 6]),
                "bbox": np.array([[10.0, 10.0, 40.0, 40.0],
                                  [30.0, 30.0, 80.0, 80.0]]),
            }
        }
        out = interpolate_track_gaps(tr)[1]
        np.testing.assert_allclose(out["bbox"][:, 2], out["bbox"][:, 3])


class TestStridedTracking:
    def test_stride_1_matches_default(self):
        frames = make_clip()
        a = MultiPersonTracker(PixelDetector())(frames)
        b = MultiPersonTracker(PixelDetector(), detection_stride=1)(frames)
        (ta,), (tb,) = a.values(), b.values()
        np.testing.assert_array_equal(ta["frames"], tb["frames"])
        np.testing.assert_allclose(ta["bbox"], tb["bbox"])

    def test_invalid_stride_raises(self):
        with pytest.raises(ValueError, match="detection_stride"):
            MultiPersonTracker(PixelDetector(), detection_stride=0)

    @pytest.mark.parametrize("stride", [2, 4])
    def test_strided_track_covers_every_frame_with_accurate_boxes(self, stride):
        frames = make_clip()
        det = PixelDetector()
        results = MultiPersonTracker(det, detection_stride=stride)(frames)
        bbox, fidx = filter_and_select_target(results, len(frames))
        # Detector saw only the strided subset.
        assert sum(det.seen) == len(range(0, len(frames), stride))
        # Contiguous frame coverage between first and last detection.
        assert fidx.tolist() == list(range(fidx[0], fidx[-1] + 1))
        assert fidx[-1] == (len(frames) - 1) // stride * stride
        # Linear motion -> interpolated boxes track ground truth closely
        # (SORT's Kalman smoothing keeps detected frames within ~2 px too).
        for f, b in zip(fidx, bbox):
            np.testing.assert_allclose(b, true_box_cxcywh(int(f)), atol=3.0)

    def test_window_boundaries_keep_global_stride_phase(self):
        """Windows of a length coprime to the stride: detected frames must
        still be the GLOBAL stride multiples (phase from start_idx)."""
        frames = make_clip(n=31)
        det = PixelDetector()
        windows = [(s, frames[s : s + 7]) for s in range(0, 31, 7)]
        results = MultiPersonTracker(det, detection_stride=3).track_windows(windows)
        whole = MultiPersonTracker(PixelDetector(), detection_stride=3)(frames)
        (tw,), (tr,) = whole.values(), results.values()
        np.testing.assert_array_equal(tw["frames"], tr["frames"])
        np.testing.assert_allclose(tw["bbox"], tr["bbox"], atol=1e-9)

    def test_streaming_track_pass_matches_batch_tracker(self, tmp_path):
        import cv2

        from poserisk_release_tpu.config import default_config
        from poserisk_release_tpu.streaming import StreamingScorer

        frames = make_clip(n=24)
        video = str(tmp_path / "v.mp4")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (frames.shape[2], frames.shape[1]))
        for f in frames:
            wr.write(f[..., ::-1])
        wr.release()
        # Re-decode so both trackers see the SAME (lossy) pixels.
        cap = cv2.VideoCapture(video)
        decoded = []
        while True:
            ok, img = cap.read()
            if not ok:
                break
            decoded.append(img[..., ::-1])
        cap.release()
        decoded = np.asarray(decoded)

        cfg = default_config().replace(DETECTOR={"detection_stride": 3})
        scorer = StreamingScorer(cfg=cfg, detector=PixelDetector(), window=7)
        stream_tracks, total, _fps = scorer._track_pass(video, None)
        batch_tracks = MultiPersonTracker(
            PixelDetector(), detection_stride=3)(decoded)
        assert total == 24
        (ts,), (tb,) = stream_tracks.values(), batch_tracks.values()
        np.testing.assert_array_equal(ts["frames"], tb["frames"])
        np.testing.assert_allclose(ts["bbox"], tb["bbox"], atol=1e-9)


def make_reversing_clip(n=56, H=160, W=240, turn=26, speed=3):
    """Rectangle translating +speed px/frame, sharply reversing at `turn` --
    the motion class where a fixed detection stride fails hardest: SORT's
    constant-velocity prediction overshoots the turn by speed*stride px, the
    IoU association breaks, and the track DIES mid-clip."""
    frames = np.zeros((n, H, W, 3), np.uint8)
    xs = []
    for i in range(n):
        x = 30 + speed * (i if i <= turn else 2 * turn - i)
        xs.append(x)
        frames[i, 30:110, x : x + 60] = 200
    return frames, np.asarray(xs, np.float64)


class TestAdaptiveStride:
    def test_static_scene_costs_exactly_the_fixed_stride(self):
        """The velocity gate: no motion between endpoints -> zero probes, so
        the adaptive schedule's cost floor IS the fixed stride."""
        frames = np.zeros((32, 120, 160, 3), np.uint8)
        frames[:, 20:80, 40:70] = 200
        det = PixelDetector()
        MultiPersonTracker(det, detection_stride=8, adaptive=True)(frames)
        assert sum(det.seen) == 4  # frames 0, 8, 16, 24 only

    def test_reversing_motion_dominates_fixed_stride(self):
        """The accuracy/throughput frontier claim, measured (docs/PERF.md
        round 5): at max stride 8 on a sharp reversal, the FIXED stride's
        track dies at the turn (constant-velocity overshoot breaks IoU
        association), losing more than half the person's frames; the
        adaptive schedule spends ~6 extra detections (still < 1/4 of the
        stride-1 cost) bisecting the turn, keeps ONE live track covering
        every strided frame, and bounds the box error."""
        frames, xs = make_reversing_clip()

        def run(adaptive, stride=8, tol=0.1):
            det = PixelDetector()
            results = MultiPersonTracker(
                det, detection_stride=stride, adaptive=adaptive,
                adaptive_tol=tol)(frames)
            bbox, fidx = filter_and_select_target(results, len(frames))
            err = {int(f): abs(b[0] - (xs[int(f)] + 30.0))
                   for f, b in zip(fidx, bbox)}
            return err, sum(det.seen)

        err_fixed, n_fixed = run(adaptive=False)
        err_adap, n_adap = run(adaptive=True)
        # Fixed stride: the selected track ends AT the reversal (frame 24)
        # -- the clip's second half is silently lost.
        assert max(err_fixed) == 24
        # Adaptive: one track spanning first to last strided detection
        # (48 = last stride-8 multiple; no extrapolation past it),
        # contiguous coverage, bounded box error even through the turn.
        assert min(err_adap) == 0 and max(err_adap) == 48
        assert sorted(err_adap) == list(range(0, 49))
        assert max(err_adap.values()) < 10.0  # px, on an 80-px box
        # Cost: a handful of probes concentrated at the turn, far below
        # the stride-1 contract's 56 detections.
        assert n_fixed <= n_adap <= n_fixed + 8, (n_fixed, n_adap)
        assert n_adap <= len(frames) // 4

    def test_adaptive_streaming_matches_batch_tracker_same_windows(self,
                                                                   tmp_path):
        """The adaptive schedule is deterministic per windowing: streaming
        _track_pass and the batch tracker fed the SAME windows agree
        exactly (refinement is window-local by design, so different window
        sizes may probe differently -- documented in
        adaptive_window_detections)."""
        import cv2

        from poserisk_release_tpu.config import default_config
        from poserisk_release_tpu.streaming import StreamingScorer

        frames, _ = make_reversing_clip(n=28)
        video = str(tmp_path / "v.mp4")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (frames.shape[2], frames.shape[1]))
        for f in frames:
            wr.write(f[..., ::-1])
        wr.release()
        cap = cv2.VideoCapture(video)
        decoded = []
        while True:
            ok, img = cap.read()
            if not ok:
                break
            decoded.append(img[..., ::-1])
        cap.release()
        decoded = np.asarray(decoded)

        cfg = default_config().replace(
            DETECTOR={"detection_stride": 4, "adaptive_stride": True})
        scorer = StreamingScorer(cfg=cfg, detector=PixelDetector(), window=7)
        stream_tracks, total, _fps = scorer._track_pass(video, None)
        windows = [(s, decoded[s: s + 7]) for s in range(0, len(decoded), 7)]
        batch_tracks = MultiPersonTracker(
            PixelDetector(), detection_stride=4,
            adaptive=True).track_windows(windows)
        assert total == 28
        (ts,), (tb,) = stream_tracks.values(), batch_tracks.values()
        np.testing.assert_array_equal(ts["frames"], tb["frames"])
        np.testing.assert_allclose(ts["bbox"], tb["bbox"], atol=1e-9)

    def test_adaptive_validation(self):
        from poserisk_release_tpu.config import default_config

        with pytest.raises(ValueError, match="adaptive"):
            MultiPersonTracker(PixelDetector(), adaptive=True)
        with pytest.raises(ValueError, match="adaptive_stride"):
            default_config().replace(DETECTOR={"adaptive_stride": True})


class TestFullFrameStepStride:
    def test_det_stride_shapes_and_pose_parity(self, small_chunk_config):
        """det_stride changes ONLY the detector coverage: scores equal the
        stride-1 step's, det_best shrinks to ceil(B / stride)."""
        import jax
        import jax.numpy as jnp

        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.pipeline import PoseEstimator
        from poserisk_release_tpu.throughput import (
            default_packed_infos,
            make_full_frame_step,
        )

        cfg = small_chunk_config
        est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
        info_reba, info_rula = map(jnp.asarray, default_packed_infos())
        rng = np.random.RandomState(0)
        frames = jnp.asarray(rng.randint(0, 255, (8, 90, 160, 3)), jnp.uint8)
        bboxes = jnp.asarray(np.tile([80.0, 45.0, 60.0, 60.0], (8, 1)),
                             jnp.float32)

        def run(stride):
            step = jax.jit(make_full_frame_step(
                cfg.SPIN.ief_iters, est.parents, img_size=64,
                det_stride=stride))
            yolo = _tiny_yolo()
            return step(yolo, est.variables, est.smpl_params, frames, bboxes,
                        info_reba, info_rula)

        def _tiny_yolo():
            from poserisk_release_tpu.models.detector import (
                fold_bn_params,
                init_yolo_params,
            )

            return fold_bn_params(init_yolo_params(seed=0))

        reba1, rula1, det1 = run(1)
        reba3, rula3, det3 = run(3)
        assert det1.shape[0] == 8 and det3.shape[0] == 3
        np.testing.assert_array_equal(np.asarray(reba1), np.asarray(reba3))
        np.testing.assert_array_equal(np.asarray(rula1), np.asarray(rula3))
        np.testing.assert_allclose(
            np.asarray(det1)[::3], np.asarray(det3), rtol=1e-6)


class TestOnlineStreamingStride:
    def test_online_mode_backfills_between_detections(self, tmp_path):
        """Online streaming detects every Nth frame and scores EVERY frame
        between the target's first and last detection -- skipped frames
        wait in a bounded ring and get boxes interpolated between the
        surrounding detections (PARITY.md #5; the deeper equality with the
        two-pass mode is pinned in tests/test_streaming.py)."""
        import cv2

        from poserisk_release_tpu.config import default_config
        from poserisk_release_tpu.streaming import StreamingScorer

        frames = make_clip(n=24)
        video = str(tmp_path / "v.mp4")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (frames.shape[2], frames.shape[1]))
        for f in frames:
            wr.write(f[..., ::-1])
        wr.release()

        import json
        import os.path as osp

        import poserisk_release_tpu

        info = json.load(open(osp.join(
            osp.dirname(poserisk_release_tpu.__file__),
            "default_information.json")))
        cfg = default_config().replace(DETECTOR={"detection_stride": 4})
        result = StreamingScorer(
            cfg=cfg, detector=PixelDetector(), window=7, selection="online",
        )(video, info)
        assert result.frames == list(range(0, 21))


class TestConfigStrideValidation:
    def test_stride_zero_rejected_at_config_level(self):
        """stride 0 divides by zero in the phase computation and stride < 0
        selects no frames at all; the guard lives on DetectorConfig so every
        consumer (batch tracker AND the streaming scorer, which builds its
        own selection) inherits it."""
        from poserisk_release_tpu.config import default_config

        for bad in (0, -2):
            with pytest.raises(ValueError, match="detection_stride"):
                default_config().replace(DETECTOR={"detection_stride": bad})

    def test_strided_local_indices_shared_rule(self):
        from poserisk_release_tpu.tracking.mpt import strided_local_indices

        # Global indices 0,3,6,... regardless of window boundaries.
        assert strided_local_indices(0, 8, 3) == [0, 3, 6]
        assert strided_local_indices(8, 8, 3) == [1, 4, 7]   # globals 9,12,15
        assert strided_local_indices(16, 2, 3) == []         # 18 is out of window
        assert strided_local_indices(18, 2, 3) == [0]        # global 18
        assert strided_local_indices(17, 1, 3) == []         # no multiple
        assert strided_local_indices(5, 4, 1) == [0, 1, 2, 3]
