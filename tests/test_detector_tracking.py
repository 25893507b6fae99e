"""Detector graph, darknet weight loader, SORT, MPT contract, and video IO."""

import os.path as osp

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.io.video import dump_frames, read_video, reference_resize_dims, write_video
from poserisk_release_tpu.models import detector as det
from poserisk_release_tpu.tracking.mpt import MultiPersonTracker, filter_and_select_target
from poserisk_release_tpu.tracking.sort import Sort, iou_xyxy


class TestYolo:
    @pytest.fixture(scope="class")
    def params(self):
        return det.init_yolo_params(seed=0)

    def test_conv_count_matches_cfg(self):
        assert len(det.conv_indices()) == 75  # canonical yolov3.cfg

    def test_forward_shapes(self, params):
        x = jnp.zeros((2, 416, 416, 3), jnp.float32)
        out = np.asarray(det.yolo_forward(params, x))
        # (13^2 + 26^2 + 52^2) * 3 anchors = 10647
        assert out.shape == (2, 10647, 5)
        assert np.isfinite(out).all()
        assert (out[..., 4] >= 0).all() and (out[..., 4] <= 1).all()

    def test_darknet_weight_roundtrip(self, params, tmp_path):
        """Serialise params into darknet binary layout, reload, compare."""
        chunks = [np.zeros(5, np.int32).tobytes()]
        for i in det.conv_indices():
            layer = params[f"conv_{i}"]
            if "scale" in layer:
                for name in ("bias", "scale", "mean", "var"):
                    chunks.append(np.asarray(layer[name], np.float32).tobytes())
            else:
                chunks.append(np.asarray(layer["conv_bias"], np.float32).tobytes())
            kernel_oihw = np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1))
            chunks.append(kernel_oihw.astype(np.float32).tobytes())
        path = tmp_path / "yolov3.weights"
        path.write_bytes(b"".join(chunks))

        loaded = det.load_darknet_weights(str(path))
        for i in det.conv_indices():
            for key, val in params[f"conv_{i}"].items():
                np.testing.assert_allclose(loaded[f"conv_{i}"][key], val, atol=1e-7)

    def test_detector_wrapper_end_to_end(self, params):
        d = det.YoloDetector(params=params, detection_threshold=0.999999)
        frames = np.zeros((2, 240, 320, 3), np.uint8)
        out = d(frames)
        assert len(out) == 2
        for r in out:
            assert r.shape[1] == 5  # (k, 5), likely k == 0 at this threshold

    def test_nms(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float64
        )
        scores = np.array([0.9, 0.8, 0.7])
        keep = det.nms_xyxy(boxes, scores, 0.45)
        assert keep.tolist() == [0, 2]


class TestSort:
    def test_single_steady_track(self):
        sort = Sort()
        ids = set()
        for i in range(10):
            box = np.array([[10 + 2 * i, 20, 60 + 2 * i, 140, 0.9]])
            tracks = sort.update(box)
            if i >= 2:  # confirmed after min_hits
                assert tracks.shape == (1, 5)
                ids.add(int(tracks[0, 4]))
        assert len(ids) == 1  # identity is stable

    def test_two_objects_keep_identity(self):
        sort = Sort()
        id_at_frame = []
        for i in range(12):
            dets = np.array(
                [
                    [10 + 3 * i, 10, 50 + 3 * i, 90, 0.9],
                    [300 - 3 * i, 10, 340 - 3 * i, 90, 0.9],
                ]
            )
            tracks = sort.update(dets)
            if i >= 3:
                assert tracks.shape[0] == 2
                # Order by x; left object keeps one id, right keeps the other.
                order = np.argsort(tracks[:, 0])
                id_at_frame.append(tuple(tracks[order, 4].astype(int)))
        assert len(set(id_at_frame)) == 1

    def test_track_dies_after_max_age(self):
        sort = Sort(max_age=1, min_hits=1)
        for _ in range(3):
            sort.update(np.array([[10, 10, 50, 90, 0.9]]))
        sort.update(np.zeros((0, 5)))
        sort.update(np.zeros((0, 5)))
        first = sort.update(np.array([[10, 10, 50, 90, 0.9]]))
        # Old track was pruned; a fresh track needs one update to confirm
        # (canonical SORT: creation does not count toward hit_streak).
        assert first.shape[0] == 0
        tracks = sort.update(np.array([[10, 10, 50, 90, 0.9]]))
        assert tracks.shape[0] == 1

    def test_iou(self):
        a = np.array([[0, 0, 10, 10]], np.float64)
        b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float64)
        iou = iou_xyxy(a, b)[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-9)


class TestMPTContract:
    def test_output_format_and_square_boxes(self):
        def detector(frames):
            return [
                np.array([[100, 50, 160, 190, 0.9]], np.float32)
                for _ in range(len(frames))
            ]

        frames = np.zeros((8, 240, 320, 3), np.uint8)
        results = MultiPersonTracker(detector)(frames)
        assert len(results) == 1
        track = next(iter(results.values()))
        assert set(track.keys()) == {"bbox", "frames"}
        # Squared: w == h == max(60, 140) == 140
        np.testing.assert_allclose(track["bbox"][:, 2], 140, atol=1e-6)
        np.testing.assert_allclose(track["bbox"][:, 3], 140, atol=1e-6)
        np.testing.assert_allclose(track["bbox"][0, :2], [130, 120], atol=1e-6)
        # Canonical SORT emits during the first min_hits frames
        # (frame_count <= min_hits), so every frame is covered.
        assert track["frames"].tolist() == list(range(8))

    def test_filter_and_select_target(self):
        results = {
            1: {"bbox": np.tile([50, 50, 40, 40], (30, 1)).astype(float),
                "frames": np.arange(30)},
            2: {"bbox": np.tile([50, 50, 90, 90], (5, 1)).astype(float),
                "frames": np.arange(5)},
        }
        # Track 2 is too short (5 < 0.33*30); big-but-short is dropped.
        bbox, frames = filter_and_select_target(results, total_frames=30)
        assert frames.shape[0] == 30
        assert bbox[0, 2] == 40

        # When nothing survives the filter, keep all and pick by area.
        bbox, frames = filter_and_select_target(results, total_frames=10**6)
        assert bbox[0, 2] == 90


class TestVideoIO:
    def test_resize_rule(self):
        assert reference_resize_dims(1920, 1080) == (800, 450)
        assert reference_resize_dims(640, 480) == (600, 450)
        assert reference_resize_dims(640, 360) == (640, 360)
        assert reference_resize_dims(810, 400) == (800, 395)

    def test_roundtrip(self, tmp_path, rng):
        frames_bgr = rng.randint(0, 255, size=(6, 120, 160, 3)).astype(np.uint8)
        path = str(tmp_path / "clip.mp4")
        write_video(list(frames_bgr), fps=10.0, file_path=path)
        clip = read_video(path)
        assert clip.num_frames == 6
        assert clip.fps == 10.0
        assert clip.frames.shape == (6, 120, 160, 3)

        n = dump_frames(clip, str(tmp_path / "tmp"))
        assert n == 6
        assert osp.isfile(str(tmp_path / "tmp" / "000000000.jpg"))

    def test_resize_applied_on_read(self, tmp_path, rng):
        frames_bgr = rng.randint(0, 255, size=(3, 1080, 1920, 3)).astype(np.uint8)
        path = str(tmp_path / "big.mp4")
        write_video(list(frames_bgr), fps=30.0, file_path=path)
        clip = read_video(path)
        assert clip.frames.shape[1:3] == (450, 800)
