"""Production int8 calibration lifecycle (VERDICT r2 #3).

The implicit lifecycle (first call / first window pins the activation
scales) is fragile when a video opens on unrepresentative frames. These
tests pin the explicit surface: DetectorConfig.calibration routes scales
through operator-supplied representative frames BEFORE any video frame is
seen; reset_calibration() gives shared instances a per-video lifecycle.
"""

import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.io.video import load_calibration_frames
from poserisk_release_tpu.models import detector as det


def _frames(rng, n=8, h=96, w=128, lo=0, hi=255):
    return rng.randint(lo, hi, (n, h, w, 3)).astype(np.uint8)


def _in_scales(params):
    return {
        name: float(layer["in_scale"])
        for name, layer in params.items()
        if "in_scale" in layer
    }


@pytest.fixture(scope="module")
def yolo_params():
    return det.fold_bn_params(det.init_yolo_params(seed=0))


class TestLoadCalibrationFrames:
    def test_npy_roundtrip_and_even_subsample(self, tmp_path, rng):
        frames = _frames(rng, n=20)
        path = str(tmp_path / "calib.npy")
        np.save(path, frames)
        got = load_calibration_frames(path, n=5)
        assert got.shape == (5, 96, 128, 3)
        # Even coverage: first and last frames are always included.
        np.testing.assert_array_equal(got[0], frames[0])
        np.testing.assert_array_equal(got[-1], frames[-1])

    def test_image_dir(self, tmp_path, rng):
        import cv2

        for i in range(4):
            cv2.imwrite(str(tmp_path / f"f{i}.png"),
                        _frames(rng, n=1, h=60, w=80)[0])
        got = load_calibration_frames(str(tmp_path), n=3)
        assert got.shape[0] == 3 and got.shape[3] == 3

    def test_video_source(self, tmp_path, rng):
        import cv2

        path = str(tmp_path / "calib.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
        for f in _frames(rng, n=12):
            w.write(f)
        w.release()
        got = load_calibration_frames(path, n=4)
        assert got.shape == (4, 96, 128, 3)

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no images"):
            load_calibration_frames(str(tmp_path), n=4)

    def test_bad_array_shape_raises(self, tmp_path):
        path = str(tmp_path / "bad.npy")
        np.save(path, np.zeros((3, 4), np.uint8))
        with pytest.raises(ValueError, match="N, H, W, 3"):
            load_calibration_frames(path, n=4)


class TestDetectorCalibrationLifecycle:
    def test_explicit_calibration_is_source_determined(self, yolo_params, rng):
        """Scales from calibrate(representative) must equal a fresh
        instance's scales on the same frames and differ from dark-frame
        scales -- the explicit path is a pure function of its source."""
        bright = _frames(rng, lo=100, hi=255)
        dark = _frames(rng, lo=0, hi=12)

        def scales_for(frames):
            d = det.YoloDetector(params=dict(yolo_params), img_size=64,
                                 int8=True, batch_size=8,
                                 int8_min_downsample=1)
            d.calibrate(frames)
            return _in_scales(d.params)

        s_bright, s_bright2, s_dark = map(
            scales_for, (bright, bright.copy(), dark))
        assert s_bright == s_bright2
        assert s_bright != s_dark
        # conv_0's input is the letterboxed image itself: dark frames MUST
        # calibrate a smaller input scale there.
        assert s_dark["conv_0"] < s_bright["conv_0"]

    def test_calibrated_detector_ignores_later_frames(self, yolo_params, rng):
        """Once explicitly calibrated, running on any frames (incl. a dark
        opening window) must not move the scales."""
        d = det.YoloDetector(params=dict(yolo_params), img_size=64,
                             int8=True, batch_size=8,
                             int8_min_downsample=1)
        d.calibrate(_frames(rng, lo=100, hi=255))
        before = _in_scales(d.params)
        d(_frames(rng, lo=0, hi=10))  # dark video start
        assert _in_scales(d.params) == before

    def test_reset_calibration_rederives_scales(self, yolo_params, rng):
        d = det.YoloDetector(params=dict(yolo_params), img_size=64,
                             int8=True, batch_size=8,
                             int8_min_downsample=1)
        d.calibrate(_frames(rng, lo=100, hi=255))
        s1 = _in_scales(d.params)
        assert not d.needs_calibration

        d.reset_calibration()
        assert d.needs_calibration
        d.calibrate(_frames(rng, lo=0, hi=12))
        s2 = _in_scales(d.params)
        assert s1 != s2 and s2["conv_0"] < s1["conv_0"]

    def test_reset_without_quantization_is_noop(self, yolo_params):
        d = det.YoloDetector(params=dict(yolo_params), img_size=64,
                             int8=True, batch_size=8,
                             int8_min_downsample=1)
        d.reset_calibration()  # nothing quantized yet; must not raise
        assert d.needs_calibration


class TestPredictorExplicitCalibration:
    def test_dark_opening_window_does_not_pin_scales(
        self, tmp_path, small_chunk_config, rng
    ):
        """THE production caveat (pipeline.py's windowed-ingest note): a
        video whose first detector window is black must NOT determine the
        int8 scales when DetectorConfig.calibration supplies representative
        frames. The detector's final scales must equal the pure explicit
        calibration of that source."""
        import cv2

        from poserisk_release_tpu.pipeline import Predictor

        bright = _frames(rng, n=10, lo=80, hi=255)
        calib_path = str(tmp_path / "calib.npy")
        np.save(calib_path, bright)

        video = str(tmp_path / "dark_open.mp4")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
        dark = np.zeros((96, 128, 3), np.uint8)
        person = _frames(rng, n=1, lo=60, hi=220)[0]
        for _ in range(8):  # first window: black
            wr.write(dark)
        for _ in range(8):
            wr.write(person)
        wr.release()

        cfg = small_chunk_config.replace(DETECTOR={
            "calibration": calib_path,
            "calibration_frames": 8,
            "img_size": 64,
            "int8": True,
            "batch_size": 8,
        })
        params = det.fold_bn_params(det.init_yolo_params(seed=0))
        d = det.YoloDetector(params=params, img_size=64, int8=True,
                             batch_size=8, int8_min_downsample=1)
        predictor = Predictor(cfg=cfg, detector=d, visualize=False)
        try:
            predictor(video, "missing.json", str(tmp_path / "out"))
        except ValueError:
            pass  # random weights may detect no one; calibration already ran

        expected = det.YoloDetector(
            params=det.fold_bn_params(det.init_yolo_params(seed=0)),
            img_size=64, int8=True, batch_size=8, int8_min_downsample=1,
        )
        expected.calibrate(load_calibration_frames(calib_path, n=8))
        assert _in_scales(d.params) == _in_scales(expected.params)

    def test_recalibrate_per_video_resets_between_calls(
        self, tmp_path, small_chunk_config, rng
    ):
        """Shared-instance lifecycle: with recalibrate_per_video=True the
        second video's scales come from the second video, not the first."""
        import cv2

        from poserisk_release_tpu.pipeline import Predictor

        def write_video(path, frames):
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
            for f in frames:
                wr.write(f)
            wr.release()

        v_bright = str(tmp_path / "bright.mp4")
        v_dark = str(tmp_path / "dark.mp4")
        write_video(v_bright, _frames(rng, n=8, lo=100, hi=255))
        write_video(v_dark, _frames(rng, n=8, lo=0, hi=12))

        cfg = small_chunk_config.replace(DETECTOR={
            "recalibrate_per_video": True,
            "img_size": 64,
            "int8": True,
            "batch_size": 8,
        })
        d = det.YoloDetector(
            params=det.fold_bn_params(det.init_yolo_params(seed=0)),
            img_size=64, int8=True, batch_size=8, int8_min_downsample=1,
        )
        predictor = Predictor(cfg=cfg, detector=d, visualize=False)

        def run(video):
            try:
                predictor(video, "missing.json", str(tmp_path / "out"))
            except ValueError:
                pass  # no tracked person under random weights is fine
            return _in_scales(d.params)

        s_bright = run(v_bright)
        s_dark = run(v_dark)
        assert s_bright != s_dark
        assert s_dark["conv_0"] < s_bright["conv_0"]


class TestSpinExplicitCalibration:
    def test_calibrate_spin_quantizes_once(self, small_chunk_config, rng):
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.pipeline import PoseEstimator

        cfg = small_chunk_config
        est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir),
                            spin_int8=True)
        assert est.spin_needs_calibration
        crops = rng.uniform(0, 1, (4, 224, 224, 3)).astype(np.float32)
        est.calibrate_spin(crops)
        assert not est.spin_needs_calibration
        quant = est._quant_backbone
        est.calibrate_spin(crops)  # second call: no-op
        assert est._quant_backbone is quant
        # Calibrated estimator still produces angles.
        euler, joints, aa = est.run(crops)
        assert euler.shape == (4, 24, 3) and np.isfinite(euler).all()
