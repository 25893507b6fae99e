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


class TestCalibrationGuards:
    def test_float_calibration_array_raises(self, tmp_path, rng):
        """astype(uint8) on [0,1] floats would truncate every pixel to 0 and
        calibrate the detector on black; the loader must refuse instead."""
        path = str(tmp_path / "calib_f32.npy")
        np.save(path, rng.uniform(0, 1, (6, 96, 128, 3)).astype(np.float32))
        with pytest.raises(ValueError, match="uint8"):
            load_calibration_frames(path, n=4)

    def test_min_downsample_above_spec_raises(self, yolo_params, rng):
        """min_downsample > 32 quantizes zero convs; silently accepting it
        would leave needs_calibration True forever (full calibration walk +
        param re-upload on EVERY call)."""
        frames = _frames(rng)
        from poserisk_release_tpu.ops.crop import letterbox_device_rect

        letter = letterbox_device_rect(jnp.asarray(frames[:2]), 64)
        scales = det.calibrate_yolo_activations(yolo_params, letter)
        with pytest.raises(ValueError, match="zero convs"):
            det.quantize_yolo_params(yolo_params, scales, min_downsample=64)


class TestExplicitSourceSkipsPerVideoReset:
    def test_no_reset_when_explicit_source_set(
        self, tmp_path, small_chunk_config, rng, monkeypatch
    ):
        """recalibrate_per_video + an explicit calibration source: the
        explicit scales are a pure function of the static source, so the
        Predictor must NOT reset+re-derive them on every video (each
        re-derivation is a full float-tower pass)."""
        import cv2

        from poserisk_release_tpu.pipeline import Predictor

        calib_path = str(tmp_path / "calib.npy")
        np.save(calib_path, _frames(rng, n=8, lo=60, hi=230))
        video = str(tmp_path / "v.mp4")
        wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (128, 96))
        for f in _frames(rng, n=8, lo=40, hi=220):
            wr.write(f)
        wr.release()

        cfg = small_chunk_config.replace(DETECTOR={
            "calibration": calib_path,
            "calibration_frames": 8,
            "recalibrate_per_video": True,
            "img_size": 64,
            "int8": True,
            "batch_size": 8,
        })
        d = det.YoloDetector(
            params=det.fold_bn_params(det.init_yolo_params(seed=0)),
            img_size=64, int8=True, batch_size=8, int8_min_downsample=1,
        )
        resets = []
        monkeypatch.setattr(
            d, "reset_calibration", lambda: resets.append(1))
        predictor = Predictor(cfg=cfg, detector=d, visualize=False)

        def run():
            try:
                predictor(video, "missing.json", str(tmp_path / "out"))
            except ValueError:
                pass  # random weights may track no one
            return _in_scales(d.params)

        s1 = run()
        s2 = run()
        assert resets == []          # explicit source -> reset skipped
        assert s1 == s2 and s1      # scales stable and quantized


class TestStreamingExplicitCalibration:
    def test_streaming_estimator_gets_explicit_scales(
        self, tmp_path, small_chunk_config, rng
    ):
        """The streaming path shares the Predictor's calibration lifecycle:
        apply_explicit_calibration on a StreamingScorer's detector must
        produce exactly the scales of a pure explicit calibration."""
        from poserisk_release_tpu.pipeline import apply_explicit_calibration
        from poserisk_release_tpu.streaming import StreamingScorer

        calib_path = str(tmp_path / "calib.npy")
        np.save(calib_path, _frames(rng, n=8, lo=80, hi=255))
        cfg = small_chunk_config.replace(DETECTOR={
            "calibration": calib_path,
            "calibration_frames": 8,
            "img_size": 64,
            "int8": True,
            "batch_size": 8,
        })
        d = det.YoloDetector(
            params=det.fold_bn_params(det.init_yolo_params(seed=0)),
            img_size=64, int8=True, batch_size=8, int8_min_downsample=1,
        )
        scorer = StreamingScorer(cfg=cfg, detector=d, window=8)
        apply_explicit_calibration(cfg, scorer.detector, scorer.estimator)
        assert not d.needs_calibration

        expected = det.YoloDetector(
            params=det.fold_bn_params(det.init_yolo_params(seed=0)),
            img_size=64, int8=True, batch_size=8, int8_min_downsample=1,
        )
        expected.calibrate(load_calibration_frames(calib_path, n=8))
        assert _in_scales(d.params) == _in_scales(expected.params)

    def test_cli_streaming_routes_through_calibration(
        self, tmp_path, monkeypatch
    ):
        """--streaming + --calibration plumbing: run_streaming must invoke
        the shared apply_explicit_calibration (it used to silently ignore
        the flag and let the first window pin the scales)."""
        import cv2

        import poserisk_release_tpu.pipeline as pipeline_mod
        from poserisk_release_tpu.cli import main
        from poserisk_release_tpu.io.video import write_video
        from poserisk_release_tpu.models.detector import StubDetector

        calls = []
        monkeypatch.setattr(
            pipeline_mod, "apply_explicit_calibration",
            lambda cfg, detector, estimator: calls.append(
                cfg.DETECTOR.calibration),
        )
        monkeypatch.setattr(
            pipeline_mod, "build_detector", lambda cfg: StubDetector())

        frames = []
        for i in range(8):
            img = np.full((120, 160, 3), 30, np.uint8)
            cv2.rectangle(img, (60, 20), (110, 100), (170, 150, 120), -1)
            frames.append(img)
        video = str(tmp_path / "v.mp4")
        write_video(frames, fps=8.0, file_path=video)
        calib = str(tmp_path / "calib.npy")
        np.save(calib, _frames(rng=np.random.RandomState(0), n=4))

        rc = main([
            "--cpu", "--streaming", "--streaming_window", "8",
            "--calibration", calib,
            "--input", video, "--info", "missing.json",
            "--output", str(tmp_path / "out"),
        ])
        assert rc == 0
        assert calls == [calib]


class TestSpinRecalibratePerVideo:
    """reset_calibration on the SPIN side of the int8 lifecycle: the flag's
    help text promises 're-derive int8 scales at the start of every video',
    which must cover the --spin_int8 backbone, not only the detector."""

    def _estimator(self, small_chunk_config, recalibrate: bool):
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.pipeline import PoseEstimator

        cfg = small_chunk_config.replace(
            DETECTOR={"recalibrate_per_video": recalibrate})
        return PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir),
                             spin_int8=True)

    def test_reset_requantizes_from_new_crops(self, small_chunk_config, rng):
        est = self._estimator(small_chunk_config, recalibrate=True)
        bright = rng.uniform(0.5, 1.0, (4, 224, 224, 3)).astype(np.float32)
        dark = rng.uniform(0.0, 0.05, (4, 224, 224, 3)).astype(np.float32)

        est.calibrate_spin(bright)
        quant_a = est._quant_backbone
        assert not est.spin_needs_calibration

        est.reset_calibration()
        assert est.spin_needs_calibration
        est.calibrate_spin(dark)
        quant_b = est._quant_backbone
        assert quant_b is not None and quant_b is not quant_a
        euler, joints, _ = est.run(dark)
        assert np.isfinite(euler).all()

    def test_reset_without_flag_raises(self, small_chunk_config, rng):
        """Without recalibrate_per_video the f32 tree is released at
        quantization time (memory), so a later reset cannot re-fold; it must
        fail loudly rather than silently keep the stale backbone."""
        est = self._estimator(small_chunk_config, recalibrate=False)
        est.calibrate_spin(
            rng.uniform(0, 1, (4, 224, 224, 3)).astype(np.float32))
        with pytest.raises(RuntimeError, match="recalibrate_per_video"):
            est.reset_calibration()

    def test_reset_before_quantization_is_noop(self, small_chunk_config):
        est = self._estimator(small_chunk_config, recalibrate=True)
        est.reset_calibration()  # nothing quantized yet
        assert est.spin_needs_calibration

    def test_reset_noop_when_spin_int8_off(self, small_chunk_config):
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.pipeline import PoseEstimator

        cfg = small_chunk_config
        est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
        est.reset_calibration()  # must not raise


class TestPerVideoResetReachesBothTowers:
    def _video(self, tmp_path, rng, name="v.mp4"):
        import cv2

        path = str(tmp_path / name)
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (128, 96))
        for f in _frames(rng, n=6, lo=40, hi=220):
            wr.write(f)
        wr.release()
        return path

    def test_predictor_resets_spin_backbone_per_video(
        self, tmp_path, small_chunk_config, rng, monkeypatch
    ):
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import Predictor

        cfg = small_chunk_config.replace(
            DETECTOR={"recalibrate_per_video": True})
        predictor = Predictor(cfg=cfg, detector=StubDetector(),
                              visualize=False)
        resets = []
        monkeypatch.setattr(predictor.pose_estimator, "reset_calibration",
                            lambda: resets.append(1))
        video = self._video(tmp_path, rng)
        predictor(video, "missing.json", str(tmp_path / "out"))
        assert resets == [1]

    def test_streaming_scorer_resets_both_per_call(
        self, tmp_path, small_chunk_config, rng, monkeypatch
    ):
        """--streaming used to silently ignore recalibrate_per_video; the
        lifecycle now lives in StreamingScorer.__call__ so library users and
        the CLI directory loop both get it."""
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.streaming import StreamingScorer

        class ResettableStub(StubDetector):
            def __init__(self):
                self.resets = 0

            def reset_calibration(self):
                self.resets += 1

        cfg = small_chunk_config.replace(
            DETECTOR={"recalibrate_per_video": True})
        d = ResettableStub()
        scorer = StreamingScorer(cfg=cfg, detector=d, window=8)
        est_resets = []
        monkeypatch.setattr(scorer.estimator, "reset_calibration",
                            lambda: est_resets.append(1))
        from poserisk_release_tpu.pipeline import load_add_info

        video = self._video(tmp_path, rng)
        add_info = load_add_info(cfg, "missing.json")
        scorer(video, add_info)
        scorer(video, add_info)
        assert d.resets == 2 and est_resets == [1, 1]

    def test_streaming_reset_skipped_with_explicit_source(
        self, tmp_path, small_chunk_config, rng, monkeypatch
    ):
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.streaming import StreamingScorer

        calib = str(tmp_path / "calib.npy")
        np.save(calib, _frames(rng, n=4))
        cfg = small_chunk_config.replace(DETECTOR={
            "recalibrate_per_video": True, "calibration": calib})
        scorer = StreamingScorer(cfg=cfg, detector=StubDetector(), window=8)
        est_resets = []
        monkeypatch.setattr(scorer.estimator, "reset_calibration",
                            lambda: est_resets.append(1))
        from poserisk_release_tpu.pipeline import load_add_info

        scorer(self._video(tmp_path, rng), load_add_info(cfg, "missing.json"))
        assert est_resets == []
