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

    def test_yolo_bias_correction_zeroes_first_conv_mean_error(self, params):
        """bias_correct_yolo's defining property: on the calibration batch,
        the per-channel MEAN of (float conv - int8 conv) at a corrected
        layer becomes ~zero (it is folded into q_bias_leaky). Asserted at
        conv_0, where the inputs are identical for both paths; decoded
        scores are intentionally NOT asserted (measured neutral through the
        saturated decode sigmoids on random weights -- see the docstring)."""
        rng = np.random.RandomState(5)
        frames = rng.randint(0, 255, (4, 96, 128, 3)).astype(np.uint8)
        from poserisk_release_tpu.ops.crop import letterbox_device

        letter = letterbox_device(jnp.asarray(frames), 64)
        folded = det.fold_bn_params(params)
        qp = det.quantize_yolo_params(
            folded, det.calibrate_yolo_activations(folded, letter),
            min_downsample=1,  # whole tower: the assertion probes conv_0
        )
        qp_bc = det.bias_correct_yolo(folded, qp, letter)

        def conv0(layer_p, entry=det.YOLOV3_SPEC[0]):
            return det._conv_block(letter, layer_p, entry, jnp.float32)

        y_f = np.asarray(conv0(folded["conv_0"]))
        y_q = np.asarray(conv0(qp["conv_0"]))
        y_bc = np.asarray(conv0(qp_bc["conv_0"]))
        # The correction zeroes the PRE-leaky channel-mean error on this
        # batch; post-leaky (piecewise-linear) the aggregate must still
        # shrink decisively.
        mean_err_plain = np.abs((y_f - y_q).mean(axis=(0, 1, 2)))
        mean_err_bc = np.abs((y_f - y_bc).mean(axis=(0, 1, 2)))
        assert mean_err_bc.mean() < mean_err_plain.mean()
        assert np.isfinite(y_bc).all()

    def test_topk_path_identical_to_full_pull(self, params):
        """Device-side top-k pre-selection must never change host results.

        Case 1 (genuine top-k): threshold set between the 24th and 25th best
        score so ~24 << k anchors survive -> the k-th score is below the
        threshold, no fallback, and results must equal the full pull exactly.
        Case 2 (fallback): near-zero threshold -> every anchor clears it, the
        k-th score trips the truncation guard, and the wrapper re-pulls the
        full set -- again identical results."""
        rng = np.random.RandomState(3)
        frames = rng.randint(0, 255, (2, 96, 128, 3)).astype(np.uint8)
        from poserisk_release_tpu.ops.crop import letterbox_device

        letter = letterbox_device(jnp.asarray(frames), 64)
        scores = np.asarray(det.yolo_forward(params, letter, 64))[..., 4]
        srt = np.sort(scores.reshape(-1))[::-1]
        thr = float((srt[23] + srt[24]) / 2)

        def run(threshold, k):
            d = det.YoloDetector(params=params, img_size=64,
                                 detection_threshold=threshold,
                                 max_device_dets=k, batch_size=2)
            return d(frames)

        for threshold in (thr, 1e-9):
            full = run(threshold, 0)
            topk = run(threshold, 64)
            assert len(full) == len(topk) == 2
            for a, b in zip(full, topk):
                np.testing.assert_array_equal(a, b)

    def test_pull_detections_skips_fallback_when_k_covers_all_anchors(self):
        """When max_device_dets >= the anchor count, the top-k result IS the
        complete set (just score-sorted) -- the truncation guard must not
        trigger a second, redundant full transfer even when every score
        clears the threshold."""
        rng = np.random.RandomState(0)
        det_dev = jnp.asarray(rng.uniform(0.5, 1.0, (2, 10, 5)).astype(np.float32))
        d = det.YoloDetector(params={}, detection_threshold=0.1,
                             max_device_dets=256)
        raw = d._pull_detections(det_dev)
        assert raw.shape == (2, 10, 5)
        # The complete-set early return is the SORTED tensor (the old
        # fallback returned det_dev unsorted); content must match per frame.
        assert (np.diff(raw[:, :, 4], axis=1) <= 0).all()
        for b in range(2):
            np.testing.assert_array_equal(
                np.sort(raw[b], axis=0), np.sort(np.asarray(det_dev)[b], axis=0)
            )

    def test_pull_detections_nan_scores_force_full_pull(self):
        """A NaN score inside the top-k could evict finite above-threshold
        detections while the k-th-score guard (NaN > thr is False) never
        fires -- non-finite scores must force the full pull."""
        rng = np.random.RandomState(1)
        full = rng.uniform(0.0, 0.05, (1, 300, 5)).astype(np.float32)
        # Every score NaN except one finite above-threshold detection: the
        # top-16 then necessarily contains NaNs whatever lax.top_k's NaN
        # order is.
        full[0, :, 4] = np.nan
        full[0, 250, 4] = 0.9
        det_dev = jnp.asarray(full)
        d = det.YoloDetector(params={}, detection_threshold=0.1,
                             max_device_dets=16)
        raw = d._pull_detections(det_dev)
        assert raw.shape == (1, 300, 5)  # full pull, not the k=16 slice
        np.testing.assert_array_equal(raw, full)

    def test_rect_path_equals_square_on_degenerate_geometry(self, params):
        """H=53, W=80 @ img_size 160: the rect canvas geometry degenerates to
        the exact square letterbox (content 160x106, pads 27/27). The rect
        code path (letterbox_device_rect + per-axis unmap) must then produce
        BIT-IDENTICAL detections to the square path -- isolating the rect
        machinery from the (weights-dependent) gray-far-field truncation."""
        from poserisk_release_tpu.ops.crop import (
            letterbox_geometry,
            rect_canvas_geometry,
        )

        ch, cw, new_w, new_h, pad_x, pad_y = rect_canvas_geometry(53, 80, 160)
        assert (ch, cw) == (160, 160)
        assert (new_w, new_h, pad_x, pad_y) == (
            (160, 106) + letterbox_geometry(53, 80, 160)[2:]
        )
        rng = np.random.RandomState(7)
        frames = rng.randint(0, 255, (2, 53, 80, 3)).astype(np.uint8)
        kwargs = dict(params=params, img_size=160, detection_threshold=0.3)
        out_sq = det.YoloDetector(rect=False, **kwargs)(frames)
        out_rc = det.YoloDetector(rect=True, **kwargs)(frames)
        assert len(out_sq) == len(out_rc) == 2
        for a, b in zip(out_sq, out_rc):
            np.testing.assert_array_equal(a, b)

    def test_rect_forward_shapes(self, params):
        """Rectangular canvases run through the fully-convolutional graph:
        (288, 416) -> (9*13 + 18*26 + 36*52) * 3 anchors."""
        x = jnp.zeros((1, 288, 416, 3), jnp.float32)
        out = np.asarray(det.yolo_forward(params, x))
        assert out.shape == (1, (9 * 13 + 18 * 26 + 36 * 52) * 3, 5)
        assert np.isfinite(out).all()

    def test_int8_ptq_single_layer_accuracy(self):
        """Mechanism check on ONE conv (no cross-layer chaos): the int8 path
        reproduces the float conv within the quantization step bound."""
        from poserisk_release_tpu.models.detector import _conv_block

        rng = np.random.RandomState(0)
        entry = ("conv", 32, 3, 1, True)
        kernel = rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1
        bias = rng.randn(32).astype(np.float32) * 0.01
        x = jnp.asarray(rng.rand(2, 20, 20, 16).astype(np.float32) * 2 - 1)

        flayer = {"kernel": jnp.asarray(kernel), "folded_bias_leaky": jnp.asarray(bias)}
        w_scale = np.abs(kernel).max(axis=(0, 1, 2)) / 127.0
        qlayer = {
            "qkernel": jnp.asarray(np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)),
            "w_scale": jnp.asarray(w_scale.astype(np.float32)),
            "in_scale": jnp.asarray(np.float32(1.0 / 127.0)),
            "q_bias_leaky": jnp.asarray(bias),
        }
        want = np.asarray(_conv_block(x, flayer, entry))
        got = np.asarray(_conv_block(x, qlayer, entry))
        # error bound ~ (activation step/2 * sum|w| + weight step/2 * sum|x|)
        assert np.abs(got - want).max() < 0.05
        assert np.abs(got - want).mean() < 0.01

    def test_int8_ptq_end_to_end(self, params):
        """Calibrate + quantize + forward: runs, stays finite, and the vast
        majority of anchors decode identically to float (the handful of
        flips are random-weight sigmoid saturation, not PTQ error)."""
        from poserisk_release_tpu.ops.crop import letterbox_device_rect

        folded = det.fold_bn_params(params)
        rng = np.random.RandomState(3)
        frames = rng.randint(0, 200, (2, 53, 80, 3)).astype(np.uint8)
        letter = letterbox_device_rect(jnp.asarray(frames), 160)
        scales = det.calibrate_yolo_activations(folded, letter)
        assert set(scales) == {f"conv_{i}" for i in det.conv_indices()}
        qp = det.quantize_yolo_params(folded, scales)
        # Whole-tower default (measured fastest in situ, docs/PERF.md r3):
        # only the 3 head convs stay float. The opt-in mixed boundary at
        # factor 8 additionally leaves the 10 shallow convs float.
        n_q = sum(1 for layer in qp.values() if "qkernel" in layer)
        assert n_q == 72 and len(qp) == 75
        qp_mixed = det.quantize_yolo_params(folded, scales, min_downsample=8)
        assert sum(1 for l in qp_mixed.values() if "qkernel" in l) == 62
        out_f = np.asarray(det.yolo_forward(folded, letter, 160))
        out_q = np.asarray(det.yolo_forward(qp, letter, 160))
        assert np.isfinite(out_q).all()
        ds = np.abs(out_f[..., 4] - out_q[..., 4])
        assert np.quantile(ds, 0.99) < 0.05

    def test_int8_wrapper_first_call_calibrates(self, params):
        """YoloDetector(int8=True): the first call runs float while
        accumulating whole-call activation scales, quantizes at its end, and
        later calls take the (deterministic) int8 path."""
        d = det.YoloDetector(
            params=det.fold_bn_params(params), img_size=96,
            detection_threshold=0.5, rect=True, int8=True,
        )
        frames = np.random.RandomState(5).randint(0, 255, (2, 30, 60, 3)).astype(np.uint8)
        out = d(frames)  # float pass + calibration over every chunk
        assert len(out) == 2 and all(r.shape[1] == 5 for r in out)
        assert any("qkernel" in l for l in d.params.values())  # quantized in place
        out2 = d(frames)  # int8 path
        out3 = d(frames)  # int8 path, deterministic
        for a, b in zip(out2, out3):
            np.testing.assert_array_equal(a, b)

    def test_int8_first_call_with_zero_frames_stays_unquantized(self, params):
        """An empty first call has no activation statistics: it must return
        [] and leave the detector unquantized (quantizing from empty absmax
        used to KeyError), with the next non-empty call calibrating."""
        d = det.YoloDetector(
            params=det.fold_bn_params(params), img_size=96,
            detection_threshold=0.5, rect=True, int8=True,
        )
        out = d(np.zeros((0, 30, 60, 3), np.uint8))
        assert out == []
        assert not any("qkernel" in l for l in d.params.values())
        frames = np.random.RandomState(5).randint(0, 255, (2, 30, 60, 3)).astype(np.uint8)
        out = d(frames)
        assert len(out) == 2
        assert any("qkernel" in l for l in d.params.values())

    def test_int8_explicit_calibrate(self, params):
        """calibrate() quantizes without running detection, making shared
        instances order-independent; a second calibrate is a no-op."""
        d = det.YoloDetector(
            params=det.fold_bn_params(params), img_size=96,
            detection_threshold=0.5, rect=True, int8=True,
        )
        frames = np.random.RandomState(6).randint(0, 255, (2, 30, 60, 3)).astype(np.uint8)
        d.calibrate(frames)
        assert any("qkernel" in l for l in d.params.values())
        before = {k: v for k, v in d.params.items()}
        d.calibrate(frames)  # no-op once quantized
        assert d.params is not None and all(d.params[k] is before[k] for k in before)
        out = d(frames)
        assert len(out) == 2

    def test_conv_input_downsample_factors(self):
        """The spec walk's per-conv input factors: stem at 1, the deepest
        tower/head at 32, head-2/3 towers back at 16/8 after upsampling --
        the structural basis of the mixed-precision boundary."""
        ds = det.conv_input_downsample()
        assert len(ds) == 75
        assert ds["conv_0"] == 1 and ds["conv_1"] == 1  # full resolution
        assert ds["conv_2"] == 2  # after the first stride-2 reduction
        assert ds["conv_75"] == 32 and ds["conv_79"] == 32  # head-1 tower
        assert ds["conv_84"] == 32  # pre-upsample 1x1 reads the /32 grid
        assert ds["conv_87"] == 16  # head-2 tower after upsample+route
        assert ds["conv_100"] == 8  # head-3 tower
        # Exactly 10 convs sit above the factor-8 boundary.
        assert sum(1 for v in ds.values() if v < 8) == 10

    def test_q8_handoff_edges_exclude_branch_and_shortcut_feeds(self):
        """q8 emission requires a SOLE consumer that is the next conv: the
        route branch points (79, 91) and every pre-shortcut 3x3 must be
        excluded or a second consumer would read a mis-scaled int8 tensor."""
        ho = det._q8_handoff_convs()
        assert 79 not in ho and 91 not in ho  # route branch points
        # pre-shortcut 3x3s: next entry is a shortcut, not a conv
        for i, entry in enumerate(det.YOLOV3_SPEC):
            if entry[0] == "shortcut":
                assert (i - 1) not in ho
        # interior 1x1 -> 3x3 pair edges DO qualify (e.g. the first
        # residual-256 pair's 1x1 at spec index 13)
        assert 13 in ho

    def test_q8_handoff_forward_identical(self, params):
        """In f32 compute the q8 handoff is bit-identical to the consumer-
        side quantize (same round/clip of the same epilogue value)."""
        from poserisk_release_tpu.ops.crop import letterbox_device_rect

        folded = det.fold_bn_params(params)
        rng = np.random.RandomState(11)
        frames = rng.randint(0, 255, (2, 53, 80, 3)).astype(np.uint8)
        letter = letterbox_device_rect(jnp.asarray(frames), 160)
        scales = det.calibrate_yolo_activations(folded, letter)
        qp_on = det.quantize_yolo_params(folded, scales, q8_handoff=True)
        qp_off = det.quantize_yolo_params(folded, scales, q8_handoff=False)
        assert any("out_scale" in l for l in qp_on.values())
        assert not any("out_scale" in l for l in qp_off.values())
        out_on = np.asarray(det.yolo_forward(qp_on, letter, 160))
        out_off = np.asarray(det.yolo_forward(qp_off, letter, 160))
        np.testing.assert_array_equal(out_on, out_off)

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

    def test_negative_area_state_kills_track_like_canonical(self):
        """Canonical SORT parity: convert_x_to_bbox has no clamp, so a
        Kalman state whose area went negative produces a NaN box and the
        predict loop deletes the track -- it must not survive with a
        degenerate zero-size box."""
        sort = Sort(max_age=3, min_hits=1)
        sort.update(np.array([[10, 10, 50, 90, 0.9]]))
        sort.tracks[0].x[2, 0] = -5.0  # area state driven negative
        out = sort.update(np.zeros((0, 5)))
        assert out.shape[0] == 0
        assert sort.tracks == []  # died immediately, not after max_age

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

    def test_track_windows_equals_whole_clip(self):
        """Windowed tracking (the Predictor's overlapped ingest path) must be
        bit-identical to a whole-clip call: one persistent SORT state."""
        from poserisk_release_tpu.models.detector import StubDetector

        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (23, 60, 80, 3)).astype(np.uint8)
        dets = [
            [[10.0 + i, 5.0, 40.0 + i, 55.0, 0.9]] if i % 7 else []
            for i in range(23)
        ]
        whole = MultiPersonTracker(StubDetector(scripted=dets))(frames)

        class _Cursor:
            def __init__(self):
                self.pos = 0

            def __call__(self, f):
                out = dets[self.pos : self.pos + len(f)]
                self.pos += len(f)
                return [np.asarray(d, np.float32).reshape(-1, 5) for d in out]

        windows = [(s, frames[s : s + 8]) for s in range(0, 23, 8)]
        winres = MultiPersonTracker(_Cursor()).track_windows(windows)
        # SORT ids come from a process-global counter (canonical upstream
        # behaviour), so compare track CONTENTS in first-frame order.
        a = sorted(whole.values(), key=lambda t: t["frames"][0])
        b = sorted(winres.values(), key=lambda t: t["frames"][0])
        assert len(a) == len(b) == 1
        for ta, tb in zip(a, b):
            np.testing.assert_array_equal(ta["frames"], tb["frames"])
            np.testing.assert_allclose(ta["bbox"], tb["bbox"])

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
