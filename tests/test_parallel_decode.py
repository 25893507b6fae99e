"""Parallel video decode: serial-exact frames, protocol parity, fallback.

The contract under test (io/video.iter_windows_parallel): any worker count
yields EXACTLY the serial decoder's stream -- same window protocol, same
start indices, bit-identical pixels -- because production wall-clock depends
on decode threads but correctness must not (docs/PERF.md; the reference
decodes serially, funcs_utils.py:18-53).
"""

import warnings

import numpy as np
import pytest

from poserisk_release_tpu.io.video import (
    iter_windows_parallel,
    read_video,
    read_video_parallel,
    write_video,
)
from poserisk_release_tpu.streaming import _window_stream


def _make_video(tmp_path, n_frames, name="clip.mp4", size=(160, 120)):
    import cv2

    path = str(tmp_path / name)
    rng = np.random.RandomState(7)
    frames = []
    for i in range(n_frames):
        img = np.full((size[1], size[0], 3), 30, np.uint8)
        cv2.rectangle(img, (10 + i % 60, 20), (60 + i % 60, 100),
                      (int(180 - i), 150, int(100 + i)), -1)
        img += rng.randint(0, 8, img.shape).astype(np.uint8)
        frames.append(img)
    write_video(frames, fps=12.0, file_path=path)
    return path


def _collect(stream):
    fps, windows, end = None, [], None
    for item in stream:
        if item[0] == "meta":
            fps = item[1]
        elif item[0] == "window":
            windows.append((item[1], item[2]))
        else:
            end = item[1]
    return fps, windows, end


class TestSerialExactness:
    @pytest.mark.parametrize("workers", [2, 3, 5])
    def test_window_stream_identical_to_serial(self, tmp_path, workers):
        path = _make_video(tmp_path, n_frames=53)
        fps_s, win_s, end_s = _collect(_window_stream(path, 8, None))
        fps_p, win_p, end_p = _collect(
            iter_windows_parallel(path, 8, workers))
        assert fps_p == fps_s and end_p == end_s == 53
        assert [s for s, _ in win_p] == [s for s, _ in win_s]
        for (_, a), (_, b) in zip(win_p, win_s):
            assert a.shape == b.shape and np.array_equal(a, b)

    def test_read_video_parallel_bit_identical(self, tmp_path):
        path = _make_video(tmp_path, n_frames=37)
        serial = read_video(path)
        par = read_video_parallel(path, workers=4, window=6)
        assert par.fps == serial.fps
        assert np.array_equal(par.frames, serial.frames)

    def test_max_frames_truncation_parity(self, tmp_path):
        path = _make_video(tmp_path, n_frames=40)
        serial = read_video(path, max_frames=21)
        par = read_video_parallel(path, workers=3, max_frames=21, window=4)
        assert np.array_equal(par.frames, serial.frames)

    def test_exact_window_multiple_length(self, tmp_path):
        """No trailing partial window: 'end' still arrives and counts match."""
        path = _make_video(tmp_path, n_frames=32)
        _, win, end = _collect(iter_windows_parallel(path, 8, 2))
        assert end == 32 and [s for s, _ in win] == [0, 8, 16, 24]
        assert all(len(f) == 8 for _, f in win)


class TestDegenerateInputs:
    def test_workers_clamped_on_tiny_clip(self, tmp_path):
        """Fewer than 2 windows per worker: the split degrades gracefully
        (down to one worker) rather than spawning seek-heavy micro-segments."""
        path = _make_video(tmp_path, n_frames=5)
        serial = read_video(path)
        par = read_video_parallel(path, workers=8, window=2)
        assert np.array_equal(par.frames, serial.frames)

    def test_workers_one_is_serial_passthrough(self, tmp_path):
        path = _make_video(tmp_path, n_frames=9)
        par = read_video_parallel(path, workers=1)
        assert np.array_equal(par.frames, read_video(path).frames)

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            _collect(iter_windows_parallel("/nonexistent/clip.mp4", 8, 2))


class _FramelessCapture:
    """Openable but frameless source (e.g. audio-only container): cv2
    reports no frame count and read() never succeeds."""

    def __init__(self, path):
        pass

    def isOpened(self):
        return True

    def get(self, prop):
        return 0.0

    def set(self, prop, val):
        return True

    def read(self):
        return False, None

    def grab(self):
        return False

    def release(self):
        pass


class TestFramelessSource:
    def test_end_zero_protocol_parity(self, monkeypatch):
        """An openable but frameless file must yield ('end', 0) exactly like
        the serial stream -- not raise mid-iteration -- so consumer behavior
        cannot depend on the decode_workers knob."""
        import cv2

        monkeypatch.setattr(cv2, "VideoCapture", _FramelessCapture)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            fps, win, end = _collect(
                iter_windows_parallel("fake.mp4", 8, 4))
        assert fps == 0.0 and win == [] and end == 0

    def test_unknown_frame_count_warns(self, monkeypatch):
        """CAP_PROP_FRAME_COUNT <= 0 disables segmentation; the user asked
        for parallel decode, so say why it did not happen."""
        import cv2

        monkeypatch.setattr(cv2, "VideoCapture", _FramelessCapture)
        with pytest.warns(RuntimeWarning, match="no frame count"):
            _collect(iter_windows_parallel("fake.mp4", 8, 4))


class TestIntegrityFallback:
    def test_guard_mismatch_falls_back_serial_exact(self, tmp_path, monkeypatch):
        """Force every guard comparison to fail: the stream must warn, fall
        back to the serial tail, and still be bit-identical to serial."""
        path = _make_video(tmp_path, n_frames=41)
        serial = read_video(path)
        import poserisk_release_tpu.io.video as video_mod

        real_array_equal = np.array_equal
        monkeypatch.setattr(video_mod.np, "array_equal",
                            lambda a, b: False)
        with pytest.warns(RuntimeWarning, match="integrity check failed"):
            par = read_video_parallel(path, workers=3, window=4)
        monkeypatch.undo()
        assert real_array_equal(par.frames, serial.frames)

    def test_lying_seek_backend_caught_by_two_frame_guard(self, monkeypatch):
        """A backend that lands the seek one frame late while ECHOING the
        requested position, on a clip where the frame pair at the boundary
        makes a single-frame guard false-pass (frames 11 == 12 below, so the
        old 1-frame guard would compare f[12] vs f[11] and yield the whole
        segment shifted). The two-frame guard also compares f[11] vs f[10],
        catches the shift, and the serial fallback restores exactness."""
        import cv2

        rng = np.random.RandomState(3)
        frames = rng.randint(0, 255, (24, 120, 160, 3)).astype(np.uint8)
        # window=4, workers=2 -> bounds [0, 12]: worker 1 seeks to frame 10
        # and decodes guards [10, 11]; shifted by 1 it decodes [11, 12].
        frames[12] = frames[11]  # defeats a single-frame guard

        class _ShiftySeekCapture:
            def __init__(self, path):
                self.pos = 0
                self.reported = 0.0

            def isOpened(self):
                return True

            def get(self, prop):
                return {
                    cv2.CAP_PROP_FPS: 10.0,
                    cv2.CAP_PROP_FRAME_COUNT: float(len(frames)),
                    cv2.CAP_PROP_FRAME_WIDTH: float(frames.shape[2]),
                    cv2.CAP_PROP_FRAME_HEIGHT: float(frames.shape[1]),
                    cv2.CAP_PROP_POS_FRAMES: self.reported,
                }.get(prop, 0.0)

            def set(self, prop, val):
                self.reported = float(int(val))  # echo the request...
                self.pos = int(val) + 1          # ...but land one late
                return True

            def read(self):
                if self.pos >= len(frames):
                    return False, None
                bgr = frames[self.pos].copy()
                self.pos += 1
                return True, bgr

            def grab(self):
                ok, _ = self.read()
                return ok

            def release(self):
                pass

        monkeypatch.setattr(cv2, "VideoCapture", _ShiftySeekCapture)
        with pytest.warns(RuntimeWarning, match="integrity check failed"):
            par = read_video_parallel("fake.mp4", workers=2, window=4)
        serial = read_video("fake.mp4")
        assert np.array_equal(par.frames, serial.frames)

    def test_worker_capture_constructor_raising_falls_back(
            self, tmp_path, monkeypatch):
        """cv2.VideoCapture raising inside a worker thread (backend/plugin
        init failure) must surface as a fail item -> serial fallback, not a
        silently dead thread deadlocking the consumer's queue.get()."""
        import threading

        import cv2

        path = _make_video(tmp_path, n_frames=30)
        serial = read_video(path)
        real_capture = cv2.VideoCapture
        main = threading.main_thread()

        class _RaisesInWorkers:
            def __new__(cls, p):
                if threading.current_thread() is not main:
                    raise RuntimeError("backend init failed")
                return real_capture(p)

        monkeypatch.setattr(cv2, "VideoCapture", _RaisesInWorkers)
        with pytest.warns(RuntimeWarning, match="integrity check failed"):
            par = read_video_parallel(path, workers=3, window=4)
        assert np.array_equal(par.frames, serial.frames)

    def test_abandoned_consumer_releases_threads(self, tmp_path):
        """Breaking out mid-stream (consumer exception) must not deadlock
        workers blocked on their bounded queues."""
        import threading

        path = _make_video(tmp_path, n_frames=48)
        before = threading.active_count()
        gen = iter_windows_parallel(path, 4, 3)
        next(gen)  # meta
        next(gen)  # first window
        gen.close()  # GeneratorExit -> finally -> stop.set()
        deadline = 50
        while threading.active_count() > before and deadline:
            import time

            time.sleep(0.1)
            deadline -= 1
        assert threading.active_count() <= before


class TestPipelineWiring:
    def test_streaming_scorer_scores_identical_across_workers(self, tmp_path):
        from poserisk_release_tpu.config import default_config
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import load_add_info
        from poserisk_release_tpu.streaming import StreamingScorer

        # window=4 over 40 frames = 10 windows, so decode_workers=3 really
        # runs 3 segments (the clamp needs >=2 windows per worker; a larger
        # window here would silently degrade this test to 1 worker).
        path = _make_video(tmp_path, n_frames=40)
        cfg1 = default_config().replace(PARALLEL={"frames_per_step": 16})
        cfg2 = cfg1.replace(DATASET={"decode_workers": 3})
        info = load_add_info(cfg1, "missing.json")
        r1 = StreamingScorer(cfg=cfg1, detector=StubDetector(), window=4)(
            path, info)
        r2 = StreamingScorer(cfg=cfg2, detector=StubDetector(), window=4)(
            path, info)
        assert r1.frames == r2.frames
        assert r1.reba_scores == r2.reba_scores
        assert r1.rula_scores == r2.rula_scores

    def test_decode_workers_validated(self):
        from poserisk_release_tpu.config import default_config

        with pytest.raises(ValueError, match="decode_workers"):
            default_config().replace(DATASET={"decode_workers": 0})

    def test_cli_flag_reaches_config(self):
        from poserisk_release_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["--decode_workers", "4", "--input", "x.mp4"])
        assert args.decode_workers == 4
