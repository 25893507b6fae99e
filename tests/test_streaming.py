"""Streaming scorer: window boundaries, identity persistence, stat parity."""

import json

import numpy as np
import pytest

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.pipeline import Predictor
from poserisk_release_tpu.streaming import StreamingScorer

def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


import os.path as _osp

import poserisk_release_tpu as _pkg

INFO = json.load(open(_osp.join(_osp.dirname(_pkg.__file__), "default_information.json")))


@pytest.fixture(scope="module")
def long_clip(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("stream") / "long.mp4"
    frames = []
    for i in range(40):
        img = np.full((120, 160, 3), 25, np.uint8)
        cv2.rectangle(img, (40 + i, 20), (90 + i, 110), (180, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=str(path))
    return str(path)


def test_windows_cover_all_frames(long_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=16)
    result = scorer(long_clip, INFO)
    assert result.total_frames == 40
    assert result.fps == 10.0
    assert result.frames == list(range(40))  # identity persisted across windows
    assert len(result.reba_scores) == 40
    assert len(result.rula_scores) == 40


def test_stats_match_batch_predictor(long_clip, tmp_path):
    """Windowed scoring must reproduce the whole-clip Predictor's stats."""
    stream = StreamingScorer(detector=StubDetector(), window=16)(long_clip, INFO)

    predictor = Predictor(cfg=_test_config(), score_type="REBA,RULA",
                          detector=StubDetector(), visualize=False)
    summary = predictor(long_clip, "/nonexistent.json", str(tmp_path / "batch"))

    assert stream.stats("reba") == summary["REBA"][0]
    assert stream.stats("rula") == summary["RULA"][0]


def test_max_frames_cap(long_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=8)
    result = scorer(long_clip, INFO, max_frames=20)
    assert result.total_frames == 20
    assert len(result.reba_scores) == 20
