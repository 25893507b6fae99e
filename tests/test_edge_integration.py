"""Edge-case integration: no-detection clips, streaming on the mesh."""

import json

import numpy as np
import pytest

import jax

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.parallel.mesh import make_mesh
from poserisk_release_tpu.pipeline import Predictor
from poserisk_release_tpu.streaming import StreamingScorer

def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


import os.path as _osp

import poserisk_release_tpu as _pkg

INFO = json.load(open(_osp.join(_osp.dirname(_pkg.__file__), "default_information.json")))


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("edge") / "clip.mp4"
    frames = []
    for i in range(12):
        img = np.full((120, 160, 3), 28, np.uint8)
        cv2.rectangle(img, (60, 20), (110, 100), (180, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=6.0, file_path=str(path))
    return str(path)


def test_no_detections_raise_clean_error(clip, tmp_path):
    empty = StubDetector(scripted=[np.zeros((0, 5), np.float32)] * 12)
    predictor = Predictor(cfg=_test_config(), score_type="REBA",
                          detector=empty, visualize=False)
    with pytest.raises(ValueError, match="no person tracks"):
        predictor(clip, "/nonexistent.json", str(tmp_path / "out"))


def test_streaming_on_mesh(clip):
    assert len(jax.devices()) == 8
    scorer = StreamingScorer(detector=StubDetector(), window=8, mesh=make_mesh(8))
    result = scorer(clip, INFO)
    assert result.total_frames == 12
    assert len(result.reba_scores) == 12

    single = StreamingScorer(detector=StubDetector(), window=8)(clip, INFO)
    assert result.reba_scores == single.reba_scores


class _SequentialScriptedDetector:
    """Streaming-safe scripted detector: consumes the script window by window."""

    def __init__(self, boxes):
        self.boxes = boxes
        self.offset = 0

    def __call__(self, frames):
        out = self.boxes[self.offset : self.offset + len(frames)]
        self.offset += len(frames)
        return out


def test_streaming_empty_windows_skipped(clip):
    """A window with zero detections contributes no scores but doesn't crash."""
    boxes = []
    for i in range(12):
        if 4 <= i < 8:
            boxes.append(np.zeros((0, 5), np.float32))
        else:
            boxes.append(np.array([[60, 20, 110, 100, 0.9]], np.float32))
    scorer = StreamingScorer(detector=_SequentialScriptedDetector(boxes), window=4)
    result = scorer(clip, INFO)
    assert result.total_frames == 12
    # Gap frames absent; identity may restart after the 4-frame outage.
    assert all(f < 4 or f >= 8 for f in result.frames)


def test_streaming_rejects_miscounting_detector(clip):
    """A detector returning the wrong per-frame count fails loudly, not with
    silent index corruption."""
    bad = StubDetector(scripted=[np.zeros((0, 5), np.float32)] * 12)  # always 12
    scorer = StreamingScorer(detector=bad, window=4)
    with pytest.raises(ValueError, match="per-frame results"):
        scorer(clip, INFO)


def test_multi_person_no_detections_raises(clip, tmp_path):
    empty = StubDetector(scripted=[np.zeros((0, 5), np.float32)] * 12)
    predictor = Predictor(cfg=_test_config(), score_type="REBA",
                          detector=empty, visualize=False, multi_person=True)
    with pytest.raises(ValueError, match="no person tracks"):
        predictor(clip, "/nonexistent.json", str(tmp_path / "mp"))
