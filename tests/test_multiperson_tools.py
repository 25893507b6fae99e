"""Multi-person mode, gendered SMPL selection, and the offline dataset tool."""

import os.path as osp

import numpy as np
import pytest

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.pipeline import Predictor
from poserisk_release_tpu.tools.data_preprocessing import main as preprocess_main
from poserisk_release_tpu.tracking.mpt import MultiPersonTracker


def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


def _two_person_detector():
    """Scripted detector: two well-separated people in every frame."""

    def detector(frames):
        out = []
        for _ in range(len(frames)):
            out.append(
                np.array(
                    [
                        [30, 40, 110, 220, 0.9],
                        [200, 40, 290, 220, 0.85],
                    ],
                    np.float32,
                )
            )
        return out

    return detector


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory, rng):
    import cv2

    path = tmp_path_factory.mktemp("mp") / "two.mp4"
    frames = []
    for _ in range(16):
        img = np.full((240, 320, 3), 25, np.uint8)
        cv2.rectangle(img, (30, 40), (110, 220), (160, 140, 120), -1)
        cv2.rectangle(img, (200, 40), (290, 220), (120, 140, 160), -1)
        frames.append(img)
    write_video(frames, fps=8.0, file_path=str(path))
    return str(path)


def test_multi_person_outputs(clip_path, tmp_path):
    predictor = Predictor(
        cfg=_test_config(), score_type="REBA",
        detector=_two_person_detector(), visualize=False, multi_person=True,
    )
    out = str(tmp_path / "mp_out")
    summaries = predictor(clip_path, "/nonexistent.json", out)
    assert len(summaries) == 2
    for pid in summaries:
        assert osp.isfile(osp.join(out, f"person_{pid}", "reba_result.txt"))


@pytest.mark.parametrize("gender", ["male", "female"])
def test_gendered_models(clip_path, tmp_path, gender):
    predictor = Predictor(
        cfg=_test_config(), score_type="REBA",
        detector=StubDetector(), visualize=False, gender=gender,
    )
    out = str(tmp_path / gender)
    summary = predictor(clip_path, "/nonexistent.json", out)
    assert "REBA" in summary


def test_data_preprocessing_tool(tmp_path, rng):
    import cv2

    src = tmp_path / "videos" / "train" / "siteA"
    src.mkdir(parents=True)
    frames = []
    for i in range(20):
        img = np.full((120, 160, 3), 20, np.uint8)
        cv2.rectangle(img, (40 + i, 20), (90 + i, 110), (150, 150, 150), -1)
        frames.append(img)
    write_video(frames, fps=2.0, file_path=str(src / "clipA.mp4"))  # 8s => 16 frames

    tracker = MultiPersonTracker(StubDetector())
    written = preprocess_main(str(tmp_path / "videos" / "train"), tracker=tracker)
    assert len(written) == 1
    assert osp.isfile(written[0])
    img_root = str(tmp_path / "images" / "train" / "siteA" / "clipA" / "0")
    assert osp.isfile(osp.join(img_root, "000000.jpg"))
    import cv2 as _cv2

    first = _cv2.imread(osp.join(img_root, "000000.jpg"))
    assert first.shape == (224, 224, 3)
