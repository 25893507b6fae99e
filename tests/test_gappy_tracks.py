"""End-to-end with a detector that misses frames: gap semantics everywhere."""

import csv
import os.path as osp

import numpy as np

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.pipeline import Predictor


def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


def _gappy_detector(n_frames, missing):
    boxes = []
    for i in range(n_frames):
        if i in missing:
            boxes.append(np.zeros((0, 5), np.float32))
        else:
            boxes.append(np.array([[80, 30, 130, 110, 0.9]], np.float32))
    return StubDetector(scripted=boxes)


def test_pipeline_with_detection_gaps(tmp_path, rng):
    import cv2

    clip = tmp_path / "gappy.mp4"
    frames = []
    for i in range(16):
        img = np.full((120, 160, 3), 30, np.uint8)
        cv2.rectangle(img, (80, 30), (130, 110), (170, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=8.0, file_path=str(clip))

    # Frame 6 missing: SORT (max_age=1) keeps identity across a single-frame
    # gap via prediction but emits no box for the missed frame. (A 2-frame
    # gap kills the track and re-detection starts a new identity -- canonical
    # SORT semantics, matching the reference's tracker.)
    missing = {6}
    predictor = Predictor(
        cfg=_test_config(), score_type="REBA", debug=True,
        detector=_gappy_detector(16, missing), visualize=True,
    )
    out = str(tmp_path / "out")
    summary = predictor(str(clip), "/nonexistent.json", out)
    assert "REBA" in summary

    # The score-log CSV has a bare row (frame index only) for missed frames.
    with open(osp.join(out, "debug", "REBA_score_log.csv")) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert len(body) == 16
    covered = [int(r[0]) for r in body if len(r) > 1]
    bare = [int(r[0]) for r in body if len(r) == 1]
    for m in missing:
        assert m in bare
    assert 0 in covered and 15 in covered

    # The annotated video still spans every clip frame.
    import cv2 as _cv2

    cap = _cv2.VideoCapture(osp.join(out, "REBA_video.mp4"))
    assert cap.get(_cv2.CAP_PROP_FRAME_COUNT) == 16
    cap.release()
