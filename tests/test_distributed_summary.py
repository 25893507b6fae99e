"""Distributed helper (single-process semantics) and run_summary.json output."""

import json
import os.path as osp

import numpy as np

import jax

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.parallel.distributed import global_batch_slice, initialize_distributed
from poserisk_release_tpu.pipeline import Predictor


def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


def test_initialize_distributed_single_process():
    info = initialize_distributed()  # no coordinator: must be a safe no-op
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())


def test_global_batch_slice_single_process():
    assert global_batch_slice(64) == slice(0, 64)


def test_run_summary_written(tmp_path, rng):
    import cv2

    clip = tmp_path / "c.mp4"
    frames = []
    for i in range(10):
        img = np.full((120, 160, 3), 30, np.uint8)
        cv2.rectangle(img, (50 + i, 20), (100 + i, 100), (170, 150, 120), -1)
        frames.append(img)
    write_video(frames, fps=5.0, file_path=str(clip))

    predictor = Predictor(cfg=_test_config(), score_type="REBA",
                          detector=StubDetector(), visualize=False)
    out = str(tmp_path / "out")
    predictor(str(clip), "/nonexistent.json", out)

    with open(osp.join(out, "run_summary.json")) as f:
        summary = json.load(f)
    assert summary["frames_total"] == 10
    assert summary["frames_tracked"] == 10
    assert "pose" in summary["timings_sec"]
    reba = summary["scores"]["REBA"]
    assert set(reba) == {"avg", "p50", "p10", "max", "mode", "action_level", "action"}
