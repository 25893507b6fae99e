"""JPEG round-trip ingest parity mode (reference funcs_utils.py:42).

The reference computes on jpg-round-tripped frames; this package's default
ingest is in-memory. These tests pin (a) that the disk and in-memory JPEG
routes are pixel-identical, (b) a quantified bound on the score drift the
JPEG artifacts induce through the full crop->SPIN->angles->REBA/RULA path
(documented in docs/PARITY.md), and (c) the Predictor config switch.
"""

import json
import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

import poserisk_release_tpu as _pkg
from poserisk_release_tpu.io.video import VideoClip, jpeg_roundtrip, read_video, write_video

INFO = json.load(open(osp.join(osp.dirname(_pkg.__file__), "default_information.json")))


def _textured_frames(n=12, h=120, w=160, noise=25):
    """Textured content so JPEG quantization actually bites."""
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        base = (
            96
            + 60 * np.sin(xx / 3.0 + i * 0.3) * np.cos(yy / 5.0)
            + (rng.randint(-noise, noise, (h, w)) if noise else 0)
        ).clip(0, 255)
        frames.append(np.stack([base, base[::-1], 255 - base], axis=-1))
    return np.stack(frames).astype(np.uint8)


@pytest.fixture(scope="module")
def clip():
    return VideoClip(frames=_textured_frames(), fps=10.0)


def test_disk_and_memory_routes_identical(clip, tmp_path):
    """cv2.imwrite(default q95) + imread == imencode + imdecode, pixelwise."""
    via_disk = jpeg_roundtrip(clip, tmp_path=str(tmp_path / "tmp"))
    in_mem = jpeg_roundtrip(clip)
    np.testing.assert_array_equal(via_disk.frames, in_mem.frames)
    assert via_disk.fps == clip.fps
    # and the round trip is lossy (otherwise this mode tests nothing)
    assert not np.array_equal(via_disk.frames, clip.frames)
    # typical JPEG q95 error is a few intensity levels
    err = np.abs(via_disk.frames.astype(int) - clip.frames.astype(int))
    assert err.mean() < 16.0


def test_jpeg_score_drift_bound(clip, small_chunk_config):
    """Quantified bound: full pose+score path on in-memory vs JPEG frames.

    Measured with this image's random-init SPIN weights on the noisy
    textured clip (docs/PARITY.md): wrap-aware |d euler| median 0.43 deg,
    p95 2.5 deg, max 7.4 deg; REBA scores identical, RULA flips by <= 2
    points on frames whose angles straddle a rule threshold. Random weights
    are chaotic amplifiers, so these bounds are conservative; the harness is
    the thing to re-run when real assets arrive."""
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.ops.crop import crop_batch
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.scoring.reba import REBAScorer
    from poserisk_release_tpu.scoring.rula import RULAScorer

    cfg = small_chunk_config
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    jclip = jpeg_roundtrip(clip)
    box = np.tile(np.array([80.0, 60.0, 100.0, 100.0], np.float32), (clip.num_frames, 1))

    results = {}
    for name, c in (("mem", clip), ("jpeg", jclip)):
        crops = np.asarray(crop_batch(jnp.asarray(c.frames), jnp.asarray(box), 1.2, 224))
        euler, joint_cam, _ = est.run(crops, chunk=16)
        reba = [r["score"] for r in REBAScorer()(euler, joint_cam, INFO)]
        rula = [r["score"] for r in RULAScorer()(euler, joint_cam, INFO)]
        results[name] = (euler, reba, rula)

    d_euler = np.abs(results["mem"][0] - results["jpeg"][0])
    d_euler = np.minimum(d_euler, 360.0 - d_euler)  # wrap-aware (+-180 seam)
    # documented drift bound (docs/PARITY.md)
    assert np.median(d_euler) < 1.0
    assert np.quantile(d_euler, 0.95) < 5.0
    assert d_euler.max() < 15.0
    # scores may flip only where an angle straddles a rule threshold, and
    # then only by a bounded amount (measured: REBA 0 flips, RULA <= 2 pts).
    d_reba = np.abs(np.asarray(results["mem"][1]) - np.asarray(results["jpeg"][1]))
    d_rula = np.abs(np.asarray(results["mem"][2]) - np.asarray(results["jpeg"][2]))
    assert d_reba.max() <= 2 and d_rula.max() <= 2


def test_predictor_jpeg_ingest_switch(tmp_path, small_chunk_config):
    """cfg.DATASET.jpeg_ingest routes the Predictor through the disk round
    trip and cleans up the tmp tree like the reference's rm -rf."""
    import cv2

    from poserisk_release_tpu.models.detector import StubDetector
    from poserisk_release_tpu.pipeline import Predictor

    path = tmp_path / "clip.mp4"
    frames = []
    for i in range(10):
        img = np.full((120, 160, 3), 25, np.uint8)
        cv2.rectangle(img, (40 + i, 20), (90 + i, 110), (180, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=str(path))

    cfg = small_chunk_config.replace(DATASET={"jpeg_ingest": True})
    out = tmp_path / "out"
    predictor = Predictor(cfg=cfg, detector=StubDetector(), visualize=False)
    summary = predictor(str(path), "/nonexistent.json", str(out))
    assert "REBA" in summary and "RULA" in summary
    assert not (out / "tmp").exists()  # removed like base.py:184
