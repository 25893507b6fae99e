"""Pixel-level renderer parity (VERDICT r2 #2).

compose_result_frame must reproduce the reference's output canvas PER PIXEL
against an independently structured restatement of the reference drawing
code (tests/oracles/reference_render.py): canvas geometry, box corner
truncation math, every putText position/scale/color, the idx//2*2 snap,
the 'Not detected target' branch, and the INTER_AREA frame placement.
Compared before the mp4 encode (the codec is lossy; the canvas is not).
"""

import numpy as np
import pytest

from poserisk_release_tpu.outputs.render import (
    compose_result_frame,
    draw_box_cxcywh,
    render_result_video,
)
from tests.oracles.reference_render import (
    render_frame_oracle,
    visualize_box_oracle,
)

JOINT_NAMES = ("Trunk", "Neck", "Leg", "U-arm", "L-arm", "Wrist")


def _scene(rng, n_frames=6, h=450, w=800):
    frames = rng.randint(0, 255, (n_frames, h, w, 3)).astype(np.uint8)
    track_frames = np.array([1, 2, 4, 5])  # frames 0 and 3 are off-track
    bboxes = np.array(
        [[401.7, 225.2, 217.0, 217.0],
         [405.1, 230.9, 221.0, 221.0],
         [398.0, 220.0, 210.5, 210.5],
         [410.3, 228.4, 219.9, 219.9]], np.float64)
    scores = np.array([7, 4, 9, 2])
    logs = np.array(
        [[str(rng.randint(1, 9)) if j % 2 == 0 else f"{rng.randint(1, 5)},{rng.randint(1, 5)}"
          for j in range(len(JOINT_NAMES))] for _ in range(4)], dtype=object)
    return frames, track_frames, bboxes, scores, logs


def test_box_drawing_matches_reference_corner_math(rng):
    import cv2

    img = rng.randint(0, 255, (450, 800, 3)).astype(np.uint8)
    # Fractional cxcywh exercises the int() truncation + //2 corner math.
    box = np.array([401.7, 225.2, 217.0, 218.9])
    ours = draw_box_cxcywh(img, box)
    ref = visualize_box_oracle(img, box[None, :])
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 5])
def test_full_canvas_pixel_parity(rng, i):
    """Every frame class: off-track (0, 3), even track idx (1, 4 -> idx 0/2)
    and odd track idx snapped even (2, 5 -> idx 1->0, 3->2)."""
    import cv2

    frames, track_frames, bboxes, scores, logs = _scene(rng)
    ours = compose_result_frame(
        frames[i], i, track_frames, bboxes, scores, JOINT_NAMES, logs, "REBA"
    )
    ref = render_frame_oracle(
        cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR), i,
        (0, track_frames, len(frames)), scores, bboxes, JOINT_NAMES, logs,
        "REBA",
    )
    np.testing.assert_array_equal(ours, ref)


def test_canvas_parity_on_tall_frames(rng):
    """Non-800x450 geometry: resize_h derives from the frame aspect."""
    import cv2

    frames, track_frames, bboxes, scores, logs = _scene(rng, h=640, w=360)
    bboxes = bboxes / 2.0
    ours = compose_result_frame(
        frames[1], 1, track_frames, bboxes, scores, JOINT_NAMES, logs, "RULA"
    )
    assert ours.shape == (int(640 * 720 / 360), 720 + 280, 3)
    ref = render_frame_oracle(
        cv2.cvtColor(frames[1], cv2.COLOR_RGB2BGR), 1,
        (0, track_frames, len(frames)), scores, bboxes, JOINT_NAMES, logs,
        "RULA",
    )
    np.testing.assert_array_equal(ours, ref)


def test_video_writer_consumes_composed_frames(tmp_path, rng):
    import os.path as osp

    frames, track_frames, bboxes, scores, logs = _scene(rng, n_frames=4)
    out = render_result_video(
        frames, bboxes, (0, track_frames, 4), 10.0, scores, JOINT_NAMES,
        logs, str(tmp_path), "REBA",
    )
    assert osp.isfile(out) and osp.getsize(out) > 0
