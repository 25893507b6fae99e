"""Per-frame renderer oracle restating the reference's drawing code.

A direct, readable restatement of the reference's output-canvas composition
-- `Predictor.visualize_result`'s per-frame loop body
(/root/reference/lib/core/base.py:305-325) and `visualize_box`
(/root/reference/lib/utils/vis_utils.py:278-294) -- used ONLY by
tests/test_render_pixel_parity.py to assert per-pixel equality against
outputs.render.compose_result_frame. Structured like the reference (inline
box corner math, per-text putText calls in source order), NOT like the
product renderer, so a drift in either implementation breaks the match.

Dtype deviation, shared with the product renderer: the reference allocates
`np.zeros((h, w, 3))` (float64) and casts `np.uint8(canvas)` at write time.
OpenCV 5 (this image) asserts CV_8U in putText, so the float64 original
cannot run here; the oracle draws on uint8. The residual class this hides
is cv2-4.x float-truncation vs uint8 rounding on antialiased glyph edges.
"""

import numpy as np


def visualize_box_oracle(img, boxes):
    """vis_utils.py:278-294, verbatim logic."""
    import cv2

    img = img.copy()
    color, thickness = (0, 255, 0), 2
    for i, box in enumerate(boxes):
        x_min, y_min, x_max, y_max = (
            int(box[0]) - int(box[2]) // 2,
            int(box[1]) - int(box[3]) // 2,
            int(box[0]) + int(box[2]) // 2,
            int(box[1]) + int(box[3]) // 2,
        )
        pos1 = (x_min, y_min)
        pos2 = (x_min, y_max)
        pos3 = (x_max, y_min)
        pos4 = (x_max, y_max)
        img = cv2.line(img, pos1, pos2, color, thickness)
        img = cv2.line(img, pos1, pos3, color, thickness)
        img = cv2.line(img, pos2, pos4, color, thickness)
        img = cv2.line(img, pos3, pos4, color, thickness)
    return img


def render_frame_oracle(img_bgr, i, timestamp, scores, bboxes, joint_names,
                        logs, title="REBA"):
    """base.py:305-325 loop body for one frame: returns the uint8 canvas
    that `video_writer.write(np.uint8(canvas))` would encode.

    img_bgr: the frame as cv2.imread would return it (BGR uint8).
    timestamp: (0, track_frames, total) exactly as Predictor builds it.
    """
    import cv2

    height, width = img_bgr.shape[0], img_bgr.shape[1]
    resize_w = 720
    resize_h = int(height * resize_w / width)
    canvas_w = resize_w + 280
    canvas_h = resize_h

    font = cv2.FONT_HERSHEY_SIMPLEX
    color = (255, 255, 255)

    canvas = np.zeros((canvas_h, canvas_w, 3), np.uint8)  # ref: float64 (see module docstring)
    img = img_bgr

    cv2.putText(canvas, "frame: " + str(i), (resize_w + 15, canvas_h - 14),
                font, 0.5, color, 1, cv2.LINE_AA)

    if i in timestamp[1]:
        idx = np.where(timestamp[1] == i)[0][0]
        idx = idx // 2 * 2
        bbox = bboxes[idx]
        img = visualize_box_oracle(img, bbox[None, :])

        cv2.putText(canvas, title + " Score: " + str(scores[idx]),
                    (resize_w + 15, 35), font, 0.7, (0, 255, 0), 1, cv2.LINE_AA)
        cv2.putText(canvas, "- Score per Joints ", (resize_w + 15, 122),
                    font, 0.6, color, 1, cv2.LINE_AA)
        for j, joint in enumerate(joint_names):
            cv2.putText(canvas, joint + ": " + str(logs[idx][j]),
                        (resize_w + 15, 153 + 24 * j), font, 0.5, color, 1,
                        cv2.LINE_AA)
    else:
        cv2.putText(canvas, "Not detected target", (resize_w + 15, canvas_h - 65),
                    font, 0.6, color, 1, cv2.LINE_AA)

    img = cv2.resize(img, (resize_w, resize_h), interpolation=cv2.INTER_AREA)
    canvas[:resize_h, :resize_w, :] = img
    return np.uint8(canvas)
