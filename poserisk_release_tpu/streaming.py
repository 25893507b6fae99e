"""Bounded-memory streaming scorer for long videos.

The reference (and this package's Predictor) materialises every frame of the
clip before scoring -- fine for demo videos, unbounded for hours-long footage.
This module scores a video in fixed-size windows with a one-window lookahead
decoded on a background host thread, so video decode overlaps device compute
and peak host memory is ~2 windows of frames.

Pipeline per window: decode -> detect+track (SORT state persists across
windows, so track identities survive window boundaries) -> crop -> fused
pose+score step -> accumulate per-frame scores/stats. The final aggregation
matches outputs.stats.post_process_scores semantics over the whole video.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from poserisk_release_tpu.config import Config, default_config
from poserisk_release_tpu.io.video import reference_resize_dims


@dataclass
class StreamResult:
    frames: List[int] = field(default_factory=list)
    reba_scores: List[int] = field(default_factory=list)
    rula_scores: List[int] = field(default_factory=list)
    total_frames: int = 0
    fps: float = 0.0

    def stats(self, which: str = "reba"):
        """(avg, top50, top10, max, mode) with the reference's semantics."""
        from scipy.stats import mode as scipy_mode

        scores = np.sort(np.asarray(getattr(self, f"{which}_scores")))[::-1]
        return (
            round(float(scores.mean()), 3),
            round(float(scores[: len(scores) // 2].mean()), 3),
            round(float(scores[: len(scores) // 10].mean()), 3),
            round(float(scores.max()), 3),
            scipy_mode(scores).mode.item(),
        )


def _decode_windows(path: str, window: int, out_q: "queue.Queue", max_frames: Optional[int]):
    """Background thread: decode + resize-rule, emit (start_idx, frames) windows."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        out_q.put(("error", f"cannot open video: {path}"))
        return
    fps = cap.get(cv2.CAP_PROP_FPS)
    src_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    src_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    width, height = reference_resize_dims(src_w, src_h)
    out_q.put(("meta", fps))

    buf: List[np.ndarray] = []
    idx = 0
    try:
        while True:
            ret, frame = cap.read()
            if not ret or (max_frames is not None and idx >= max_frames):
                break
            frame = cv2.resize(frame, (width, height))
            buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            idx += 1
            if len(buf) == window:
                out_q.put(("window", idx - window, np.stack(buf)))
                buf = []
        if buf:
            out_q.put(("window", idx - len(buf), np.stack(buf)))
    finally:
        cap.release()
        out_q.put(("end", idx))


class StreamingScorer:
    """Window-at-a-time scoring with persistent tracking state.

    >>> scorer = StreamingScorer(detector=StubDetector())
    >>> result = scorer(video_path, add_info)
    """

    def __init__(
        self,
        cfg: Config | None = None,
        detector=None,
        window: int = 256,
        mesh=None,
        spin_variables=None,
    ):
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import PoseEstimator

        self.cfg = cfg or default_config()
        self.window = window
        self.smpl = SMPLFamily(self.cfg.SPIN.smpl_model_dir)
        self.estimator = PoseEstimator(self.cfg, self.smpl, mesh=mesh, variables=spin_variables)
        self.detector = detector if detector is not None else StubDetector()

    def __call__(self, video_path: str, add_info: Dict,
                 max_frames: Optional[int] = None) -> StreamResult:
        import jax.numpy as jnp

        from poserisk_release_tpu.ops.crop import crop_batch
        from poserisk_release_tpu.scoring.reba import REBAScorer
        from poserisk_release_tpu.scoring.rula import RULAScorer
        from poserisk_release_tpu.tracking.sort import Sort

        result = StreamResult()
        sort = Sort()  # persistent across windows -> stable identities
        target_id: Optional[int] = None

        q: "queue.Queue" = queue.Queue(maxsize=2)  # 1 window in flight + 1 ready
        thread = threading.Thread(
            target=_decode_windows, args=(video_path, self.window, q, max_frames),
            daemon=True,
        )
        thread.start()

        reba = REBAScorer()
        rula = RULAScorer()

        while True:
            item = q.get()
            if item[0] == "error":
                raise FileNotFoundError(item[1])
            if item[0] == "meta":
                result.fps = float(item[1])
                continue
            if item[0] == "end":
                result.total_frames = int(item[1])
                break
            _, start_idx, frames = item

            detections = self.detector(frames)
            if len(detections) != len(frames):
                raise ValueError(
                    f"detector returned {len(detections)} per-frame results "
                    f"for a {len(frames)}-frame window"
                )
            track_frames: List[int] = []
            track_boxes: List[np.ndarray] = []
            for local_idx, dets in enumerate(detections):
                tracks = sort.update(np.asarray(dets, np.float64).reshape(-1, 5))
                if tracks.shape[0] == 0:
                    continue
                # Lock onto the largest-box identity seen first; follow it.
                if target_id is None or not np.any(tracks[:, 4] == target_id):
                    areas = (tracks[:, 2] - tracks[:, 0]) * (tracks[:, 3] - tracks[:, 1])
                    target_id = int(tracks[int(np.argmax(areas)), 4])
                row = tracks[tracks[:, 4] == target_id][0]
                w, h = row[2] - row[0], row[3] - row[1]
                side = max(w, h)
                track_boxes.append(
                    np.array([row[0] + w / 2, row[1] + h / 2, side, side], np.float32)
                )
                track_frames.append(start_idx + local_idx)

            if not track_frames:
                continue
            local = np.asarray(track_frames) - start_idx
            crops = np.asarray(
                crop_batch(
                    jnp.asarray(frames[local]),
                    jnp.asarray(np.stack(track_boxes)),
                    scale=float(self.cfg.DATASET.bbox_scale),
                    out_size=int(self.cfg.MODEL.input_shape[0]),
                )
            )
            # Chunk by the window size (padded to the mesh size inside run):
            # the default frames_per_step chunk would pad a small window up
            # to 64 x n_devices frames of wasted compute.
            euler, joint_cam, _aa = self.estimator.run(crops, chunk=self.window)
            for r in reba(euler, joint_cam, add_info):
                result.reba_scores.append(r["score"])
            for r in rula(euler, joint_cam, add_info):
                result.rula_scores.append(r["score"])
            result.frames.extend(track_frames)

        thread.join(timeout=5)
        return result
