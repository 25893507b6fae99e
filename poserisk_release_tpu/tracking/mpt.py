"""Multi-person tracking orchestration with the reference MPT's output contract.

Reproduces what the external multi-person-tracker returns to the reference
(consumed at /root/reference/lib/core/base.py:59-74; contract in SURVEY.md
section 2.9): a dict

    {person_id: {'bbox': ndarray (N, 4) [cx, cy, w, h], 'frames': ndarray (N,)}}

where each bbox is SQUARED to max(w, h) on both sides (the upstream tracker's
prepare_output_tracks does `w = h = max(w, h)`), which is what keeps the
224x224 crops aspect-correct downstream.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from poserisk_release_tpu.tracking.sort import Sort


class MultiPersonTracker:
    """detector: frames (N, H, W, 3) uint8 RGB -> per-frame (k, 5) xyxy+score."""

    def __init__(
        self,
        detector: Callable[[np.ndarray], List[np.ndarray]],
        max_age: int = 1,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
    ):
        self.detector = detector
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold

    def __call__(self, frames_rgb: np.ndarray) -> Dict[int, Dict[str, np.ndarray]]:
        return self.track_windows([(0, frames_rgb)])

    def track_windows(self, windows) -> Dict[int, Dict[str, np.ndarray]]:
        """Track an iterable of (start_frame_idx, frames) windows with ONE
        persistent SORT state -- identical results to a whole-clip call, but
        consumable from a streaming decoder so detection (device) overlaps
        decode (host thread). Windows must arrive in frame order."""
        tracker = Sort(
            max_age=self.max_age, min_hits=self.min_hits, iou_threshold=self.iou_threshold
        )
        people: Dict[int, Dict[str, list]] = {}
        for start_idx, frames_rgb in windows:
            detections = detect_frames(self.detector, frames_rgb)
            for local_idx, dets in enumerate(detections):
                tracks = tracker.update(np.asarray(dets, np.float64).reshape(-1, 5))
                accumulate_tracks(people, start_idx + local_idx, tracks)
        return finalize_tracks(people)


def detect_frames(detector, frames_rgb) -> List[np.ndarray]:
    """Run the detector on one window and validate the per-frame contract
    (exactly one (k, 5) array per input frame). A scripted stub that ignores
    its frames argument would otherwise replay ALL its detections per
    window, silently corrupting SORT state and frame indices. Shared by the
    whole-clip tracker and the streaming scorer."""
    detections = detector(frames_rgb)
    if len(detections) != len(frames_rgb):
        raise ValueError(
            f"detector returned {len(detections)} per-frame results for a "
            f"{len(frames_rgb)}-frame window; detectors must emit exactly "
            "one (k, 5) array per input frame"
        )
    return detections


def accumulate_tracks(people: Dict[int, Dict[str, list]], frame_idx: int,
                      tracks: np.ndarray) -> None:
    """Fold one frame's SORT output rows (x1, y1, x2, y2, id) into the MPT
    people dict, squaring each bbox to max(w, h) per the upstream tracker's
    prepare_output_tracks convention (SURVEY.md section 2.9). Shared by the
    whole-clip tracker above and the streaming scorer's tracking pass."""
    for row in tracks:
        x1, y1, x2, y2, tid = row
        w, h = x2 - x1, y2 - y1
        cx, cy = x1 + w / 2.0, y1 + h / 2.0
        side = max(w, h)
        entry = people.setdefault(int(tid), {"bbox": [], "frames": []})
        entry["bbox"].append(np.array([cx, cy, side, side], np.float64))
        entry["frames"].append(frame_idx)


def finalize_tracks(people: Dict[int, Dict[str, list]]) -> Dict[int, Dict[str, np.ndarray]]:
    """List-of-rows accumulator -> the MPT output contract arrays."""
    return {
        pid: {
            "bbox": np.stack(v["bbox"]),
            "frames": np.asarray(v["frames"], np.int64),
        }
        for pid, v in people.items()
    }


def filter_and_select_target(
    tracking_results: Dict[int, Dict[str, np.ndarray]],
    total_frames: int,
    min_frame_ratio: float = 0.33,
    max_min_frames: int = 1000,
):
    """Track filtering + target selection, parity with the reference:
    drop tracks shorter than min(min_frame_ratio * total, 1000) (falling back
    to keeping all when none survive, base.py:66-68), then pick the track
    with the largest mean bbox area (funcs_utils.py:55-64).

    Returns (bbox (N, 4) cxcywh, frames (N,)).
    """
    min_frames = min(total_frames * min_frame_ratio, max_min_frames)

    kept = [t for t in tracking_results.values() if t["frames"].shape[0] >= min_frames]
    if not kept:
        kept = list(tracking_results.values())
    if not kept:
        raise ValueError("no person tracks found in the clip")

    areas = [float((t["bbox"][:, 2] * t["bbox"][:, 3]).mean()) for t in kept]
    best = kept[int(np.argmax(areas))]
    return best["bbox"], best["frames"]
