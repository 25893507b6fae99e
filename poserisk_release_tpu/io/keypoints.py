"""Keypoint-driven bbox derivation + temporal smoothing (host-side).

Port of the reference's optional keypoint crop path: smooth_bbox.py
(/root/reference/lib/utils/smooth_bbox.py:9-121, itself from
akanazawa/human_dynamics) plus CropDataset's joints2d branch
(/root/reference/data/demo_dataset.py:46-53), which converts the smoothed
[cx, cy, scale] params back to square person-height boxes via
150/scale. Never hit on the demo path (joints2d=None) but part of the
library surface.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.signal import medfilt

PERSON_TARGET_PX = 150.0


def kp_to_bbox_param(kp: Optional[np.ndarray], vis_thresh: float) -> Optional[np.ndarray]:
    """(K, 3) keypoints -> [cx, cy, scale] with scale = 150/person_height,
    or None when invisible/degenerate."""
    if kp is None:
        return None
    kp = np.asarray(kp)
    vis = kp[:, 2] > vis_thresh
    if not np.any(vis):
        return None
    min_pt = np.min(kp[vis, :2], axis=0)
    max_pt = np.max(kp[vis, :2], axis=0)
    person_height = float(np.linalg.norm(max_pt - min_pt))
    if person_height < 0.5:
        return None
    center = (min_pt + max_pt) / 2.0
    return np.append(center, PERSON_TARGET_PX / person_height)


def get_all_bbox_params(
    kps: Sequence[Optional[np.ndarray]], vis_thresh: float = 2
) -> Tuple[np.ndarray, int, int]:
    """Per-frame bbox params with linear interpolation over gaps.

    Returns (params (M, 3), start_index inclusive, end_index exclusive) over
    the input frame range, matching the reference's loop semantics (leading/
    trailing missing frames are dropped, interior gaps interpolated).
    """
    params: List[np.ndarray] = []
    start_index = -1
    gap = 0
    i = -1
    for i, kp in enumerate(kps):
        p = kp_to_bbox_param(kp, vis_thresh)
        if p is None:
            gap += 1
            continue
        if start_index == -1:
            start_index = i
            gap = 0
        if gap > 0:
            prev = params[-1]
            interp = np.stack(
                [np.linspace(a, b, gap + 2) for a, b in zip(prev, p)]
            ).T[1:-1]
            params.extend(interp)
            gap = 0
        params.append(np.asarray(p, np.float64))
    stacked = (
        np.stack(params).astype(np.float32)
        if params
        else np.empty((0, 3), np.float32)
    )
    return stacked, start_index, i - gap + 1


def smooth_bbox_params(
    bbox_params: np.ndarray, kernel_size: int = 11, sigma: float = 8
) -> np.ndarray:
    """Median then gaussian filtering per parameter trajectory."""
    med = np.stack([medfilt(t, kernel_size) for t in bbox_params.T]).T
    return np.stack([gaussian_filter1d(t, sigma) for t in med.T]).T


def get_smooth_bbox_params(
    kps: Sequence[Optional[np.ndarray]],
    vis_thresh: float = 2,
    kernel_size: int = 11,
    sigma: float = 3,
) -> Tuple[np.ndarray, int, int]:
    params, start, end = get_all_bbox_params(kps, vis_thresh)
    smoothed = smooth_bbox_params(params, kernel_size, sigma)
    smoothed = np.vstack((np.zeros((start, 3)), smoothed))
    return smoothed, start, end


def bboxes_from_joints2d(
    joints2d: Sequence[Optional[np.ndarray]], vis_thresh: float = 0.3
) -> Tuple[np.ndarray, int, int]:
    """The CropDataset joints2d branch (demo_dataset.py:46-53): raw (not
    smoothed) params, scale inverted back to person-height pixels, square
    boxes. Returns (bboxes (M, 4) cxcywh, time_pt1, time_pt2)."""
    params, t0, t1 = get_all_bbox_params(joints2d, vis_thresh=vis_thresh)
    if t0 == -1:
        raise ValueError("no visible keypoints in any frame")
    side = PERSON_TARGET_PX / params[:, 2]
    bboxes = np.stack([params[:, 0], params[:, 1], side, side]).T
    return bboxes.astype(np.float32), t0, t1
