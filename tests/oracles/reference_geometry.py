"""Host-side numpy/cv2 oracles mirroring the reference's geometry code paths.

These re-state the math of /root/reference/lib/utils/coord_utils.py on top of
cv2 so parity tests can compare the JAX ops against the exact library calls
the reference makes (cv2.Rodrigues both directions, XYZ Euler extraction).
"""

import math

import cv2
import numpy as np


def rodrigues_vec_to_mat(aa: np.ndarray) -> np.ndarray:
    return cv2.Rodrigues(np.asarray(aa, np.float64))[0]


def rodrigues_mat_to_vec(R: np.ndarray) -> np.ndarray:
    return cv2.Rodrigues(np.asarray(R, np.float64))[0].reshape(-1)


def euler_from_rotmat_xyz(R: np.ndarray) -> np.ndarray:
    """Reference rotationMatrixToEulerAngles (coord_utils.py:69-81)."""
    sy = math.sqrt(R[0, 0] * R[0, 0] + R[1, 0] * R[1, 0])
    if sy >= 1e-6:
        x = math.atan2(R[2, 1], R[2, 2])
        y = math.atan2(-R[2, 0], sy)
        z = math.atan2(R[1, 0], R[0, 0])
    else:
        x = math.atan2(-R[1, 2], R[1, 1])
        y = math.atan2(-R[2, 0], sy)
        z = 0.0
    return np.array([x, y, z])


def rotmat_from_euler_zyx_composition(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """Reference euler_to_rotMat: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    return Rz @ Ry @ Rx


def axis_angle_to_euler_deg(pose_j3: np.ndarray) -> np.ndarray:
    """Reference axis_angle_to_euler_angle for one frame (J, 3) -> degrees."""
    out = []
    for aa in pose_j3:
        R = rodrigues_vec_to_mat(aa)
        out.append(euler_from_rotmat_xyz(R) * 180.0 / math.pi)
    return np.stack(out)
