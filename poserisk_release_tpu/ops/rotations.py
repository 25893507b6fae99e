"""Branchless, vmappable rotation conversions (JAX).

The reference converts SPIN's per-joint rotation matrices to axis-angle and
Euler angles one joint at a time on the host with OpenCV
(/root/reference/lib/utils/coord_utils.py:24-30, 83-95). Here every
conversion is a closed-form jnp expression over a trailing (3, 3) / (3,)
axis, so a whole clip's F x 24 rotations convert in one fused XLA op.

Convention parity (required for score-identical REBA/RULA):
  * rotmat -> axis-angle follows cv2.Rodrigues' algorithm, including its
    theta ~ pi branch (sign choice from the matrix diagonal/off-diagonals).
  * rotmat -> Euler follows the reference's XYZ extraction
    (coord_utils.py:69-81) with the sy < 1e-6 gimbal branch as jnp.where.
  * euler -> rotmat is the Rz @ Ry @ Rx composition (coord_utils.py:45-60).
All branches are data-independent `jnp.where` selects: safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Classic Rodrigues formula R = I + sin(t) K + (1 - cos(t)) K^2, with the
    t -> 0 limit handled by series expansions of sin(t)/t and (1-cos t)/t^2
    so the expression is smooth and branch-free.
    """
    aa = jnp.asarray(aa)
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # (..., 1)
    theta = jnp.sqrt(theta2)
    small = theta2 < 1e-12

    # sin(t)/t and (1 - cos(t))/t^2 with Taylor fallbacks near zero.
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / jnp.where(small, 1.0, theta2))

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    K2 = jnp.matmul(K, K)
    return eye + sinc[..., None] * K + cosc[..., None] * K2


def rotmat_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3), cv2 convention.

    Mirrors cv2.Rodrigues(matrix) so downstream Euler angles and the debug
    axis-angle dumps match the reference bit-for-bit (to float precision):

      r   = (R21 - R12, R02 - R20, R10 - R01)
      c   = clip((trace - 1)/2, -1, 1); theta = arccos(c); s = sin(theta)
      |s| >= eps : out = r * theta / (2 s)
      s < eps, c > 0  (theta ~ 0) : out = 0
      s < eps, c <= 0 (theta ~ pi): axis from sqrt((diag + 1)/2) with signs
         taken from the first row (R01, R02) and a parity fix from R12.
    """
    R = jnp.asarray(R)
    rx = R[..., 2, 1] - R[..., 1, 2]
    ry = R[..., 0, 2] - R[..., 2, 0]
    rz = R[..., 1, 0] - R[..., 0, 1]
    r = jnp.stack([rx, ry, rz], axis=-1)

    c = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(c)
    s = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1), 0.0)) * 0.5  # = |sin(theta)|

    # Generic branch: r * theta / (2 sin theta).
    safe_s = jnp.where(s < 1e-5, jnp.ones_like(s), s)
    generic = r * (theta / (2.0 * safe_s))[..., None]

    # theta ~ pi branch (cv2's diagonal method).
    t0 = jnp.sqrt(jnp.maximum((R[..., 0, 0] + 1.0) * 0.5, 0.0))
    t1 = jnp.sqrt(jnp.maximum((R[..., 1, 1] + 1.0) * 0.5, 0.0))
    t2 = jnp.sqrt(jnp.maximum((R[..., 2, 2] + 1.0) * 0.5, 0.0))
    a1 = jnp.where(R[..., 0, 1] < 0, -t1, t1)
    a2 = jnp.where(R[..., 0, 2] < 0, -t2, t2)
    # Parity fix when the x component is the smallest: flip z if the signs of
    # R12 and a1*a2 disagree (cv2's `if (R12 > 0) != (ry*rz > 0)` check).
    x_smallest = (jnp.abs(t0) < jnp.abs(a1)) & (jnp.abs(t0) < jnp.abs(a2))
    flip = x_smallest & ((R[..., 1, 2] > 0) != (a1 * a2 > 0))
    a2 = jnp.where(flip, -a2, a2)
    axis_pi = jnp.stack([t0, a1, a2], axis=-1)
    norm_pi = jnp.sqrt(jnp.maximum(jnp.sum(axis_pi * axis_pi, axis=-1, keepdims=True), 1e-24))
    near_pi = (axis_pi / norm_pi) * theta[..., None]

    small_s = s < 1e-5
    out = jnp.where(
        small_s[..., None],
        jnp.where((c > 0)[..., None], jnp.zeros_like(r), near_pi),
        generic,
    )
    return out


def slerp_rotmat(Ra: jnp.ndarray, Rb: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Geodesic interpolation between rotation matrices (..., 3, 3):
    R(t) = Ra . exp(t . log(Ra^T Rb)), branch-free via the existing
    rotmat<->axis-angle conversions. `t` must broadcast against the leading
    dims, e.g. (B, 1, 1) for per-frame weights over (B, 24, 3, 3) joints.

    Endpoint behaviour: t == 0 returns Ra BIT-EXACTLY (the relative
    axis-angle scales to 0, Rodrigues of 0 is the exact identity, and
    Ra @ I multiplies by exact 1s/0s); t == 1 returns Rb up to one
    log/exp round trip (float32 rounding). Used by the pose-stride
    throughput mode (throughput.make_pose_core) where every anchor frame
    sits at t == 0, so anchor poses are never perturbed."""
    Ra = jnp.asarray(Ra)
    Rb = jnp.asarray(Rb)
    rel = jnp.matmul(jnp.swapaxes(Ra, -1, -2), Rb)  # Ra^T Rb
    aa = rotmat_to_axis_angle(rel)
    return jnp.matmul(Ra, axis_angle_to_rotmat(aa * t))


def rotmat_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> XYZ Euler angles (..., 3) in radians.

    Same extraction as the reference's rotationMatrixToEulerAngles
    (coord_utils.py:69-81): R = Rz(z) @ Ry(y) @ Rx(x); gimbal-lock branch
    (sy < 1e-6) as a select.
    """
    R = jnp.asarray(R)
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def euler_xyz_to_rotmat(euler: jnp.ndarray) -> jnp.ndarray:
    """XYZ Euler (..., 3) radians -> rotation matrix, R = Rz @ Ry @ Rx.

    Matches the reference's euler_to_rotMat composition (coord_utils.py:45-60,
    called with (z, y, x) argument order in axis_angle_to_euler_angle).
    """
    euler = jnp.asarray(euler)
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_euler_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> XYZ Euler in degrees (reference scoring units)."""
    return rotmat_to_euler_xyz(R) * (180.0 / jnp.pi)


def is_rotation_matrix(R: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
    """Orthonormality check, parity with the reference's isRotationMatrix
    (/root/reference/lib/utils/coord_utils.py:62-67): ||R^T R - I|| < tol per
    matrix. Returns a boolean array over the leading axes."""
    R = jnp.asarray(R)
    eye = jnp.eye(3, dtype=R.dtype)
    defect = jnp.linalg.norm(
        (jnp.swapaxes(R, -1, -2) @ R - eye).reshape(R.shape[:-2] + (9,)), axis=-1
    )
    return defect < tol


def euler_roundtrip_defect(R: jnp.ndarray) -> jnp.ndarray:
    """Per-matrix signed-sum defect of the rotmat -> euler -> rotmat loop.

    The reference guards every conversion with
    ``if (rotation_matrix - rotation_matrix2).sum() > 0.1: assert 0``
    (/root/reference/lib/utils/coord_utils.py:88-91) -- a SIGNED sum, not an
    absolute one, replicated verbatim. Returns the defect (..., ) so callers
    can apply the same 0.1 threshold.
    """
    R = jnp.asarray(R)
    R2 = euler_xyz_to_rotmat(rotmat_to_euler_xyz(R))
    return jnp.sum(R - R2, axis=(-1, -2))


def assert_euler_roundtrip(R, threshold: float = 0.1) -> None:
    """Opt-in host-side mirror of the reference's round-trip consistency
    assert (coord_utils.py:90-91). Raises AssertionError naming the worst
    offender when any matrix's defect exceeds the reference's 0.1 bound."""
    import numpy as np

    defect = np.asarray(euler_roundtrip_defect(jnp.asarray(R, jnp.float32)))
    if defect.size and defect.max() > threshold:
        idx = np.unravel_index(int(np.argmax(defect)), defect.shape)
        raise AssertionError(
            f"euler round-trip defect {defect.max():.4f} > {threshold} at index {idx} "
            "(reference coord_utils.py:90-91 would abort here)"
        )


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (..., 6) -> (..., 3, 3) via Gram-Schmidt.

    Matches SPIN's rot6d_to_rotmat head convention (Zhou et al. CVPR'19):
    reshape to (..., 3, 2), take a1 = m[..., 0] and a2 = m[..., 1], and build
    orthonormal columns b1, b2, b3 = b1 x b2.
    """
    x = jnp.asarray(x)
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2u = a2 - proj * b1
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalised quaternion (w, x, y, z) (..., 4) -> rotmat (..., 3, 3).

    Same algebra as smplpytorch's quat2mat (rodrigues_layer.py:13-38); used by
    the LBS axis-angle path for numeric parity with the reference body model.
    """
    quat = jnp.asarray(quat)
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz], axis=-1)
    row1 = jnp.stack([2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx], axis=-1)
    row2 = jnp.stack([2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_matrix_to_rot_vec(R: jnp.ndarray) -> jnp.ndarray:
    """Named counterpart of the reference's standalone scalar util
    rotation_matrix_to_rotVec (coord_utils.py:32-43), vmappable over (..., 3, 3).

    Deliberately replicates the reference formula rather than delegating to
    rotmat_to_axis_angle (the cv2 mirror): theta = arccos((trace-1)/2), and
    the degenerate test is `sin(theta) == 0` EXACTLY -- in floats that fires
    only for theta == 0 (math.sin(pi) is ~1.2e-16, not 0), so near-pi
    matrices go through the generic formula and degrade, exactly like the
    reference. Deviation: an invalid trace (|c| > 1 from accumulated error)
    yields NaN here where math.acos would raise ValueError.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos((trace - 1.0) * 0.5)
    sin_theta = jnp.sin(theta)
    degenerate = sin_theta == 0
    multi = 1.0 / (2.0 * jnp.where(degenerate, jnp.ones_like(sin_theta), sin_theta))
    rx = multi * (R[..., 2, 1] - R[..., 1, 2]) * theta
    ry = multi * (R[..., 0, 2] - R[..., 2, 0]) * theta
    rz = multi * (R[..., 1, 0] - R[..., 0, 1]) * theta
    vec = jnp.stack([rx, ry, rz], axis=-1)
    return jnp.where(degenerate[..., None], jnp.zeros_like(vec), vec)


def euler_deg_to_axis_angle(euler_deg: jnp.ndarray) -> jnp.ndarray:
    """XYZ Euler degrees (..., 3) -> axis-angle, cv2 convention.

    Parity with the reference's euler_angle_to_axis_angle path
    (coord_utils.py:97-103): degrees -> Rz@Ry@Rx -> rotation vector.
    """
    return rotmat_to_axis_angle(euler_xyz_to_rotmat(euler_deg * (jnp.pi / 180.0)))


def axis_angle_to_rotmat_smpl(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotmat via the half-angle quaternion, smplpytorch-style.

    Replicates batch_rodrigues (rodrigues_layer.py:41-52) including its
    +1e-8 regulariser inside the norm, so LBS outputs match the reference
    body model to float precision.
    """
    aa = jnp.asarray(aa)
    norm = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    half = norm * 0.5
    v_cos = jnp.cos(half)
    v_sin = jnp.sin(half)
    quat = jnp.concatenate([v_cos, v_sin * (aa / norm)], axis=-1)
    return quat_to_rotmat(quat)
