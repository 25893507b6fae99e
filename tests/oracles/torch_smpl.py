"""Torch restatement of the reference SMPL forward pass, for LBS parity tests.

Follows the exact math of smplpytorch's SMPL_Layer.forward
(/root/reference/lib/smplpytorch/smplpytorch/pytorch/smpl_layer.py:65-158)
and batch_rodrigues (rodrigues_layer.py:41-52), operating on the same plain
ndarray parameter set the JAX model uses, so both implementations are driven
from one asset.
"""

import numpy as np
import torch


def _quat_to_mat(quat):
    q = quat / quat.norm(p=2, dim=1, keepdim=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return torch.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        dim=1,
    ).view(-1, 3, 3)


def _rodrigues(axisang):
    # Reference regulariser: norm of (v + 1e-8), elementwise.
    angle = torch.norm(axisang + 1e-8, p=2, dim=1, keepdim=True)
    normed = axisang / angle
    half = angle * 0.5
    quat = torch.cat([torch.cos(half), torch.sin(half) * normed], dim=1)
    return _quat_to_mat(quat)


def smpl_forward(arrays, pose_72, betas_10=None, trans_3=None):
    """arrays: dict of SMPL ndarrays (same npz layout as body.smpl).
    pose_72: (B, 72) axis-angle. Returns (verts (B,V,3), joints (B,J,3))."""
    v_template = torch.from_numpy(np.asarray(arrays["v_template"], np.float32))
    shapedirs = torch.from_numpy(np.asarray(arrays["shapedirs"], np.float32))
    posedirs = torch.from_numpy(np.asarray(arrays["posedirs"], np.float32))
    j_regressor = torch.from_numpy(np.asarray(arrays["J_regressor"], np.float32))
    weights = torch.from_numpy(np.asarray(arrays["weights"], np.float32))
    template_betas = torch.from_numpy(np.asarray(arrays["betas"], np.float32))
    parents = [int(p) for p in arrays["kintree_parents"]]
    parents[0] = 0

    pose = torch.from_numpy(np.asarray(pose_72, np.float32))
    B = pose.shape[0]
    J = len(parents)
    V = v_template.shape[0]

    rotmats = _rodrigues(pose.reshape(B * J, 3)).reshape(B, J, 3, 3)

    # The reference runs SMPL_Layer one frame at a time (its caller loops,
    # coord_utils.py:12), so the all-zero-betas template fallback
    # (smpl_layer.py:87-95) is decided PER FRAME, never over the batch.
    if betas_10 is None:
        betas = template_betas.unsqueeze(0).expand(B, -1)
    else:
        given = np.broadcast_to(np.asarray(betas_10, np.float32), (B, 10))
        per_frame = np.where(
            np.linalg.norm(given, axis=1, keepdims=True) == 0.0,
            np.asarray(arrays["betas"], np.float32)[None],
            given,
        )
        betas = torch.from_numpy(np.ascontiguousarray(per_frame))
    v_shaped = v_template.unsqueeze(0) + torch.einsum(
        "vck,bk->bvc", shapedirs.view(V, 3, -1), betas
    )
    joints_rest = torch.einsum("jv,bvc->bjc", j_regressor, v_shaped)

    eye = torch.eye(3)
    pose_map = (rotmats[:, 1:] - eye).reshape(B, -1)
    v_posed = v_shaped + torch.einsum(
        "vcp,bp->bvc", posedirs.view(V, 3, -1), pose_map
    )

    # Kinematic chain of 4x4 transforms.
    results = []
    root = torch.eye(4).unsqueeze(0).repeat(B, 1, 1)
    root[:, :3, :3] = rotmats[:, 0]
    root[:, :3, 3] = joints_rest[:, 0]
    results.append(root)
    for j in range(1, J):
        rel = torch.eye(4).unsqueeze(0).repeat(B, 1, 1)
        rel[:, :3, :3] = rotmats[:, j]
        rel[:, :3, 3] = joints_rest[:, j] - joints_rest[:, parents[j]]
        results.append(torch.bmm(results[parents[j]], rel))
    world = torch.stack(results, dim=1)  # (B, J, 4, 4)

    joints = world[:, :, :3, 3]

    # Subtract rotated rest joints, then skin.
    j_h = torch.cat([joints_rest, torch.zeros(B, J, 1)], dim=2)
    correction = torch.einsum("bjik,bjk->bji", world, j_h)
    A = world.clone()
    A[:, :, :, 3] = A[:, :, :, 3] - correction
    T = torch.einsum("vj,bjik->bvik", weights, A)
    v_h = torch.cat([v_posed, torch.ones(B, V, 1)], dim=2)
    verts = torch.einsum("bvik,bvk->bvi", T, v_h)[:, :, :3]

    if trans_3 is not None:
        # Same per-frame rule for the all-zero-translation skip
        # (smpl_layer.py:148-155): each frame gates on its own trans.
        given = np.broadcast_to(np.asarray(trans_3, np.float32), (B, 3))
        gate = (np.linalg.norm(given, axis=1, keepdims=True) != 0.0).astype(np.float32)
        t = torch.from_numpy(np.ascontiguousarray(given * gate))
        verts = verts + t.unsqueeze(1)
        joints = joints + t.unsqueeze(1)
    return verts.numpy(), joints.numpy()
