"""Batched SMPL linear-blend-skinning forward pass (JAX/XLA, TPU-first).

The reference runs LBS one frame at a time with Python loops over the 24-joint
kinematic chain (/root/reference/lib/smplpytorch/smplpytorch/pytorch/
smpl_layer.py:65-158, loops at :109-132) -- the dominant CPU bottleneck of the
whole pipeline (SURVEY.md section 3.3). Here the full clip batches through one
fused XLA graph:

  * axis-angle -> rotmats via the half-angle-quaternion formulation
    (numeric parity with smplpytorch's batch_rodrigues);
  * blend shapes + pose correctives as two large MXU matmuls;
  * the kinematic chain as a statically unrolled 23-step accumulation of
    (B, 3, 3) matmuls (J is a compile-time constant, so no lax.scan overhead
    and XLA schedules the chain while the big matmuls stream);
  * skinning as ONE (V, J) x (B*J, 12) MXU matmul -- the classic
    "weights @ per-joint affine" formulation, instead of materialising the
    reference's (B, 4, 4, V) tensor.

Semantics parity with SMPL_Layer.forward:
  * all-zero betas fall back to the model's template betas (smpl_layer.py:87);
  * all-zero trans applies no translation (center_idx is None in the
    reference's usage, so no root centering);
  * outputs are (verts (B, V, 3), joints (B, J, 3)) in meters.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from poserisk_release_tpu.body.smpl import SMPLModel
from poserisk_release_tpu.ops.rotations import axis_angle_to_rotmat_smpl

_HI = jax.lax.Precision.HIGHEST


def smpl_params_to_jax(model: SMPLModel) -> Dict[str, jnp.ndarray]:
    """Device-resident parameter pytree for the LBS kernel."""
    V = model.num_verts
    return {
        "v_template": jnp.asarray(model.v_template, jnp.float32),
        "shapedirs": jnp.asarray(model.shapedirs, jnp.float32).reshape(V * 3, -1),
        "posedirs": jnp.asarray(model.posedirs, jnp.float32).reshape(V * 3, -1),
        "J_regressor": jnp.asarray(model.J_regressor, jnp.float32),
        "weights": jnp.asarray(model.weights, jnp.float32),
        "template_betas": jnp.asarray(model.betas, jnp.float32),
        # Static ints (hashable) travel alongside via closure, not the pytree.
    }


def _kinematic_chain(
    rotmats: jnp.ndarray, joints_rest: jnp.ndarray, parents: Tuple[int, ...]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate world transforms along the (static) kinematic tree.

    rotmats: (B, J, 3, 3) local rotations; joints_rest: (B, J, 3).
    Returns (R_world (B, J, 3, 3), t_world (B, J, 3)) of each joint's 4x4
    world transform [R | t] (the homogeneous row is implicit).
    """
    num_joints = rotmats.shape[1]
    R = [rotmats[:, 0]]
    t = [joints_rest[:, 0]]
    for j in range(1, num_joints):
        p = parents[j]
        rel_t = joints_rest[:, j] - joints_rest[:, p]
        R_j = jnp.matmul(R[p], rotmats[:, j], precision=_HI)
        t_j = jnp.einsum("bij,bj->bi", R[p], rel_t, precision=_HI) + t[p]
        R.append(R_j)
        t.append(t_j)
    return jnp.stack(R, axis=1), jnp.stack(t, axis=1)


@partial(jax.jit, static_argnames=("parents",))
def _lbs_impl(params, pose_axisang, betas, trans, parents):
    B = pose_axisang.shape[0]
    J = len(parents)
    V = params["v_template"].shape[0]

    # --- rotations -------------------------------------------------------
    aa = pose_axisang.reshape(B, J, 3)
    rotmats = axis_angle_to_rotmat_smpl(aa)  # (B, J, 3, 3)

    # --- shape blend + joint regression -----------------------------------
    # Reference quirk: all-zero betas (norm == 0) fall back to template
    # betas. PER FRAME -- the reference runs smpl_layer one frame at a time
    # (smpl_layer.py:87), so in a mixed batch each frame takes its own
    # branch; a batch-global norm would leak one frame's betas into
    # another's fallback decision.
    use_template = jnp.linalg.norm(betas, axis=1, keepdims=True) == 0.0
    eff_betas = jnp.where(
        use_template, jnp.broadcast_to(params["template_betas"], betas.shape), betas
    )
    v_shaped = params["v_template"][None] + jnp.matmul(
        eff_betas, params["shapedirs"].T, precision=_HI
    ).reshape(B, V, 3)
    joints_rest = jnp.einsum("jv,bvc->bjc", params["J_regressor"], v_shaped, precision=_HI)

    # --- pose correctives --------------------------------------------------
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_map = (rotmats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    v_posed = v_shaped + jnp.matmul(pose_map, params["posedirs"].T, precision=_HI).reshape(
        B, V, 3
    )

    # --- kinematic chain ----------------------------------------------------
    R_world, t_world = _kinematic_chain(rotmats, joints_rest, parents)

    # Remove the rest-pose joint location from each world transform so the
    # affine maps rest-space points: A = [R_world | t_world - R_world @ j_rest].
    t_skin = t_world - jnp.einsum("bjik,bjk->bji", R_world, joints_rest, precision=_HI)

    # --- skinning: one (V, J) @ (B*J, 12) MXU matmul -------------------------
    A = jnp.concatenate([R_world.reshape(B, J, 9), t_skin], axis=-1)  # (B, J, 12)
    M = jnp.einsum("vj,bjk->bvk", params["weights"], A, precision=_HI)  # (B, V, 12)
    Rv = M[..., :9].reshape(B, V, 3, 3)
    tv = M[..., 9:]
    verts = jnp.einsum("bvij,bvj->bvi", Rv, v_posed, precision=_HI) + tv

    # --- translation (reference: skipped when all-zero, per frame) -----------
    has_trans = jnp.linalg.norm(trans, axis=1) != 0.0
    gate = jnp.where(has_trans, 1.0, 0.0)[:, None, None]
    verts = verts + gate * trans[:, None, :]
    joints = t_world + gate * trans[:, None, :]
    return verts, joints


class LBS:
    """Callable SMPL forward bound to one model's parameters.

    >>> lbs = LBS(model)
    >>> verts, joints = lbs(pose_aa_b72, betas_b10)

    use_pallas=True routes vertex skinning through the fused Pallas kernel
    (ops/lbs_pallas.py): ~13x faster on TPU for full-mesh batches, at default
    MXU precision (vs this path's HIGHEST) -- use it for throughput/training
    workloads; the default jnp path is the bit-parity reference for debug
    mesh exports. Translation composes as a post-kernel add (reference
    semantics preserved); off-TPU the kernel runs in interpret mode so the
    option stays usable everywhere.
    """

    def __init__(self, model: SMPLModel, use_pallas: bool = False):
        self.model = model
        self.use_pallas = use_pallas
        self.params = smpl_params_to_jax(model)
        parents = np.asarray(model.kintree_parents).astype(np.int64)
        parents = parents.copy()
        parents[0] = 0  # root sentinel (2**32-1 in the pkl) is never used
        self.parents: Tuple[int, ...] = tuple(int(p) for p in parents)

    def __call__(
        self,
        pose_axisang: jnp.ndarray,  # (B, J*3)
        betas: jnp.ndarray | None = None,  # (B, 10)
        trans: jnp.ndarray | None = None,  # (B, 3)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pose_axisang = jnp.asarray(pose_axisang, jnp.float32)
        B = pose_axisang.shape[0]
        if betas is None:
            betas = jnp.zeros((B, self.params["template_betas"].shape[0]), jnp.float32)
        if trans is None:
            trans = jnp.zeros((B, 3), jnp.float32)
        if self.use_pallas:
            from poserisk_release_tpu.ops.lbs_pallas import lbs_pallas_jit

            verts, joints = lbs_pallas_jit(
                self.params, pose_axisang, jnp.asarray(betas, jnp.float32),
                self.parents,
                # The module docstring's promised off-TPU fallback: Mosaic
                # lowering needs a TPU, interpret mode does not (same
                # platform gate as pipeline._pallas_crop).
                interpret=jax.devices()[0].platform != "tpu",
            )
            # Reference semantics: translation applies only when non-zero,
            # PER FRAME (smpl_layer.py:148-155 runs one frame per call); the
            # kernel skins in rest space, so it composes as a plain post-add.
            trans = jnp.asarray(trans, jnp.float32)
            gate = jnp.where(
                jnp.linalg.norm(trans, axis=1) != 0.0, 1.0, 0.0)[:, None, None]
            offset = gate * trans[:, None, :]
            return verts + offset, joints + offset
        return _lbs_impl(self.params, pose_axisang, jnp.asarray(betas, jnp.float32),
                         jnp.asarray(trans, jnp.float32), self.parents)


def joints_only(
    params: Dict[str, jnp.ndarray], pose_axisang: jnp.ndarray, parents: Tuple[int, ...]
) -> jnp.ndarray:
    """Fast path used by scoring: joint locations for zero-beta poses.

    The scoring pipeline (reference get_joint_cam, coord_utils.py:7-21) only
    needs the 24 joint positions, never the 6890 vertices, so skinning and
    pose correctives are skipped entirely: joints depend only on the chain.
    Returns (B, J, 3) in meters.
    """
    B = pose_axisang.shape[0]
    J = len(parents)
    aa = pose_axisang.reshape(B, J, 3)
    rotmats = axis_angle_to_rotmat_smpl(aa)
    return joints_only_from_rotmats(params, rotmats, parents)


def joints_only_from_rotmats(
    params: Dict[str, jnp.ndarray], rotmats: jnp.ndarray, parents: Tuple[int, ...]
) -> jnp.ndarray:
    """joints_only taking per-joint rotation matrices (B, J, 3, 3) directly.

    The training step differentiates through this: SPIN's head already
    predicts rotation matrices, and routing them through axis-angle and back
    is an identity with gradient singularities (the arccos/sqrt in
    rotmat_to_axis_angle has infinite derivative at theta ~ 0/pi, which is
    exactly where near-identity joint rotations live). Returns (B, J, 3) m.
    """
    B = rotmats.shape[0]
    J = len(parents)
    v_shaped = params["v_template"][None] + jnp.matmul(
        params["template_betas"][None], params["shapedirs"].T, precision=_HI
    ).reshape(1, -1, 3)
    joints_rest = jnp.einsum("jv,bvc->bjc", params["J_regressor"], v_shaped, precision=_HI)
    joints_rest = jnp.broadcast_to(joints_rest, (B, J, 3))
    _, t_world = _kinematic_chain(rotmats, joints_rest, parents)
    return t_world
