"""Pallas-fused SMPL vertex skinning kernel (TPU).

The flagship fusion called out in SURVEY.md/BASELINE: blend shapes, pose
correctives, and linear-blend skinning in ONE pass over the big per-vertex
arrays. The jnp path (ops/lbs.py) materialises v_shaped and v_posed in HBM
between matmuls; this kernel streams a vertex tile through VMEM once:

    per vertex tile T (grid):
      v_c = v_template_c[T] + shapedirs_c[T] @ betas^T
                            + posedirs_c[T] @ pose_map^T     (MXU, c = x,y,z)
      M_k = weights[T] @ A_k                                 (MXU, k = 0..11)
      out_c[T] = M_(3c)*v_x + M_(3c+1)*v_y + M_(3c+2)*v_z + M_(9+c)  (VPU)

Everything in-kernel is strictly 2-D (vertices x batch / vertices x basis)
with the batch axis on lanes -- Mosaic-friendly layouts, no shape casts.
The tiny per-batch tensors (betas^T (10, B), pose_map^T (P, B), joint-affine
planes A (12, J, B)) are computed outside (rotations + the 24-step kinematic
chain are negligible) and live replicated in VMEM.

HBM traffic = one read of shapedirs/posedirs/weights/v_template + one write
of the output planes: bandwidth-optimal for the big arrays, vs 3 reads + 2
intermediate write/read pairs for the unfused path.

Falls back to interpret mode off-TPU so tests validate numerics on CPU.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poserisk_release_tpu.ops.rotations import axis_angle_to_rotmat_smpl

VTILE = 512  # vertices per grid step


def _skin_kernel(
    betas_t_ref,  # (10, B)
    pose_map_t_ref,  # (P, B)
    a_ref,  # (12, J, B) affine planes: rows of [R | t] then translation
    v_template_ref,  # (3, VT)
    shapedirs_ref,  # (3, VT, 10)
    posedirs_ref,  # (3, VT, P)
    weights_ref,  # (VT, J)
    out_x_ref,  # (VT, B)
    out_y_ref,
    out_z_ref,
):
    def posed_coord(c):
        disp = jnp.dot(
            shapedirs_ref[c], betas_t_ref[:], preferred_element_type=jnp.float32
        ) + jnp.dot(posedirs_ref[c], pose_map_t_ref[:], preferred_element_type=jnp.float32)
        return v_template_ref[c][:, None] + disp  # (VT, B)

    vx = posed_coord(0)
    vy = posed_coord(1)
    vz = posed_coord(2)

    w = weights_ref[:]

    def m(k):
        return jnp.dot(w, a_ref[k], preferred_element_type=jnp.float32)  # (VT, B)

    out_x_ref[:] = m(0) * vx + m(1) * vy + m(2) * vz + m(9)
    out_y_ref[:] = m(3) * vx + m(4) * vy + m(5) * vz + m(10)
    out_z_ref[:] = m(6) * vx + m(7) * vy + m(8) * vz + m(11)


def skin_vertices_pallas(
    betas: jnp.ndarray,  # (B, 10) effective betas
    pose_map: jnp.ndarray,  # (B, 9*(J-1)) rotmats minus identity
    affines: jnp.ndarray,  # (B, J, 12) world affines with rest-joint removed
    v_template: jnp.ndarray,  # (V, 3)
    shapedirs: jnp.ndarray,  # (V*3, 10)  [v-major, coord-minor rows]
    posedirs: jnp.ndarray,  # (V*3, P)
    weights: jnp.ndarray,  # (V, J)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused skinning; pads V to a VTILE multiple. Returns (B, V, 3)."""
    B = betas.shape[0]
    V = v_template.shape[0]
    J = weights.shape[1]
    P = pose_map.shape[1]

    # Host/XLA-side layout prep (tiny or one-off reshapes).
    sd = jnp.transpose(shapedirs.reshape(V, 3, -1), (1, 0, 2))  # (3, V, 10)
    pd = jnp.transpose(posedirs.reshape(V, 3, -1), (1, 0, 2))  # (3, V, P)
    vt = v_template.T  # (3, V)
    a_planes = jnp.transpose(affines, (2, 1, 0))  # (12, J, B)

    v_pad = (-V) % VTILE
    if v_pad:
        vt = jnp.pad(vt, ((0, 0), (0, v_pad)))
        sd = jnp.pad(sd, ((0, 0), (0, v_pad), (0, 0)))
        pd = jnp.pad(pd, ((0, 0), (0, v_pad), (0, 0)))
        weights = jnp.pad(weights, ((0, v_pad), (0, 0)))
    Vp = V + v_pad
    grid = (Vp // VTILE,)

    out_shape = jax.ShapeDtypeStruct((Vp, B), jnp.float32)
    out_x, out_y, out_z = pl.pallas_call(
        _skin_kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((10, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, J, B), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VTILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VTILE, 10), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VTILE, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, J), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((VTILE, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        betas.T.astype(jnp.float32),
        pose_map.T.astype(jnp.float32),
        a_planes.astype(jnp.float32),
        vt.astype(jnp.float32),
        sd.astype(jnp.float32),
        pd.astype(jnp.float32),
        weights.astype(jnp.float32),
    )
    verts = jnp.stack([out_x[:V], out_y[:V], out_z[:V]], axis=-1)  # (V, B, 3)
    return jnp.transpose(verts, (1, 0, 2))


def lbs_forward_pallas(
    params: Dict[str, jnp.ndarray],
    pose_axisang: jnp.ndarray,  # (B, J*3)
    betas: jnp.ndarray,  # (B, 10)
    parents: Tuple[int, ...],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full SMPL forward with the Pallas skinning kernel.

    Rotations + kinematic chain are tiny (J=24) and stay as jnp ops fused by
    XLA; the per-vertex work runs in the kernel. Matches ops.lbs semantics
    (template-betas fallback on all-zero betas).
    """
    B = pose_axisang.shape[0]
    J = len(parents)
    V = params["v_template"].shape[0]

    aa = pose_axisang.reshape(B, J, 3)
    rotmats = axis_angle_to_rotmat_smpl(aa)

    # Per-frame template-betas fallback, matching ops.lbs._lbs_impl (the
    # reference applies the quirk one frame at a time).
    use_template = jnp.linalg.norm(betas, axis=1, keepdims=True) == 0.0
    eff_betas = jnp.where(
        use_template, jnp.broadcast_to(params["template_betas"], betas.shape), betas
    )

    # Rest joints WITHOUT materialising (B, V, 3): fold the joint regressor
    # into the template and the shape basis once (B-independent, XLA hoists
    # it), then contract per-batch over the 10 betas only -- O(B*J) traffic
    # instead of an HBM round trip of the full shaped mesh, which would
    # dwarf the kernel's one-pass win at large B. Numerically this is the
    # same sum re-associated (HIGHEST precision throughout).
    hi = jax.lax.Precision.HIGHEST
    reg = params["J_regressor"]  # (J, V)
    joints_base = jnp.matmul(reg, params["v_template"], precision=hi)  # (J, 3)
    # shapedirs rows are v-major/coord-minor: (V*3, 10) -> (V, 3, 10).
    shape_basis = params["shapedirs"].reshape(V, 3, -1)
    joints_shape = jnp.einsum("jv,vcs->jcs", reg, shape_basis, precision=hi)
    joints_rest = joints_base[None] + jnp.einsum(
        "bs,jcs->bjc", eff_betas, joints_shape, precision=hi)

    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_map = (rotmats[:, 1:] - eye).reshape(B, (J - 1) * 9)

    # ONE kinematic-chain definition for both LBS paths (ops.lbs owns it),
    # so a precision/parent-handling change cannot desynchronise them.
    from poserisk_release_tpu.ops.lbs import _kinematic_chain

    R_world, t_world = _kinematic_chain(rotmats, joints_rest, parents)
    t_skin = t_world - jnp.einsum("bjik,bjk->bji", R_world, joints_rest, precision=hi)
    affines = jnp.concatenate([R_world.reshape(B, J, 9), t_skin], axis=-1)

    verts = skin_vertices_pallas(
        eff_betas, pose_map, affines,
        params["v_template"], params["shapedirs"], params["posedirs"],
        params["weights"], interpret=interpret,
    )
    return verts, t_world


@functools.partial(jax.jit, static_argnames=("parents", "interpret"))
def lbs_pallas_jit(params, pose_axisang, betas, parents, interpret=False):
    return lbs_forward_pallas(params, pose_axisang, betas, parents, interpret=interpret)
