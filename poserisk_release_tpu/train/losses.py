"""Mesh/coordinate training losses (JAX), TPU-native rebuild of lib/core/loss.py.

The reference's training stack is vestigial (never exercised by run.py --
SURVEY.md section 2.13) but part of the capability surface, so the losses are
rebuilt as pure jnp functions (differentiable, vmapped over the batch):

  * coord_loss          -- masked L1 (CoordLoss, loss.py:10-23)
  * laplacian_loss      -- uniform-weight mesh Laplacian smoothness
                           (LaplacianLoss, loss.py:25-58); the dense 6890^2
                           matmul becomes a sparse neighbour-mean gather,
                           mathematically identical row-normalised Laplacian.
  * normal_vector_loss  -- GT-face-normal alignment (loss.py:61-87)
  * edge_length_loss    -- per-edge length L1 (loss.py:90-113)

All are jit/grad-compatible; face index arrays are static constants.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def coord_loss(pred, target, target_valid=None):
    """Mean L1; optional validity mask multiplies both sides (reference
    semantics: masked entries contribute zero but still count in the mean)."""
    pred = jnp.asarray(pred)
    target = jnp.asarray(target)
    if target_valid is not None:
        pred = pred * target_valid
        target = target * target_valid
    return jnp.mean(jnp.abs(pred - target))


def build_laplacian_neighbors(faces: np.ndarray, num_verts: int,
                              max_degree: int | None = None):
    """Static neighbour table (V, max_degree) + degree (V,) from triangle faces.

    Row-normalised uniform Laplacian: L x = x - mean(neighbours). Equivalent
    to the reference's dense matrix (laplacian[i]/degree_i) without the
    6890 x 6890 matmul. max_degree defaults to the mesh's actual maximum
    valence (so the equivalence is unconditional); an explicit value that
    would TRUNCATE a neighbour list raises instead of silently computing a
    wrong Laplacian.
    """
    neighbors = [[] for _ in range(num_verts)]
    for a, b, c in np.asarray(faces, np.int64):
        for u, v in ((a, b), (b, c), (c, a)):
            if v not in neighbors[u]:
                neighbors[u].append(v)
            if u not in neighbors[v]:
                neighbors[v].append(u)
    actual_max = max((len(n) for n in neighbors), default=0)
    if max_degree is None:
        max_degree = max(actual_max, 1)
    elif actual_max > max_degree:
        raise ValueError(
            f"max_degree={max_degree} would truncate a vertex with "
            f"{actual_max} neighbours; pass max_degree>={actual_max} or None")
    degree = np.array([max(len(n), 1) for n in neighbors], np.int32)
    table = np.zeros((num_verts, max_degree), np.int32)
    mask = np.zeros((num_verts, max_degree), np.float32)
    for i, n in enumerate(neighbors):
        table[i, : len(n)] = n
        mask[i, : len(n)] = 1.0
    return table, mask, degree


def laplacian_loss(verts, neighbor_table, neighbor_mask, average=False):
    """verts: (B, V, 3). Sum over coords of squared Laplacian per vertex,
    then mean (or sum/B with average=True) -- reference loss.py:48-58."""
    gathered = verts[:, neighbor_table, :]  # (B, V, D, 3)
    neigh_sum = jnp.sum(gathered * neighbor_mask[None, :, :, None], axis=2)
    degree = jnp.sum(neighbor_mask, axis=1)[None, :, None]
    lap = verts - neigh_sum / jnp.maximum(degree, 1.0)
    per_vertex = jnp.sum(lap**2, axis=2)  # (B, V)
    if average:
        return jnp.sum(per_vertex) / verts.shape[0]
    return jnp.mean(per_vertex)


def _normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def normal_vector_loss(coord_out, coord_gt, faces):
    faces = jnp.asarray(faces, jnp.int32)
    v1o = _normalize(coord_out[:, faces[:, 1]] - coord_out[:, faces[:, 0]])
    v2o = _normalize(coord_out[:, faces[:, 2]] - coord_out[:, faces[:, 0]])
    v3o = _normalize(coord_out[:, faces[:, 2]] - coord_out[:, faces[:, 1]])

    v1g = _normalize(coord_gt[:, faces[:, 1]] - coord_gt[:, faces[:, 0]])
    v2g = _normalize(coord_gt[:, faces[:, 2]] - coord_gt[:, faces[:, 0]])
    normal_gt = _normalize(jnp.cross(v1g, v2g))

    cos1 = jnp.abs(jnp.sum(v1o * normal_gt, axis=2))
    cos2 = jnp.abs(jnp.sum(v2o * normal_gt, axis=2))
    cos3 = jnp.abs(jnp.sum(v3o * normal_gt, axis=2))
    return jnp.mean(jnp.stack([cos1, cos2, cos3], axis=1))


def edge_length_loss(coord_out, coord_gt, faces):
    faces = jnp.asarray(faces, jnp.int32)

    def edges(coord):
        d1 = jnp.linalg.norm(coord[:, faces[:, 0]] - coord[:, faces[:, 1]], axis=2)
        d2 = jnp.linalg.norm(coord[:, faces[:, 0]] - coord[:, faces[:, 2]], axis=2)
        d3 = jnp.linalg.norm(coord[:, faces[:, 1]] - coord[:, faces[:, 2]], axis=2)
        return d1, d2, d3

    out = edges(coord_out)
    gt = edges(coord_gt)
    diffs = [jnp.abs(a - b) for a, b in zip(out, gt)]
    return jnp.mean(jnp.stack(diffs, axis=1))


def get_loss(faces: np.ndarray) -> Tuple:
    """Factory mirroring the reference get_loss tuple (loss.py:116-118):
    (coord, normal, edge, coord, coord) as partial-applied callables."""
    return (
        coord_loss,
        partial(normal_vector_loss, faces=faces),
        partial(edge_length_loss, faces=faces),
        coord_loss,
        coord_loss,
    )
