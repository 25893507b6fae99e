"""Expert parallelism: the gendered SMPL body models sharded as experts.

The reference keeps all three gendered SMPL layers resident and indexes
them per run (`lib/utils/smpl.py`'s layer dict, selected by the CLI's
--gender). That dict IS an expert structure: per-frame work routes to
exactly one of a small set of parameter sets. This module shards it the
MoE way over an ``expert`` mesh axis:

  * the gender parameter trees are STACKED along a leading expert axis and
    sharded `P('expert')` — each device row holds only its expert's SMPL
    tables (the memory story of expert parallelism);
  * routing uses the dense-dispatch pattern (standard for tiny expert
    counts): inside shard_map each device computes joints for the whole
    frame batch with its local expert, masks frames routed elsewhere, and
    one psum over ``expert`` combines — no host gather, one collective.

With three genders the axis pads by repeating the neutral model (pad slots
are never routed to). Parity: tests/test_parallelism.py routes a mixed
male/female/neutral batch and matches per-gender serial computation.

What the axis buys (stated precisely): with E = 3 tiny experts the win is
RESIDENCY and routing, not FLOPs -- all gendered tables stay placed once,
one per device row, so switching a track's gender (PoseEstimator.
set_gender under --person_genders) swaps a scalar instead of re-uploading
a parameter tree, and a mixed-gender batch needs no host-side regrouping.
Dense dispatch deliberately computes the full batch per row: the joints
stage is a negligible fraction of the pose step (SPIN dominates), so
sparse dispatch's all_to_all would cost more than the masked compute it
saves. At expert counts where compute dominates, swap `routed` for a
capacity-based dispatch; the placement/stacking machinery is unchanged.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from poserisk_release_tpu.ops.lbs import joints_only_from_rotmats, smpl_params_to_jax

EXPERT_AXIS = "expert"
GENDERS = ("neutral", "male", "female")


def stack_expert_trees(trees: Sequence[Dict], mesh: Mesh,
                       expert_axis: str = EXPERT_AXIS) -> Dict:
    """Stack homogeneous expert param trees along a leading expert axis and
    shard it `P(expert)`, padding with tree 0 up to the axis size."""
    E = mesh.shape[expert_axis]
    if E < len(trees):
        raise ValueError(f"expert axis {E} < {len(trees)} experts")
    trees = list(trees) + [trees[0]] * (E - len(trees))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    spec = jax.tree_util.tree_map(
        lambda x: P(expert_axis, *([None] * (x.ndim - 1))), stacked)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), stacked, spec)


def stack_gender_experts(family, mesh: Mesh,
                         expert_axis: str = EXPERT_AXIS) -> Dict:
    """Stack the family's gendered SMPL params as experts (slot order
    GENDERS, neutral-padded). Returns the sharded stacked tree."""
    return stack_expert_trees(
        [smpl_params_to_jax(family[g]) for g in GENDERS], mesh, expert_axis)


def make_expert_joints(mesh: Mesh, parents: Tuple[int, ...],
                       expert_axis: str = EXPERT_AXIS,
                       data_axis: str | None = None):
    """fn(stacked_params, rotmats (B,24,3,3), gender_ids (B,)) -> (B,24,3) m.

    gender_ids index GENDERS. Dense dispatch: every expert row evaluates the
    full batch with its own SMPL tables, masks the frames routed to other
    experts, and a psum over ``expert`` combines. With data_axis set the
    frame batch additionally shards over it (dp x ep)."""

    def routed(stacked, rotmats, gender_ids):
        e = lax.axis_index(expert_axis)
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        joints = joints_only_from_rotmats(local, rotmats, parents)
        mask = (gender_ids == e).astype(joints.dtype)
        return lax.psum(joints * mask[:, None, None], expert_axis)

    dspec = P(data_axis) if data_axis else P()
    in_specs = (P(expert_axis), P(data_axis, None, None, None), dspec)
    return shard_map(routed, mesh=mesh, in_specs=in_specs,
                     out_specs=P(data_axis, None, None), check_vma=False)
