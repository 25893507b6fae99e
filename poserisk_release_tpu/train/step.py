"""End-to-end SPIN fine-tuning step (TPU-idiomatic training loop core).

The reference ships only vestigial, partly-broken training code (losses,
optimizers, dataset mixers -- none wired to a runnable step; SURVEY.md
section 2.13). This module closes the loop the TPU way: ONE jitted train
step -- HMR forward (optionally rematerialised backbone), axis-angle ->
SMPL joints, reference losses, optax update -- whose batch axis shards
across the data mesh; with replicated parameters and a sharded batch, XLA
inserts the gradient all-reduce automatically, so the same step runs
single-chip or on a v5e-8 unchanged.

>>> state = TrainState.create(cfg, smpl_family)
>>> state, loss = state.step(crops, target_joints)
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from poserisk_release_tpu.models.spin import HMR
from poserisk_release_tpu.ops.lbs import joints_only_from_rotmats
from poserisk_release_tpu.train.losses import coord_loss
from poserisk_release_tpu.train.optim import get_optimizer


def make_train_step(n_iter: int, parents: Tuple[int, ...], optimizer,
                    remat: bool = True, compute_dtype=jnp.float32):
    """step(params, batch_stats, opt_state, smpl_params, crops, target_joints,
    joint_valid) -> (params, opt_state, loss). Jittable; shard the crops /
    targets batch axis across the mesh and replicate everything else."""
    model = HMR(n_iter=n_iter, dtype=compute_dtype, remat=remat)

    def loss_fn(params, batch_stats, smpl_params, crops, target_joints, joint_valid):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rotmat, _betas, _cam = model.apply(variables, crops)
        # Differentiate through the rotation MATRICES: the eval path's
        # rotmat -> axis-angle -> rotmat round trip is an identity whose
        # gradient blows up at theta ~ 0/pi (arccos/sqrt singularities in
        # rotmat_to_axis_angle) -- near-identity joint rotations NaN the
        # whole step. joints_only_from_rotmats skips the round trip.
        joints = joints_only_from_rotmats(smpl_params, rotmat, parents)
        joints = joints - joints[:, :1]  # root-centered, like the eval path
        return coord_loss(joints, target_joints, joint_valid)

    def step(params, batch_stats, opt_state, smpl_params, crops,
             target_joints, joint_valid=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch_stats, smpl_params, crops, target_joints, joint_valid
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    return step


@dataclass
class TrainState:
    """Minimal training harness around make_train_step."""

    params: Dict
    batch_stats: Dict
    opt_state: Any
    smpl_params: Dict
    _step: Any

    @classmethod
    def create(cls, cfg, smpl_family, variables: Optional[Dict] = None,
               optimizer_name: str = "adam", lr: float = 1e-4,
               gender: str = "neutral", remat: bool = True,
               mesh=None) -> "TrainState":
        from poserisk_release_tpu.pipeline import PoseEstimator

        estimator = PoseEstimator(cfg, smpl_family, gender=gender,
                                  variables=variables)
        optimizer = get_optimizer(optimizer_name, lr)
        params = dict(estimator.variables["params"])
        batch_stats = dict(estimator.variables.get("batch_stats", {}))
        step = make_train_step(cfg.SPIN.ief_iters, estimator.parents, optimizer,
                               remat=remat)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            data_axis = "data" if "data" in mesh.axis_names else None
            sharded = NamedSharding(mesh, P(data_axis))
            if "model" in mesh.axis_names:
                # dp x tp: Megatron-style parameter sharding over the
                # 'model' axis (parallel/spmd.py); the gradient pytree
                # inherits the specs, and optax mu/nu inherit them too
                # because optimizer.init runs AFTER placement
                # (jnp.zeros_like preserves sharding).
                from poserisk_release_tpu.parallel.spmd import (
                    shard_tree, spin_tp_specs)

                variables = {"params": params, "batch_stats": batch_stats}
                specs = spin_tp_specs(variables)
                placed = shard_tree(mesh, variables, specs)
                params, batch_stats = placed["params"], placed["batch_stats"]
                named = jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s), specs)
                param_sh, stats_sh = named["params"], named["batch_stats"]
            else:
                params = jax.device_put(params, replicated)
                batch_stats = jax.device_put(batch_stats, replicated)
                param_sh = stats_sh = replicated
            opt_state = optimizer.init(params)
            step = jax.jit(
                step,
                in_shardings=(param_sh, stats_sh, None, replicated,
                              sharded, sharded, None),
            )
            smpl = jax.device_put(estimator.smpl_params, replicated)
        else:
            step = jax.jit(step)
            opt_state = optimizer.init(params)
            smpl = estimator.smpl_params
        return cls(params=params, batch_stats=batch_stats, opt_state=opt_state,
                   smpl_params=smpl, _step=step)

    def step(self, crops, target_joints, joint_valid=None
             ) -> Tuple["TrainState", float]:
        params, opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state, self.smpl_params,
            jnp.asarray(crops), jnp.asarray(target_joints),
            None if joint_valid is None else jnp.asarray(joint_valid),
        )
        return replace(self, params=params, opt_state=opt_state), float(loss)

    def variables(self) -> Dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out
