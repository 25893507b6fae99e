"""Optimizer/scheduler factories + checkpoint IO (optax / orbax-free npz).

TPU-native equivalents of the reference's torch training utilities
(/root/reference/lib/utils/funcs_utils.py:147-231): the same four optimizer
choices (sgd / rmsprop / adam / adamw with the reference's hyperparameter
wiring), step + plateau schedulers as optax schedules / host-side state, and
checkpoint save/load that round-trips arbitrary param pytrees to npz (torch
checkpoints are ingested through models.convert instead).
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Dict, Iterable

import numpy as np
import optax


def get_optimizer(
    name: str,
    lr: float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """Mirrors get_optimizer (funcs_utils.py:147-178): adamw uses the
    reference's fixed weight_decay=0.1; sgd wires weight_decay like torch
    SGD (decay added to the gradient BEFORE the momentum trace,
    funcs_utils.py:154-160)."""
    if name == "sgd":
        sgd = optax.sgd(lr, momentum=momentum, nesterov=nesterov)
        if weight_decay:
            return optax.chain(optax.add_decayed_weights(weight_decay), sgd)
        return sgd
    if name == "rmsprop":
        return optax.rmsprop(lr)
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=0.1)
    raise ValueError(f"unknown optimizer: {name}")


def step_schedule(base_lr: float, milestones: Iterable[int], gamma: float) -> optax.Schedule:
    """MultiStepLR equivalent (funcs_utils.py:184)."""
    milestones = sorted(milestones)

    def schedule(count):
        import jax.numpy as jnp

        factor = jnp.asarray(1.0)
        for m in milestones:
            factor = factor * jnp.where(count >= m, gamma, 1.0)
        return base_lr * factor

    return schedule


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau equivalent (funcs_utils.py:186), host-side state.

    Matches torch's defaults the reference relies on: mode='min' with the
    RELATIVE improvement threshold 1e-4 -- a metric only counts as better
    when it beats best * (1 - threshold), so a loss creeping down by less
    than 0.01% per epoch still accumulates bad epochs and drops the LR."""

    lr: float
    factor: float = 0.1
    patience: int = 10
    min_lr: float = 1e-5
    threshold: float = 1e-4
    best: float = field(default=float("inf"))
    bad_epochs: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def lr_warmup(base_lr: float, epoch: int, base_epochs: int) -> float:
    """funcs_utils.py:106-110."""
    return base_lr * (epoch / base_epochs)


def lr_check(lr, epoch: int) -> float:
    """Training-loop LR report (funcs_utils.py:96-104 parity).

    The reference resolves the optimizer's current lr and prints
    `Current epoch {epoch}, lr: {lr}`; its warmup call is dead code (guarded
    by `if False and epoch <= base_epoch`), so none happens here either.
    Accepts either a float lr or an optax schedule (called at `epoch`)."""
    curr_lr = float(lr(epoch)) if callable(lr) else float(lr)
    print(f"Current epoch {epoch}, lr: {curr_lr}")
    return curr_lr


def get_scheduler(
    name: str | None,
    base_lr: float,
    milestones: Iterable[int] = (),
    gamma: float = 0.1,
):
    """Config-driven scheduler factory (funcs_utils.py:181-189 parity).

    'step' -> MultiStepLR-equivalent optax schedule (step_schedule);
    'platue' (the reference's spelling) -> host-side PlateauScheduler with
    the reference's hardwired mode='min', patience=10, min_lr=1e-5; any
    other name -> None, exactly like the reference's fall-through."""
    if name == "step":
        return step_schedule(base_lr, milestones, gamma)
    if name == "platue":
        return PlateauScheduler(lr=base_lr, factor=gamma, patience=10, min_lr=1e-5)
    return None


# ---------------------------------------------------------------------------
# Checkpoint IO (flat-npz pytree store; no torch on the runtime path).
# Shares the '/'-joined flatten/unflatten with models.convert so there is
# exactly one npz pytree layout in the codebase.
# ---------------------------------------------------------------------------
def save_checkpoint(
    state: Dict, epoch: int, checkpoint_dir: str, end_epoch: int | None = None,
    is_best: bool = False,
) -> str:
    """save_checkpoint parity (funcs_utils.py:191-199): epoch_{N} naming,
    'final' at end_epoch, optional 'best' copy."""
    from poserisk_release_tpu.models.convert import flatten_tree

    os.makedirs(checkpoint_dir, exist_ok=True)
    name = "final" if (end_epoch is not None and epoch == end_epoch) else f"epoch_{epoch}"
    path = osp.join(checkpoint_dir, name + ".npz")
    flat = flatten_tree(state)
    flat["__epoch__"] = np.asarray(epoch)
    np.savez(path, **flat)
    if is_best:
        np.savez(osp.join(checkpoint_dir, "best.npz"), **flat)
    return path


def load_checkpoint(path: str) -> Dict:
    from poserisk_release_tpu.models.convert import unflatten_tree

    if not osp.isfile(path):
        raise ValueError(f"No checkpoint exists!\n {path}")
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    flat.pop("__epoch__", None)
    return unflatten_tree(flat)
