"""Device-mesh utilities: data-parallel sharding of the frame axis.

The reference is single-device (SURVEY.md section 2: no distributed code
anywhere; `--gpu` just sets CUDA_VISIBLE_DEVICES). The TPU-native design
treats a clip's frame axis as embarrassingly data-parallel: a 1-D
`Mesh(('data',))` over the chips of a v5e-8 (ICI), inputs sharded along
frames via NamedSharding, parameters replicated, XLA inserting the (only
needed) collectives for reductions. Multi-host scale-out keeps the same mesh
abstraction over DCN via jax.distributed.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over the first `num_devices` devices (0 => all)."""
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 across the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis_name: str = DATA_AXIS) -> Any:
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))


def replicate_tree(mesh: Mesh, tree) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sharding), tree)


def pad_to_multiple(x, multiple: int) -> tuple:
    """Pad dim 0 up to a multiple (repeat-edge padding); returns (padded, n_valid).

    Accepts a host ndarray OR a device (jax.Array) batch: device inputs are
    padded with jnp ops so an already-uploaded batch (e.g. the streaming
    scorer's shared per-window union upload) is never pulled back to host
    just to be padded."""
    n = x.shape[0]
    if multiple <= 1 or n % multiple == 0:
        return x, n
    if n == 0:
        # x[-1:] of an empty batch yields ZERO filler rows, silently
        # returning an unpadded empty -- unreachable from the product
        # (_run_chunked returns empty-in/empty-out before uploading), but a
        # library caller deserves a loud error over a wrong shape.
        raise ValueError("cannot edge-pad an empty batch to a multiple")
    pad = multiple - (n % multiple)
    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        filler = jnp.repeat(x[-1:], pad, axis=0)
        return jnp.concatenate([x, filler], axis=0), n
    filler = np.repeat(x[-1:], pad, axis=0)
    return np.concatenate([x, filler], axis=0), n
