"""N-D device meshes + tensor/spatial sharding rules for the SPIN graphs.

The reference is single-device (SURVEY.md section 2: `--gpu` only sets
CUDA_VISIBLE_DEVICES), so every axis here is a TPU-native extension. The
data axis (parallel/mesh.py) covers the inference workload; this module adds
the remaining scale-out axes the GSPMD way -- annotate shardings, let XLA
insert the collectives:

  * tensor parallelism (``model`` axis): Megatron-style sharding of the HMR
    parameter tree. Every backbone conv kernel shards its OUTPUT-channel
    axis, every per-channel BatchNorm vector (scale/bias/mean/var) shards
    with it, and the IEF trunk runs the classic column-parallel fc1 /
    row-parallel fc2 pair (fc1 kernel P(None, model) + bias P(model);
    fc2 kernel P(model, None) + replicated bias, which makes XLA reduce the
    partial products with one psum). The tiny regressor heads
    (decpose/decshape/deccam, 144/10/3 outputs) and the mean-params state
    stay replicated. Under pjit the partitioner propagates these specs
    through the residual adds and inserts the channel all-gathers where a
    conv consumes a sharded activation with an unsharded kernel axis.
  * spatial partitioning (``spatial`` axis): shard the image HEIGHT axis of
    the crop batch. XLA's SPMD partitioner performs the conv halo exchanges
    automatically, so the same jitted step runs with 2-D (batch, height)
    input sharding unchanged -- the long-clip analog of sequence
    parallelism (one frame's rows spread over chips).

Parity: tests/test_parallelism.py runs every axis against the replicated
single-mesh step on the virtual CPU mesh and asserts score equality /
float closeness. Pipeline ('stage') and expert ('expert') axes live in
parallel/pipeline.py and parallel/expert.py.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"


def make_axes_mesh(axes: Mapping[str, int]) -> Mesh:
    """Mesh over the first prod(sizes) devices, axes in dict order.

    >>> make_axes_mesh({"data": 2, "model": 4})  # 2x4 over 8 devices
    """
    sizes = tuple(axes.values())
    n = int(np.prod(sizes))
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"mesh {dict(axes)} needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(sizes), tuple(axes.keys()))


def model_axes_from_config(pcfg) -> Dict[str, int]:
    """The configured model-parallel axes (size > 1) of a ParallelConfig,
    in mesh order: stage outermost (its collective is one ppermute hop per
    tick), then expert, model, spatial innermost (their per-layer
    all-gathers/psums ride the fastest ICI links)."""
    return {
        name: int(size)
        for name, size in (("stage", pcfg.stage), ("expert", pcfg.expert),
                           (MODEL_AXIS, pcfg.model), (SPATIAL_AXIS, pcfg.spatial))
        if int(size) > 1
    }


def mesh_from_config(pcfg) -> Optional[Mesh]:
    """Build the N-D device mesh a ParallelConfig describes, or None when it
    describes the single-device layout (no model axes, data axis <= 1).

    The data axis is outermost; its size is PARALLEL.num_devices, or all
    devices left over after the model axes when 0. This is THE config ->
    mesh rule: PoseEstimator calls it so every parallel axis is reachable
    from the config/CLI alone."""
    axes = model_axes_from_config(pcfg)
    n_model = int(np.prod(list(axes.values()))) if axes else 1
    n_total = len(jax.devices())
    if pcfg.num_devices and pcfg.num_devices > 0:
        dp = int(pcfg.num_devices)
    else:
        dp = max(1, n_total // n_model)
    if not axes and dp <= 1:
        return None
    return make_axes_mesh({pcfg.data_axis: dp, **axes})


def _tp_leaf_spec(path: tuple, leaf, model_axis: str) -> P:
    """Megatron-style PartitionSpec for one HMR variables leaf (see module
    docstring for the scheme). `path` is the tree_map_with_path key path."""
    keys = [getattr(k, "key", str(k)) for k in path]
    ndim = getattr(leaf, "ndim", np.ndim(leaf))
    if "backbone" in keys:
        if ndim == 4:  # conv kernel (H, W, I, O): shard output channels
            return P(None, None, None, model_axis)
        if ndim == 1:  # BN scale/bias + running mean/var: per-channel
            return P(model_axis)
        return P()
    if "fc1" in keys:  # column-parallel
        return P(None, model_axis) if ndim == 2 else P(model_axis)
    if "fc2" in keys:  # row-parallel (bias replicated; psum joins partials)
        return P(model_axis, None) if ndim == 2 else P()
    # decpose/decshape/deccam heads + init_{pose,shape,cam} state: replicated
    return P()


def spin_tp_specs(variables: Dict, model_axis: str = MODEL_AXIS) -> Dict:
    """PartitionSpec tree for HMR variables ({'params': ..., 'batch_stats': ...}).

    Requires the model-axis size to divide every backbone channel count
    (the smallest is the stem's 64), so model axes up to 64 wide are valid."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _tp_leaf_spec(path, leaf, model_axis), variables
    )


def shard_tree(mesh: Mesh, tree, specs) -> Dict:
    """device_put every leaf with its NamedSharding(mesh, spec)."""
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        tree, specs,
    )


def crops_spec(data_axis: Optional[str] = "data",
               spatial_axis: Optional[str] = None) -> P:
    """Spec for an NHWC crop batch: batch over data, height over spatial."""
    return P(data_axis, spatial_axis, None, None)


def tp_step_shardings(mesh: Mesh, variables: Dict,
                      data_axis: Optional[str] = "data",
                      model_axis: str = MODEL_AXIS,
                      spatial_axis: Optional[str] = None):
    """in_shardings for throughput.make_pose_and_score_step under tp (+dp/sp).

    Returns (shardings_tuple, sharded_variables_fn): pass the former to
    jax.jit(step, in_shardings=...), use the latter to place the variables.
    Argument order matches step(spin_variables, smpl_params, crops,
    info_reba, info_rula). Variables replicate when the mesh has no
    model axis (pure dp / sp meshes)."""
    if model_axis in mesh.axis_names:
        specs = spin_tp_specs(variables, model_axis)
    else:
        specs = jax.tree_util.tree_map(lambda _: P(), variables)
    repl = NamedSharding(mesh, P())
    shardings = (
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
        repl,
        NamedSharding(mesh, crops_spec(data_axis, spatial_axis)),
        repl,
        repl,
    )
    return shardings, lambda v: shard_tree(mesh, v, specs)
