"""Pipeline parallelism: the HMR forward as a microbatched `stage` pipeline.

The GPipe-style schedule, written the TPU way (shard_map over a ``stage``
mesh axis + `lax.ppermute` hops + one `lax.scan` over ticks — the
scaling-book recipe), over a block-level split of the SPIN regressor:
ResNet-50's 16 bottleneck blocks (plus the stem on stage 0 and the IEF head
on the last stage) are partitioned into S contiguous stages. The default
split is chosen to BALANCE PARAMETER BYTES across stages
(`balanced_split`), because the point of pipeline parallelism is the memory
story: each chip holds only its stage's parameters.

Each stage is a Flax module built from the SAME classes as models/resnet.
ResNet50 (StemConv / nn.BatchNorm / Bottleneck) with the SAME submodule
names, applied to the per-stage slice of the shared backbone subtree — so
stage numerics are *identical* to the monolithic HMR.apply, not a
reimplementation. Stage activations have different shapes, so the
inter-stage carry is one fixed-size f32 buffer (the max flattened
activation); each device `lax.switch`-es into its own stage, reshapes,
computes, and re-flattens.

Schedule: with S stages and M microbatches, the scan runs S+M-1 ticks;
device s processes microbatch t-s at tick t (bubble ticks compute on a
zero buffer and are masked out). The last stage accumulates its outputs
and a final masked psum over ``stage`` replicates them.

Parameter placement (`make_hmr_pipeline_sharded`): stage parameter trees
are shape-heterogeneous, so each stage's leaves are flattened into one f32
vector, the S vectors are padded to the longest and stacked into a
(S, maxlen) buffer sharded `P('stage')` — device row s holds ONLY its
stage's parameters (plus pad). Inside the shard_map, branch s unflattens
its local row back into the stage subtree with static offsets/shapes, so
the per-device addressable parameter bytes are ~total/S for a balanced
split (tests/test_parallelism.py asserts the shrink AND numerical parity).
`make_hmr_pipeline` (replicated parameters) remains for schedule-only
validation.

The reference has no model-parallel story at all (single GPU, SURVEY.md
section 2); this is a TPU-native extension for scaling the pose tower
past one chip's HBM/compute — reachable from the product config via
PARALLEL.stage (pipeline.PoseEstimator wires it into the pose core).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from poserisk_release_tpu.models.resnet import BN_EPS, Bottleneck, StemConv
from poserisk_release_tpu.models.spin import NPOSE, ief_head

STAGE_AXIS = "stage"
_LAYERS = (3, 4, 6, 3)
_PLANES = (64, 128, 256, 512)
# The 16 bottleneck blocks in execution order as (layer, block) pairs.
_BLOCKS: Tuple[Tuple[int, int], ...] = tuple(
    (L, i) for L, n in enumerate(_LAYERS, start=1) for i in range(n)
)
# The historical 4-stage layer-boundary split (stem+layer1 | layer2 |
# layer3 | layer4+head) — kept as the schedule-validation default.
LAYER_SPLIT: Tuple[int, ...] = (0, 3, 7, 13, 16)
# flattened (rotmat 24*9, betas 10, cam 3) per sample
_OUT_F = 24 * 9 + 10 + 3


def _block_geometry(hw: int) -> List[Tuple[int, int, int]]:
    """Input (H, W, C) of each of the 16 blocks for square hw-pixel crops,
    plus the final feature-map shape at index 16 (hw % 32 == 0)."""
    shapes = []
    h, c = hw // 4, 64  # after stem (/2) + maxpool (/2)
    for L, i in _BLOCKS:
        if L > 1 and i == 0:
            shapes.append((h, h, c))
            h //= 2
        else:
            shapes.append((h, h, c))
        c = _PLANES[L - 1] * 4
    shapes.append((h, h, c))
    return shapes


def stage_input_shape(hw: int, b0: int) -> Tuple[int, int, int]:
    """Input (H, W, C) of the stage whose first block is b0 (b0 == 0 means
    the stage starts at the raw crops, before the stem)."""
    if b0 == 0:
        return (hw, hw, 3)
    return _block_geometry(hw)[b0]


def hmr_stage_shapes(hw: int) -> Tuple[Tuple[int, int, int], ...]:
    """Per-stage input (H, W, C) for the LAYER_SPLIT (back-compat helper)."""
    return tuple(stage_input_shape(hw, b0) for b0 in LAYER_SPLIT[:-1])


class _StageBlocks(nn.Module):
    """Blocks [b0, b1) of the backbone (stage 0 additionally runs the stem),
    with the SAME submodule names as models.resnet.ResNet50 so the shared
    parameter tree applies unchanged."""

    b0: int
    b1: int
    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.b0 == 0:
            x = StemConv(64, dtype=self.dtype, s2d=self.stem_s2d,
                         name="conv1")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        for b in range(self.b0, self.b1):
            L, i = _BLOCKS[b]
            x = Bottleneck(planes=_PLANES[L - 1],
                           stride=2 if (L > 1 and i == 0) else 1,
                           has_downsample=(i == 0), dtype=self.dtype,
                           name=f"layer{L}_{i}")(x)
        return x


def _backbone_vars(variables: Dict) -> Dict:
    out = {"params": variables["params"]["backbone"]}
    stats = variables.get("batch_stats", {}).get("backbone")
    if stats:
        out["batch_stats"] = stats
    return out


def _head(variables: Dict, xf: jnp.ndarray, n_iter: int):
    """IEF head on pooled features, reading weights straight from the tree
    (same dense math as flax nn.Dense; shared loop via spin.ief_head)."""
    p = variables["params"]
    B = xf.shape[0]
    pose = jnp.broadcast_to(jnp.asarray(p["init_pose"]), (B, NPOSE))
    shape = jnp.broadcast_to(jnp.asarray(p["init_shape"]), (B, 10))
    cam = jnp.broadcast_to(jnp.asarray(p["init_cam"]), (B, 3))

    def dense(name, t):
        return t @ jnp.asarray(p[name]["kernel"]) + jnp.asarray(p[name]["bias"])

    return ief_head(dense, xf, pose, shape, cam, n_iter)


# ---------------------------------------------------------------------------
# Stage membership + parameter placement
# ---------------------------------------------------------------------------

def _path_keys(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def _leaf_stage(keys: Tuple[str, ...], split: Sequence[int]) -> int:
    """Stage index owning one variables leaf. Backbone modules map to the
    stage holding their block (stem/bn1 to stage 0); everything else (IEF
    head + init_* state) belongs to the last stage."""
    n_stages = len(split) - 1
    if "backbone" in keys:
        mod = keys[keys.index("backbone") + 1]
        if mod in ("conv1", "bn1"):
            return 0
        L, i = mod[len("layer")], mod[len("layer") + 2:]
        b = _BLOCKS.index((int(L), int(i)))
        for s in range(n_stages):
            if split[s] <= b < split[s + 1]:
                return s
        raise ValueError(f"block {b} outside split {split}")
    return n_stages - 1


def balanced_split(variables: Dict, n_stages: int) -> Tuple[int, ...]:
    """The block split minimising the LARGEST stage's parameter bytes (the
    per-device pp memory), by exhaustive search over the C(15, S-1)
    boundary placements. Stem bytes are pinned to stage 0, head bytes to
    the last stage."""
    if not 2 <= n_stages <= len(_BLOCKS):
        raise ValueError(f"n_stages must be in [2, {len(_BLOCKS)}], got {n_stages}")
    mod_bytes: Dict[str, int] = {}
    head_bytes = 0
    stem_bytes = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        keys = _path_keys(path)
        nbytes = int(np.size(leaf)) * np.dtype(
            getattr(leaf, "dtype", np.float32)).itemsize
        if "backbone" in keys:
            mod = keys[keys.index("backbone") + 1]
            if mod in ("conv1", "bn1"):
                stem_bytes += nbytes
            else:
                mod_bytes[mod] = mod_bytes.get(mod, 0) + nbytes
        else:
            head_bytes += nbytes
    block_bytes = [mod_bytes.get(f"layer{L}_{i}", 0) for L, i in _BLOCKS]

    best, best_cost = None, None
    for cuts in itertools.combinations(range(1, len(_BLOCKS)), n_stages - 1):
        split = (0, *cuts, len(_BLOCKS))
        sizes = []
        for s in range(n_stages):
            size = sum(block_bytes[split[s]: split[s + 1]])
            if s == 0:
                size += stem_bytes
            if s == n_stages - 1:
                size += head_bytes
            sizes.append(size)
        cost = max(sizes)
        if best_cost is None or cost < best_cost:
            best, best_cost = split, cost
    return best


def stage_param_entries(variables: Dict, split: Sequence[int]):
    """Static flattening metadata: per stage, the ordered
    [(path_keys, offset, shape, dtype)] of its leaves plus the stage's flat
    length. Order is the canonical tree-flatten order, so placement and
    in-kernel unflattening can never disagree."""
    n_stages = len(split) - 1
    entries: List[List[Tuple[Tuple[str, ...], int, Tuple[int, ...], np.dtype]]] = [
        [] for _ in range(n_stages)
    ]
    sizes = [0] * n_stages
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        keys = _path_keys(path)
        s = _leaf_stage(keys, split)
        shape = tuple(np.shape(leaf))
        entries[s].append((keys, sizes[s], shape,
                           np.dtype(getattr(leaf, "dtype", np.float32))))
        sizes[s] += int(np.prod(shape)) if shape else 1
    return entries, sizes


def place_stage_params(mesh: Mesh, variables: Dict, split: Sequence[int],
                       entries=None, sizes=None) -> jnp.ndarray:
    """Pack each stage's leaves into row s of a (S, maxlen) f32 buffer and
    shard it P('stage'): device row s holds ONLY stage s's parameters. f32
    staging is lossless for bf16-stored trees (exact up/down cast)."""
    if entries is None or sizes is None:
        entries, sizes = stage_param_entries(variables, split)
    S = len(sizes)
    maxlen = max(max(sizes), 1)
    # Pad to the lane width so every row starts layout-aligned.
    maxlen = ((maxlen + 127) // 128) * 128
    buf = np.zeros((S, maxlen), np.float32)
    flat = {tuple(_path_keys(p)): np.asarray(l, np.float32)
            for p, l in jax.tree_util.tree_leaves_with_path(variables)}
    for s, stage_entries in enumerate(entries):
        for keys, off, shape, _dtype in stage_entries:
            n = int(np.prod(shape)) if shape else 1
            buf[s, off: off + n] = flat[keys].reshape(-1)
    if mesh.shape[STAGE_AXIS] != S:
        raise ValueError(
            f"split has {S} stages but mesh stage axis is {mesh.shape[STAGE_AXIS]}")
    return jax.device_put(
        jnp.asarray(buf), NamedSharding(mesh, P(STAGE_AXIS, None)))


def _unflatten_stage(vec: jnp.ndarray, stage_entries) -> Dict:
    """Rebuild one stage's nested variables subtree from its flat row
    (static offsets/shapes; leaves cast back to their stored dtype)."""
    tree: Dict = {}
    for keys, off, shape, dtype in stage_entries:
        n = int(np.prod(shape)) if shape else 1
        leaf = vec[off: off + n].reshape(shape).astype(dtype)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return tree


# ---------------------------------------------------------------------------
# The pipelined forward
# ---------------------------------------------------------------------------

def _resolve_split(S: int, split) -> Tuple[int, ...]:
    if split is None:
        if S != 4:
            raise ValueError(
                f"no default split for {S} stages; pass split= (e.g. "
                f"balanced_split(variables, {S}))")
        return LAYER_SPLIT
    split = tuple(int(b) for b in split)
    if (len(split) != S + 1 or split[0] != 0 or split[-1] != len(_BLOCKS)
            or list(split) != sorted(set(split))):
        raise ValueError(f"bad split {split} for stage axis {S}")
    return split


def _build_pipeline(mesh: Mesh, hw: int, microbatch: int, n_microbatches: int,
                    n_iter: int, compute_dtype, stem_s2d: bool,
                    data_axis, split: Tuple[int, ...], param_entries=None):
    S = mesh.shape[STAGE_AXIS]
    M = n_microbatches
    m = microbatch
    shapes = [stage_input_shape(hw, split[s]) for s in range(S)]
    flat_sizes = [m * int(np.prod(s)) for s in shapes]
    buff = max(max(flat_sizes), m * _OUT_F)

    stage_mods = [
        _StageBlocks(b0=split[s], b1=split[s + 1], dtype=compute_dtype,
                     stem_s2d=(stem_s2d and split[s] == 0))
        for s in range(S)
    ]

    def run_stage(i, v, flat):
        if param_entries is not None:
            v = _unflatten_stage(v, param_entries[i])
        x = flat[: flat_sizes[i]].reshape((m,) + shapes[i])
        y = stage_mods[i].apply(_backbone_vars(v), x)
        if i < S - 1:
            out = y.astype(jnp.float32).reshape(-1)
        else:
            xf = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            rotmat, betas, cam = _head(v, xf, n_iter)
            out = jnp.concatenate(
                [rotmat.reshape(m, -1), betas, cam], axis=1).reshape(-1)
        return jnp.zeros((buff,), jnp.float32).at[: out.shape[0]].set(out)

    perm = [(i, i + 1) for i in range(S - 1)]

    def pipelined(v, crops):
        s = lax.axis_index(STAGE_AXIS)
        if param_entries is not None:
            local = v[0]  # (1, maxlen) local stage row
        else:
            local = v

        def tick(carry, t):
            buf, out = carry
            mb = lax.dynamic_slice_in_dim(
                crops, jnp.minimum(t, M - 1) * m, m, 0)
            fresh = jnp.zeros((buff,), jnp.float32
                              ).at[: flat_sizes[0]].set(
                                  mb.astype(jnp.float32).reshape(-1))
            x = jnp.where(s == 0, fresh, buf)
            y = lax.switch(s, [lambda f, i=i: run_stage(i, local, f)
                               for i in range(S)], x)
            # last stage: bank microbatch t-(S-1) when it is a real one
            j = t - (S - 1)
            write = jnp.logical_and(s == S - 1,
                                    jnp.logical_and(j >= 0, j < M))
            upd = lax.dynamic_update_slice_in_dim(
                out, y[: m * _OUT_F].reshape(m, _OUT_F),
                jnp.clip(j, 0, M - 1) * m, 0)
            out = jnp.where(write, upd, out)
            buf = lax.ppermute(y, STAGE_AXIS, perm)
            return (buf, out), None

        init = (jnp.zeros((buff,), jnp.float32),
                jnp.zeros((M * m, _OUT_F), jnp.float32))
        (_, out), _ = lax.scan(tick, init, jnp.arange(M + S - 1))
        # replicate the last stage's bank across the stage axis
        out = lax.psum(jnp.where(s == S - 1, out, 0.0), STAGE_AXIS)
        B = M * m
        return (out[:, : 24 * 9].reshape(B, 24, 3, 3),
                out[:, 24 * 9: 24 * 9 + 10], out[:, -3:])

    vspec = P(STAGE_AXIS, None) if param_entries is not None else P()
    if data_axis is None:
        in_specs = (vspec, P(None, None, None, None))
        out_specs = (P(None, None, None, None), P(None, None), P(None, None))
    else:
        in_specs = (vspec, P(data_axis, None, None, None))
        out_specs = (P(data_axis, None, None, None),
                     P(data_axis, None), P(data_axis, None))
    return shard_map(pipelined, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)


def make_hmr_pipeline(mesh: Mesh, hw: int, microbatch: int,
                      n_microbatches: int, n_iter: int = 3,
                      compute_dtype=jnp.float32, stem_s2d: bool = False,
                      data_axis: str | None = None, split=None):
    """Pipelined HMR forward with REPLICATED parameters (schedule/parity
    validation). Returns fn(variables, crops) -> (rotmat, betas, cam) for
    crops of shape (n_microbatches * microbatch, hw, hw, 3) [per data shard
    when data_axis is set]. Jit-ready."""
    S = mesh.shape[STAGE_AXIS]
    return _build_pipeline(mesh, hw, microbatch, n_microbatches, n_iter,
                           compute_dtype, stem_s2d, data_axis,
                           _resolve_split(S, split))


def make_hmr_pipeline_from_entries(mesh: Mesh, entries, split, hw: int,
                                   microbatch: int, n_microbatches: int,
                                   n_iter: int = 3, compute_dtype=jnp.float32,
                                   stem_s2d: bool = False,
                                   data_axis: str | None = None):
    """Stage-sharded pipelined forward from precomputed placement metadata
    (stage_param_entries) — the shape-polymorphic hook PoseEstimator uses to
    build one pipeline per (batch, resolution) over a single placed buffer."""
    return _build_pipeline(mesh, hw, microbatch, n_microbatches, n_iter,
                           compute_dtype, stem_s2d, data_axis,
                           _resolve_split(mesh.shape[STAGE_AXIS], split),
                           param_entries=entries)


def make_hmr_pipeline_sharded(mesh: Mesh, variables: Dict, hw: int,
                              microbatch: int, n_microbatches: int,
                              n_iter: int = 3, compute_dtype=jnp.float32,
                              stem_s2d: bool = False,
                              data_axis: str | None = None, split=None):
    """Pipelined HMR forward with STAGE-SHARDED parameter placement — the
    deployment form: device row s holds only stage s's parameters.

    Returns (fn, place, split): ``place(variables) -> (S, maxlen) buffer``
    (sharded P('stage')), ``fn(buffer, crops) -> (rotmat, betas, cam)``.
    The default split balances parameter bytes across stages
    (`balanced_split`)."""
    S = mesh.shape[STAGE_AXIS]
    if split is None:
        split = balanced_split(variables, S)
    else:
        split = _resolve_split(S, split)
    entries, sizes = stage_param_entries(variables, split)
    fn = _build_pipeline(mesh, hw, microbatch, n_microbatches, n_iter,
                         compute_dtype, stem_s2d, data_axis, split,
                         param_entries=entries)

    def place(v: Dict) -> jnp.ndarray:
        return place_stage_params(mesh, v, split, entries, sizes)

    return fn, place, split
