"""torch state_dict -> Flax variables converters (SPIN checkpoint ingestion).

The reference loads the published SPIN checkpoint with
`load_state_dict(torch.load(...)['model'], strict=False)`
(/root/reference/lib/core/base.py:83-84). This module performs the one-time
conversion of that checkpoint (or any state_dict with the same naming) into
the Flax HMR parameter tree, so at runtime the TPU framework only ever loads
a converted .npz/.msgpack -- no torch on the hot path.

Layout rules:
  conv  torch (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  linear torch (O, I)         -> flax kernel (I, O)
  batchnorm weight/bias       -> params.scale / params.bias
  batchnorm running_mean/var  -> batch_stats.mean / batch_stats.var

torch module paths map to flax module names:
  conv1, bn1                  -> backbone/conv1, backbone/bn1
  layer{s}.{i}.conv{k}/bn{k}  -> backbone/layer{s}_{i}/conv{k},bn{k}
  layer{s}.{i}.downsample.0/1 -> backbone/layer{s}_{i}/downsample_conv,_bn
  fc1, fc2, decpose, decshape, deccam -> same names at the top level
  init_pose/init_shape/init_cam buffers -> top-level params
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


BN_EPS = 1e-5  # torch BatchNorm default; both conv towers use it


def fold_bn_kernel_bias(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                        eps: float = BN_EPS):
    """Eval-mode BN fold, host-side f32: kernel' = kernel * gamma/sqrt(var+
    eps) per output channel, bias' = beta - mean * that scale. THE one
    definition shared by the YOLO (detector.fold_bn_params) and ResNet
    (resnet_int8._fold) PTQ paths, so an eps/accumulation change cannot
    desynchronise them. kernel is HWIO (flax)."""
    inv = 1.0 / np.sqrt(np.asarray(bn_var, np.float32) + eps)
    mul = inv * np.asarray(bn_scale, np.float32)
    bias = np.asarray(bn_bias, np.float32) - np.asarray(bn_mean, np.float32) * mul
    return np.asarray(kernel, np.float32) * mul[None, None, None, :], bias


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value, np.float32)


_LAYER_RE = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")


def spin_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a SPIN hmr state_dict (tensor or ndarray values) to Flax variables.

    Returns {'params': ..., 'batch_stats': ...} matching models.spin.HMR.
    Unknown keys (e.g. the smpl sub-module SPIN sometimes bundles) are ignored,
    mirroring the reference's strict=False load.
    """
    params: Dict = {}
    stats: Dict = {}

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, raw in state.items():
        # DataParallel-saved checkpoints prefix every key with 'module.'
        # (the reference ships a stripper, funcs_utils.py:135-140).
        if key.startswith("module."):
            key = key[len("module."):]
        value = to_np(raw)
        # ---- top-level regressor state buffers ----
        if key in ("init_pose", "init_shape", "init_cam"):
            _set(params, (key,), value.reshape(1, -1))
            continue
        # ---- head linears ----
        m = re.match(r"^(fc1|fc2|decpose|decshape|deccam)\.(weight|bias)$", key)
        if m:
            name, kind = m.groups()
            if kind == "weight":
                _set(params, (name, "kernel"), _linear_kernel(value))
            else:
                _set(params, (name, "bias"), value)
            continue
        # ---- backbone stem ----
        if key == "conv1.weight":
            _set(params, ("backbone", "conv1", "kernel"), _conv_kernel(value))
            continue
        m = re.match(r"^bn1\.(weight|bias|running_mean|running_var)$", key)
        if m:
            _bn_assign(params, stats, ("backbone", "bn1"), m.group(1), value)
            continue
        # ---- residual stages ----
        m = _LAYER_RE.match(key)
        if m:
            stage, block, rest = m.group(1), m.group(2), m.group(3)
            base = ("backbone", f"layer{stage}_{block}")
            cm = re.match(r"^conv(\d)\.weight$", rest)
            if cm:
                _set(params, base + (f"conv{cm.group(1)}", "kernel"), _conv_kernel(value))
                continue
            bm = re.match(r"^bn(\d)\.(weight|bias|running_mean|running_var)$", rest)
            if bm:
                _bn_assign(params, stats, base + (f"bn{bm.group(1)}",), bm.group(2), value)
                continue
            if rest == "downsample.0.weight":
                _set(params, base + ("downsample_conv", "kernel"), _conv_kernel(value))
                continue
            dm = re.match(r"^downsample\.1\.(weight|bias|running_mean|running_var)$", rest)
            if dm:
                _bn_assign(params, stats, base + ("downsample_bn",), dm.group(1), value)
                continue
        # anything else (num_batches_tracked, bundled smpl buffers, fc of the
        # original torchvision classifier...) is intentionally dropped.

    return {"params": params, "batch_stats": stats}


def _bn_assign(params: Dict, stats: Dict, base: tuple, kind: str, value: np.ndarray) -> None:
    if kind == "weight":
        _set(params, base + ("scale",), value)
    elif kind == "bias":
        _set(params, base + ("bias",), value)
    elif kind == "running_mean":
        _set(stats, base + ("mean",), value)
    elif kind == "running_var":
        _set(stats, base + ("var",), value)


def load_spin_checkpoint(path: str):
    """torch.load the reference checkpoint file and convert.

    Accepts both {'model': state_dict} (SPIN's format) and a bare state_dict.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model", blob) if isinstance(blob, dict) else blob
    return spin_state_dict_to_flax(state)


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict pytree -> flat {'a/b/c': ndarray} mapping (npz layout)."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(flatten_tree(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, value in flat.items():
        _set(tree, tuple(key.split("/")), value)
    return tree


_SOURCE_STAMP_KEY = "__source_stamp__"


def source_stamp(path: str) -> np.ndarray:
    """(size_bytes, mtime_ns) identity of a converted checkpoint, stored
    INSIDE the npz cache. Comparing stamps catches replacement checkpoints
    installed with timestamp-preserving tools (cp -p, rsync -a, tar) or on
    coarse-mtime filesystems, which a bare mtime '>' ordering misses."""
    import os

    st = os.stat(path)
    return np.asarray([st.st_size, st.st_mtime_ns], np.int64)


def save_flax_variables(variables: Dict, path: str,
                        source: str | None = None) -> None:
    """Flatten-and-save converted variables to npz for torch-free reload.

    source: path of the checkpoint these variables were converted from;
    its source_stamp is embedded so loaders can detect replacement."""
    flat = flatten_tree(variables)
    if source is not None:
        flat[_SOURCE_STAMP_KEY] = source_stamp(source)
    np.savez(path, **flat)


def load_flax_variables(path: str) -> Dict:
    with np.load(path) as data:
        return unflatten_tree({key: data[key] for key in data.files
                               if key != _SOURCE_STAMP_KEY})


def cached_source_stamp(path: str) -> np.ndarray | None:
    """The source_stamp stored in an npz cache, or None for caches written
    before stamps existed (or by save calls without a source)."""
    with np.load(path) as data:
        if _SOURCE_STAMP_KEY in data.files:
            return data[_SOURCE_STAMP_KEY]
    return None
