"""BN-folded / int8-PTQ ResNet-50 backbone for the SPIN throughput path.

The strict-parity SPIN backbone is the Flax module in models/resnet.py
(torch-numerics compatible, f32/bf16). This module re-expresses the SAME
network as a pure function over a flat parameter dict -- like the YOLOv3
graph in models/detector.py -- so BatchNorm can be folded into the conv
kernels once at load time and the conv tower can run on the v5e's int8 MXU
path (s8 x s8 -> s32, 2x bf16 peak).

Pipeline: fold_resnet50_params(flax_variables) -> calibrate_resnet50(folded,
sample_crops) -> quantize_resnet50(folded, scales) -> resnet50_forward(q, x).
Reference network: torchvision ResNet-50 v1.5 inside SPIN's hmr
(/root/reference/lib/core/base.py:81-84; SURVEY.md section 2.10).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
STAGES = ((1, 3, 64), (2, 4, 128), (3, 6, 256), (4, 3, 512))


def _fold(kernel, bn_scale, bn_bias, bn_mean, bn_var):
    # ONE BN-fold definition across both conv towers (models.convert).
    from poserisk_release_tpu.models.convert import fold_bn_kernel_bias

    return fold_bn_kernel_bias(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                               eps=BN_EPS)


def fold_resnet50_params(variables: Dict) -> Dict[str, Dict]:
    """Flax HMR variables -> flat {conv_name: {kernel, bias}} with BN folded.

    Accepts either the full HMR variables (backbone under 'backbone') or a
    bare ResNet50 variables dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if "backbone" in params:
        params = params["backbone"]
        stats = stats.get("backbone", {})

    def grab(conv_path, bn_path):
        k = params
        for p in conv_path:
            k = k[p]
        kernel = k["kernel"]
        bnp, bns = params, stats
        for p in bn_path:
            bnp = bnp[p]
            bns = bns[p]
        return _fold(kernel, bnp["scale"], bnp["bias"], bns["mean"], bns["var"])

    folded: Dict[str, Dict] = {}
    kernel, bias = grab(["conv1"], ["bn1"])
    folded["conv1"] = {"kernel": kernel, "bias": bias}
    for stage, n_blocks, _planes in STAGES:
        for block in range(n_blocks):
            base = f"layer{stage}_{block}"
            for i in (1, 2, 3):
                kernel, bias = grab([base, f"conv{i}"], [base, f"bn{i}"])
                folded[f"{base}.conv{i}"] = {"kernel": kernel, "bias": bias}
            if block == 0:
                kernel, bias = grab([base, "downsample_conv"], [base, "downsample_bn"])
                folded[f"{base}.downsample"] = {"kernel": kernel, "bias": bias}
    return folded


def _qconv(layer: Dict, x, stride: int, pad: int, compute_dtype):
    if "qkernel" in layer:
        inv_s = (1.0 / layer["in_scale"]).astype(compute_dtype)
        xq = jnp.clip(jnp.round(x.astype(compute_dtype) * inv_s), -127.0, 127.0
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, layer["qkernel"], (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (layer["in_scale"] * layer["w_scale"])
                + layer["bias"]).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        jnp.asarray(layer["kernel"]).astype(compute_dtype),
        (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.asarray(layer["bias"]).astype(compute_dtype)


def resnet50_forward(folded: Dict[str, Dict], x: jnp.ndarray,
                     compute_dtype=jnp.bfloat16,
                     _record: Dict[str, jnp.ndarray] | None = None) -> jnp.ndarray:
    """(B, 224, 224, 3) [0,1] -> (B, 2048) pooled features (f32).

    Identical math to models/resnet.ResNet50 with inference BN folded into
    the convs; layers carrying 'qkernel' run on the int8 MXU path."""

    def conv(name, t, stride, pad, relu=True):
        if _record is not None:
            _record[name] = t.astype(jnp.float32)
        out = _qconv(folded[name], t, stride, pad, compute_dtype)
        return jax.nn.relu(out) if relu else out

    x = conv("conv1", x, 2, 3)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=jnp.finfo(compute_dtype).min)
    x = jax.lax.reduce_window(
        x, jnp.finfo(compute_dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), "VALID",
    )
    for stage, n_blocks, _planes in STAGES:
        for block in range(n_blocks):
            stride = 2 if (stage > 1 and block == 0) else 1
            base = f"layer{stage}_{block}"
            identity = x
            out = conv(f"{base}.conv1", x, 1, 0)
            out = conv(f"{base}.conv2", out, stride, 1)
            out = conv(f"{base}.conv3", out, 1, 0, relu=False)
            if block == 0:
                identity = conv(f"{base}.downsample", x, stride, 0, relu=False)
            x = jax.nn.relu(out + identity)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def calibrate_resnet50(folded: Dict[str, Dict], crops: jnp.ndarray,
                       percentile: float | None = None) -> Dict[str, float]:
    """Per-conv input activation scales over a calibration batch (f32 walk).

    percentile=None records absmax (conservative: no saturation, but outliers
    stretch the int8 grid and cost resolution on the bulk of the values).
    percentile=99.9-99.999 records that percentile of |x| instead -- standard
    saturating PTQ calibration: the far tail clips at +-127 while everything
    else gains quantization resolution. On random-init weights the two
    measure equal (no outlier tail to clip: absmax median angle drift 0.289
    deg == p99.999's, with p99.999 shrinking the wrap-prone tail, max 358 ->
    7.8 deg); the percentile option exists for trained checkpoints, whose
    outlier channels are exactly what absmax is weakest against.

    Runs as ONE cached jit graph returning all reductions together -- an
    eager walk pays one remote dispatch/compile per op through a TPU relay,
    and a jit built per call would recompile on every calibration."""
    vals = jax.device_get(
        _resnet_calibration_walk(folded, jnp.asarray(crops), percentile)
    )
    return {k: float(v) for k, v in vals.items()}


@jax.jit
def _resnet_calibration_walk_absmax(folded, crops):
    record: Dict[str, jnp.ndarray] = {}
    resnet50_forward(folded, crops, jnp.float32, _record=record)
    return {k: jnp.max(jnp.abs(v)) for k, v in record.items()}


def _resnet_calibration_walk(folded, crops, percentile):
    if percentile is None:
        return _resnet_calibration_walk_absmax(folded, crops)
    return _resnet_calibration_walk_percentile(folded, crops, percentile)


@functools.partial(jax.jit, static_argnames=("percentile",))
def _resnet_calibration_walk_percentile(folded, crops, percentile):
    record: Dict[str, jnp.ndarray] = {}
    resnet50_forward(folded, crops, jnp.float32, _record=record)
    return {k: jnp.percentile(jnp.abs(v), percentile) for k, v in record.items()}


def _conv_geometry() -> Dict[str, tuple]:
    """conv name -> (stride, pad), mirroring resnet50_forward's traversal."""
    geo = {"conv1": (2, 3)}
    for stage, n_blocks, _planes in STAGES:
        for block in range(n_blocks):
            stride = 2 if (stage > 1 and block == 0) else 1
            base = f"layer{stage}_{block}"
            geo[f"{base}.conv1"] = (1, 0)
            geo[f"{base}.conv2"] = (stride, 1)
            geo[f"{base}.conv3"] = (1, 0)
            if block == 0:
                geo[f"{base}.downsample"] = (stride, 0)
    return geo


@jax.jit
def _bias_corr_walk(fp, qp, x):
    """Float forward + per-quantized-conv E[conv_f32 - conv_int8] in ONE
    graph. Module-level jit like _calibration_walk: a per-call jax.jit(walk)
    closure would recompile the full backbone walk on every re-quantization
    (~40-90 s per compile through this environment's remote relay, paid per
    video under recalibrate_per_video)."""
    geo = _conv_geometry()
    record: Dict[str, jnp.ndarray] = {}
    resnet50_forward(fp, x, jnp.float32, _record=record)
    corr = {}
    for name, x_f in record.items():
        if "qkernel" not in qp[name]:
            continue  # float layer under a min_stage boundary: no error
        stride, pad = geo[name]
        y_f = _qconv(fp[name], x_f, stride, pad, jnp.float32)
        y_q = _qconv(qp[name], x_f, stride, pad, jnp.float32)
        corr[name] = jnp.mean(y_f - y_q, axis=(0, 1, 2))
    return corr


def bias_correct_resnet50(folded: Dict[str, Dict], qparams: Dict[str, Dict],
                          crops: jnp.ndarray) -> Dict[str, Dict]:
    """Fold the expected per-channel quantization error into the biases.

    Classic PTQ bias correction (Nagel et al., "Data-Free Quantization"):
    weight rounding and activation quantization shift each conv's output by
    a systematic per-channel amount E[conv_f32(x) - conv_int8(x)]; adding
    that expectation (estimated on the calibration batch, at the float
    activations, pre-ReLU where the bias lives) to the int8 path's bias
    removes the systematic component of the drift for free at runtime.
    Returns a new qparams dict with corrected biases."""
    corr = _bias_corr_walk(folded, qparams, jnp.asarray(crops))
    out = {}
    for name, layer in qparams.items():
        if name in corr:
            layer = dict(layer)
            layer["bias"] = jnp.asarray(layer["bias"]) + corr[name].astype(jnp.float32)
        out[name] = layer
    return out


def _conv_stage(name: str) -> int:
    """Stage index of a folded-conv name: conv1/maxpool stem = 0,
    layer{s}_* = s (1..4)."""
    return int(name[5]) if name.startswith("layer") else 0


def quantize_resnet50(folded: Dict[str, Dict], act_absmax: Dict[str, float],
                      min_stage: int = 0) -> Dict[str, Dict]:
    """Folded params -> int8 PTQ params (same scheme as the detector:
    symmetric per-output-channel weights, calibrated per-tensor activations).

    ``min_stage`` sets a mixed-precision boundary: only convs in residual
    stage >= min_stage are quantized (conv1 stem = stage 0); shallower
    layers keep the float/bf16 path through _qconv's float branch. The
    in-situ A/B (tools/exp_spin_mixed.py; docs/PERF.md round 3) measured
    whole-tower (min_stage=0) fastest on the product pose step -- 1.29x
    vs bf16, where min_stage=3 keeps only ~half of that (1.13x) for 7%
    less angle drift -- so 0 stays the default; 3 is the
    accuracy-preferable middle if real weights show threshold-class
    drift."""
    if min_stage > max(_conv_stage(n) for n in folded):
        # Accepting this silently would quantize nothing while the int8
        # lifecycle keeps reporting "needs calibration" (cf. the detector's
        # int8_min_downsample guard).
        raise ValueError(
            f"int8_min_stage={min_stage} quantizes zero convs "
            "(deepest ResNet-50 stage is 4)")
    out: Dict[str, Dict] = {}
    for name, layer in folded.items():
        if _conv_stage(name) < min_stage:
            out[name] = dict(layer)  # float/bf16 shallow layer
            continue
        kernel = np.asarray(layer["kernel"], np.float32)
        w_scale = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12) / 127.0
        qkernel = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        out[name] = {
            "qkernel": jnp.asarray(qkernel),
            "w_scale": jnp.asarray(w_scale.astype(np.float32)),
            "in_scale": jnp.asarray(np.float32(max(act_absmax[name], 1e-12) / 127.0)),
            "bias": jnp.asarray(np.asarray(layer["bias"], np.float32)),
        }
    return out
