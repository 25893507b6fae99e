"""YOLOv3 person detector (functional JAX) + darknet-weights ingestion.

The reference delegates detection to the external multi-person-tracker's
YOLOv3 (constructed at /root/reference/lib/core/base.py:38-46 with
yolo_img_size=416, detection_threshold=0.1; behavioural contract in SURVEY.md
section 2.9). This is a TPU-native rebuild:

  * the 75-conv YOLOv3 graph is expressed as a data-driven spec mirroring the
    canonical yolov3.cfg (Darknet-53 + 3 detection heads), executed as pure
    functions over a parameter pytree -- whole batches of frames jit in one
    XLA graph, NHWC, MXU-friendly;
  * weights load from the standard `yolov3.weights` darknet binary (the same
    file the reference's pip dependency downloads); with no weights file a
    deterministic random init keeps the pipeline runnable (plus StubDetector
    for tests);
  * box decode (sigmoid xy + grid, exp wh * anchor) runs on device; the
    score filter + NMS run on host per frame (tiny).

Detections are returned as (x1, y1, x2, y2, score) in ORIGINAL image
coordinates for the person class only, matching what SORT consumes upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Architecture spec (canonical yolov3.cfg).
# Each entry: ("conv", filters, ksize, stride, batch_norm) | ("shortcut", from)
#           | ("route", [idxs]) | ("upsample",) | ("yolo", anchor_set)
# Indices in route/shortcut refer to entry positions in this list.
# ---------------------------------------------------------------------------
def _residual(filters: int, n: int) -> List[tuple]:
    out = []
    for _ in range(n):
        out.append(("conv", filters // 2, 1, 1, True))
        out.append(("conv", filters, 3, 1, True))
        out.append(("shortcut", -3))
    return out


YOLOV3_SPEC: List[tuple] = (
    [
        ("conv", 32, 3, 1, True),
        ("conv", 64, 3, 2, True),
        *_residual(64, 1),
        ("conv", 128, 3, 2, True),
        *_residual(128, 2),
        ("conv", 256, 3, 2, True),
        *_residual(256, 8),  # ends at spec index 36 (route point)
        ("conv", 512, 3, 2, True),
        *_residual(512, 8),  # ends at spec index 61 (route point)
        ("conv", 1024, 3, 2, True),
        *_residual(1024, 4),
        # Head 1 (stride 32)
        ("conv", 512, 1, 1, True),
        ("conv", 1024, 3, 1, True),
        ("conv", 512, 1, 1, True),
        ("conv", 1024, 3, 1, True),
        ("conv", 512, 1, 1, True),  # spec index 79: branch point
        ("conv", 1024, 3, 1, True),
        ("conv", 255, 1, 1, False),
        ("yolo", 2),
        # Head 2 (stride 16)
        ("route", [79]),
        ("conv", 256, 1, 1, True),
        ("upsample",),
        ("route", [-1, 61]),
        ("conv", 256, 1, 1, True),
        ("conv", 512, 3, 1, True),
        ("conv", 256, 1, 1, True),
        ("conv", 512, 3, 1, True),
        ("conv", 256, 1, 1, True),  # branch point (spec index 91)
        ("conv", 512, 3, 1, True),
        ("conv", 255, 1, 1, False),
        ("yolo", 1),
        # Head 3 (stride 8)
        ("route", [91]),
        ("conv", 128, 1, 1, True),
        ("upsample",),
        ("route", [-1, 36]),
        ("conv", 128, 1, 1, True),
        ("conv", 256, 3, 1, True),
        ("conv", 128, 1, 1, True),
        ("conv", 256, 3, 1, True),
        ("conv", 128, 1, 1, True),
        ("conv", 256, 3, 1, True),
        ("conv", 255, 1, 1, False),
        ("yolo", 0),
    ]
)

ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),  # stride 8
    ((30, 61), (62, 45), (59, 119)),  # stride 16
    ((116, 90), (156, 198), (373, 326)),  # stride 32
)
NUM_CLASSES = 80
PERSON_CLASS = 0
BN_EPS = 1e-5
LEAKY_SLOPE = 0.1


def conv_indices() -> List[int]:
    """Spec positions that are conv layers, in darknet weight-file order."""
    return [i for i, e in enumerate(YOLOV3_SPEC) if e[0] == "conv"]


def init_yolo_params(seed: int = 0, img_size: int = 416) -> Dict[str, Dict]:
    """Deterministic random init (He-style) for weight-free environments."""
    rng = np.random.RandomState(seed)
    params: Dict[str, Dict] = {}
    in_ch = 3
    channels: List[int] = []
    for i, entry in enumerate(YOLOV3_SPEC):
        kind = entry[0]
        if kind == "conv":
            _, filters, ksize, stride, bn = entry
            fan_in = in_ch * ksize * ksize
            kernel = rng.normal(0, np.sqrt(2.0 / fan_in), (ksize, ksize, in_ch, filters))
            layer = {"kernel": kernel.astype(np.float32)}
            if bn:
                layer.update(
                    scale=np.ones(filters, np.float32),
                    bias=np.zeros(filters, np.float32),
                    mean=np.zeros(filters, np.float32),
                    var=np.ones(filters, np.float32),
                )
            else:
                layer["conv_bias"] = np.zeros(filters, np.float32)
            params[f"conv_{i}"] = layer
            in_ch = filters
        elif kind == "shortcut":
            pass  # channels unchanged
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in entry[1]]
            in_ch = sum(channels[r] for r in refs)
        elif kind == "upsample":
            pass
        elif kind == "yolo":
            pass
        channels.append(in_ch)
    return params


def fold_bn_params(params: Dict[str, Dict], dtype=None) -> Dict[str, Dict]:
    """Fold BatchNorm into the conv kernels/biases ONCE at load time.

    w' = w * gamma/sqrt(var+eps) (per output channel), b' = beta - mean * that
    scale. Removes the per-conv scale/shift pass entirely: measured 109 -> 61
    ms for the 128-frame detector forward (XLA fuses bias+leaky into the conv
    epilogue, but not the unfused four-tensor BN form). Inference-only --
    exactly the reference's eval-mode BN semantics.
    """
    import jax.numpy as jnp

    from poserisk_release_tpu.models.convert import fold_bn_kernel_bias

    folded: Dict[str, Dict] = {}
    for name, layer in params.items():
        kernel = np.asarray(layer["kernel"], np.float32)
        if "scale" in layer:
            # ONE BN-fold definition across both conv towers (models.convert).
            kernel, bias = fold_bn_kernel_bias(
                kernel, layer["scale"], layer["bias"], layer["mean"],
                layer["var"], eps=BN_EPS)
            leaky = True
        else:
            bias = np.asarray(layer["conv_bias"], np.float32)
            leaky = False
        if dtype is not None:
            kernel = jnp.asarray(kernel).astype(dtype)
        # The leaky flag is encoded in the KEY (pytree structure is static
        # under jit; a bool leaf would become a traced value).
        bias_key = "folded_bias_leaky" if leaky else "conv_bias"
        folded[name] = {"kernel": jnp.asarray(kernel), bias_key: jnp.asarray(bias)}
    return folded


def cast_conv_kernels(params: Dict[str, Dict], dtype) -> Dict[str, Dict]:
    """Pre-cast conv kernels to the compute dtype ONCE.

    When kernels stay f32 and the graph computes in bf16, XLA re-casts all
    ~62 MB of weights on every step (params are arguments, so the casts
    can't constant-fold): measured 99.6 -> 65.5 ms per 128-frame batch just
    from storing the kernels in bf16. BN vectors stay f32 (folded in f32).
    """
    import jax.numpy as jnp

    return {
        name: {
            key: (jnp.asarray(val).astype(dtype) if key == "kernel" else jnp.asarray(val))
            for key, val in layer.items()
        }
        for name, layer in params.items()
    }


# ---------------------------------------------------------------------------
# Post-training int8 quantization (PTQ)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("compute_dtype",))
def _calibration_walk(params: Dict[str, Dict], letterboxed: jnp.ndarray,
                      compute_dtype):
    """Returns ({conv_name: absmax}, decoded detections) from ONE walk.

    Module-level jit: the per-chunk calibration loop in YoloDetector must
    hit the SAME compiled graph every chunk (a jit built inside the calling
    function would be keyed on a fresh closure and recompile the 75-conv
    walk per chunk -- minutes per chunk through a TPU relay). The decoded
    detections come along for free, so the calibrating first call detects
    each chunk without running the graph a second time."""
    absmax: Dict[str, jnp.ndarray] = {}

    def tap(name: str, v: jnp.ndarray) -> None:
        absmax[name] = jnp.max(jnp.abs(v.astype(jnp.float32)))

    det = _yolo_graph(params, letterboxed, compute_dtype, tap=tap)
    return dict(absmax), det


def calibrate_yolo_activations(params: Dict[str, Dict], letterboxed: jnp.ndarray,
                               compute_dtype=jnp.float32) -> Dict[str, float]:
    """Per-conv input absmax over a calibration batch of letterboxed frames.

    Runs the reference-precision forward once (the SAME graph walk as
    yolo_forward, via its tap hook), recording max|x| at every conv input;
    these become the static activation scales of the int8 path (standard
    per-tensor PTQ calibration). The walk runs as ONE cached jit graph
    returning all 75 reductions together -- an eager walk costs one remote
    dispatch (and through this environment's TPU relay, one remote compile)
    per op. Returns {conv_name: absmax}. Use merge_absmax to accumulate
    over several batches."""
    vals, _ = _calibration_walk(params, letterboxed, compute_dtype)
    return _absmax_floats(vals)


def _absmax_floats(vals: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    return {k: float(v) for k, v in jax.device_get(vals).items()}


def merge_absmax(a: Dict[str, float], b: Dict[str, float]) -> Dict[str, float]:
    """Elementwise max of two calibration records (multi-batch calibration)."""
    if not a:
        return dict(b)
    return {k: max(a[k], b[k]) for k in a}


def conv_input_downsample() -> Dict[str, int]:
    """Walk YOLOV3_SPEC tracking each tensor's downsample factor relative to
    the canvas (1 = full resolution, 32 = the deepest grid); return
    {conv_name: factor of that conv's INPUT}. Canvas-size-independent, so
    the mixed-precision boundary below holds for square and rect canvases
    alike."""
    factors: List[int] = []  # OUTPUT factor per spec index
    f = 1
    out: Dict[str, int] = {}
    for i, entry in enumerate(YOLOV3_SPEC):
        kind = entry[0]
        if kind == "conv":
            out[f"conv_{i}"] = f
            f *= entry[3]
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in entry[1]]
            f = factors[refs[0]]
        elif kind == "upsample":
            f //= 2
        factors.append(f)
    return out


def _q8_handoff_convs() -> set:
    """Spec indices of convs whose output has exactly ONE consumer and that
    consumer is the immediately-following conv. These may emit int8 directly
    (pre-scaled by the consumer's activation scale) so the inter-layer
    tensor costs 1 byte/element of HBM traffic instead of 2 (bf16) -- the
    roofline's "glue share" (docs/PERF.md round 3) is exactly this traffic.
    Excluded: convs feeding shortcuts/routes (branch points 79/91, every
    pre-shortcut 3x3) and convs followed by non-conv entries."""
    referenced = set()
    for i, entry in enumerate(YOLOV3_SPEC):
        if entry[0] == "shortcut":
            referenced.add(i + entry[1])
        elif entry[0] == "route":
            referenced.update(r if r >= 0 else i + r for r in entry[1])
    return {
        i
        for i, entry in enumerate(YOLOV3_SPEC)
        if entry[0] == "conv"
        and i not in referenced
        and i + 1 < len(YOLOV3_SPEC)
        and YOLOV3_SPEC[i + 1][0] == "conv"
    }


def quantize_yolo_params(folded: Dict[str, Dict], act_absmax: Dict[str, float],
                         min_downsample: int = 1, q8_handoff: bool = False
                         ) -> Dict[str, Dict]:
    """BN-folded params -> int8 PTQ params for the MXU's s8 x s8 -> s32 path.

    Weights: symmetric per-output-channel int8 (scale = absmax/127 per
    channel). Activations: symmetric per-tensor int8 with the calibrated
    static scale. The three bias-only detection-head convs (255 channels)
    stay in the float path -- their logits feed sigmoids/exp directly and are
    a negligible FLOP share.

    ``min_downsample`` sets a MIXED-PRECISION boundary: only convs whose
    input sits at >= that downsample factor are quantized; shallower layers
    keep the float/bf16 path. ``q8_handoff``: a quantized conv whose sole
    consumer is the next quantized conv stores that consumer's activation
    scale as ``out_scale`` and emits int8 directly from its epilogue
    (_conv_block), so the inter-layer tensor is 1 byte/element in HBM.
    Rounding semantics match the consumer-side quantize (round/clip of the
    same float epilogue value); skipping the bf16 cast in between can only
    REDUCE quantization error.

    Both knobs default OFF: the round-3 in-situ A/B (tools/exp_mixed_int8.py,
    docs/PERF.md) measured the whole-tower int8 graph FASTER than
    mixed(8) and mixed+q8 (29.5 vs 31.1/31.2 ms per 128 frames) -- the
    isolated per-layer ratios that motivated them were harness artifacts;
    in the full graph XLA fuses the q/dq glue into conv epilogues, so
    neither boundary nor handoff pays. min_downsample=8 remains the
    ACCURACY-preferable option (10 fewer quantized layers) at ~5% cost."""
    ds = conv_input_downsample()
    handoff = _q8_handoff_convs() if q8_handoff else set()
    out: Dict[str, Dict] = {}
    quantized = set()
    for name, layer in folded.items():
        if "folded_bias_leaky" not in layer or ds[name] < min_downsample:
            out[name] = dict(layer)  # float head conv / shallow mixed layer
            continue
        quantized.add(name)
        kernel = np.asarray(layer["kernel"], np.float32)
        w_scale = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12) / 127.0
        qkernel = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        in_scale = np.float32(max(act_absmax[name], 1e-12) / 127.0)
        out[name] = {
            "qkernel": jnp.asarray(qkernel),
            "w_scale": jnp.asarray(w_scale.astype(np.float32)),
            "in_scale": jnp.asarray(in_scale),
            "q_bias_leaky": jnp.asarray(layer["folded_bias_leaky"]),
        }
    if not quantized:
        # min_downsample above the deepest spec factor (32) would quantize
        # nothing: needs_calibration could then never turn False and the
        # detector would silently re-run the full calibration walk (plus a
        # whole-tree device_put) on every call, forever.
        raise ValueError(
            f"int8_min_downsample={min_downsample} quantizes zero convs "
            f"(deepest downsample factor in the spec is {max(ds.values())})")
    # Second pass: wire the q8 handoff edges (producer and consumer must
    # BOTH be quantized for the pre-scaled int8 emission to be meaningful).
    for i in handoff:
        name, nxt = f"conv_{i}", f"conv_{i + 1}"
        if name in quantized and nxt in quantized:
            out[name]["out_scale"] = out[nxt]["in_scale"]
    return out


def bias_correct_yolo(folded: Dict[str, Dict], qparams: Dict[str, Dict],
                      letterboxed: jnp.ndarray) -> Dict[str, Dict]:
    """Fold the expected per-channel quantization error into q_bias_leaky.

    Classic PTQ bias correction (same as resnet_int8.bias_correct_resnet50):
    at every quantized conv, estimate E[conv_f32(x) - conv_int8(x)] per
    output channel on the calibration batch (at the float activations,
    pre-bias/pre-leaky) and add it to the int8 path's bias. Free at runtime;
    removes the systematic component of the weight/activation rounding
    drift. Returns a new qparams dict.

    NOT wired into the default int8 path: on this image's random-init
    weights the decoded-score drift measured neutral (0.00283 -> 0.00306
    mean |delta score|) -- the saturated decode sigmoids do not reward a
    pre-activation mean shift the way SPIN's linear feature head does
    (where the same correction HALVES the drift; resnet_int8). Re-evaluate
    as the default once trained weights are available."""
    corr = _yolo_bias_corr_walk(folded, qparams, letterboxed)
    out = {}
    for name, layer in qparams.items():
        layer = dict(layer)
        if name in corr:
            layer["q_bias_leaky"] = (
                jnp.asarray(layer["q_bias_leaky"]) + corr[name].astype(jnp.float32)
            )
        out[name] = layer
    return out


@jax.jit
def _yolo_bias_corr_walk(fp, qp, x):
    """Float forward + per-quantized-conv E[conv_f32 - conv_int8] in ONE
    graph. Module-level jit like _calibration_walk: a per-call
    jax.jit(walk) closure would recompile the 75-conv walk on every
    re-quantization (~40-90 s per compile through this environment's
    remote relay)."""
    rec: Dict[str, jnp.ndarray] = {}

    def tap(name, v):
        rec[name] = v

    _yolo_graph(fp, x, jnp.float32, tap=tap)
    corr = {}
    for i, entry in enumerate(YOLOV3_SPEC):
        if entry[0] != "conv":
            continue
        name = f"conv_{i}"
        if "qkernel" not in qp[name]:
            continue  # float head conv
        _, _filters, ksize, stride, _bn = entry
        pad = (ksize - 1) // 2
        x_f = rec[name]
        y_f = jax.lax.conv_general_dilated(
            x_f, jnp.asarray(fp[name]["kernel"], jnp.float32),
            (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        layer = qp[name]
        xq = jnp.clip(
            jnp.round(x_f * (1.0 / layer["in_scale"])), -127.0, 127.0
        ).astype(jnp.int8)
        y_q = jax.lax.conv_general_dilated(
            xq, layer["qkernel"], (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (layer["in_scale"] * layer["w_scale"])
        corr[name] = jnp.mean(y_f - y_q, axis=(0, 1, 2))
    return corr


def load_darknet_weights(path: str) -> Dict[str, Dict]:
    """Parse the standard darknet binary: 5 int32 header, then per conv layer
    [bn_bias, bn_scale, bn_mean, bn_var] or [conv_bias], then kernel (OIHW)."""
    with open(path, "rb") as f:
        np.fromfile(f, np.int32, 5)  # header (major, minor, revision, seen)
        blob = np.fromfile(f, np.float32)

    params: Dict[str, Dict] = {}
    ptr = 0
    in_ch = 3
    channels: List[int] = []
    for i, entry in enumerate(YOLOV3_SPEC):
        kind = entry[0]
        if kind == "conv":
            _, filters, ksize, stride, bn = entry
            layer: Dict[str, np.ndarray] = {}
            if bn:
                for name in ("bias", "scale", "mean", "var"):
                    layer[name] = blob[ptr : ptr + filters].copy()
                    ptr += filters
            else:
                layer["conv_bias"] = blob[ptr : ptr + filters].copy()
                ptr += filters
            n_w = filters * in_ch * ksize * ksize
            kernel = blob[ptr : ptr + n_w].reshape(filters, in_ch, ksize, ksize)
            ptr += n_w
            layer["kernel"] = np.transpose(kernel, (2, 3, 1, 0)).copy()  # -> HWIO
            params[f"conv_{i}"] = layer
            in_ch = filters
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in entry[1]]
            in_ch = sum(channels[r] for r in refs)
        channels.append(in_ch)
    if ptr != blob.size:
        raise ValueError(f"darknet weight size mismatch: used {ptr} of {blob.size}")
    return params


def _conv_block(x, layer, entry, compute_dtype=jnp.float32):
    _, filters, ksize, stride, bn = entry
    pad = (ksize - 1) // 2
    if "qkernel" in layer:
        # int8 PTQ path (quantize_yolo_params): quantize the activation with
        # its calibrated static scale, run the conv on the s8 MXU path, then
        # dequantize + bias + leaky in one fused epilogue. An int8 INPUT is
        # a q8 handoff from the producer (already scaled by this layer's
        # in_scale) and skips the quantize.
        if x.dtype == jnp.int8:
            xq = x
        else:
            inv_s = 1.0 / layer["in_scale"]
            xq = jnp.clip(jnp.round(x.astype(compute_dtype) * inv_s.astype(compute_dtype)),
                          -127.0, 127.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            layer["qkernel"],
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (layer["in_scale"] * layer["w_scale"]) + layer["q_bias_leaky"]
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
        if "out_scale" in layer:
            # Sole consumer is the next quantized conv: emit its int8 input
            # directly (fused into this epilogue), so the inter-layer tensor
            # is 1 byte/element in HBM instead of a bf16 round trip.
            return jnp.clip(jnp.round(y * (1.0 / layer["out_scale"])),
                            -127.0, 127.0).astype(jnp.int8)
        return y.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        jnp.asarray(layer["kernel"]).astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "scale" in layer:
        # Unfolded BN layer: scale/shift fused into one multiply-add.
        inv = jax.lax.rsqrt(jnp.asarray(layer["var"]) + BN_EPS)
        mul = (inv * jnp.asarray(layer["scale"])).astype(compute_dtype)
        add = (
            jnp.asarray(layer["bias"]) - jnp.asarray(layer["mean"]) * inv * jnp.asarray(layer["scale"])
        ).astype(compute_dtype)
        x = x * mul + add
        x = jnp.where(x > 0, x, jnp.asarray(LEAKY_SLOPE, compute_dtype) * x)
    elif "folded_bias_leaky" in layer:
        # BN pre-folded by fold_bn_params: bias + leaky in the conv epilogue.
        x = x + jnp.asarray(layer["folded_bias_leaky"]).astype(compute_dtype)
        x = jnp.where(x > 0, x, jnp.asarray(LEAKY_SLOPE, compute_dtype) * x)
    else:
        # Plain-bias head conv.
        x = x + jnp.asarray(layer["conv_bias"]).astype(compute_dtype)
    return x


def _decode_head(raw, anchor_set, stride):
    """raw: (B, gh, gw, 255) -> (B, gh*gw*3, 5) [cx, cy, w, h, person_score]
    in letterbox-canvas pixel units. The grid may be rectangular (the
    detector is fully convolutional; see ops.crop.rect_canvas_geometry)."""
    B, gh, gw = raw.shape[0], raw.shape[1], raw.shape[2]
    raw = raw.reshape(B, gh, gw, 3, 5 + NUM_CLASSES)
    xy = jax.nn.sigmoid(raw[..., 0:2])
    wh = raw[..., 2:4]
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls_person = jax.nn.sigmoid(raw[..., 5 + PERSON_CLASS : 6 + PERSON_CLASS])

    gy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,gh,gw,1,2)
    anchors = jnp.asarray(ANCHORS[anchor_set], jnp.float32)[None, None, None, :, :]

    cxcy = (xy + grid) * stride
    pwh = jnp.exp(jnp.clip(wh, -20.0, 20.0)) * anchors
    score = obj * cls_person
    out = jnp.concatenate([cxcy, pwh, score], axis=-1)
    return out.reshape(B, gh * gw * 3, 5)


def _yolo_graph(params: Dict, images: jnp.ndarray, compute_dtype, tap=None
                ) -> jnp.ndarray:
    """THE YOLOV3_SPEC graph walk, shared by the jitted forward and the PTQ
    calibration pass (one walker, so calibrated activation scales can never
    desynchronise from the inference graph). tap(conv_name, conv_input) is
    invoked per conv when given (calibration-only; the tap sees traced
    values, so record jnp expressions and reduce outside)."""
    outputs: List[jnp.ndarray] = []
    detections: List[jnp.ndarray] = []
    x = images
    for i, entry in enumerate(YOLOV3_SPEC):
        kind = entry[0]
        if kind == "conv":
            if tap is not None:
                tap(f"conv_{i}", x)
            x = _conv_block(x, params[f"conv_{i}"], entry, compute_dtype)
        elif kind == "shortcut":
            x = x + outputs[i + entry[1]]
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in entry[1]]
            parts = [outputs[r] for r in refs]
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        elif kind == "upsample":
            B, H, W, C = x.shape
            # Nearest-neighbour 2x as reshape+broadcast (cheaper to lower
            # than a general jax.image.resize gather).
            x = jnp.broadcast_to(
                x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
            ).reshape(B, H * 2, W * 2, C)
        elif kind == "yolo":
            stride = images.shape[1] // x.shape[1]
            detections.append(_decode_head(x.astype(jnp.float32), entry[1], stride))
        outputs.append(x)
    return jnp.concatenate(detections, axis=1)


@partial(jax.jit, static_argnames=("k",))
def _topk_select(det: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, anchors, 5) -> the k best by score, score-descending (ties by
    lower anchor index, per lax.top_k -- load-bearing for NMS determinism).

    This is the device half of the top-k transfer reduction
    (DetectorConfig.max_device_dets, YoloDetector._pull_detections): the
    full decode is (B, ~10k anchors, 5) f32 = ~213 KB/frame, but the host
    only needs the handful above the 0.1 threshold, so selecting on the
    already-computed decode cuts the device->host transfer ~40x. Exactness
    contract lives in _pull_detections (truncation-guarded full-pull
    fallback)."""
    k = min(k, det.shape[1])  # small canvases can have < k anchors
    _, idx = jax.lax.top_k(det[..., 4], k)
    return jnp.take_along_axis(det, idx[..., None], axis=1)


@partial(jax.jit, static_argnames=("compute_dtype",))
def yolo_forward(params: Dict, images: jnp.ndarray, img_size: int = 416,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """images: (B, H, W, 3) float32 in [0,1] letterboxed; H and W must be
    multiples of 32 but need not be equal (rectangular canvases skip the
    gray-padding FLOPs of a square letterbox -- ops.crop.rect_canvas_geometry).
    Returns (B, total_anchors, 5) decoded [cx, cy, w, h, person_score] in
    canvas pixels.

    compute_dtype=bfloat16 runs the conv tower at MXU-native precision (the
    decode heads return to f32); detection scores shift by <1e-2, well under
    the 0.1 detection threshold's granularity.

    img_size is accepted for API compatibility but unused (and deliberately
    NOT a static jit arg): strides derive from the canvas shape, so varying
    it must not trigger a recompile."""
    del img_size
    return _yolo_graph(params, images, compute_dtype)


# ---------------------------------------------------------------------------
# NMS + detector wrapper
# ---------------------------------------------------------------------------
def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> np.ndarray:
    """Greedy IoU NMS; returns kept indices sorted by descending score.

    Ties break by INPUT ORDER (stable sort): both detector paths present
    equal-scored boxes in anchor order (the full pull trivially;
    _topk_select because lax.top_k breaks ties by lower index), so a
    stable descending sort makes NMS deterministic and path-independent --
    load-bearing for the top-k path's results-identical contract."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_thr]
    return np.array(keep, np.int64)


@dataclass
class YoloDetector:
    """Batched person detector with the MPT-era calling convention.

    rect=True runs the conv tower on the rectangular canvas
    (ops.crop.rect_canvas_geometry): identical content resample, anchors and
    stride-grid congruence, ~1.44x fewer FLOPs on 800x450 ingest frames than
    the square letterbox. The residual deviation is the truncated gray far
    field at the canvas edge -- invisible to content-interior receptive
    fields of a trained detector, but unquantifiable with this image's
    random-init weights (their saturated sigmoids flip on any perturbation),
    so rect defaults to False for the strict square-canvas contract of the
    upstream MPT detector and is enabled by throughput mode / DetectorConfig.
    rect_letterbox."""

    params: Dict
    img_size: int = 416
    detection_threshold: float = 0.1
    nms_threshold: float = 0.45
    batch_size: int = 8
    rect: bool = False
    # Device-side top-k pre-selection (_topk_select): the host pulls
    # (B, k, 5) instead of every anchor. 0 disables. Results are ALWAYS
    # identical to the full pull: any chunk where the k-th score still
    # clears the detection threshold (possible truncation) re-pulls in full.
    max_device_dets: int = 256
    # int8 PTQ of the conv tower (quantize_yolo_params): measured 1.43x over
    # bf16 on the rect canvas (28.6 vs 40.8 ms / 128 frames). The first
    # __call__ runs float while calibrating activation scales over ALL its
    # chunks, then quantizes; use calibrate() for explicit setup. Opt-in
    # like rect.
    int8: bool = False
    # Mixed-precision boundary: quantize only convs at >= this downsample
    # factor. Whole tower (1) is the measured-fastest default; 8 trades
    # ~5% speed for 10 fewer quantized layers (docs/PERF.md round 3).
    int8_min_downsample: int = 1

    def _pull_detections(self, det_dev) -> np.ndarray:
        """Device-resident full decode -> host array, via the top-k transfer
        reduction when enabled: pull only the k best per frame; if some
        frame's k-th score still clears the threshold the cap MAY have
        truncated its candidate set, so fall back to pulling the full
        tensor -- a pure transfer, never a recompute (det_dev is already
        computed). Shared by the calibrating and steady-state branches so
        the truncation guard cannot diverge between them."""
        if self.max_device_dets:
            raw = np.asarray(_topk_select(det_dev, self.max_device_dets))
            if raw.shape[1] >= det_dev.shape[1]:
                # k covered every anchor: raw IS the full set (sorted); a
                # second full pull would only double the transfer.
                return raw
            scores = raw[..., 4]
            # Non-finite scores would break the guard two ways: a NaN in the
            # top-k can evict a finite above-threshold detection while the
            # `> thr` comparison on the NaN k-th score reads False, silently
            # skipping the fallback. Any non-finite score -> pull in full.
            if np.isfinite(scores).all() and not (
                scores[:, -1] > self.detection_threshold
            ).any():
                return raw
        return np.asarray(det_dev)

    @property
    def needs_calibration(self) -> bool:
        """True when int8 is requested but activation scales are not set yet
        (the Predictor's windowed ingest calibrates explicitly up front
        instead of letting the first 64-frame window pin the scales)."""
        return self.int8 and not any("qkernel" in l for l in self.params.values())

    def _snapshot_float_params(self) -> None:
        """Host-side copy of the float (BN-folded) params, taken once just
        before quantization so reset_calibration can restore them. Host
        memory, not HBM: ~62 MB of f32 kernels."""
        if getattr(self, "_float_params", None) is None:
            self._float_params = jax.device_get(self.params)

    def reset_calibration(self) -> None:
        """Drop the int8 activation scales: restore the float params saved at
        quantization time, so the NEXT call (or an explicit calibrate())
        re-derives scales from fresh frames. The per-video re-calibration
        hook for detector instances shared across videos with different
        exposure statistics (DetectorConfig.recalibrate_per_video)."""
        if not self.int8:
            return
        saved = getattr(self, "_float_params", None)
        if saved is not None and any("qkernel" in l for l in self.params.values()):
            self.params = jax.device_put(saved)

    @classmethod
    def from_weights(cls, weights_path: str | None, fold_bn: bool = True,
                     **kwargs) -> "YoloDetector":
        import os.path as osp

        if weights_path and osp.isfile(weights_path):
            params = load_darknet_weights(weights_path)
        else:
            params = init_yolo_params()
        if fold_bn:
            params = fold_bn_params(params)
        return cls(params=params, **kwargs)

    def __call__(self, frames_rgb: np.ndarray) -> List[np.ndarray]:
        """frames_rgb: (N, H, W, 3) uint8. Returns per-frame ndarray
        (k, 5) [x1, y1, x2, y2, score] person detections in frame coords."""
        from poserisk_release_tpu.ops.crop import (
            letterbox_device,
            letterbox_device_rect,
            letterbox_geometry,
            rect_canvas_geometry,
        )

        N, H, W = frames_rgb.shape[0], frames_rgb.shape[1], frames_rgb.shape[2]
        if self.rect:
            _, _, new_w, new_h, pad_x, pad_y = rect_canvas_geometry(H, W, self.img_size)
            letterbox = letterbox_device_rect
        else:
            new_w, new_h, pad_x, pad_y = letterbox_geometry(H, W, self.img_size)
            letterbox = letterbox_device
        # Exact inverse of the letterbox: integer pads + per-axis content
        # scale (the rounded content size makes sx != sy by up to half a
        # pixel; using them keeps the unmap bit-exact).
        sx, sy = new_w / W, new_h / H

        quantized = any("qkernel" in l for l in self.params.values())
        if self.int8 and not quantized:
            if not any("folded_bias_leaky" in l for l in self.params.values()):
                raise ValueError("int8 PTQ requires BN-folded params (fold_bn=True)")
        # int8 lifecycle: the FIRST call runs the float graph while
        # accumulating per-conv absmax over EVERY chunk (whole-call
        # calibration -- a single dark opening window must not pin the
        # scales); quantization happens at the end of that call, so later
        # calls take the int8 path. Call `calibrate` explicitly for a
        # deterministic, shared-instance setup.
        calibrating = self.int8 and not quantized
        compute_dtype = jnp.bfloat16 if (self.int8 and quantized) else jnp.float32
        absmax: Dict[str, float] = {}
        results: List[np.ndarray] = []
        for start in range(0, N, self.batch_size):
            chunk = np.ascontiguousarray(frames_rgb[start : start + self.batch_size])
            # Letterbox on device (separable matmul resample; see ops/crop.py)
            # feeding the conv tower directly.
            letter = letterbox(jnp.asarray(chunk), self.img_size)
            if calibrating:
                # One walk yields the chunk's absmax AND its detections --
                # no second full forward during the calibrating call.
                vals, det_dev = _calibration_walk(self.params, letter, jnp.float32)
                absmax = merge_absmax(absmax, _absmax_floats(vals))
            else:
                det_dev = yolo_forward(self.params, letter, self.img_size,
                                       compute_dtype=compute_dtype)
            raw = self._pull_detections(det_dev)
            for det in raw:
                mask = det[:, 4] > self.detection_threshold
                det = det[mask]
                if det.size == 0:
                    results.append(np.zeros((0, 5), np.float32))
                    continue
                # Exact inverse of cv2's half-pixel mapping for centers;
                # sizes scale linearly.
                cx = (det[:, 0] - pad_x + 0.5) / sx - 0.5
                cy = (det[:, 1] - pad_y + 0.5) / sy - 0.5
                w = det[:, 2] / sx
                h = det[:, 3] / sy
                boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, W - 1)
                boxes[:, 1::2] = boxes[:, 1::2].clip(0, H - 1)
                # Drop boxes degenerated by the frame-bound clip (zero-area
                # boxes poison SORT's aspect-ratio Kalman state with NaNs).
                ok = ((boxes[:, 2] - boxes[:, 0]) >= 2) & ((boxes[:, 3] - boxes[:, 1]) >= 2)
                boxes, det = boxes[ok], det[ok]
                if boxes.shape[0] == 0:
                    results.append(np.zeros((0, 5), np.float32))
                    continue
                keep = nms_xyxy(boxes, det[:, 4], self.nms_threshold)
                results.append(
                    np.concatenate([boxes[keep], det[keep, 4:5]], axis=1).astype(np.float32)
                )
        if calibrating and absmax:
            # absmax is empty when this (calibrating) call received zero
            # frames: no activation statistics exist, so stay un-quantized
            # and let the next non-empty call calibrate -- quantizing from
            # {} would KeyError, turning an empty first window into a crash.
            self._snapshot_float_params()
            self.params = jax.device_put(quantize_yolo_params(
                self.params, absmax, min_downsample=self.int8_min_downsample))
        return results

    def calibrate(self, frames_rgb: np.ndarray) -> None:
        """Explicit int8 calibration on representative frames: accumulates
        per-conv activation absmax over batch_size chunks and quantizes.
        Preferred over the implicit first-call calibration when a detector
        instance is shared across videos (deterministic, order-independent)."""
        from poserisk_release_tpu.ops.crop import letterbox_device, letterbox_device_rect

        if not self.int8:
            raise ValueError("calibrate() requires int8=True")
        if any("qkernel" in l for l in self.params.values()):
            return  # already quantized
        if not any("folded_bias_leaky" in l for l in self.params.values()):
            # Fail BEFORE the expensive float walk: quantize_yolo_params
            # would silently no-op on unfolded params and the next __call__
            # would raise anyway (same check/message as __call__).
            raise ValueError("int8 PTQ requires BN-folded params (fold_bn=True)")
        letterbox = letterbox_device_rect if self.rect else letterbox_device
        absmax: Dict[str, float] = {}
        N = frames_rgb.shape[0]
        for start in range(0, N, self.batch_size):
            chunk = np.ascontiguousarray(frames_rgb[start : start + self.batch_size])
            letter = letterbox(jnp.asarray(chunk), self.img_size)
            absmax = merge_absmax(
                absmax, calibrate_yolo_activations(self.params, letter)
            )
        self._snapshot_float_params()
        self.params = jax.device_put(quantize_yolo_params(
            self.params, absmax, min_downsample=self.int8_min_downsample))


@dataclass
class StubDetector:
    """Deterministic detector for weight-free tests/pipelines: returns either
    scripted per-frame boxes or one full-frame box per frame."""

    scripted: List[np.ndarray] | None = None

    def __call__(self, frames_rgb: np.ndarray) -> List[np.ndarray]:
        if self.scripted is not None:
            return [np.asarray(b, np.float32).reshape(-1, 5) for b in self.scripted]
        N, H, W = frames_rgb.shape[0], frames_rgb.shape[1], frames_rgb.shape[2]
        box = np.array([[W * 0.25, H * 0.1, W * 0.75, H * 0.95, 0.99]], np.float32)
        return [box.copy() for _ in range(N)]
