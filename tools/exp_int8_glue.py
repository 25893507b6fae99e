"""Experiment: int8 detector glue variants (round 2 perf push).

Hypothesis: the current int8 PTQ path (models/detector._conv_block) spends
~half its time on elementwise glue traffic: each conv writes s32, a fused
dequant+leaky kernel writes bf16, and the next conv's quantize pass reads
bf16 and writes s8 again (~9-13 bytes/element vs the 1 byte an int8-to-int8
chain needs). This script times, in ONE process on the real chip:

  A. the current int8 forward (baseline re-measurement),
  B. an "int8-chain" prototype: every tower tensor is (int8, scale); the conv
     epilogue folds dequant + bias + leaky + requant into a single
     s32 -> s8 chain (scales folded: A = s_in*w_scale/s_out, B = b/s_out,
     exploiting leaky's positive homogeneity), shortcuts add in the int8
     domain with per-operand rescale, route concats rescale parts to the
     consumer scale.

Also dumps the compiled HLO of both to /tmp/ for fusion inspection.

RESULT (2026-08-16, v5e via relay, batch 128): the hypothesis is FALSE.
  A current int8: 30.47 ms   B int8-chain: 30.98 ms   (0.984x -- no win)
XLA already fuses the dequant+leaky+requant chains into single elementwise
kernels; the int8 detector is bound by the s8 convolutions themselves (the
MXU does not reach its nominal 2x-over-bf16 on these 3x3 spatial shapes).
The chain variant also degrades numerics on random-init weights (the float
detection heads must NOT be quantized: per-tensor int8 on their wide-range
inputs blows up exp(wh) decode). Kept as the methodology record behind
docs/PERF.md's round-2 "what we did not ship" note.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poserisk_release_tpu.utils.profiling import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # share bench.py's on-disk executable cache

from poserisk_release_tpu.models.detector import (  # noqa: E402
    LEAKY_SLOPE,
    YOLOV3_SPEC,
    _decode_head,
    calibrate_yolo_activations,
    fold_bn_params,
    init_yolo_params,
    quantize_yolo_params,
    yolo_forward,
)
from poserisk_release_tpu.ops.crop import letterbox_device_rect  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MEASURE = 24


# ---------------------------------------------------------------------------
# Calibration of EVERY entry output (the chain needs output scales for
# shortcut operands too, which calibrate_yolo_activations does not record).
# ---------------------------------------------------------------------------
def calibrate_entry_outputs(folded, letterboxed):
    """One-jit f32 walk recording absmax of every spec entry's output."""
    from poserisk_release_tpu.models.detector import _conv_block

    def walk(params, letter):
        absmax = {}
        outputs = []
        x = letter
        for i, entry in enumerate(YOLOV3_SPEC):
            kind = entry[0]
            if kind == "conv":
                x = _conv_block(x, params[f"conv_{i}"], entry, jnp.float32)
            elif kind == "shortcut":
                x = x + outputs[i + entry[1]]
            elif kind == "route":
                refs = [r if r >= 0 else i + r for r in entry[1]]
                parts = [outputs[r] for r in refs]
                x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            elif kind == "upsample":
                Bn, H, W, C = x.shape
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (Bn, H, 2, W, 2, C)
                ).reshape(Bn, H * 2, W * 2, C)
            elif kind == "yolo":
                outputs.append(x)
                continue
            outputs.append(x)
            absmax[str(i)] = jnp.max(jnp.abs(x))
        absmax["input"] = jnp.max(jnp.abs(letter))
        return absmax

    vals = jax.jit(walk)(folded, letterboxed)
    return {k: float(v) for k, v in vals.items()}


def build_chain_params(folded, out_absmax):
    """Per-entry chain-quantized params + static per-entry scales."""
    params = {}
    scales = {}  # entry index -> scale of its int8 OUTPUT (None = float)
    in_scale = max(out_absmax["input"], 1e-12) / 127.0
    scales["input"] = in_scale
    prev_scale = in_scale
    channels = []
    in_ch = 3
    for i, entry in enumerate(YOLOV3_SPEC):
        kind = entry[0]
        if kind == "conv":
            _, filters, ksize, stride, bn = entry
            layer = folded[f"conv_{i}"]
            kernel = np.asarray(layer["kernel"], np.float32)
            if "folded_bias_leaky" in layer:
                w_scale = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12) / 127.0
                qk = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
                s_out = max(out_absmax[str(i)], 1e-12) / 127.0
                A = (prev_scale * w_scale / s_out).astype(np.float32)
                Bc = (np.asarray(layer["folded_bias_leaky"], np.float32) / s_out).astype(
                    np.float32
                )
                params[f"conv_{i}"] = {
                    "qkernel": jnp.asarray(qk),
                    "A": jnp.asarray(A),
                    "B": jnp.asarray(Bc),
                }
                scales[i] = s_out
                prev_scale = s_out
            else:
                # float head conv: dequant input inside, output float
                w_scale = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12) / 127.0
                qk = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
                params[f"conv_{i}"] = {
                    "qkernel": jnp.asarray(qk),
                    "deq": jnp.asarray((prev_scale * w_scale).astype(np.float32)),
                    "bias": jnp.asarray(np.asarray(layer["conv_bias"], np.float32)),
                }
                scales[i] = None
                prev_scale = None
            in_ch = filters
        elif kind == "shortcut":
            s_out = max(out_absmax[str(i)], 1e-12) / 127.0
            scales[i] = s_out
            prev_scale = s_out
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in entry[1]]
            s_out = max(out_absmax[str(i)], 1e-12) / 127.0
            scales[i] = s_out
            prev_scale = s_out
            in_ch = sum(channels[r] for r in refs)
        elif kind == "upsample":
            scales[i] = prev_scale
        elif kind == "yolo":
            scales[i] = prev_scale
        channels.append(in_ch)
    return params, scales


def _sat8(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def make_chain_forward(scales):
    """scales are STATIC (baked into the jitted graph as python floats)."""

    def fwd(params, letter_q8):
        outputs = []
        detections = []
        x = letter_q8  # int8 canvas
        for i, entry in enumerate(YOLOV3_SPEC):
            kind = entry[0]
            if kind == "conv":
                _, filters, ksize, stride, bn = entry
                pad = (ksize - 1) // 2
                layer = params[f"conv_{i}"]
                y32 = jax.lax.conv_general_dilated(
                    x,
                    layer["qkernel"],
                    window_strides=(stride, stride),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                if "A" in layer:
                    y = y32.astype(jnp.float32) * layer["A"] + layer["B"]
                    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
                    x = _sat8(y)
                else:
                    x = y32.astype(jnp.float32) * layer["deq"] + layer["bias"]
            elif kind == "shortcut":
                j = i + entry[1]
                s1, s2 = scales[i - 1], scales[j]
                s_out = scales[i]
                x = _sat8(
                    x.astype(jnp.float32) * (s1 / s_out)
                    + outputs[j].astype(jnp.float32) * (s2 / s_out)
                )
            elif kind == "route":
                refs = [r if r >= 0 else i + r for r in entry[1]]
                s_out = scales[i]
                parts = []
                for r in refs:
                    p = outputs[r]
                    if scales[r] == s_out:
                        parts.append(p)
                    else:
                        parts.append(_sat8(p.astype(jnp.float32) * (scales[r] / s_out)))
                x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            elif kind == "upsample":
                Bn, H, W, C = x.shape
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (Bn, H, 2, W, 2, C)
                ).reshape(Bn, H * 2, W * 2, C)
            elif kind == "yolo":
                stride = letter_q8.shape[1] // x.shape[1]
                detections.append(_decode_head(x.astype(jnp.float32), entry[1], stride))
            outputs.append(x)
        return jnp.concatenate(detections, axis=1)

    return fwd


def timeit(fn, *args, label=""):
    def sync(out):
        return float(jnp.sum(out[..., 4].astype(jnp.float32)))

    sync(fn(*args))
    sync(fn(*args))

    def one_pass():
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(MEASURE)]
        acc = jnp.float32(0)
        for o in outs:
            acc = acc + jnp.sum(o[..., 4].astype(jnp.float32))
        float(acc)
        return time.perf_counter() - t0

    el = min(one_pass(), one_pass())
    ms = el / MEASURE * 1000
    print(f"{label}: {ms:.2f} ms / {B} frames  ({B / (el / MEASURE):.1f} fps)", flush=True)
    return ms


def main():
    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, 450, 800, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    letter_bf16 = jax.jit(
        lambda f: letterbox_device_rect(f, 416, compute_dtype=jnp.bfloat16)
    )(frames)
    letter_f32 = letter_bf16.astype(jnp.float32)

    folded = fold_bn_params(init_yolo_params())
    print("calibrating (eager)...", flush=True)
    act = calibrate_yolo_activations(folded, letter_f32[:16])
    qp = jax.device_put(quantize_yolo_params(folded, act))

    out_absmax = calibrate_entry_outputs(folded, letter_f32[:16])
    chain_p, chain_scales = build_chain_params(folded, out_absmax)
    chain_p = jax.device_put(chain_p)
    in_s = chain_scales["input"]
    letter_q8 = jax.jit(lambda x: _sat8(x.astype(jnp.float32) * (1.0 / in_s)))(
        letter_bf16
    )

    # numeric sanity: chain vs current on 4 frames
    cur = yolo_forward(qp, letter_bf16[:4], 416, compute_dtype=jnp.bfloat16)
    chain_fwd = jax.jit(make_chain_forward(chain_scales))
    chn = chain_fwd(chain_p, letter_q8[:4])
    ds = float(jnp.max(jnp.abs(cur[..., 4] - chn[..., 4])))
    db = float(
        jnp.max(
            jnp.abs(cur[..., :4] - chn[..., :4])
            / jnp.maximum(jnp.abs(cur[..., :4]), 1.0)
        )
    )
    print(f"chain-vs-current: max score delta {ds:.4f}, max rel box delta {db:.4f}",
          flush=True)

    a = timeit(
        lambda p, x: yolo_forward(p, x, 416, compute_dtype=jnp.bfloat16),
        qp,
        letter_bf16,
        label="A current int8 (bf16 glue)",
    )
    b = timeit(chain_fwd, chain_p, letter_q8, label="B int8-chain")
    print(f"speedup B vs A: {a / b:.3f}x", flush=True)

    try:
        lowered = jax.jit(make_chain_forward(chain_scales)).lower(chain_p, letter_q8)
        txt = lowered.compile().as_text()
        with open("/tmp/chain_hlo.txt", "w") as f:
            f.write(txt)
        print(f"chain HLO dumped ({len(txt)} bytes)", flush=True)
    except Exception as e:
        print(f"HLO dump failed: {e}", flush=True)


if __name__ == "__main__":
    main()
