"""Fused int8 YOLOv3 residual stage as one Pallas kernel.

The per-layer roofline (docs/PERF.md round 3) left exactly one evidenced
gap in the int8 detector: the 36x52/C256 residual stage runs at 61% of the
int8 MXU peak while its bare s8 conv pair reaches 96% -- the difference is
inter-layer HBM traffic (bf16 activations round-tripping between conv
epilogues). Graph-level attacks (q8 handoff, mixed precision) measured
neutral in situ because XLA can overlap but not remove that traffic.

This kernel REMOVES it. Grid = (B, n_blocks): the inner grid dimension
walks the stage's residual blocks in order while the frame's residual
stream lives in a VMEM scratch that persists across grid steps -- loaded
from HBM once at block 0, written back once after the last block. Each
grid step runs one full residual block: quantize -> 1x1 s8 matmul ->
dequant + bias + leaky -> quantize -> 3x3 s8 conv (nine accumulated
shifted matmuls over a zero-padded VMEM scratch; each K = C/2 = one full
128-lane MXU pass) -> dequant + bias + leaky -> shortcut add. Only ONE
block's weights are VMEM-resident at a time (the j grid axis indexes the
weight blocks), keeping the whole kernel ~12 MB under the ~16 MB/core
VMEM budget at 36x52/C256.

Semantics match models.detector._conv_block's int8 branch per conv (same
jnp.round/clip quantize against the same calibrated static scales, same
fused dequant+bias+leaky epilogue, same f32 shortcut add); bit-exact vs
an f32-stream per-conv chain (tests/test_yolo_stage_pallas.py). The one
numeric difference vs the product bf16-compute graph is that the residual
stream never round-trips through bfloat16 between blocks, which can only
reduce rounding error. Stage boundaries coincide with the graph's route
points (YOLOV3_SPEC indices 36 and 61 are the only intra-tower tensors
referenced from outside), so fusing whole stages is structurally safe.

Reference behaviour being reproduced: the Darknet-53 residual stages of
the canonical yolov3.cfg (SURVEY.md section 2.9; models/detector.py
YOLOV3_SPEC)."""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poserisk_release_tpu.models.detector import LEAKY_SLOPE, YOLOV3_SPEC


def pack_yolo_stage(qparams: Dict[str, Dict], start: int, n_blocks: int):
    """Stack one residual stage's int8 params for the fused kernel.

    `start` is the spec index of the stage's first 1x1 conv; blocks are
    (conv 1x1 @ i, conv 3x3 @ i+1, shortcut @ i+2). Requires every conv of
    the stage to be quantized (whole-tower int8, the product default).
    Returns a dict of host arrays:
      qk1  (n, C, C/2) s8      1x1 kernels
      qk3  (n, 9*C/2, C) s8    3x3 kernels, (ky, kx, cin)-major rows
      d1   (n, C/2) f32        in_scale * w_scale (dequant) for the 1x1
      b1   (n, C/2) f32        folded bias for the 1x1
      d3/b3 (n, C) f32         same for the 3x3
      inv_s (n, 2) f32         1/in_scale of (1x1, 3x3)
    """
    qk1, qk3, d1, b1, d3, b3, inv_s = [], [], [], [], [], [], []
    for j in range(n_blocks):
        i = start + 3 * j
        assert YOLOV3_SPEC[i][0] == "conv" and YOLOV3_SPEC[i][2] == 1
        assert YOLOV3_SPEC[i + 1][0] == "conv" and YOLOV3_SPEC[i + 1][2] == 3
        assert YOLOV3_SPEC[i + 2][0] == "shortcut"
        l1, l3 = qparams[f"conv_{i}"], qparams[f"conv_{i + 1}"]
        if "qkernel" not in l1 or "qkernel" not in l3:
            raise ValueError(
                f"fused stage needs whole-tower int8; conv_{i}/conv_{i+1} "
                "are not quantized")
        k1 = np.asarray(l1["qkernel"])  # (1, 1, C, C/2)
        k3 = np.asarray(l3["qkernel"])  # (3, 3, C/2, C)
        qk1.append(k1[0, 0])
        qk3.append(k3.reshape(-1, k3.shape[-1]))
        s1 = float(np.asarray(l1["in_scale"]))
        s3 = float(np.asarray(l3["in_scale"]))
        d1.append(np.asarray(l1["w_scale"], np.float32) * s1)
        b1.append(np.asarray(l1["q_bias_leaky"], np.float32))
        d3.append(np.asarray(l3["w_scale"], np.float32) * s3)
        b3.append(np.asarray(l3["q_bias_leaky"], np.float32))
        inv_s.append([1.0 / s1, 1.0 / s3])
    # Vectors carry a middle singleton so their per-block BlockSpec
    # (1, 1, C) satisfies the TPU lowering rule (last two block dims must
    # divide (8, 128) or equal the array dims).
    return {
        "qk1": np.stack(qk1), "qk3": np.stack(qk3),
        "d1": np.stack(d1).astype(np.float32)[:, None, :],
        "b1": np.stack(b1).astype(np.float32)[:, None, :],
        "d3": np.stack(d3).astype(np.float32)[:, None, :],
        "b3": np.stack(b3).astype(np.float32)[:, None, :],
        "inv_s": np.asarray(inv_s, np.float32),
    }


def _leaky(y):
    return jnp.where(y > 0, y, jnp.float32(LEAKY_SLOPE) * y)


def _quant(x, inv_s):
    return jnp.clip(jnp.round(x * inv_s), -127.0, 127.0).astype(jnp.int8)


def _stage_kernel(inv_s_ref, h_ref, qk1_ref, qk3_ref, d1_ref, b1_ref,
                  d3_ref, b3_ref, out_ref, hs_ref, pad_ref, *, H, W, C,
                  n_blocks):
    half = C // 2
    HW = H * W
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        hs_ref[:] = h_ref[0].reshape(HW, C).astype(jnp.float32)

    h = hs_ref[:]
    # 1x1: quantize the residual stream, one s8 matmul, fused epilogue.
    # (inv_s is the WHOLE (n, 2) array in SMEM -- per-block SMEM slices are
    # not lowerable -- indexed by the block grid position.)
    q = _quant(h, inv_s_ref[j, 0])
    a = jnp.dot(q, qk1_ref[0], preferred_element_type=jnp.int32)
    a = _leaky(a.astype(jnp.float32) * d1_ref[0, 0] + b1_ref[0, 0])
    # 3x3: quantize, zero-pad in VMEM, nine shifted s8 matmuls accumulated
    # in s32 (each K = C/2 = a full 128-lane MXU pass).
    aq = _quant(a, inv_s_ref[j, 1])
    pad_ref[:] = jnp.zeros((H + 2, W + 2, half), jnp.int8)
    pad_ref[1:H + 1, 1:W + 1, :] = aq.reshape(H, W, half)
    acc = jnp.zeros((HW, C), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            tap = pad_ref[ky:ky + H, kx:kx + W, :].reshape(HW, half)
            acc = acc + jnp.dot(
                tap, qk3_ref[0, (ky * 3 + kx) * half:(ky * 3 + kx + 1) * half],
                preferred_element_type=jnp.int32,
            )
    y = _leaky(acc.astype(jnp.float32) * d3_ref[0, 0] + b3_ref[0, 0])
    hs_ref[:] = h + y  # shortcut (f32 residual stream, VMEM-resident)

    @pl.when(j == n_blocks - 1)
    def _store():
        out_ref[0] = hs_ref[:].reshape(H, W, C).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def fused_residual_stage(h, pack, n_blocks: int, interpret: bool = False):
    """h: (B, H, W, C) bf16/f32 stage input -> (B, H, W, C) same dtype.

    pack: pack_yolo_stage output (device arrays or host). Grid is
    (B, n_blocks): the inner axis walks the residual blocks with the
    frame's stream persisted in VMEM scratch; only one block's weights are
    resident at a time."""
    B, H, W, C = h.shape
    half = C // 2
    return pl.pallas_call(
        functools.partial(_stage_kernel, H=H, W=W, C=C, n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_s, whole (n, 2)
            pl.BlockSpec((1, H, W, C), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, half), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * half, C), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, half), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, half), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b, j: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H * W, C), jnp.float32),
            pltpu.VMEM((H + 2, W + 2, half), jnp.int8),
        ],
        interpret=interpret,
    )(
        jnp.asarray(pack["inv_s"]), h,
        jnp.asarray(pack["qk1"]), jnp.asarray(pack["qk3"]),
        jnp.asarray(pack["d1"]), jnp.asarray(pack["b1"]),
        jnp.asarray(pack["d3"]), jnp.asarray(pack["b3"]),
    )
