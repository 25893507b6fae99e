"""Per-layer int8 roofline of the YOLOv3 detector on the rect canvas.

VERDICT round-2 #1: the aggregate "52% of int8 peak" number writes off a
potential 2x of detector headroom without per-shape evidence. This tool
times every distinct conv shape class of YOLOV3_SPEC (rect 288x416 canvas,
batch 128) in isolation with the SAME int8 arithmetic as the product path
(`models.detector._conv_block`'s qkernel branch: static-scale quantize ->
s8xs8->s32 conv -> dequant + bias + leaky epilogue), and reports effective
TOPS vs the chip's nominal int8 peak per shape -- identifying which layers
XLA runs well and which leave real headroom.

Measurement discipline (CLAUDE.md): loop-inside-jit via lax.fori_loop with
the loop index perturbing the input (XLA must not hoist the body), every
output consumed into a device-side accumulator, one scalar readback as the
sync barrier (block_until_ready is a no-op through the axon relay).

Usage:
  python tools/roofline_detector.py              # all 23 classes (~25 min
                                                 #  of remote compiles)
  python tools/roofline_detector.py --top 6      # only the 6 biggest
                                                 #  FLOP-share classes
  python tools/roofline_detector.py --bf16       # also time bf16 per class

Run EXCLUSIVELY (single-tenant TPU; see tools/profile_stages.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from collections import OrderedDict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poserisk_release_tpu.utils.profiling import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # share bench.py's on-disk executable cache

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from poserisk_release_tpu.models.detector import (  # noqa: E402
    LEAKY_SLOPE,
    YOLOV3_SPEC,
)

B = 128
ITERS = 24
CANVAS = (288, 416)  # rect_canvas_geometry(450, 800, 416)
INT8_PEAK_TOPS = 394.0  # v5e: 2x the 197 TF/s bf16 peak
BF16_PEAK_TOPS = 197.0


def shape_classes(canvas=CANVAS):
    """Walk YOLOV3_SPEC tracking (H, W, C); group convs by
    (H, W, Cin, Cout, k, stride). Returns OrderedDict key -> (count, flops1)
    where flops1 is the MAC-doubled FLOPs of ONE conv of the class per frame."""
    shapes: "OrderedDict[tuple, list]" = OrderedDict()
    hw, ch = canvas, 3
    hist = []
    for i, e in enumerate(YOLOV3_SPEC):
        kind = e[0]
        if kind == "conv":
            _, f, k, s, _bn = e
            ho, wo = hw[0] // s, hw[1] // s
            key = (hw[0], hw[1], ch, f, k, s)
            flops = 2 * ho * wo * k * k * ch * f
            if key not in shapes:
                shapes[key] = [0, flops]
            shapes[key][0] += 1
            hw, ch = (ho, wo), f
        elif kind == "route":
            refs = [r if r >= 0 else i + r for r in e[1]]
            hw = hist[refs[0]][:2]
            ch = sum(hist[r][2] for r in refs)
        elif kind == "upsample":
            hw = (hw[0] * 2, hw[1] * 2)
        hist.append((hw[0], hw[1], ch))
    return shapes


def _looped_int8(iters):
    """Jittable: run the product int8 conv block `iters` times, input
    perturbed by the loop index, output fully consumed into the carry."""

    def fn(x, qkernel, w_scale, in_scale, bias, stride, pad):
        inv_s = 1.0 / in_scale

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            xq = jnp.clip(jnp.round(xi * inv_s.astype(x.dtype)), -127.0, 127.0
                          ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, qkernel, (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (in_scale * w_scale) + bias
            y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
            return acc + jnp.sum(y)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return fn


def _looped_bf16(iters):
    def fn(x, kernel, bias, stride, pad):
        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            y = jax.lax.conv_general_dilated(
                xi, kernel, (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + bias.astype(y.dtype)
            y = jnp.where(y > 0, y, jnp.asarray(LEAKY_SLOPE, y.dtype) * y)
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return fn


_INT8 = jax.jit(_looped_int8(ITERS), static_argnames=("stride", "pad"))
_BF16 = jax.jit(_looped_bf16(ITERS), static_argnames=("stride", "pad"))


def time_class(key, bf16=False):
    h, w, cin, cout, k, s = key
    pad = (k - 1) // 2
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    # Generated ON device: a host device_put of (B, h, w, cin) f32 crosses
    # this environment's ~4 MB/s relay (up to GBs per conv class).
    x = jax.jit(
        lambda key: jax.random.uniform(key, (B, h, w, cin), jnp.float32,
                                       -1.0, 1.0).astype(dtype)
    )(jax.random.PRNGKey(0))
    kern = rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
    bias = rng.normal(0, 0.01, (cout,)).astype(np.float32)
    if bf16:
        args = (x, jax.device_put(jnp.asarray(kern, dtype)),
                jax.device_put(jnp.asarray(bias)))
        fn = lambda: _BF16(*args, stride=s, pad=pad)  # noqa: E731
    else:
        w_scale = np.maximum(np.abs(kern).max(axis=(0, 1, 2)), 1e-12) / 127.0
        qkernel = np.clip(np.round(kern / w_scale), -127, 127).astype(np.int8)
        args = (x, jax.device_put(jnp.asarray(qkernel)),
                jax.device_put(jnp.asarray(w_scale.astype(np.float32))),
                jax.device_put(jnp.asarray(np.float32(1.0 / 127.0))),
                jax.device_put(jnp.asarray(bias)))
        fn = lambda: _INT8(*args, stride=s, pad=pad)  # noqa: E731
    float(fn())  # compile + warm

    def one() -> float:
        t0 = time.perf_counter()
        float(fn())
        return time.perf_counter() - t0

    return min(one(), one()) / ITERS * 1000.0  # ms per conv @ batch B


# ---------------------------------------------------------------------------
# Chain-slope mode: the isolated per-conv numbers above include fixed
# per-iteration elementwise overhead (input perturbation, quantize, dequant
# + sum) that is HBM traffic the real tower amortises across fused epilogues
# -- their SUM exceeds the measured full graph. The residual body is a
# natural chain (1x1 C->C/2 then 3x3 C/2->C, repeated), so timing the chain
# at two depths and taking the SLOPE cancels every fixed cost and yields the
# true marginal ms per pair exactly as the tower runs it.
# ---------------------------------------------------------------------------
def _chain_pairs_pure():
    """Glue-free s8 chain: activations STAY int8 between convs (the s32
    accumulator is truncated straight back to s8, semantically meaningless
    but byte-identical in shape/layout) -- times the bare XLA s8 conv pair
    without any quantize/dequantize elementwise traffic. The gap between
    this and the glued chain is exactly the q/dq cost the product path pays."""

    def fn(x8, k1, k3, m, iters):
        def pair(h8):
            y = jax.lax.conv_general_dilated(
                h8, k1, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y8 = jax.lax.shift_right_arithmetic(y, 8).astype(jnp.int8)
            z = jax.lax.conv_general_dilated(
                y8, k3, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return jax.lax.shift_right_arithmetic(z, 8).astype(jnp.int8)

        def body(i, acc):
            h = (x8.astype(jnp.int32) + i).astype(jnp.int8)  # break hoisting
            h = jax.lax.fori_loop(0, m, lambda _, hh: pair(hh), h)
            return acc + jnp.sum(h.astype(jnp.int32))

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return fn


_CHAIN_PURE = jax.jit(_chain_pairs_pure(), static_argnames=("m", "iters"))


def time_chain_pure(h, w, c, depths=(3, 9)):
    rng = np.random.RandomState(0)
    half = c // 2
    x8 = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (B, h, w, c)).astype(np.int8)))
    k1 = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (1, 1, c, half)).astype(np.int8)))
    k3 = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (3, 3, half, c)).astype(np.int8)))

    def measure(m):
        def call():
            return int(_CHAIN_PURE(x8, k1, k3, m=m, iters=ITERS))

        call()

        def one():
            t0 = time.perf_counter()
            call()
            return time.perf_counter() - t0

        return min(one(), one()) / ITERS * 1000.0

    m_lo, m_hi = depths
    return (measure(m_hi) - measure(m_lo)) / (m_hi - m_lo)


def _chain_pairs(int8: bool):
    def fn(x, k1, s1_w, k3, s3_w, b1, b3, in_s1, in_s3, m, iters):
        def pair(h):
            if int8:
                hq = jnp.clip(jnp.round(h * (1.0 / in_s1)), -127.0, 127.0
                              ).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    hq, k1, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (in_s1 * s1_w) + b1
                y = jnp.where(y > 0, y, LEAKY_SLOPE * y).astype(jnp.bfloat16)
                yq = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / in_s3)),
                              -127.0, 127.0).astype(jnp.int8)
                z = jax.lax.conv_general_dilated(
                    yq, k3, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (in_s3 * s3_w) + b3
                return jnp.where(z > 0, z, LEAKY_SLOPE * z).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                h, k1, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + b1.astype(y.dtype)
            y = jnp.where(y > 0, y, jnp.asarray(LEAKY_SLOPE, y.dtype) * y)
            z = jax.lax.conv_general_dilated(
                y, k3, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            z = z + b3.astype(z.dtype)
            return jnp.where(z > 0, z, jnp.asarray(LEAKY_SLOPE, z.dtype) * z)

        def body(i, acc):
            h = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            h = jax.lax.fori_loop(0, m, lambda _, hh: pair(hh), h)
            return acc + jnp.sum(h.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return fn


_CHAIN_INT8 = jax.jit(_chain_pairs(True), static_argnames=("m", "iters"))
_CHAIN_BF16 = jax.jit(_chain_pairs(False), static_argnames=("m", "iters"))


def time_chain(h, w, c, int8=True, depths=(3, 9)):
    """Marginal ms per (1x1 C->C/2, 3x3 C/2->C) pair at (h, w, C), from the
    slope between two chain depths."""
    rng = np.random.RandomState(0)
    half = c // 2
    x = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (B, h, w, c)).astype(np.float32)).astype(jnp.bfloat16))
    k1f = rng.normal(0, 0.05, (1, 1, c, half)).astype(np.float32)
    k3f = rng.normal(0, 0.05, (3, 3, half, c)).astype(np.float32)
    b1 = jax.device_put(jnp.asarray(rng.normal(0, 0.01, (half,)).astype(np.float32)))
    b3 = jax.device_put(jnp.asarray(rng.normal(0, 0.01, (c,)).astype(np.float32)))
    if int8:
        s1 = np.maximum(np.abs(k1f).max(axis=(0, 1, 2)), 1e-12) / 127.0
        s3 = np.maximum(np.abs(k3f).max(axis=(0, 1, 2)), 1e-12) / 127.0
        args = (x,
                jax.device_put(jnp.asarray(
                    np.clip(np.round(k1f / s1), -127, 127).astype(np.int8))),
                jax.device_put(jnp.asarray(s1.astype(np.float32))),
                jax.device_put(jnp.asarray(
                    np.clip(np.round(k3f / s3), -127, 127).astype(np.int8))),
                jax.device_put(jnp.asarray(s3.astype(np.float32))),
                b1, b3,
                jax.device_put(jnp.asarray(np.float32(1 / 127.0))),
                jax.device_put(jnp.asarray(np.float32(1 / 127.0))))
        runner = _CHAIN_INT8
    else:
        args = (x,
                jax.device_put(jnp.asarray(k1f, jnp.bfloat16)),
                jax.device_put(jnp.asarray(np.zeros(1, np.float32))),  # unused slot
                jax.device_put(jnp.asarray(k3f, jnp.bfloat16)),
                jax.device_put(jnp.asarray(np.zeros(1, np.float32))),  # unused slot
                b1, b3,
                jax.device_put(jnp.asarray(np.float32(1.0))),
                jax.device_put(jnp.asarray(np.float32(1.0))))
        runner = _CHAIN_BF16

    def measure(m):
        def call():
            return runner(*args, m=m, iters=ITERS)

        float(call())

        def one():
            t0 = time.perf_counter()
            float(call())
            return time.perf_counter() - t0

        return min(one(), one()) / ITERS * 1000.0

    m_lo, m_hi = depths
    return (measure(m_hi) - measure(m_lo)) / (m_hi - m_lo)


def chain_mode(bf16: bool) -> None:
    stages = [  # (H, W, C, pairs in tower incl. head re-use of the shapes)
        (72, 104, 128, 2),
        (36, 52, 256, 11),
        (18, 26, 512, 11),
        (9, 13, 1024, 7),
    ]
    print(f"backend: {jax.devices()[0].platform}; batch {B}; chain-slope "
          f"mode (per residual pair: 1x1 C->C/2 + 3x3 C/2->C)", flush=True)
    hdr = ("| HxW | C | pairs | ms/pair int8 | pair TOPS | % of peak "
           "| ms/pair pure-s8 | pure TOPS | glue share |")
    if bf16:
        hdr += " ms/pair bf16 | int8 speedup |"
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    total_int8 = total_pure = 0.0
    for h, w, c, n in stages:
        flops_pair = 2 * h * w * (c * (c // 2) + 9 * (c // 2) * c) * B
        ms = time_chain(h, w, c, int8=True)
        msp = time_chain_pure(h, w, c)
        total_int8 += ms * n
        total_pure += msp * n
        tops = flops_pair / (ms / 1000) / 1e12
        topsp = flops_pair / (msp / 1000) / 1e12
        row = (f"| {h}x{w} | {c} | {n} | {ms:.3f} | {tops:.0f} | "
               f"{100*tops/INT8_PEAK_TOPS:.0f}% | {msp:.3f} | {topsp:.0f} | "
               f"{100*(ms-msp)/ms:.0f}% |")
        if bf16:
            msb = time_chain(h, w, c, int8=False)
            row += f" {msb:.3f} | {msb/ms:.2f}x |"
        print(row, flush=True)
    print(f"\nbody pairs total: int8 {total_int8:.1f} ms, pure-s8 "
          f"{total_pure:.1f} ms / {B} frames")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=0,
                    help="only the N biggest FLOP-share classes (0 = all)")
    ap.add_argument("--bf16", action="store_true",
                    help="also time the bf16 conv per class")
    ap.add_argument("--chain", action="store_true",
                    help="chain-slope mode: marginal ms per residual pair "
                         "(cancels the isolated harness's fixed overhead)")
    args = ap.parse_args()
    if args.chain:
        chain_mode(args.bf16)
        return

    shapes = shape_classes()
    total_flops = sum(n * f for n, f in shapes.values())
    ranked = sorted(shapes.items(), key=lambda kv: -kv[1][0] * kv[1][1])
    if args.top:
        ranked = ranked[: args.top]

    print(f"backend: {jax.devices()[0].platform}; batch {B}; canvas {CANVAS}; "
          f"{len(ranked)}/{len(shapes)} classes; total {total_flops/1e9:.1f} GFLOP/frame",
          flush=True)
    hdr = ("| HxW | Cin->Cout | k | s | n | share | ms(all,int8) | TOPS "
           f"| % of {INT8_PEAK_TOPS:.0f}T |")
    if args.bf16:
        hdr += " ms(all,bf16) | bf16 TF/s | int8 speedup |"
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))

    tot_ms = 0.0
    rows = []
    for key, (n, f1) in ranked:
        h, w, cin, cout, k, s = key
        ms1 = time_class(key)
        ms = ms1 * n
        tot_ms += ms
        tops = f1 * B / (ms1 / 1000) / 1e12
        row = (f"| {h}x{w} | {cin}->{cout} | {k} | {s} | {n} | "
               f"{100*n*f1/total_flops:.1f}% | {ms:.2f} | {tops:.0f} | "
               f"{100*tops/INT8_PEAK_TOPS:.0f}% |")
        if args.bf16:
            msb1 = time_class(key, bf16=True)
            tfs = f1 * B / (msb1 / 1000) / 1e12
            row += f" {msb1*n:.2f} | {tfs:.0f} | {msb1/ms1:.2f}x |"
        rows.append(row)
        print(row, flush=True)
    print(f"\nsum of isolated int8 classes: {tot_ms:.1f} ms / {B} frames "
          f"(full measured graph ~28.6 ms incl. decode/shortcut/route glue)")


if __name__ == "__main__":
    main()
