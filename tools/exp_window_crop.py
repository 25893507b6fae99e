"""Experiment: bbox-windowed Pallas crop vs the full-width kernels.

Times, interleaved in one process on the real chip (the only A/B discipline
that survives this environment's relay drift -- docs/PERF.md):
  A. ops.crop.crop_batch (jnp separable matmuls, bf16)
  B. ops.resample_pallas.crop_batch_pallas (full-width kernel)
  C. ops.resample_pallas.crop_batch_pallas_windowed (window=384 and 512)
with realistic person-box widths (~180-220 px of an 800-px frame), plus the
output deltas. The windowed kernel DMAs/casts/multiplies ~W/window times
less per frame; this measures how much of that theoretical cut survives the
kernel's extra grid steps and accumulation traffic.

Usage: python tools/exp_window_crop.py [batch]
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

import functools  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from poserisk_release_tpu.ops.crop import crop_batch  # noqa: E402
from poserisk_release_tpu.ops.resample_pallas import (  # noqa: E402
    _crop_coords,
    _load_channel,
    _resample,
    _taps_from_coords,
    crop_batch_pallas,
    crop_batch_pallas_windowed,
    crop_window_fits,
)


def _multi_kernel(bbox_ref, frame_ref, crop_ref, *, H, W, out_size, scale,
                  acc_dtype, fpb):
    """crop_batch_pallas with `fpb` frames per program: fewer, bigger grid
    steps -- probes whether the 1-frame kernel is grid-latency-bound."""
    b0 = pl.program_id(0) * fpb
    inv255 = 1.0 / 255.0
    for f in range(fpb):
        b = b0 + f
        # The library's ONE sampling-convention definition, at an explicit
        # frame index (an inline copy here would silently diverge from the
        # kernels this probe compares against).
        ys, xs = _crop_coords(bbox_ref, out_size, scale, b)
        t_c = _taps_from_coords(ys, H, lane_axis=1).astype(acc_dtype)
        s_c_t = _taps_from_coords(xs, W, lane_axis=0).astype(acc_dtype)
        for c in range(3):
            x = (frame_ref[f, c].astype(jnp.int32).astype(jnp.float32)
                 .astype(acc_dtype))
            cr = _resample(x, t_c, s_c_t, acc_dtype)
            crop_ref[f, c] = (cr * inv255).astype(crop_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fpb",))
def crop_batch_pallas_multi(frames, bboxes, fpb=2):
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    assert B % fpb == 0
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2))
    out = pl.pallas_call(
        functools.partial(_multi_kernel, H=H, W=W, out_size=224, scale=1.2,
                          acc_dtype=jnp.bfloat16, fpb=fpb),
        grid=(B // fpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((fpb, 3, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fpb, 3, 224, 224), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, 224, 224), jnp.bfloat16),
    )(bboxes.astype(jnp.float32), frames_chw)
    return jnp.transpose(out, (0, 2, 3, 1))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MEASURE = 24


def timeit(fn, *args, label=""):
    def sync(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    sync(fn(*args))
    sync(fn(*args))

    def one_pass():
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(MEASURE)]
        acc = jnp.float32(0)
        for o in outs:
            acc = acc + jnp.sum(o.astype(jnp.float32))
        float(acc)
        return time.perf_counter() - t0

    el = min(one_pass(), one_pass())
    ms = el / MEASURE * 1000
    print(f"{label}: {ms:.2f} ms / {B} frames", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, 450, 800, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    # Realistic tracked-person geometry: centers drift across the frame,
    # widths 180-220 px (fits the 512 window: 220*1.2+2+127=393), heights
    # 300-430 px. The 384-window row uses narrower boxes (<= 210*1.2 span).
    bboxes_np = np.stack(
        [
            rng.uniform(150, 650, B),
            rng.uniform(180, 270, B),
            rng.uniform(180, 220, B),
            rng.uniform(300, 430, B),
        ],
        axis=1,
    ).astype(np.float32)
    assert crop_window_fits(bboxes_np, window=512)
    narrow_np = bboxes_np.copy()
    narrow_np[:, 2] = rng.uniform(140, 210, B)
    assert crop_window_fits(narrow_np, window=384)
    bboxes = jnp.asarray(bboxes_np)
    narrow = jnp.asarray(narrow_np)

    jnp_crop = jax.jit(
        lambda f, b: crop_batch(f, b, compute_dtype=jnp.bfloat16)
    )
    full = jax.jit(lambda f, b: crop_batch_pallas(f, b))
    win384 = jax.jit(lambda f, b: crop_batch_pallas_windowed(f, b, window=384))
    win512 = jax.jit(lambda f, b: crop_batch_pallas_windowed(f, b, window=512))

    ref = np.asarray(full(frames, bboxes)).astype(np.float32)
    delta = np.abs(np.asarray(win512(frames, bboxes)).astype(np.float32) - ref)
    print(f"win512 vs full kernel: max|d|={delta.max():.5f} "
          f"mean|d|={delta.mean():.6f}", flush=True)
    ref_n = np.asarray(full(frames, narrow)).astype(np.float32)
    delta = np.abs(np.asarray(win384(frames, narrow)).astype(np.float32) - ref_n)
    print(f"win384 vs full kernel (narrow boxes): max|d|={delta.max():.5f} "
          f"mean|d|={delta.mean():.6f}", flush=True)

    multi2 = jax.jit(lambda f, b: crop_batch_pallas_multi(f, b, fpb=2))
    multi4 = jax.jit(lambda f, b: crop_batch_pallas_multi(f, b, fpb=4))
    delta = np.abs(np.asarray(multi2(frames, bboxes)).astype(np.float32) - ref)
    print(f"multi2 vs full kernel: max|d|={delta.max():.5f}", flush=True)

    results = {}
    for name, fn, bb in (
        ("jnp bf16", jnp_crop, bboxes),
        ("pallas full", full, bboxes),
        ("pallas win512", win512, bboxes),
        ("pallas win384 (narrow)", win384, narrow),
        ("pallas 2-frames/program", multi2, bboxes),
        ("pallas 4-frames/program", multi4, bboxes),
    ):
        results[name] = timeit(fn, frames, bb, label=name)
    base = results["pallas full"]
    for name, ms in results.items():
        print(f"{name}: {base / ms:.2f}x vs full kernel")


if __name__ == "__main__":
    main()
