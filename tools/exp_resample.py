"""Experiment: fused Pallas letterbox+crop vs the separate jnp resamples.

Times, on the real chip in one process:
  A. letterbox_device_rect(bf16) + crop_batch(bf16)  (current bench path)
  B. ops.resample_pallas.fused_letterbox_crop (one HBM read per frame)
and reports the bf16 output deltas between the two.
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

from poserisk_release_tpu.ops.crop import crop_batch, letterbox_device_rect  # noqa: E402
from poserisk_release_tpu.ops.resample_pallas import fused_letterbox_crop  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MEASURE = 24


def timeit(fn, *args, label=""):
    def sync(out):
        lt, cr = out
        return float(jnp.sum(lt.astype(jnp.float32)) + jnp.sum(cr.astype(jnp.float32)))

    sync(fn(*args))
    sync(fn(*args))

    def one_pass():
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(MEASURE)]
        acc = jnp.float32(0)
        for lt, cr in outs:
            acc = acc + jnp.sum(lt.astype(jnp.float32)) + jnp.sum(cr.astype(jnp.float32))
        float(acc)
        return time.perf_counter() - t0

    el = min(one_pass(), one_pass())
    ms = el / MEASURE * 1000
    print(f"{label}: {ms:.2f} ms / {B} frames", flush=True)
    return ms


def main():
    frames = jax.jit(
        lambda k: jax.random.randint(k, (B, 450, 800, 3), 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(0))
    bboxes = jnp.asarray(
        np.tile(np.array([400.0, 225.0, 220.0, 220.0], np.float32), (B, 1))
    )

    jnp_pair = jax.jit(
        lambda f, b: (
            letterbox_device_rect(f, 416, compute_dtype=jnp.bfloat16),
            crop_batch(f, b, scale=1.2, out_size=224, compute_dtype=jnp.bfloat16),
        )
    )
    fused = jax.jit(
        lambda f, b: fused_letterbox_crop(f, b, compute_dtype=jnp.bfloat16)
    )

    lt_a, cr_a = jnp_pair(frames, bboxes)
    lt_b, cr_b = fused(frames, bboxes)
    dl = float(jnp.max(jnp.abs(lt_a.astype(jnp.float32) - lt_b.astype(jnp.float32))))
    dc = float(jnp.max(jnp.abs(cr_a.astype(jnp.float32) - cr_b.astype(jnp.float32))))
    print(f"bf16 deltas: letterbox {dl * 255:.2f}/255, crop {dc * 255:.2f}/255",
          flush=True)

    a = timeit(jnp_pair, frames, bboxes, label="A jnp letterbox+crop (bf16)")
    b = timeit(fused, frames, bboxes, label="B fused pallas")
    print(f"speedup: {a / b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
