"""A/B the fused Pallas int8 residual stage vs the XLA per-conv chain.

The one evidenced gap left in the int8 detector (docs/PERF.md round 3):
the 36x52/C256 stage runs at 61% of int8 peak vs 96% for the bare s8
pair; the difference is inter-layer HBM traffic, which graph-level
changes could not remove. ops/yolo_stage_pallas.fused_residual_stage
keeps the whole stage VMEM-resident; this experiment measures it against
the product per-conv graph on the real stage shapes, interleaved in one
process.

Usage: python tools/exp_fused_stage.py [--stages 256 512 1024]
Run EXCLUSIVELY (single-tenant TPU).
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

# stage -> (spec start, n blocks, H, W on the 288x416 rect canvas)
STAGE_GEOM = {
    256: (13, 8, 36, 52),
    512: (38, 8, 18, 26),
    1024: (63, 4, 9, 13),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, nargs="*", default=[256, 512, 1024])
    args = ap.parse_args()

    import poserisk_release_tpu.models.detector as det
    from poserisk_release_tpu.ops.crop import letterbox_device_rect
    from poserisk_release_tpu.ops.yolo_stage_pallas import (
        fused_residual_stage,
        pack_yolo_stage,
    )

    params = det.init_yolo_params()
    folded = det.fold_bn_params(params)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 200, (8, 450, 800, 3)).astype(np.uint8)
    letter = letterbox_device_rect(jnp.asarray(frames), 416)
    qp = jax.device_put(det.quantize_yolo_params(
        folded, det.calibrate_yolo_activations(folded, letter)))

    def xla_chain(start, n):
        def fn(h, qp):
            for j in range(n):
                k = start + 3 * j
                a = det._conv_block(h, qp[f"conv_{k}"], det.YOLOV3_SPEC[k],
                                    jnp.bfloat16)
                b2 = det._conv_block(a, qp[f"conv_{k+1}"],
                                     det.YOLOV3_SPEC[k + 1], jnp.bfloat16)
                h = h + b2
            return h

        return fn

    def timed(call):
        # device-side accumulate + scalar readback (relay-safe barrier)
        def sync():
            return float(jnp.sum(call().astype(jnp.float32)))

        sync()

        def one():
            t0 = time.perf_counter()
            outs = [call() for _ in range(ITERS)]
            acc = jnp.float32(0)
            for o in outs:
                acc = acc + jnp.sum(o.astype(jnp.float32))
            float(acc)
            return time.perf_counter() - t0

        return min(one(), one()) / ITERS * 1000.0

    print(f"backend {jax.devices()[0].platform}; batch {B}; fused stage vs "
          f"XLA per-conv chain (rect-canvas geometry)", flush=True)
    print("| stage | HxW | blocks | XLA ms | fused ms | speedup |")
    print("|---|---|---|---|---|---|")
    for c in args.stages:
        start, n, H, W = STAGE_GEOM[c]
        # Generated ON device (a host device_put of this activation tensor
        # would cross the ~4 MB/s relay; 245 MB for the C256 stage).
        x = jax.jit(
            lambda key, H=H, W=W, c=c: jax.random.uniform(
                key, (B, H, W, c), jnp.float32, -0.5, 2.0
            ).astype(jnp.bfloat16)
        )(jax.random.PRNGKey(c))
        pack = jax.device_put(pack_yolo_stage(jax.device_get(qp), start, n))
        chain = jax.jit(xla_chain(start, n))
        ms_xla = timed(lambda: chain(x, qp))
        ms_fused = timed(lambda: fused_residual_stage(x, pack, n))
        print(f"| C{c} | {H}x{W} | {n} | {ms_xla:.2f} | {ms_fused:.2f} | "
              f"{ms_xla/ms_fused:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
