"""Fused int8 YOLO residual-stage kernel: semantics vs the product chain.

ops/yolo_stage_pallas.fused_residual_stage is a measured-NEGATIVE
optimization on the real chip (0.45-0.79x vs the XLA per-conv graph on
all three stage shapes -- docs/PERF.md round 3) and ships as experiment
evidence, not as a product path. These tests pin its arithmetic so the
negative result stays reproducible: the kernel must be numerically
equivalent to an f32-stream per-conv chain built from the SAME quantized
params (s8 matmuls are integer-exact, so any drift would mean the kernel
computes a different function than what was benchmarked).

Runs in Pallas interpret mode on the CPU suite (no TPU lowering).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.models import detector as det
from poserisk_release_tpu.ops.crop import letterbox_device_rect
from poserisk_release_tpu.ops.yolo_stage_pallas import (
    fused_residual_stage,
    pack_yolo_stage,
)

# The C256 residual stage of the canonical yolov3.cfg: spec index of its
# first 1x1 conv and its block count (matches tools/exp_fused_stage.py).
STAGE_START, STAGE_BLOCKS = 13, 8


@pytest.fixture(scope="module")
def qparams():
    params = det.init_yolo_params(seed=0)
    folded = det.fold_bn_params(params)
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 200, (2, 53, 80, 3)).astype(np.uint8)
    letter = letterbox_device_rect(jnp.asarray(frames), 96)
    return det.quantize_yolo_params(
        folded, det.calibrate_yolo_activations(folded, letter))


def _conv_chain_f32(h, qp, start, n_blocks):
    """The product int8 per-conv path with an f32 activation stream --
    exactly the arithmetic the fused kernel keeps VMEM-resident."""
    for j in range(n_blocks):
        k = start + 3 * j
        a = det._conv_block(h, qp[f"conv_{k}"], det.YOLOV3_SPEC[k],
                            jnp.float32)
        b = det._conv_block(a, qp[f"conv_{k + 1}"], det.YOLOV3_SPEC[k + 1],
                            jnp.float32)
        h = h + b
    return h


class TestFusedStage:
    def test_matches_f32_stream_conv_chain(self, qparams):
        rng = np.random.RandomState(0)
        h = jnp.asarray(
            rng.uniform(-0.5, 2.0, (2, 6, 8, 256)).astype(np.float32))
        pack = pack_yolo_stage(qparams, STAGE_START, STAGE_BLOCKS)
        got = np.asarray(fused_residual_stage(
            h, pack, STAGE_BLOCKS, interpret=True))
        want = np.asarray(_conv_chain_f32(
            h, qparams, STAGE_START, STAGE_BLOCKS))
        assert got.shape == want.shape == (2, 6, 8, 256)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
        # s8 matmuls are integer-exact; the only float ops are the shared
        # epilogues, so the chains should agree far tighter than the bf16
        # product-graph rounding class.
        assert float(np.abs(got - want).max()) < 1e-4

    def test_preserves_input_dtype(self, qparams):
        h = jnp.zeros((1, 6, 8, 256), jnp.bfloat16)
        pack = pack_yolo_stage(qparams, STAGE_START, STAGE_BLOCKS)
        out = fused_residual_stage(h, pack, STAGE_BLOCKS, interpret=True)
        assert out.dtype == jnp.bfloat16

    def test_pack_requires_quantized_tower(self):
        folded = det.fold_bn_params(det.init_yolo_params(seed=0))
        with pytest.raises(ValueError, match="whole-tower int8"):
            pack_yolo_stage(folded, STAGE_START, STAGE_BLOCKS)

    def test_pack_shapes(self, qparams):
        pack = pack_yolo_stage(qparams, STAGE_START, STAGE_BLOCKS)
        n, C, half = STAGE_BLOCKS, 256, 128
        assert pack["qk1"].shape == (n, C, half)
        assert pack["qk3"].shape == (n, 9 * half, C)
        assert pack["qk1"].dtype == np.int8 and pack["qk3"].dtype == np.int8
        assert pack["d1"].shape == (n, 1, half)
        assert pack["b3"].shape == (n, 1, C)
        assert pack["inv_s"].shape == (n, 2)
