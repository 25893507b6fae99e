"""Folded / int8-PTQ SPIN backbone (models/resnet_int8, spin.hmr_forward_quant)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poserisk_release_tpu.body.smpl import SMPLFamily
from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.models.resnet import ResNet50
from poserisk_release_tpu.models.resnet_int8 import (
    bias_correct_resnet50,
    calibrate_resnet50,
    fold_resnet50_params,
    quantize_resnet50,
    resnet50_forward,
)
from poserisk_release_tpu.models.spin import HMR, hmr_forward_quant
from poserisk_release_tpu.pipeline import PoseEstimator


@pytest.fixture(scope="module")
def estimator(small_chunk_config):
    return PoseEstimator(
        small_chunk_config, SMPLFamily(small_chunk_config.SPIN.smpl_model_dir)
    )


@pytest.fixture(scope="module")
def crops(rng):
    return jnp.asarray(rng.rand(4, 224, 224, 3).astype(np.float32))


@pytest.fixture(scope="module")
def folded(estimator):
    return fold_resnet50_params(estimator.variables)


def test_folded_matches_flax_backbone(estimator, folded, crops):
    """BN folding is exact (to f32 rounding): the functional folded forward
    reproduces the Flax ResNet50 to ~1e-5."""
    bb_vars = {"params": estimator.variables["params"]["backbone"]}
    if "batch_stats" in estimator.variables:
        bb_vars["batch_stats"] = estimator.variables["batch_stats"]["backbone"]
    ref = ResNet50().apply(bb_vars, crops)
    got = jax.jit(lambda f, c: resnet50_forward(f, c, jnp.float32))(folded, crops)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_int8_backbone_bounded_drift(estimator, folded, crops):
    """int8 PTQ features stay within ~1-2% of the float features even under
    random-init weights (which AMPLIFY per-layer quantization noise --
    trained weights behave better; docs/PARITY.md)."""
    bb_vars = {"params": estimator.variables["params"]["backbone"]}
    if "batch_stats" in estimator.variables:
        bb_vars["batch_stats"] = estimator.variables["batch_stats"]["backbone"]
    ref = np.asarray(ResNet50().apply(bb_vars, crops))
    scales = calibrate_resnet50(folded, crops[:2])
    q = quantize_resnet50(folded, scales)
    assert all("qkernel" in layer for layer in q.values())
    got = np.asarray(jax.jit(lambda f, c: resnet50_forward(f, c, jnp.float32))(q, crops))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05


def test_bias_correction_reduces_feature_error(estimator, folded, crops):
    """PTQ bias correction (quantize_spin_backbone default) folds the mean
    per-channel quantization error into the biases: the quantized features
    must land measurably closer to the float features. Measured on this
    random-init model: ~2.6x lower feature MAE, median angle drift halved
    (docs/PARITY.md)."""
    ref = np.asarray(
        jax.jit(lambda f, c: resnet50_forward(f, c, jnp.float32))(folded, crops)
    )
    scales = calibrate_resnet50(folded, crops[:2])
    q = quantize_resnet50(folded, scales)
    q_bc = bias_correct_resnet50(folded, q, crops[:2])
    fwd = jax.jit(lambda f, c: resnet50_forward(f, c, jnp.float32))
    mae_plain = np.abs(np.asarray(fwd(q, crops)) - ref).mean()
    mae_bc = np.abs(np.asarray(fwd(q_bc, crops)) - ref).mean()
    assert mae_bc < mae_plain * 0.8
    assert set(q_bc) == set(q)


def test_percentile_calibration_scales_and_forward(estimator, folded, crops):
    """Saturating (percentile) calibration yields per-tensor scales <= absmax
    and a working quantized forward. The option targets trained checkpoints
    (outlier channels); on random weights it measures neutral, so absmax
    stays the default (models/spin.quantize_spin_backbone)."""
    absmax = calibrate_resnet50(folded, crops[:2])
    pct = calibrate_resnet50(folded, crops[:2], percentile=99.9)
    assert set(pct) == set(absmax)
    assert all(pct[k] <= absmax[k] + 1e-9 for k in absmax)
    q = quantize_resnet50(folded, pct)
    feat = jax.jit(lambda f, c: resnet50_forward(f, c, jnp.float32))(q, crops[:2])
    assert np.isfinite(np.asarray(feat)).all()


def test_quant_hmr_head_math_identical(estimator, folded, crops):
    """hmr_forward_quant with the FLOAT folded backbone must reproduce
    HMR.apply exactly (same head math, BN folding is the only difference)."""
    model = HMR(n_iter=3)
    r_ref, s_ref, c_ref = model.apply(estimator.variables, crops)
    r_q, s_q, c_q = jax.jit(
        lambda f, v, c: hmr_forward_quant(f, v, c, 3, jnp.float32)
    )(folded, estimator.variables, crops)
    np.testing.assert_allclose(np.asarray(r_q), np.asarray(r_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(c_q), np.asarray(c_ref), atol=5e-4)


def test_pose_estimator_spin_int8_lifecycle(small_chunk_config, rng):
    """The product surface for the int8 backbone (Predictor --spin_int8):
    the estimator quantizes on the FIRST batch it processes (fold +
    calibrate + bias-correct) and then scores through the int8 core."""
    est = PoseEstimator(
        small_chunk_config, SMPLFamily(small_chunk_config.SPIN.smpl_model_dir),
        spin_int8=True,
    )
    assert est._quant_backbone is None
    frames = rng.randint(0, 255, (8, 96, 128, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([64.0, 48.0, 40.0, 60.0], np.float32), (8, 1))
    euler, joint_cam, _aa = est.run_from_frames(frames, np.arange(8), bboxes)
    assert est._quant_backbone is not None  # calibrated during the run
    assert euler.shape == (8, 24, 3) and np.isfinite(np.asarray(euler)).all()
    assert joint_cam.shape == (8, 24, 3)


def test_quant_pose_core_runs(estimator, folded, crops):
    """The throughput pose core accepts a quantized backbone and produces
    valid rotations end to end."""
    from poserisk_release_tpu.throughput import make_pose_core

    scales = calibrate_resnet50(folded, crops[:2])
    q = quantize_resnet50(folded, scales)
    core = make_pose_core(3, estimator.parents, jnp.float32, quant_backbone=q)
    euler, joint_cam, aa = jax.jit(core)(
        estimator.variables, estimator.smpl_params, crops
    )
    assert euler.shape == (4, 24, 3) and np.isfinite(np.asarray(euler)).all()
    assert joint_cam.shape == (4, 24, 3)
    np.testing.assert_allclose(
        np.asarray(aa)[:, 0], np.tile([3.14, 0.0, 0.0], (4, 1)), atol=1e-6
    )


class TestMinStageBoundary:
    def test_min_stage_3_quantizes_only_deep_stages(self, folded, crops):
        scales = calibrate_resnet50(folded, crops)
        q = quantize_resnet50(folded, scales, min_stage=3)
        for name, layer in q.items():
            deep = name.startswith(("layer3", "layer4"))
            assert ("qkernel" in layer) == deep, name
        # 6*3+1 (layer3) + 3*3+1 (layer4) = 29 quantized convs
        assert sum(1 for l in q.values() if "qkernel" in l) == 29

    def test_min_stage_forward_bounds_drift_below_whole_int8(
        self, folded, crops
    ):
        """Fewer quantized layers must not drift MORE than the whole-tower
        int8 backbone (the accuracy rationale for min_stage=3)."""
        ref = np.asarray(resnet50_forward(folded, crops, jnp.float32))
        scales = calibrate_resnet50(folded, crops)

        def mae(q):
            out = np.asarray(resnet50_forward(q, crops, jnp.float32))
            return float(np.abs(out - ref).mean())

        mae_whole = mae(quantize_resnet50(folded, scales))
        mae_mixed = mae(quantize_resnet50(folded, scales, min_stage=3))
        assert mae_mixed <= mae_whole * 1.05  # allow measurement-level slack
        assert mae_mixed < 0.05

    def test_min_stage_above_deepest_raises(self, folded, crops):
        scales = calibrate_resnet50(folded, crops)
        with pytest.raises(ValueError, match="zero convs"):
            quantize_resnet50(folded, scales, min_stage=5)

    def test_bias_correction_skips_float_layers(self, folded, crops):
        scales = calibrate_resnet50(folded, crops)
        q = quantize_resnet50(folded, scales, min_stage=3)
        qc = bias_correct_resnet50(folded, q, crops)
        # Float shallow layers are untouched (same object semantics: bias
        # unchanged); quantized deep layers got a correction term.
        np.testing.assert_array_equal(
            np.asarray(q["conv1"]["bias"]), np.asarray(qc["conv1"]["bias"]))
        assert not np.array_equal(
            np.asarray(q["layer4_0.conv2"]["bias"]),
            np.asarray(qc["layer4_0.conv2"]["bias"]))

    def test_quantize_spin_backbone_min_stage_passthrough(
        self, estimator, crops
    ):
        from poserisk_release_tpu.models.spin import quantize_spin_backbone

        q = quantize_spin_backbone(estimator.variables, crops, min_stage=4)
        quantized = {n for n, l in q.items() if "qkernel" in l}
        assert quantized == {
            "layer4_0.conv1", "layer4_0.conv2", "layer4_0.conv3",
            "layer4_0.downsample",
            "layer4_1.conv1", "layer4_1.conv2", "layer4_1.conv3",
            "layer4_2.conv1", "layer4_2.conv2", "layer4_2.conv3",
        }
