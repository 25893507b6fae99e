"""LBS parity: JAX SMPL forward vs a torch restatement of smplpytorch math."""

import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.body import smpl as body
from poserisk_release_tpu.ops.lbs import LBS, joints_only
from tests.oracles import torch_smpl


@pytest.fixture(scope="module")
def small_model():
    return body.SMPLModel.from_arrays(body.synthetic_smpl_arrays(num_verts=200, seed=7))


@pytest.fixture(scope="module")
def full_model():
    return body.SMPLModel.from_arrays(body.synthetic_smpl_arrays(seed=3))


def _arrays(model):
    return {
        "v_template": model.v_template,
        "shapedirs": model.shapedirs,
        "posedirs": model.posedirs,
        "J_regressor": model.J_regressor,
        "weights": model.weights,
        "kintree_parents": model.kintree_parents,
        "betas": model.betas,
    }


def test_zero_pose_gives_rest(small_model):
    lbs = LBS(small_model)
    verts, joints = lbs(np.zeros((1, 72), np.float32))
    np.testing.assert_allclose(np.asarray(verts)[0], small_model.v_template, atol=1e-5)
    rest_joints = small_model.J_regressor @ small_model.v_template
    np.testing.assert_allclose(np.asarray(joints)[0], rest_joints, atol=1e-5)


@pytest.mark.parametrize("batch", [1, 5])
def test_matches_torch_reference(small_model, rng, batch):
    lbs = LBS(small_model)
    pose = rng.uniform(-1.0, 1.0, size=(batch, 72)).astype(np.float32)
    verts, joints = lbs(pose)
    want_verts, want_joints = torch_smpl.smpl_forward(_arrays(small_model), pose)
    np.testing.assert_allclose(np.asarray(verts), want_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_joints, atol=2e-5)


def test_nonzero_betas(small_model, rng):
    lbs = LBS(small_model)
    pose = rng.uniform(-0.8, 0.8, size=(3, 72)).astype(np.float32)
    betas = rng.normal(scale=1.5, size=(3, 10)).astype(np.float32)
    verts, joints = lbs(pose, betas)
    want_verts, want_joints = torch_smpl.smpl_forward(_arrays(small_model), pose, betas)
    np.testing.assert_allclose(np.asarray(verts), want_verts, atol=3e-5)
    np.testing.assert_allclose(np.asarray(joints), want_joints, atol=3e-5)


def test_translation(small_model, rng):
    lbs = LBS(small_model)
    pose = rng.uniform(-0.5, 0.5, size=(2, 72)).astype(np.float32)
    trans = rng.normal(size=(2, 3)).astype(np.float32)
    verts, joints = lbs(pose, None, trans)
    want_verts, want_joints = torch_smpl.smpl_forward(_arrays(small_model), pose, None, trans)
    np.testing.assert_allclose(np.asarray(verts), want_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_joints, atol=2e-5)


def test_root_pose_pi_convention(small_model):
    """The scoring path forces root pose (3.14, 0, 0); make sure that pose
    (theta ~ pi) stays numerically healthy through the quaternion path."""
    lbs = LBS(small_model)
    pose = np.zeros((1, 72), np.float32)
    pose[0, 0] = 3.14
    verts, joints = lbs(pose)
    want_verts, want_joints = torch_smpl.smpl_forward(_arrays(small_model), pose)
    np.testing.assert_allclose(np.asarray(verts), want_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_joints, atol=2e-5)


def test_joints_only_fast_path(small_model, rng):
    """joints_only must agree with the full forward's joint output."""
    from poserisk_release_tpu.ops.lbs import smpl_params_to_jax

    lbs = LBS(small_model)
    pose = rng.uniform(-1.0, 1.0, size=(4, 72)).astype(np.float32)
    _, joints_full = lbs(pose)
    joints_fast = joints_only(smpl_params_to_jax(small_model), jnp.asarray(pose), lbs.parents)
    np.testing.assert_allclose(np.asarray(joints_fast), np.asarray(joints_full), atol=1e-5)


def test_full_size_shapes(full_model):
    lbs = LBS(full_model)
    verts, joints = lbs(np.zeros((2, 72), np.float32))
    assert verts.shape == (2, 6890, 3)
    assert joints.shape == (2, 24, 3)


def test_pkl_conversion_roundtrip(tmp_path):
    """convert_pkl_to_npz must survive a chumpy-pickled asset without chumpy."""
    import pickle
    import sys
    import types

    arrays = body.synthetic_smpl_arrays(num_verts=50, seed=1)

    # Build a fake chumpy module so we can pickle "chumpy" objects, then
    # remove it to prove the converter needs no chumpy at load time.
    fake = types.ModuleType("chumpy")
    fake_ch = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = x

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    fake_ch.Ch = Ch
    fake.ch = fake_ch
    sys.modules["chumpy"] = fake
    sys.modules["chumpy.ch"] = fake_ch
    try:
        import scipy.sparse as sp

        payload = {
            "v_template": Ch(arrays["v_template"]),
            "shapedirs": Ch(arrays["shapedirs"]),
            "posedirs": Ch(arrays["posedirs"]),
            "J_regressor": sp.csc_matrix(arrays["J_regressor"]),
            "weights": Ch(arrays["weights"]),
            "kintree_table": np.stack(
                [arrays["kintree_parents"], np.arange(24)]
            ),
            "f": arrays["faces"],
            "betas": Ch(arrays["betas"]),
            "bs_type": "lrotmin",
        }
        pkl = tmp_path / "SMPL_NEUTRAL.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(payload, f)
    finally:
        del sys.modules["chumpy"]
        del sys.modules["chumpy.ch"]

    npz = tmp_path / "SMPL_NEUTRAL.npz"
    body.convert_pkl_to_npz(str(pkl), str(npz))
    model = body.SMPLModel.load(str(tmp_path), "neutral", allow_synthetic=False)
    np.testing.assert_allclose(model.v_template, arrays["v_template"])
    np.testing.assert_allclose(model.J_regressor, arrays["J_regressor"])
    assert model.kintree_parents.tolist() == arrays["kintree_parents"].tolist()


def test_extended_regressor_rows(full_model):
    reg = full_model.extended_joint_regressor()
    assert reg.shape == (29, full_model.num_verts)
    for row, vidx in zip(range(24, 29), body.FACE_KPS_VERTEX):
        assert reg[row, vidx] == 1.0
        assert reg[row].sum() == 1.0


def test_vertex_segmentation_and_part_colors(full_model):
    seg = full_model.vertex_segmentation()
    assert seg.shape == (full_model.num_verts,)
    assert seg.min() >= 0 and seg.max() < full_model.num_joints
    # Each vertex's dominant joint carries its largest weight.
    w = full_model.weights
    assert (w[np.arange(len(seg)), seg] == w.max(axis=1)).all()

    from poserisk_release_tpu.body.smpl import PART_SEGMENTS_COLOR

    assert len(PART_SEGMENTS_COLOR) == 24


class TestPerFrameQuirks:
    """The reference applies its all-zero fallbacks ONE FRAME AT A TIME
    (smpl_layer runs per frame), so in a mixed batch each frame takes its
    own branch -- a batch-global norm would leak one frame's betas/trans
    into another's decision. Template betas are NONZERO here: the suite's
    synthetic models carry zero template betas, which made the fallback
    untestable (a regression to plain zero betas would have passed)."""

    @pytest.fixture(scope="class")
    def template_model(self):
        arrays = body.synthetic_smpl_arrays(num_verts=200, seed=11)
        arrays["betas"] = np.linspace(-0.5, 0.5, 10).astype(np.float32)
        return body.SMPLModel.from_arrays(arrays)

    def test_mixed_batch_betas_fallback_is_per_frame(self, template_model):
        lbs = LBS(template_model)
        pose = np.zeros((2, 72), np.float32)
        betas = np.stack([np.zeros(10, np.float32),
                          np.full(10, 0.3, np.float32)])
        verts, _ = lbs(pose, betas)

        v_tpl, _ = lbs(pose[:1], template_model.betas[None].astype(np.float32))
        v_03, _ = lbs(pose[1:], betas[1:])
        # Frame 0 (all-zero betas) takes the template fallback; frame 1
        # keeps its own betas -- independent of sharing a batch.
        np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(v_tpl[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(verts[1]), np.asarray(v_03[0]),
                                   atol=1e-6)
        # And the fallback is NOT a zero-betas forward (template != 0 here).
        v_zero_request = np.asarray(verts[0])
        v_true_zero = np.asarray(lbs(pose[:1], betas[1:] * 0 + 1e-8)[0][0])
        assert np.abs(v_zero_request - v_true_zero).max() > 1e-4

    def test_mixed_batch_trans_gate_is_per_frame(self, template_model):
        lbs = LBS(template_model)
        pose = np.zeros((2, 72), np.float32)
        trans = np.stack([np.zeros(3, np.float32),
                          np.array([0.1, -0.2, 0.3], np.float32)])
        verts, joints = lbs(pose, None, trans)
        # Frame 0 untranslated, frame 1 shifted by its own trans.
        np.testing.assert_allclose(np.asarray(verts[0]),
                                   np.asarray(lbs(pose[:1])[0][0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(joints[1] - joints[0]),
            np.broadcast_to(trans[1], joints[0].shape), atol=1e-5)

    def test_mixed_batch_matches_torch_oracle(self, template_model):
        """Close the truth-link loop: the torch restatement of SMPL_Layer
        (per-frame fallback/trans gates, like the reference's one-frame
        loop) agrees with the product LBS on a batch mixing zero and
        non-zero betas AND zero and non-zero trans."""
        from tests.oracles import torch_smpl

        pose = np.random.RandomState(3).uniform(
            -0.4, 0.4, (3, 72)).astype(np.float32)
        betas = np.stack([np.zeros(10, np.float32),
                          np.full(10, 0.25, np.float32),
                          np.linspace(-0.2, 0.2, 10).astype(np.float32)])
        trans = np.stack([np.array([0.2, 0.0, -0.1], np.float32),
                          np.zeros(3, np.float32),
                          np.array([-0.05, 0.3, 0.0], np.float32)])
        want_v, want_j = torch_smpl.smpl_forward(
            _arrays(template_model), pose, betas, trans)
        got_v, got_j = LBS(template_model)(pose, betas, trans)
        np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_j), want_j, atol=2e-5)

    def test_pallas_path_matches_per_frame_fallback(self, template_model):
        """use_pallas=True (interpret mode off-TPU, the module docstring's
        promised fallback -- no monkeypatch) agrees with the jnp path on
        the mixed batch, including the precontracted rest-joint math."""
        pose = np.random.RandomState(0).uniform(
            -0.3, 0.3, (2, 72)).astype(np.float32)
        betas = np.stack([np.zeros(10, np.float32),
                          np.full(10, 0.2, np.float32)])
        ref_v, ref_j = LBS(template_model)(pose, betas)
        pal_v, pal_j = LBS(template_model, use_pallas=True)(pose, betas)
        np.testing.assert_allclose(np.asarray(pal_v), np.asarray(ref_v),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(pal_j), np.asarray(ref_j),
                                   atol=2e-5)
