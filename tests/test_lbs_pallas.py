"""Pallas skinning kernel parity vs the jnp LBS path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.body import smpl as body
from poserisk_release_tpu.ops.lbs import LBS, smpl_params_to_jax
from poserisk_release_tpu.ops.lbs_pallas import lbs_forward_pallas


@pytest.fixture(scope="module")
def model():
    # Full-size vertex count exercises the VTILE padding path (6890 % 512 != 0).
    return body.SMPLModel.from_arrays(body.synthetic_smpl_arrays(seed=5))


def test_matches_jnp_path(model, rng):
    lbs = LBS(model)
    params = smpl_params_to_jax(model)
    pose = rng.uniform(-1.0, 1.0, size=(3, 72)).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(3, 10)).astype(np.float32)

    want_verts, want_joints = lbs(pose, betas)
    got_verts, got_joints = lbs_forward_pallas(
        params, jnp.asarray(pose), jnp.asarray(betas), lbs.parents, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_joints), np.asarray(want_joints), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_verts), np.asarray(want_verts), atol=1e-4)


def test_zero_betas_template_fallback(model):
    lbs = LBS(model)
    params = smpl_params_to_jax(model)
    pose = np.zeros((1, 72), np.float32)
    pose[0, 0] = 3.14
    want_verts, _ = lbs(pose)
    got_verts, _ = lbs_forward_pallas(
        params, jnp.asarray(pose), jnp.zeros((1, 10), jnp.float32), lbs.parents,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_verts), np.asarray(want_verts), atol=1e-4)


def test_pallas_path_applies_translation(model, rng):
    """LBS(use_pallas=True) must honor trans (post-kernel composition).
    No monkeypatch: off-TPU the class routes the kernel through interpret
    mode itself (the module docstring's promised fallback)."""
    from poserisk_release_tpu.ops.lbs import LBS

    lbs = LBS(model, use_pallas=True)
    pose = rng.uniform(-0.5, 0.5, size=(2, 72)).astype(np.float32)
    trans = rng.normal(size=(2, 3)).astype(np.float32)
    v0, j0 = lbs(pose, None, np.zeros((2, 3), np.float32))
    v1, j1 = lbs(pose, None, trans)
    np.testing.assert_allclose(np.asarray(v1) - np.asarray(v0),
                               np.broadcast_to(trans[:, None, :], v0.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1) - np.asarray(j0),
                               np.broadcast_to(trans[:, None, :], j0.shape), atol=1e-5)
