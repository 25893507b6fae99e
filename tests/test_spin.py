"""SPIN model parity: Flax HMR vs torch oracle through the weight converter."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from poserisk_release_tpu.models.convert import (
    load_flax_variables,
    save_flax_variables,
    spin_state_dict_to_flax,
)
from poserisk_release_tpu.models.spin import HMR, init_spin_params, load_mean_params
from tests.oracles.torch_hmr import randomized_torch_hmr


@pytest.fixture(scope="module")
def mean_params():
    return load_mean_params("")  # synthetic fallback (no asset in this image)


@pytest.fixture(scope="module")
def torch_model(mean_params):
    return randomized_torch_hmr(mean_params, seed=11)


@pytest.fixture(scope="module")
def flax_variables(torch_model):
    state = dict(torch_model.state_dict())
    return spin_state_dict_to_flax(state)


def test_converted_forward_matches_torch(torch_model, flax_variables, rng):
    imgs = rng.uniform(0.0, 1.0, size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_rot, t_shape, t_cam = torch_model(
            torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
        )
    model = HMR(n_iter=3)
    j_rot, j_shape, j_cam = model.apply(flax_variables, jnp.asarray(imgs))

    np.testing.assert_allclose(np.asarray(j_shape), t_shape.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_cam), t_cam.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_rot), t_rot.numpy(), atol=2e-4)


def test_rotmats_are_valid(flax_variables, rng):
    imgs = rng.uniform(0.0, 1.0, size=(3, 224, 224, 3)).astype(np.float32)
    rot, shape, cam = HMR(n_iter=3).apply(flax_variables, jnp.asarray(imgs))
    assert rot.shape == (3, 24, 3, 3)
    assert shape.shape == (3, 10)
    assert cam.shape == (3, 3)
    r = np.asarray(rot).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", r, r), np.tile(np.eye(3), (len(r), 1, 1)), atol=1e-4
    )


def test_mean_params_injected(mean_params):
    variables = init_spin_params(jax.random.PRNGKey(0), mean_params)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["init_pose"]), mean_params["init_pose"]
    )


def test_variables_roundtrip_npz(flax_variables, tmp_path):
    path = str(tmp_path / "spin.npz")
    save_flax_variables(flax_variables, path)
    loaded = load_flax_variables(path)

    flat_a = jax.tree_util.tree_leaves(flax_variables)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_converter_ignores_unknown_keys(torch_model):
    state = dict(torch_model.state_dict())
    state["smpl.v_template"] = torch.zeros(5, 3)
    state["fc.weight"] = torch.zeros(1000, 2048)
    variables = spin_state_dict_to_flax(state)
    assert "smpl" not in variables["params"]
    assert "fc" not in variables["params"]


class TestStemS2D:
    """Space-to-depth stem (models/resnet.StemConv s2d=True): the SAME 7x7
    stride-2 convolution computed as s2d(2) + 4x4/s1 over exactly
    rearranged weights -- adopted-or-not per the in-situ A/B in
    docs/PERF.md; either way the layouts must agree to accumulation
    rounding on the same parameters."""

    def test_stem_conv_layouts_agree(self, rng):
        from poserisk_release_tpu.models.resnet import StemConv

        x = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        plain = StemConv(64, s2d=False)
        variables = plain.init(jax.random.PRNGKey(2), x)
        y0 = plain.apply(variables, x)
        y1 = StemConv(64, s2d=True).apply(variables, x)
        assert y0.shape == y1.shape == (2, 112, 112, 64)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)

    def test_stem_matches_torch_conv(self, torch_model, flax_variables, rng):
        """Both layouts against the torch conv1 oracle directly."""
        from poserisk_release_tpu.models.resnet import StemConv

        imgs = rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            want = (
                torch_model.conv1(
                    torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))))
                .permute(0, 2, 3, 1).numpy())
        stem_vars = {"params": flax_variables["params"]["backbone"]["conv1"]}
        for s2d in (False, True):
            got = StemConv(64, s2d=s2d).apply(stem_vars, jnp.asarray(imgs))
            np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_hmr_s2d_same_scores(self, flax_variables, rng):
        """Through the whole regressor: the rot6d state and the integer
        scores downstream must not move beyond conv-rounding noise."""
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        r0, s0, c0 = HMR(n_iter=3).apply(flax_variables, imgs)
        r1, s1, c1 = HMR(n_iter=3, stem_s2d=True).apply(flax_variables, imgs)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-4)
