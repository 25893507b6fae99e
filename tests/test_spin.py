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
