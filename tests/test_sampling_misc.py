"""Feature sampling vs torch grid_sample; converter module-prefix stripping."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from poserisk_release_tpu.models.convert import spin_state_dict_to_flax
from poserisk_release_tpu.ops.sampling import count_parameters, sample_image_feature

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles


def test_matches_torch_grid_sample(rng):
    C, H, W = 8, 14, 14
    width, height = 224.0, 224.0
    feat = rng.normal(size=(C, H, W)).astype(np.float32)
    xy = rng.uniform(5, 219, size=(16, 2)).astype(np.float32)

    # Reference path (funcs_utils.py:87-93)
    x = torch.from_numpy(xy[:, 0] / width * 2 - 1)
    y = torch.from_numpy(xy[:, 1] / height * 2 - 1)
    grid = torch.stack((x, y), 1)[None, :, None, :]
    want = F.grid_sample(
        torch.from_numpy(feat)[None], grid, align_corners=True
    )[0, :, :, 0].permute(1, 0).numpy()

    got = np.asarray(sample_image_feature(jnp.asarray(feat), jnp.asarray(xy), width, height))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_boundary_band_matches_torch_grid_sample(rng):
    """Points in the one-pixel border band OUTSIDE the grid, where exactly
    one bilinear tap is still inside (gx/gy in [-1, 0) or (W-1, W]): the
    reference's grid_sample samples the edge pixel with a partial weight.
    A clipped-x0+1 neighbour index reads pixel 1 instead of pixel 0 in the
    left/top band -- this pins the true-neighbour clip."""
    C, H, W = 3, 14, 14
    width = height = 224.0
    feat = rng.normal(size=(C, H, W)).astype(np.float32)
    # x in [-17.2, 0) maps to gx in [-1, 0); also cover the right/bottom band
    # and exact corners.
    xy = np.array(
        [[-10.0, 50.0], [50.0, -10.0], [-5.0, -5.0], [230.0, 50.0],
         [50.0, 230.0], [0.0, 0.0], [224.0, 224.0], [-17.0, 230.0]],
        np.float32,
    )
    x = torch.from_numpy(xy[:, 0] / width * 2 - 1)
    y = torch.from_numpy(xy[:, 1] / height * 2 - 1)
    grid = torch.stack((x, y), 1)[None, :, None, :]
    want = F.grid_sample(
        torch.from_numpy(feat)[None], grid, align_corners=True
    )[0, :, :, 0].permute(1, 0).numpy()

    got = np.asarray(sample_image_feature(jnp.asarray(feat), jnp.asarray(xy), width, height))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_out_of_bounds_zero_padding(rng):
    feat = np.ones((2, 8, 8), np.float32)
    xy = np.array([[-500.0, -500.0], [10000.0, 10000.0]], np.float32)
    got = np.asarray(sample_image_feature(jnp.asarray(feat), jnp.asarray(xy), 224.0, 224.0))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_count_parameters():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(7)}}
    assert count_parameters(tree) == 19


def test_converter_strips_module_prefix():
    state = {
        "module.fc1.weight": torch.zeros(1024, 2205),
        "module.fc1.bias": torch.zeros(1024),
    }
    variables = spin_state_dict_to_flax(state)
    assert "fc1" in variables["params"]
    assert variables["params"]["fc1"]["kernel"].shape == (2205, 1024)
