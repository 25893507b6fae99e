"""Numeric parity under TRAINED-LIKE weight statistics (VERDICT r1 task 4).

Round 1 proved torch-vs-flax SPIN parity only with fresh He-init weights;
trained ImageNet ResNets have per-layer conv magnitude spread, log-normal BN
running variances, and non-zero running means, which can amplify f32 drift at
rule thresholds. This suite re-runs the parity harness with those statistics
(tests/oracles/torch_hmr.realistic_torch_hmr), reports the angle-drift
DISTRIBUTION (not just a max), and sweeps LBS with log-normal-scaled blend
shapes. Measured CDF is recorded in docs/PARITY.md.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from poserisk_release_tpu.models.convert import spin_state_dict_to_flax
from poserisk_release_tpu.models.spin import HMR, load_mean_params
from poserisk_release_tpu.ops.rotations import rotmat_to_euler_deg
from tests.oracles.torch_hmr import realistic_torch_hmr


@pytest.fixture(scope="module")
def torch_model():
    return realistic_torch_hmr(load_mean_params(""), seed=23)


@pytest.fixture(scope="module")
def flax_variables(torch_model):
    return spin_state_dict_to_flax(dict(torch_model.state_dict()))


def _textured_crops(n, rng):
    """Mixed content: smooth gradients, hard edges, and high-frequency noise
    (the adversarial cases for resample/conv numerics)."""
    yy, xx = np.mgrid[0:224, 0:224]
    crops = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            base = (np.sin(xx / (3 + i % 7)) * np.cos(yy / (5 + i % 5)) + 1) / 2
        elif kind == 1:
            base = ((xx // (8 + i % 9) + yy // (6 + i % 7)) % 2).astype(float)
        else:
            base = rng.rand(224, 224)
        crops.append(np.stack([base, base[::-1], 1 - base], axis=-1))
    return np.asarray(crops, np.float32)


def test_angle_drift_distribution(torch_model, flax_variables, rng):
    """flax-vs-torch euler drift CDF under trained-like statistics.

    Measured (docs/PARITY.md): median ~1e-5 deg, p99 < 1e-3 deg, max < 0.01
    deg across 48 crops x 24 joints x 3 angles -- three orders of magnitude
    below the 1-degree granularity of the closest scoring thresholds."""
    crops = _textured_crops(48, rng)
    with torch.no_grad():
        t_rot, _, _ = torch_model(torch.from_numpy(np.transpose(crops, (0, 3, 1, 2))))
    model = HMR(n_iter=3)
    j_rot, _, _ = model.apply(flax_variables, jnp.asarray(crops))

    t_euler = np.asarray(rotmat_to_euler_deg(jnp.asarray(t_rot.numpy())))
    j_euler = np.asarray(rotmat_to_euler_deg(j_rot))
    d = np.abs(t_euler - j_euler)
    d = np.minimum(d, 360.0 - d)

    assert np.median(d) < 1e-3
    assert np.quantile(d, 0.99) < 0.05
    assert d.max() < 0.5
    # rotmats themselves agree tightly even with var spreads of ~4 decades
    assert np.abs(np.asarray(j_rot) - t_rot.numpy()).max() < 5e-3


def test_score_flips_under_realistic_stats(torch_model, flax_variables, rng):
    """End-to-end: REBA/RULA sequences from torch-euler vs flax-euler must be
    identical -- drift is far below threshold granularity even on crops whose
    angles land near rule boundaries."""
    import json
    import os.path as osp

    import poserisk_release_tpu as _pkg
    from poserisk_release_tpu.scoring.reba import REBAScorer
    from poserisk_release_tpu.scoring.rula import RULAScorer

    info = json.load(
        open(osp.join(osp.dirname(_pkg.__file__), "default_information.json"))
    )
    crops = _textured_crops(24, rng)
    with torch.no_grad():
        t_rot, _, _ = torch_model(torch.from_numpy(np.transpose(crops, (0, 3, 1, 2))))
    model = HMR(n_iter=3)
    j_rot, _, _ = model.apply(flax_variables, jnp.asarray(crops))
    t_euler = np.asarray(rotmat_to_euler_deg(jnp.asarray(t_rot.numpy())))
    j_euler = np.asarray(rotmat_to_euler_deg(j_rot))

    for scorer_cls in (REBAScorer, RULAScorer):
        a = [r["score"] for r in scorer_cls()(t_euler, None, info)]
        b = [r["score"] for r in scorer_cls()(j_euler, None, info)]
        assert a == b


def test_lbs_parity_lognormal_shapes(rng):
    """LBS torch-vs-jnp parity with log-normal-scaled blend shapes and large
    pose magnitudes (the trained-SMPL-like stress case)."""
    from poserisk_release_tpu.body.smpl import SMPLModel, synthetic_smpl_arrays
    from poserisk_release_tpu.ops.lbs import LBS
    from tests.oracles import torch_smpl

    arrays = dict(synthetic_smpl_arrays(num_verts=300, seed=9))
    arrays["shapedirs"] = (
        arrays["shapedirs"] * np.exp(rng.randn(*arrays["shapedirs"].shape) * 0.5)
    )
    arrays["posedirs"] = (
        arrays["posedirs"] * np.exp(rng.randn(*arrays["posedirs"].shape) * 0.5)
    )
    model = SMPLModel.from_arrays(arrays)

    pose = ((rng.rand(6, 72) * 2 - 1) * 2.5).astype(np.float32)
    betas = (rng.randn(6, 10) * 2.0).astype(np.float32)
    verts, joints = LBS(model)(jnp.asarray(pose), jnp.asarray(betas))
    t_verts, t_joints = torch_smpl.smpl_forward(arrays, pose, betas)
    assert np.abs(np.asarray(verts) - t_verts).max() < 5e-4
    assert np.abs(np.asarray(joints) - t_joints).max() < 5e-4
