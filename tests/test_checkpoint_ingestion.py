"""Real-asset ingestion path: torch SPIN checkpoint -> Flax -> npz cache.

Covers PoseEstimator._load_variables' priority chain end-to-end with an
actual torch-saved checkpoint file (the format the published SPIN release
uses: {'model': state_dict}), including the torch-free reload from the
converted .flax.npz cache.
"""

import os.path as osp

import numpy as np
import torch

import jax.numpy as jnp

from poserisk_release_tpu.body.smpl import SMPLFamily
from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.models.spin import HMR, load_mean_params
from poserisk_release_tpu.pipeline import PoseEstimator
from tests.oracles.torch_hmr import randomized_torch_hmr


def test_torch_checkpoint_priority_chain(tmp_path, rng):
    mean = load_mean_params("")
    torch_model = randomized_torch_hmr(mean, seed=3)
    ckpt_path = str(tmp_path / "model_checkpoint.pt")
    # The published SPIN checkpoint format: {'model': state_dict}.
    torch.save({"model": torch_model.state_dict()}, ckpt_path)

    mean_path = str(tmp_path / "smpl_mean_params.npz")
    np.savez(
        mean_path,
        pose=mean["init_pose"].reshape(-1),
        shape=mean["init_shape"].reshape(-1).astype(np.float64),  # SPIN ships f64 shape
        cam=mean["init_cam"].reshape(-1),
    )

    cfg = default_config().replace(
        SPIN={"checkpoint": ckpt_path, "smpl_mean_params": mean_path},
        PARALLEL={"frames_per_step": 8},
    )
    family = SMPLFamily(cfg.SPIN.smpl_model_dir)

    est = PoseEstimator(cfg, family)
    crops = rng.uniform(0, 1, size=(4, 224, 224, 3)).astype(np.float32)
    euler, joint_cam, aa = est.run(crops)
    assert euler.shape == (4, 24, 3)

    # Conversion cached the torch-free npz next to the checkpoint.
    assert osp.isfile(ckpt_path + ".flax.npz")

    # Second estimator takes the npz path; outputs must be identical.
    est2 = PoseEstimator(cfg, family)
    euler2, _, _ = est2.run(crops)
    np.testing.assert_allclose(euler2, euler, atol=1e-5)

    # And both match driving the converted weights directly.
    with torch.no_grad():
        t_rot, _, _ = torch_model(torch.from_numpy(np.transpose(crops, (0, 3, 1, 2))))
    rot_jax, _, _ = HMR(n_iter=3).apply(est.variables, jnp.asarray(crops))
    np.testing.assert_allclose(np.asarray(rot_jax), t_rot.numpy(), atol=3e-4)


def test_newer_checkpoint_invalidates_npz_cache(tmp_path):
    """Dropping NEW weights over the old checkpoint path must re-convert:
    the cached .flax.npz of the previous weights used to shadow them
    unconditionally."""
    import os

    from poserisk_release_tpu.pipeline import load_spin_variables

    mean = load_mean_params("")
    ckpt_path = str(tmp_path / "model_checkpoint.pt")
    mean_path = str(tmp_path / "smpl_mean_params.npz")
    np.savez(mean_path, pose=mean["init_pose"].reshape(-1),
             shape=mean["init_shape"].reshape(-1), cam=mean["init_cam"].reshape(-1))
    cfg = default_config().replace(
        SPIN={"checkpoint": ckpt_path, "smpl_mean_params": mean_path})

    torch.save({"model": randomized_torch_hmr(mean, seed=1).state_dict()}, ckpt_path)
    v1 = load_spin_variables(cfg)
    npz = ckpt_path + ".flax.npz"
    assert osp.isfile(npz)

    # New weights at the same path, mtime forced past the cache's.
    torch.save({"model": randomized_torch_hmr(mean, seed=2).state_dict()}, ckpt_path)
    os.utime(ckpt_path, (os.path.getmtime(npz) + 10,) * 2)
    v2 = load_spin_variables(cfg)
    w1 = np.asarray(jnp.asarray(v1["params"]["fc1"]["kernel"]))
    w2 = np.asarray(jnp.asarray(v2["params"]["fc1"]["kernel"]))
    assert not np.array_equal(w1, w2)

    # And the refreshed cache now serves the NEW weights torch-free.
    v3 = load_spin_variables(cfg)
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(v3["params"]["fc1"]["kernel"])), w2)


def test_timestamp_preserving_replacement_invalidates_cache(tmp_path):
    """A replacement checkpoint installed with a timestamp-preserving tool
    (cp -p / rsync -a / tar) can carry an mtime OLDER than the npz cache;
    the embedded (size, mtime_ns) source stamp must still detect it."""
    import os

    from poserisk_release_tpu.pipeline import load_spin_variables

    mean = load_mean_params("")
    ckpt_path = str(tmp_path / "model_checkpoint.pt")
    mean_path = str(tmp_path / "smpl_mean_params.npz")
    np.savez(mean_path, pose=mean["init_pose"].reshape(-1),
             shape=mean["init_shape"].reshape(-1),
             cam=mean["init_cam"].reshape(-1))
    cfg = default_config().replace(
        SPIN={"checkpoint": ckpt_path, "smpl_mean_params": mean_path})

    torch.save({"model": randomized_torch_hmr(mean, seed=1).state_dict()},
               ckpt_path)
    v1 = load_spin_variables(cfg)
    npz = ckpt_path + ".flax.npz"
    assert osp.isfile(npz)

    # New weights whose mtime is forced BEFORE the cache's -- the old
    # mtime-'>'-ordering guard would keep serving the stale conversion.
    torch.save({"model": randomized_torch_hmr(mean, seed=2).state_dict()},
               ckpt_path)
    os.utime(ckpt_path, (os.path.getmtime(npz) - 100,) * 2)
    v2 = load_spin_variables(cfg)
    w1 = np.asarray(jnp.asarray(v1["params"]["fc1"]["kernel"]))
    w2 = np.asarray(jnp.asarray(v2["params"]["fc1"]["kernel"]))
    assert not np.array_equal(w1, w2)

    # The refreshed cache carries the new stamp: the next load is served
    # torch-free without another conversion (mtime of the npz advanced, the
    # checkpoint's did not -- only the stamp equality makes this work).
    from poserisk_release_tpu.models import convert as model_convert

    stamp = model_convert.cached_source_stamp(npz)
    assert stamp is not None
    np.testing.assert_array_equal(
        stamp, model_convert.source_stamp(ckpt_path))
    v3 = load_spin_variables(cfg)
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(v3["params"]["fc1"]["kernel"])), w2)
