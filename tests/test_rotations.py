"""Parity tests: JAX rotation conversions vs cv2 / reference formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from poserisk_release_tpu.ops import rotations as R
from tests.oracles import reference_geometry as oracle

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles


def _random_axis_angles(rng, n, max_angle=np.pi - 0.05):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0.001, max_angle, size=(n, 1))
    return axes * angles


class TestAxisAngleToRotmat:
    def test_matches_cv2(self, rng):
        aas = _random_axis_angles(rng, 256)
        got = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aas, jnp.float64)))
        for aa, mat in zip(aas, got):
            np.testing.assert_allclose(mat, oracle.rodrigues_vec_to_mat(aa), atol=1e-6)

    def test_zero_angle_is_identity(self):
        got = np.asarray(R.axis_angle_to_rotmat(jnp.zeros(3)))
        np.testing.assert_allclose(got, np.eye(3), atol=1e-6)

    def test_tiny_angle_stable(self):
        aa = np.array([1e-9, -1e-9, 1e-9])
        got = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aa, jnp.float64)))
        np.testing.assert_allclose(got, oracle.rodrigues_vec_to_mat(aa), atol=1e-8)

    def test_smpl_variant_matches_generic(self, rng):
        aas = _random_axis_angles(rng, 128)
        a = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aas, jnp.float64)))
        b = np.asarray(R.axis_angle_to_rotmat_smpl(jnp.asarray(aas, jnp.float64)))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestRotmatToAxisAngle:
    def test_matches_cv2_generic(self, rng):
        aas = _random_axis_angles(rng, 256, max_angle=np.pi - 0.2)
        mats = np.stack([oracle.rodrigues_vec_to_mat(aa) for aa in aas])
        got = np.asarray(R.rotmat_to_axis_angle(jnp.asarray(mats, jnp.float64)))
        for mat, aa_got in zip(mats, got):
            np.testing.assert_allclose(aa_got, oracle.rodrigues_mat_to_vec(mat), atol=1e-5)

    def test_identity_gives_zero(self):
        got = np.asarray(R.rotmat_to_axis_angle(jnp.eye(3)))
        np.testing.assert_allclose(got, np.zeros(3), atol=1e-7)

    @pytest.mark.parametrize("axis", [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.6, 0.8, 0)])
    def test_near_pi(self, axis):
        """The root joint of an upright person sits near theta = pi."""
        aa = np.asarray(axis, np.float64) * (np.pi - 1e-9)
        mat = oracle.rodrigues_vec_to_mat(aa)
        got = np.asarray(R.rotmat_to_axis_angle(jnp.asarray(mat, jnp.float64)))
        want = oracle.rodrigues_mat_to_vec(mat)
        # At exactly pi the sign of the axis is ambiguous; accept either.
        err = min(np.linalg.norm(got - want), np.linalg.norm(got + want))
        assert err < 1e-4

    def test_roundtrip_through_f32(self, rng):
        """f32 end-to-end (the TPU pipeline dtype) keeps angles within 1e-3 deg."""
        aas = _random_axis_angles(rng, 512, max_angle=3.0)
        mats = R.axis_angle_to_rotmat(jnp.asarray(aas, jnp.float32))
        back = np.asarray(R.rotmat_to_axis_angle(mats))
        # arccos is ill-conditioned near theta ~ pi in f32; 1e-2 rad is still
        # far below the 1-degree granularity of every scoring threshold.
        np.testing.assert_allclose(back, aas, atol=1e-2)


class TestRotationMatrixToRotVec:
    """Named counterpart of the reference's scalar rotation_matrix_to_rotVec
    (coord_utils.py:32-43), including its exact `sin(theta) == 0` degenerate
    test."""

    @staticmethod
    def _reference_formula(Rmat):
        import math

        theta = math.acos(((Rmat[0, 0] + Rmat[1, 1] + Rmat[2, 2]) - 1) / 2)
        sin_theta = math.sin(theta)
        if sin_theta == 0:
            return np.zeros(3)
        multi = 1 / (2 * math.sin(theta))
        return np.array([
            multi * (Rmat[2, 1] - Rmat[1, 2]) * theta,
            multi * (Rmat[0, 2] - Rmat[2, 0]) * theta,
            multi * (Rmat[1, 0] - Rmat[0, 1]) * theta,
        ])

    def test_matches_reference_formula(self, rng):
        aas = _random_axis_angles(rng, 128, max_angle=np.pi - 0.05)
        mats = np.stack([oracle.rodrigues_vec_to_mat(aa) for aa in aas])
        got = np.asarray(R.rotation_matrix_to_rot_vec(jnp.asarray(mats, jnp.float64)))
        for mat, vec in zip(mats, got):
            np.testing.assert_allclose(vec, self._reference_formula(mat), atol=1e-7)

    def test_identity_gives_zero(self):
        got = np.asarray(R.rotation_matrix_to_rot_vec(jnp.eye(3)))
        np.testing.assert_array_equal(got, np.zeros(3))

    def test_agrees_with_cv2_mirror_away_from_pi(self, rng):
        aas = _random_axis_angles(rng, 128, max_angle=np.pi - 0.2)
        mats = jnp.asarray(
            np.stack([oracle.rodrigues_vec_to_mat(aa) for aa in aas]), jnp.float64
        )
        a = np.asarray(R.rotation_matrix_to_rot_vec(mats))
        b = np.asarray(R.rotmat_to_axis_angle(mats))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestEuler:
    def test_extraction_matches_reference(self, rng):
        aas = _random_axis_angles(rng, 256)
        mats = np.stack([oracle.rodrigues_vec_to_mat(aa) for aa in aas])
        got = np.asarray(R.rotmat_to_euler_xyz(jnp.asarray(mats, jnp.float64)))
        want = np.stack([oracle.euler_from_rotmat_xyz(m) for m in mats])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_gimbal_branch(self):
        """pitch = +-pi/2 exercises the singular branch."""
        for sign in (+1.0, -1.0):
            mat = oracle.rotmat_from_euler_zyx_composition(0.3, sign * np.pi / 2, 0.2)
            got = np.asarray(R.rotmat_to_euler_xyz(jnp.asarray(mat, jnp.float64)))
            want = oracle.euler_from_rotmat_xyz(mat)
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_composition_matches_reference(self, rng):
        eulers = rng.uniform(-1.2, 1.2, size=(64, 3))
        got = np.asarray(R.euler_xyz_to_rotmat(jnp.asarray(eulers, jnp.float64)))
        for e, mat in zip(eulers, got):
            want = oracle.rotmat_from_euler_zyx_composition(e[2], e[1], e[0])
            np.testing.assert_allclose(mat, want, atol=1e-9)

    def test_full_pipeline_axis_angle_to_euler_deg(self, rng):
        """End-to-end: (J, 3) axis-angle -> Euler degrees, vs reference loop."""
        pose = _random_axis_angles(rng, 24)
        mats = R.axis_angle_to_rotmat(jnp.asarray(pose, jnp.float64))
        got = np.asarray(R.rotmat_to_euler_deg(mats))
        want = oracle.axis_angle_to_euler_deg(pose)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestRot6d:
    def test_orthonormal_output(self, rng):
        x = rng.normal(size=(32, 6))
        mats = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x, jnp.float64)))
        eye = np.eye(3)
        for m in mats:
            np.testing.assert_allclose(m.T @ m, eye, atol=1e-8)
            assert np.linalg.det(m) > 0.999

    def test_spin_convention(self, rng):
        """Matches SPIN's torch rot6d_to_rotmat (columns from (3,2) reshape)."""
        import torch

        def torch_rot6d(x):
            a1 = x[:, :, 0]
            a2 = x[:, :, 1]
            b1 = torch.nn.functional.normalize(a1)
            b2 = torch.nn.functional.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
            b3 = torch.cross(b1, b2, dim=1)
            return torch.stack((b1, b2, b3), dim=-1)

        x = rng.normal(size=(16, 6)).astype(np.float32)
        want = torch_rot6d(torch.from_numpy(x).view(-1, 3, 2)).numpy()
        got = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Euler round-trip validation (reference coord_utils.py:90-91)
# ---------------------------------------------------------------------------
class TestEulerRoundtripGuard:
    def test_valid_rotations_pass(self, rng):
        from poserisk_release_tpu.ops.rotations import (
            assert_euler_roundtrip,
            axis_angle_to_rotmat,
            euler_roundtrip_defect,
        )
        import jax.numpy as jnp

        aa = rng.randn(64, 3) * 1.5
        R = axis_angle_to_rotmat(jnp.asarray(aa, jnp.float32))
        defect = np.asarray(euler_roundtrip_defect(R))
        assert np.abs(defect).max() < 1e-3  # valid rotations round-trip
        assert_euler_roundtrip(R)  # no raise

    def test_corrupted_matrix_raises(self):
        from poserisk_release_tpu.ops.rotations import assert_euler_roundtrip

        bad = np.stack([np.eye(3, dtype=np.float32) * 2.0])  # not a rotation
        with pytest.raises(AssertionError, match="round-trip defect"):
            assert_euler_roundtrip(bad)

    def test_predictor_opt_in_runs(self, tmp_path, small_chunk_config):
        """Predictor(validate_rotations=True) executes the guard on the live
        path without tripping on SPIN's (orthonormal) rotmats."""
        import cv2

        from poserisk_release_tpu.io.video import write_video
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import Predictor

        path = tmp_path / "clip.mp4"
        frames = []
        for i in range(8):
            img = np.full((120, 160, 3), 25, np.uint8)
            cv2.rectangle(img, (40 + i, 20), (90 + i, 110), (180, 150, 130), -1)
            frames.append(img)
        write_video(frames, fps=10.0, file_path=str(path))
        predictor = Predictor(
            cfg=small_chunk_config, detector=StubDetector(), visualize=False,
            validate_rotations=True,
        )
        summary = predictor(str(path), "/nonexistent.json", str(tmp_path / "out"))
        assert "REBA" in summary
