"""2D/3D visualisation helpers and rotation API completions."""

import os.path as osp

import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.body.smpl import SKELETON
from poserisk_release_tpu.ops import rotations as R
from poserisk_release_tpu.outputs.render import (
    render_joint_cam_video,
    vis_keypoints,
    vis_keypoints_with_skeleton,
)
from tests.oracles import reference_geometry as oracle


def test_vis_keypoints(rng):
    img = rng.randint(0, 255, size=(100, 120, 3)).astype(np.uint8)
    kps = rng.uniform(10, 90, size=(10, 2))
    out = vis_keypoints(img, kps)
    assert out.shape == img.shape
    assert (out != img).any()  # something was drawn


def test_vis_keypoints_with_skeleton(rng):
    img = rng.randint(0, 255, size=(100, 120, 3)).astype(np.uint8)
    kps = np.vstack([rng.uniform(10, 90, size=(2, 24)), np.ones((1, 24))])
    out = vis_keypoints_with_skeleton(img, kps, SKELETON)
    assert out.shape == img.shape
    assert (out != img).any()


def test_render_joint_cam_video(tmp_path, rng):
    jc = rng.normal(scale=300, size=(6, 24, 3))
    frames = np.arange(6)
    out = render_joint_cam_video(jc, frames, SKELETON, str(tmp_path), fps=5.0)
    assert osp.isfile(out)
    import cv2

    cap = cv2.VideoCapture(out)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 6
    cap.release()


def test_euler_deg_to_axis_angle_roundtrip(rng):
    eulers = rng.uniform(-80, 80, size=(32, 3))
    aa = np.asarray(R.euler_deg_to_axis_angle(jnp.asarray(eulers, jnp.float64)))
    # Round-trip through the reference's composition convention.
    for e, a in zip(eulers, aa):
        mat_ref = oracle.rotmat_from_euler_zyx_composition(*np.deg2rad(e)[::-1])
        back = oracle.euler_from_rotmat_xyz(oracle.rodrigues_vec_to_mat(a))
        np.testing.assert_allclose(np.rad2deg(back), e, atol=1e-5)
        del mat_ref


def test_vis_2d_pose_writes_overlay_jpg(tmp_path, rng):
    from poserisk_release_tpu.outputs.render import vis_2d_pose

    img = rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
    pred = np.array([[20.0, 30.0], [50.0, 60.0], [70.0, 20.0]])
    skeleton = ((0, 1), (1, 2))
    path = vis_2d_pose(pred, img, skeleton, str(tmp_path), prefix="unittest")
    import os.path as osp

    assert osp.isfile(path) and osp.getsize(path) > 0
    base = osp.basename(path)
    assert base.startswith("unittest_") and base.endswith("_2d_joint.jpg")
