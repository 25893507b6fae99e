"""2D/3D visualisation helpers and rotation API completions."""

import os.path as osp

import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.body.smpl import SKELETON
from poserisk_release_tpu.ops import rotations as R
from poserisk_release_tpu.outputs.render import (
    axis_equal_3d,
    render_joint_cam_video,
    vis_keypoints,
    vis_keypoints_with_skeleton,
)
from tests.oracles import reference_geometry as oracle


def _axes3d():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    return fig, fig.add_subplot(111, projection="3d")


def test_axis_equal_3d_equalizes_uneven_limits():
    """vis_utils.py:172-179 parity: each axis re-centered on its midpoint
    with half-range = half the LARGEST current extent."""
    import matplotlib.pyplot as plt

    fig, ax = _axes3d()
    ax.set_xlim3d(0, 10)
    ax.set_ylim3d(-2, 2)
    ax.set_zlim3d(100, 101)
    axis_equal_3d(ax)
    np.testing.assert_allclose(ax.get_xlim3d(), (0.0, 10.0))
    np.testing.assert_allclose(ax.get_ylim3d(), (-5.0, 5.0))
    np.testing.assert_allclose(ax.get_zlim3d(), (95.5, 105.5))
    plt.close(fig)


def test_axis_equal_3d_noop_on_symmetric_limits():
    """After vis_3d_pose's fixed +-800 limits the reference's call is a
    no-op; ours must be too."""
    import matplotlib.pyplot as plt

    fig, ax = _axes3d()
    for dim in "xyz":
        getattr(ax, f"set_{dim}lim3d")(-800, 800)
    axis_equal_3d(ax)
    for dim in "xyz":
        np.testing.assert_allclose(getattr(ax, f"get_{dim}lim3d")(), (-800.0, 800.0))
    plt.close(fig)


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
