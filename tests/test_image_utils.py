"""Host-side image utility surface (io/images.py vs reference _img_utils.py)."""

import numpy as np
import pytest

from poserisk_release_tpu.io import images as imutils

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles


@pytest.fixture()
def jpg(tmp_path, rng):
    import cv2

    img = rng.randint(0, 256, (60, 80, 3)).astype(np.uint8)
    path = tmp_path / "img.jpg"
    cv2.imwrite(str(path), img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    return str(path), img


def test_get_image_preserves_reference_swap_quirk(jpg):
    """get_image applies RGB2BGR to a BGR read -- i.e. returns RGB."""
    import cv2

    path, bgr = jpg
    got = imutils.get_image(path)
    want = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(got, want)


def test_read_image_range_and_shape(jpg):
    path, _ = jpg
    out = imutils.read_image(path)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_convert_cvimg_to_tensor_no_imagenet_norm():
    img = np.full((4, 4, 3), 255, np.uint8)
    out = imutils.convert_cvimg_to_tensor(img)
    np.testing.assert_allclose(out, 1.0)  # ToTensor only, no mean/std


def test_get_single_image_crop_demo_keypoints(rng):
    img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
    bbox = [60.0, 50.0, 40.0, 40.0]
    kp = np.array([[60.0, 50.0, 1.0], [70.0, 55.0, 1.0]])
    crop, raw, kp_out = imutils.get_single_image_crop_demo(img, bbox, kp.copy())
    assert crop.shape == (224, 224, 3)
    # reference parity: raw is the PRE-ToTensor warp output -- uint8 0..255
    # (_img_utils.py:248 copies before convert_cvimg_to_tensor)
    assert raw.dtype == np.uint8
    np.testing.assert_allclose(raw / 255.0, crop, atol=0.5 / 255.0)
    # the bbox center maps to the crop center
    np.testing.assert_allclose(kp_out[0, :2], [112.0, 112.0], atol=1e-6)
    assert kp_out[0, 2] == 1.0  # confidence untouched


def test_get_image_crops_axis_quirk(jpg):
    """The reference indexes the box as [y1, x1, y2, x2] when computing the
    center (its quirk); pin that a tall row-span becomes a vertical crop."""
    path, img = jpg
    # boxes: bb[0]/bb[2] are ROWS in the reference's center math
    crops = imutils.get_image_crops(path, [[10, 20, 50, 60], [0, 0, 59, 79]])
    assert crops.shape == (2, 224, 224, 3)
    assert np.isfinite(crops).all() and crops.max() <= 1.0


def test_imagenet_denormalize_reference_algebra(rng):
    """Pin torch2numpy's EXACT inverse transform, including its blue-channel
    0.255-for-0.225 typo (the inverse does not invert the reference's own
    forward normalize -- quirk preserved, see io/images.py)."""
    chw = rng.randn(3, 8, 6).astype(np.float32)
    got = imutils.imagenet_denormalize(chw)
    inv_mean = np.array([-0.485 / 0.229, -0.456 / 0.224, -0.406 / 0.255])
    inv_std = np.array([1 / 0.229, 1 / 0.224, 1 / 0.255])
    want = (chw - inv_mean[:, None, None]) / inv_std[:, None, None]
    want = (np.clip(want, 0, 1) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(got, np.transpose(want, (1, 2, 0)))
    # red/green DO invert the standard forward normalize; blue is ~13% dim
    hwc = rng.randint(0, 255, (8, 6, 3)).astype(np.uint8)
    norm = (hwc.astype(np.float32) / 255.0 - imutils.IMAGENET_MEAN) / imutils.IMAGENET_STD
    back = imutils.imagenet_denormalize(np.transpose(norm, (2, 0, 1)))
    assert np.abs(back[..., :2].astype(int) - hwc[..., :2].astype(int)).max() <= 1


def test_video_denormalize_shape_and_range(rng):
    vid = rng.randn(2, 3, 3, 4, 5).astype(np.float32)
    out = imutils.video_denormalize(vid)
    assert out.shape == (2, 3, 3, 4, 5) and out.dtype == np.uint8


def test_is_rotation_matrix():
    import jax.numpy as jnp

    from poserisk_release_tpu.ops.rotations import (
        axis_angle_to_rotmat,
        is_rotation_matrix,
    )

    R = axis_angle_to_rotmat(jnp.asarray([[0.3, -0.2, 0.9], [0.0, 0.0, 0.0]]))
    assert np.asarray(is_rotation_matrix(R)).all()
    assert not bool(np.asarray(is_rotation_matrix(jnp.eye(3) * 2.0)))
