"""Crop parity: device bilinear resample vs the reference cv2.warpAffine path."""

import cv2
import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.ops.crop import crop_batch


def _reference_crop(image_rgb_u8, bbox, scale=1.2, crop_size=224):
    """Reference path: gen_trans_from_patch_cv + warpAffine + ToTensor
    (/root/reference/lib/utils/_img_utils.py:53-101, 219-266), rot=0."""
    c_x, c_y, bb_w, bb_h = bbox
    src_w, src_h = bb_w * scale, bb_h * scale
    src = np.array(
        [[c_x, c_y], [c_x, c_y + src_h * 0.5], [c_x + src_w * 0.5, c_y]], np.float32
    )
    half = crop_size * 0.5
    dst = np.array([[half, half], [half, half + half], [half + half, half]], np.float32)
    trans = cv2.getAffineTransform(src, dst)
    patch = cv2.warpAffine(
        image_rgb_u8, trans, (crop_size, crop_size),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
    )
    return patch.astype(np.float32) / 255.0


def test_matches_cv2_warp(rng):
    img = rng.randint(0, 256, size=(300, 400, 3), dtype=np.uint8)
    bboxes = np.array(
        [
            [200.0, 150.0, 120.0, 180.0],  # fully inside
            [50.0, 40.0, 150.0, 150.0],  # spills over top-left (border zeros)
            [380.0, 280.0, 100.0, 90.0],  # spills over bottom-right
            [200.0, 150.0, 11.0, 17.0],  # strong upsample
        ],
        np.float32,
    )
    got = np.asarray(
        crop_batch(jnp.asarray(np.stack([img] * len(bboxes))), jnp.asarray(bboxes))
    )
    for i, bb in enumerate(bboxes):
        want = _reference_crop(img, bb)
        # cv2 INTER_LINEAR quantises interpolation weights to 1/32; allow the
        # corresponding intensity error plus one uint8 LSB.
        assert np.abs(got[i] - want).max() < 0.045, f"bbox {i}"
        assert np.abs(got[i] - want).mean() < 0.004, f"bbox {i}"


def test_range_and_layout(rng):
    img = rng.randint(0, 256, size=(2, 100, 120, 3)).astype(np.uint8)
    bb = np.array([[60.0, 50.0, 40.0, 40.0]] * 2, np.float32)
    out = np.asarray(crop_batch(jnp.asarray(img), jnp.asarray(bb), out_size=64))
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_fully_outside_bbox_is_black():
    img = np.full((50, 50, 3), 255, np.uint8)
    bb = np.array([[500.0, 500.0, 20.0, 20.0]], np.float32)
    out = np.asarray(crop_batch(jnp.asarray(img[None]), jnp.asarray(bb), out_size=32))
    assert out.max() == 0.0


def test_identity_crop_center():
    """A bbox covering the image center at scale*size == out_size reproduces
    the pixels exactly (integer-aligned sampling)."""
    img = (np.arange(64 * 64 * 3) % 255).reshape(64, 64, 3).astype(np.uint8)
    # src step = (w*scale)/out == 1 -> integer sampling at x = cx + (i - 16)
    bb = np.array([[32.0, 32.0, 32.0 / 1.2, 32.0 / 1.2]], np.float32)
    out = np.asarray(crop_batch(jnp.asarray(img[None]), jnp.asarray(bb), out_size=32))
    want = img[16:48, 16:48].astype(np.float32) / 255.0
    np.testing.assert_allclose(out[0], want, atol=1e-6)
