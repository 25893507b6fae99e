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


# ---------------------------------------------------------------------------
# Augmentation crop path (rot / flip / color), reference _img_utils.py:30-101
# ---------------------------------------------------------------------------
def _reference_crop_affine(image_rgb_u8, bbox, scale, rot, do_flip, crop_size=224):
    """generate_patch_image_cv oracle incl. rotation and flip
    (/root/reference/lib/utils/_img_utils.py:53-101)."""
    img = image_rgb_u8.copy()
    H, W = img.shape[:2]
    c_x, c_y, bb_w, bb_h = bbox
    if do_flip:
        img = img[:, ::-1, :]
        c_x = W - c_x - 1
    rot_rad = np.pi * rot / 180
    def rot2d(pt):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], np.float32)
    src_down = rot2d(np.array([0, bb_h * scale * 0.5], np.float32))
    src_right = rot2d(np.array([bb_w * scale * 0.5, 0], np.float32))
    c = np.array([c_x, c_y], np.float32)
    src = np.stack([c, c + src_down, c + src_right])
    half = crop_size * 0.5
    dst = np.array([[half, half], [half, 2 * half], [2 * half, half]], np.float32)
    trans = cv2.getAffineTransform(src, dst)
    patch = cv2.warpAffine(np.ascontiguousarray(img), trans, (crop_size, crop_size),
                           flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    return patch.astype(np.float32) / 255.0


def test_affine_crop_matches_cv2_rot_flip(rng):
    from poserisk_release_tpu.ops.crop import crop_batch_affine

    img = rng.randint(0, 256, size=(240, 320, 3), dtype=np.uint8)
    cases = [
        # (bbox, scale, rot_deg, flip)
        ([160.0, 120.0, 90.0, 140.0], 1.2, 0.0, False),
        ([160.0, 120.0, 90.0, 140.0], 1.3, 30.0, False),
        ([100.0, 90.0, 120.0, 120.0], 1.2, -45.0, True),
        ([250.0, 60.0, 80.0, 100.0], 1.4, 10.0, True),  # spills over edges
    ]
    got = np.asarray(
        crop_batch_affine(
            jnp.asarray(np.stack([img] * len(cases))),
            jnp.asarray(np.array([c[0] for c in cases], np.float32)),
            jnp.asarray(np.array([c[1] for c in cases], np.float32)),
            jnp.asarray(np.array([c[2] for c in cases], np.float32)),
            jnp.asarray(np.array([c[3] for c in cases])),
            jnp.asarray(np.ones((len(cases), 3), np.float32)),
        )
    )
    for i, (bbox, scale, rot, flip) in enumerate(cases):
        want = _reference_crop_affine(img, bbox, scale, rot, flip)
        assert np.abs(got[i] - want).max() < 0.045, f"case {i}"
        assert np.abs(got[i] - want).mean() < 0.005, f"case {i}"


def test_affine_crop_rot0_matches_matmul_path(rng):
    """Cross-validation: the gather fallback at rot=0/no-flip reproduces the
    separable-matmul hot path to float tolerance."""
    from poserisk_release_tpu.ops.crop import crop_batch, crop_batch_affine

    img = rng.randint(0, 256, size=(200, 260, 3), dtype=np.uint8)
    bbox = np.array([[130.0, 100.0, 80.0, 120.0]], np.float32)
    a = np.asarray(crop_batch(jnp.asarray(img[None]), jnp.asarray(bbox), scale=1.2))
    b = np.asarray(
        crop_batch_affine(
            jnp.asarray(img[None]), jnp.asarray(bbox),
            jnp.asarray(np.array([1.2], np.float32)),
            jnp.asarray(np.zeros(1, np.float32)),
            jnp.asarray(np.array([False])),
            jnp.asarray(np.ones((1, 3), np.float32)),
        )
    )
    np.testing.assert_allclose(a, b, atol=2e-2)  # bf16 MXU pass vs f32 gather


def test_affine_crop_color_scale(rng):
    from poserisk_release_tpu.ops.crop import crop_batch_affine

    img = np.full((100, 100, 3), 100, np.uint8)
    bbox = np.array([[50.0, 50.0, 40.0, 40.0]], np.float32)
    out = np.asarray(
        crop_batch_affine(
            jnp.asarray(img[None]), jnp.asarray(bbox),
            jnp.asarray(np.array([1.0], np.float32)),
            jnp.asarray(np.zeros(1, np.float32)),
            jnp.asarray(np.array([False])),
            jnp.asarray(np.array([[0.5, 1.0, 2.0]], np.float32)),
        )
    )
    base = 100 / 255.0
    np.testing.assert_allclose(out[0, 112, 112], [base * 0.5, base, min(base * 2, 1.0)], atol=1e-2)


def test_sample_augmentation_ranges():
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.ops.crop import sample_augmentation

    rng = np.random.RandomState(0)
    # reference-default hooks: rot/flip disabled
    for _ in range(20):
        scale, rot, flip, color = sample_augmentation(rng, None)
        assert 1.2 <= scale <= 1.5
        assert rot == 0.0 and flip is False
        assert color.shape == (3,) and (0.8 <= color).all() and (color <= 1.2).all()
    # AugConfig re-enables the hooks
    import dataclasses
    aug = dataclasses.replace(default_config().AUG, flip=True, rotate_factor=30.0)
    rots, flips = [], []
    for _ in range(50):
        _, rot, flip, _ = sample_augmentation(rng, aug)
        rots.append(rot); flips.append(flip)
    assert any(f for f in flips) and any(not f for f in flips)
    assert max(abs(r) for r in rots) > 1.0 and max(abs(r) for r in rots) <= 60.0
