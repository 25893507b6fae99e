"""Fused letterbox+crop Pallas kernel parity vs the jnp resample paths.

Runs in interpret mode on the CPU mesh (same pattern as test_lbs_pallas).
The jnp paths (ops.crop.letterbox_device_rect / crop_batch) are themselves
pinned against cv2 oracles in test_letterbox.py / test_crop.py, so agreement
here chains the Pallas kernel to the reference convention."""

import jax.numpy as jnp
import numpy as np
import pytest

from poserisk_release_tpu.ops.crop import crop_batch, letterbox_device_rect
from poserisk_release_tpu.ops.resample_pallas import fused_letterbox_crop

BBOXES = np.array(
    [
        [400.0, 225.0, 220.0, 220.0],  # centered person box
        [100.0, 80.0, 60.0, 120.0],    # small, off-center
        [780.0, 440.0, 100.0, 50.0],   # straddles the right/bottom border
        [-20.0, 10.0, 80.0, 80.0],     # partially outside (zero-border taps)
    ],
    np.float32,
)


def _frames(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("hw", [(450, 800), (360, 640)])
def test_f32_matches_jnp_paths_exactly(hw):
    H, W = hw
    frames = jnp.asarray(_frames((4, H, W, 3)))
    bboxes = jnp.asarray(BBOXES)
    letter, crops = fused_letterbox_crop(
        frames, bboxes, compute_dtype=jnp.float32, interpret=True
    )
    letter_ref = letterbox_device_rect(frames, 416)
    crops_ref = crop_batch(frames, bboxes)
    assert letter.shape == letter_ref.shape
    assert crops.shape == crops_ref.shape
    np.testing.assert_allclose(np.asarray(letter), np.asarray(letter_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(crops), np.asarray(crops_ref),
                               atol=1e-5)


def test_bf16_within_quantization_tolerance():
    """bf16 taps/accumulation deviate by at most a few intensity steps --
    the same tolerance class as the bf16 jnp path the bench already uses."""
    frames = jnp.asarray(_frames((2, 450, 800, 3), seed=3))
    bboxes = jnp.asarray(BBOXES[:2])
    letter, crops = fused_letterbox_crop(
        frames, bboxes, compute_dtype=jnp.bfloat16, interpret=True
    )
    letter_ref = letterbox_device_rect(frames, 416)
    crops_ref = crop_batch(frames, bboxes)
    assert float(jnp.max(jnp.abs(letter.astype(jnp.float32) - letter_ref))) < 4.0 / 255.0
    assert float(jnp.max(jnp.abs(crops.astype(jnp.float32) - crops_ref))) < 4.0 / 255.0


def test_crop_only_kernel_matches_crop_batch():
    """crop_batch_pallas (the fast-mode product crop in
    pipeline.PoseEstimator.run_from_frames) matches ops.crop.crop_batch."""
    from poserisk_release_tpu.ops.resample_pallas import crop_batch_pallas

    frames = jnp.asarray(_frames((4, 450, 800, 3), seed=11))
    bboxes = jnp.asarray(BBOXES)
    crops = crop_batch_pallas(frames, bboxes, compute_dtype=jnp.float32,
                              interpret=True)
    np.testing.assert_allclose(
        np.asarray(crops), np.asarray(crop_batch(frames, bboxes)), atol=1e-5
    )
    with pytest.raises(TypeError):
        crop_batch_pallas(frames.astype(jnp.float32), bboxes, interpret=True)


def test_values_in_unit_range_and_gray_border():
    frames = jnp.asarray(_frames((1, 450, 800, 3), seed=7))
    bboxes = jnp.asarray(BBOXES[:1])
    letter, crops = fused_letterbox_crop(
        frames, bboxes, compute_dtype=jnp.float32, interpret=True
    )
    letter = np.asarray(letter)
    # 800x450 -> 416x234 content on a 416x288 canvas: rows above/below the
    # content band are the 128/255 gray fill.
    assert np.allclose(letter[0, :2, :, :], 128.0 / 255.0, atol=1e-6)
    assert np.asarray(crops).min() >= 0.0
    assert np.asarray(crops).max() <= 1.0 + 1e-6


@pytest.mark.parametrize("stride", [2, 3, 4])
def test_det_stride_letterboxes_only_stride_multiples(stride):
    """Detection-stride mode: the kernel letterboxes only every Nth frame
    (output == letterbox_device_rect(frames[::N])) while crops still cover
    all frames -- including a batch not divisible by the stride."""
    frames = jnp.asarray(_frames((11, 90, 160, 3)))
    bboxes = jnp.asarray(
        np.tile(np.array([[80.0, 45.0, 50.0, 50.0]], np.float32), (11, 1)))
    letter, crops = fused_letterbox_crop(
        frames, bboxes, img_size=64, out_size=32,
        compute_dtype=jnp.float32, interpret=True, det_stride=stride,
    )
    letter_ref = letterbox_device_rect(frames[::stride], 64)
    crops_ref = crop_batch(frames, bboxes, out_size=32)
    assert letter.shape == letter_ref.shape
    np.testing.assert_allclose(np.asarray(letter), np.asarray(letter_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(crops), np.asarray(crops_ref),
                               atol=1e-5)


def test_windowed_crop_kernel_matches_crop_batch():
    """crop_batch_pallas_windowed (experimental: measured 0.91-1.12x vs the
    full-width kernel on TPU, docs/PERF.md round 3, so NOT on the product
    path) stays exact inside its fit precondition, including edge-straddling
    boxes."""
    from poserisk_release_tpu.ops.resample_pallas import (
        crop_batch_pallas_windowed,
        crop_window_fits,
    )

    frames = jnp.asarray(_frames((4, 450, 800, 3), seed=13))
    bboxes = np.array(
        [
            [400.0, 225.0, 200.0, 380.0],
            [60.0, 200.0, 180.0, 300.0],   # left-edge overhang
            [770.0, 225.0, 190.0, 400.0],  # right-edge overhang
            [420.0, 100.0, 150.0, 150.0],
        ],
        np.float32,
    )
    assert crop_window_fits(bboxes, window=384)
    crops = crop_batch_pallas_windowed(
        frames, jnp.asarray(bboxes), window=384,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(crops), np.asarray(crop_batch(frames, jnp.asarray(bboxes))),
        atol=1e-5,
    )


def test_crop_window_fits_guard():
    from poserisk_release_tpu.ops.resample_pallas import crop_window_fits

    # 220 * 1.2 + 2 + 128 = 394 > 384: realistic wide boxes need window 512.
    wide = np.array([[400.0, 225.0, 220.0, 300.0]], np.float32)
    assert not crop_window_fits(wide, window=384)
    assert crop_window_fits(wide, window=512)
    assert crop_window_fits(np.zeros((0, 4), np.float32), window=384)


def test_crop_window_fits_slack_is_a_full_chunk():
    """Regression (round-3 review): the guard's chunk-alignment slack must be
    a FULL chunk_w. xs_min is real-valued, so (xs_min - 1) mod chunk_w can
    reach just under chunk_w; a chunk_w - 1 bound admitted this bbox
    (bw*scale + 2 + 127 == window exactly) whose rightmost interpolation tap
    falls one column past the 256-px window -- the windowed kernel's crop
    right edge silently lost ~33% of a tap weight (measured 0.33 max abs
    pixel error vs crop_batch)."""
    from poserisk_release_tpu.ops.resample_pallas import (
        crop_batch_pallas_windowed,
        crop_window_fits,
    )

    bbox = np.array([[192.4, 225.0, 127.0 / 1.2, 300.0]], np.float32)
    # Old (chunk_w - 1) bound: 127 + 2 + 127 <= 256 held; the tightened
    # guard must reject, because the kernel really does lose a tap here:
    assert not crop_window_fits(bbox, window=256)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 256, (1, 450, 800, 3), dtype=np.uint8))
    ref = np.asarray(crop_batch(frames, jnp.asarray(bbox)))
    lossy = np.asarray(crop_batch_pallas_windowed(
        frames, jnp.asarray(bbox), window=256,
        compute_dtype=jnp.float32, interpret=True,
    ))
    assert np.abs(lossy - ref).max() > 0.1  # the guard exists for a reason
    # One chunk more and the same bbox is exact again:
    assert crop_window_fits(bbox, window=384)
    ok = np.asarray(crop_batch_pallas_windowed(
        frames, jnp.asarray(bbox), window=384,
        compute_dtype=jnp.float32, interpret=True,
    ))
    np.testing.assert_allclose(ok, ref, atol=1e-5)


def test_windowed_crop_falls_back_when_window_covers_width():
    """window >= frame width routes to the plain kernel (strictly better)."""
    from poserisk_release_tpu.ops.resample_pallas import (
        crop_batch_pallas,
        crop_batch_pallas_windowed,
    )

    frames = jnp.asarray(_frames((2, 128, 256, 3), seed=5))
    bboxes = jnp.asarray(
        np.array([[128.0, 64.0, 80.0, 90.0], [40.0, 30.0, 50.0, 60.0]], np.float32)
    )
    got = crop_batch_pallas_windowed(
        frames, bboxes, window=256, compute_dtype=jnp.float32, interpret=True
    )
    want = crop_batch_pallas(
        frames, bboxes, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
