"""Device letterbox parity with a host cv2 letterbox oracle + coordinate unmap.

The device letterbox follows cv2.resize's half-pixel + edge-clamp convention
with integer-rounded content sizes and pads (ops/crop.py), so agreement with
the cv2 oracle is per-pixel up to cv2's 11-bit fixed-point interpolation
rounding -- not merely "same content up to a sub-pixel shift".
"""

import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.ops.crop import (
    letterbox_device,
    letterbox_device_rect,
    letterbox_geometry,
    rect_canvas_geometry,
)


def cv2_letterbox_oracle(frames: np.ndarray, img_size: int = 416):
    """Host oracle: cv2.resize INTER_LINEAR onto a gray square canvas (the
    upstream MPT detector's preprocessing shape, SURVEY.md section 2.9)."""
    import cv2

    N, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    new_w, new_h, pad_x, pad_y = letterbox_geometry(H, W, img_size)
    out = np.full((N, img_size, img_size, 3), 128, np.uint8)
    for i in range(N):
        out[i, pad_y : pad_y + new_h, pad_x : pad_x + new_w] = cv2.resize(
            frames[i], (new_w, new_h), interpolation=cv2.INTER_LINEAR
        )
    return out.astype(np.float32) / 255.0, (pad_x, pad_y)


def _gradient_frames():
    yy, xx = np.mgrid[0:90, 0:160]
    base = ((yy * 2 + xx) % 256).astype(np.uint8)
    return np.stack([np.stack([base, 255 - base, base // 2], axis=-1)] * 2)


def test_matches_cv2_exactly(rng):
    """Exact-convention parity: every pixel (content AND padding) agrees with
    cv2 to fixed-point rounding -- including random noise content, which
    decorrelates under ANY sub-pixel convention mismatch."""
    frames = rng.randint(0, 256, (2, 90, 160, 3)).astype(np.uint8)
    got = np.asarray(letterbox_device(jnp.asarray(frames), img_size=64))
    want, _ = cv2_letterbox_oracle(frames, img_size=64)
    assert got.shape == want.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(got, want, atol=2.5 / 255)
    # and on smooth gradients the agreement is tighter still
    frames = _gradient_frames()
    got = np.asarray(letterbox_device(jnp.asarray(frames), img_size=64))
    want, _ = cv2_letterbox_oracle(frames, img_size=64)
    np.testing.assert_allclose(got, want, atol=1.5 / 255)


def test_tall_frames_pad_left_right():
    frames = np.transpose(_gradient_frames(), (0, 2, 1, 3)).copy()  # 160x90
    got = np.asarray(letterbox_device(jnp.asarray(frames), img_size=64))
    want, (pad_x, _) = cv2_letterbox_oracle(frames, img_size=64)
    assert pad_x > 0
    np.testing.assert_allclose(got, want, atol=1.5 / 255)


def test_square_input_near_identity():
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, 16:48, 16:48] = 200
    out = np.asarray(letterbox_device(jnp.asarray(img), img_size=64))
    # No padding for square input; bright block stays centered at same size.
    assert abs(out[0, 32, 32, 0] - 200 / 255.0) < 0.02
    assert out[0, 4, 4, 0] < 0.02


def test_rect_canvas_content_matches_square():
    """The rectangular canvas (rect_canvas_geometry) must hold EXACTLY the
    same resampled content as the square letterbox -- only the amount of gray
    padding differs."""
    frames = _gradient_frames()  # 90x160 -> square 256: content 256x144
    sq = np.asarray(letterbox_device(jnp.asarray(frames), img_size=256))
    rect = np.asarray(letterbox_device_rect(jnp.asarray(frames), img_size=256))
    ch, cw, new_w, new_h, rpx, rpy = rect_canvas_geometry(90, 160, 256)
    assert (ch, cw) == (192, 256)  # genuinely smaller than the 256 square
    _, _, spx, spy = letterbox_geometry(90, 160, 256)
    assert rpy % 32 == spy % 32 and rpx % 32 == spx % 32  # grid congruence
    np.testing.assert_allclose(
        rect[:, rpy : rpy + new_h, rpx : rpx + new_w],
        sq[:, spy : spy + new_h, spx : spx + new_w],
        atol=1e-6,
    )
    # canvas dims are multiples of 32 and large enough for the content
    assert ch % 32 == 0 and cw % 32 == 0
    assert ch >= new_h and cw >= new_w


def test_rect_canvas_geometry_800x450():
    """The reference ingest cap's canvas: 416x288 instead of 416x416 (the
    square pad_y=91 folds to 27 mod 32 so all head grids stay congruent)."""
    ch, cw, new_w, new_h, pad_x, pad_y = rect_canvas_geometry(450, 800, 416)
    assert (ch, cw) == (288, 416)
    assert (new_w, new_h) == (416, 234)
    assert (pad_x, pad_y) == (0, 27)
    assert pad_y % 32 == ((416 - 234) // 2) % 32


def test_unmap_roundtrip():
    """The detector's integer-pad, per-axis-scale unmap inverts the letterbox
    mapping exactly at pixel centers."""
    H, W, S = 90, 160, 64
    new_w, new_h, pad_x, pad_y = letterbox_geometry(H, W, S)
    sx, sy = new_w / W, new_h / H
    for src_x, src_y in [(0.0, 0.0), (80.0, 45.0), (159.0, 89.0)]:
        # cv2 convention: dst = (src + 0.5) * scale - 0.5 + pad
        dst_x = (src_x + 0.5) * sx - 0.5 + pad_x
        dst_y = (src_y + 0.5) * sy - 0.5 + pad_y
        back_x = (dst_x - pad_x + 0.5) / sx - 0.5
        back_y = (dst_y - pad_y + 0.5) / sy - 0.5
        assert abs(back_x - src_x) < 1e-9
        assert abs(back_y - src_y) < 1e-9
