"""Device letterbox parity with the host cv2 letterbox + coordinate unmap."""

import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.models.detector import letterbox_batch
from poserisk_release_tpu.ops.crop import letterbox_device


def test_matches_host_letterbox(rng):
    # Smooth gradient content: the two implementations differ by a half-pixel
    # sampling convention, which must stay invisible on smooth images (random
    # noise would decorrelate under any sub-pixel shift).
    yy, xx = np.mgrid[0:90, 0:160]
    base = ((yy * 2 + xx) % 256).astype(np.uint8)
    frames = np.stack([np.stack([base, 255 - base, base // 2], axis=-1)] * 2)
    got = np.asarray(letterbox_device(jnp.asarray(frames), img_size=64))
    want, ratio, (pad_x, pad_y) = letterbox_batch(frames, img_size=64)
    assert got.shape == want.shape == (2, 64, 64, 3)
    # Padding bands are gray in both.
    np.testing.assert_allclose(got[:, :pad_y], 128 / 255.0, atol=1 / 255)
    np.testing.assert_allclose(want[:, :pad_y], 128 / 255.0, atol=1 / 255)
    # Content region agrees up to the half-pixel convention difference
    # between cv2.resize and the direct center mapping (interior only).
    interior = slice(pad_y + 2, 64 - pad_y - 2)
    err = np.abs(got[:, interior, 2:-2] - want[:, interior, 2:-2])
    assert np.quantile(err, 0.9) < 0.25  # same image content, small shift


def test_square_input_near_identity():
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, 16:48, 16:48] = 200
    out = np.asarray(letterbox_device(jnp.asarray(img), img_size=64))
    # No padding for square input; bright block stays centered at same size.
    assert abs(out[0, 32, 32, 0] - 200 / 255.0) < 0.02
    assert out[0, 4, 4, 0] < 0.02


def test_unmap_roundtrip():
    """The detector's (ratio, pad) unmap inverts the device letterbox mapping."""
    H, W, S = 90, 160, 64
    side = float(max(H, W))
    ratio = S / side
    pad_x = (S - W * ratio) / 2.0
    pad_y = (S - H * ratio) / 2.0
    # letterbox maps src -> dst: dst = (src - center) * S/side + S/2
    for src_x, src_y in [(0, 0), (80, 45), (159, 89)]:
        dst_x = (src_x - W / 2) * S / side + S / 2
        dst_y = (src_y - H / 2) * S / side + S / 2
        back_x = (dst_x - pad_x) / ratio
        back_y = (dst_y - pad_y) / ratio
        assert abs(back_x - src_x) < 1e-9
        assert abs(back_y - src_y) < 1e-9
