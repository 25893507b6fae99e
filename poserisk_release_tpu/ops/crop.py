"""Device-side bbox crop / letterbox as separable MXU matmul resampling.

The reference crops one frame at a time on DataLoader workers with
cv2.warpAffine (/root/reference/lib/utils/_img_utils.py:53-101, 219-252):
bbox [cx, cy, w, h] scaled by cfg.DATASET.bbox_scale, warped to 224x224 with
bilinear sampling and zero border, then ToTensor (range [0,1], NO ImageNet
mean/std -- _img_utils.py:259-266).

TPU-first design: for rot=0 the affine warp is a separable bilinear resample,
i.e. two matrix multiplications per image:

    out[o, x] = sum_h sum_w T[o, h] * img[h, w] * S[x, w]

with T (out, H) and S (out, W) holding the two-tap interpolation weights of
each output row/column (built on device from the bbox scalars). Matmuls run
on the MXU: measured 6.5 ms vs 16-100 ms for the gather formulation at
128 x 450 x 800 -> 224^2 (gathers have no TPU hardware support). Constant
borders fall out exactly as  border * (1 - rowsum(T) x rowsum(S))  since
out-of-image taps carry zero weight.

Sampling parity: src = c + (dst - out/2) * (size * scale / out), matching
cv2.getAffineTransform's mapping of the reference's three control points
(no half-pixel shift); see tests/test_crop.py vs cv2.warpAffine.

Output is NHWC float32 in [0, 1] (TPU-native layout; the SPIN model takes
NHWC directly instead of the reference's NCHW).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrices(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """coords: (B, out) float sample positions along an axis of length `size`.
    Returns (B, out, size) rows with the two bilinear tap weights; taps
    outside [0, size) get zero weight (constant-border semantics)."""
    x0 = jnp.floor(coords)
    frac = coords - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    w0 = ((i0 >= 0) & (i0 <= size - 1)).astype(jnp.float32) * (1.0 - frac)
    w1 = ((i1 >= 0) & (i1 <= size - 1)).astype(jnp.float32) * frac
    return w0[..., None] * (idx == jnp.clip(i0, 0, size - 1)[..., None]) + w1[
        ..., None
    ] * (idx == jnp.clip(i1, 0, size - 1)[..., None])


@partial(jax.jit, static_argnames=("scale", "out_size", "border_value"))
def crop_batch(
    images: jnp.ndarray,  # (N, H, W, C) uint8 or float32
    bboxes: jnp.ndarray,  # (N, 4) [cx, cy, w, h]
    scale: float = 1.2,
    out_size: int = 224,
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Batched device crop. Returns (N, out, out, C) float32 in [0, 1].

    Memory note: intermediates scale with N * out * max(H, W) (the
    interpolation matrices and the row-resampled tensor). The pipeline's
    ingest resize rule caps frames at 800x450 (io/video.py), where a
    128-frame batch peaks ~0.5 GB; for direct library use on much larger
    frames, chunk the batch axis accordingly.
    """
    imgs = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        imgs = imgs / 255.0
    B, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    bboxes = bboxes.astype(jnp.float32)

    offsets = jnp.arange(out_size, dtype=jnp.float32) - out_size * 0.5
    xs = offsets[None, :] * (bboxes[:, 2:3] * scale / out_size) + bboxes[:, 0:1]
    ys = offsets[None, :] * (bboxes[:, 3:4] * scale / out_size) + bboxes[:, 1:2]

    T = _interp_matrices(ys, H)  # (B, out, H)
    S = _interp_matrices(xs, W)  # (B, out, W)

    # DEFAULT precision: the MXU's single-pass bf16 product costs at most
    # ~1.5/255 of intensity (far inside the cv2 fixed-point parity tolerance,
    # tests/test_crop.py) and is ~13x faster than HIGHEST for these shapes.
    rows = jnp.einsum("boh,bhwc->bowc", T, imgs)
    out = jnp.einsum("bowc,bxw->boxc", rows, S)
    if border_value != 0.0:
        coverage = jnp.einsum("bo,bx->box", jnp.sum(T, axis=2), jnp.sum(S, axis=2))
        out = out + border_value * (1.0 - coverage)[..., None]
    return out


@partial(jax.jit, static_argnames=("img_size",))
def letterbox_device(images: jnp.ndarray, img_size: int = 416) -> jnp.ndarray:
    """Aspect-preserving letterbox to (img_size, img_size) with gray padding,
    as the same separable matmul resample (the padding bands fall out of the
    constant-border term). ~9 ms for 128 x 450 x 800 frames vs 142 ms for
    jax.image.resize. Sampling uses the direct center mapping, a half-pixel
    offset from cv2.resize's convention -- irrelevant at detector robustness
    scales (tests/test_letterbox.py).
    """
    N, H, W = images.shape[0], images.shape[1], images.shape[2]
    side = float(max(H, W))
    bbox = jnp.broadcast_to(
        jnp.asarray([W * 0.5, H * 0.5, side, side], jnp.float32), (N, 4)
    )
    return crop_batch(
        images, bbox, scale=1.0, out_size=img_size, border_value=128.0 / 255.0
    )


def crop_center_offset_reference_parity(out_size: int) -> float:
    """The reference maps dst pixel x to src offset (x - out/2) * step.

    cv2.getAffineTransform on the three (center, center+down, center+right)
    point pairs yields exactly dst = center + (src - c) * out/(size*scale),
    i.e. src = c + (x - out/2) * (size*scale)/out with NO half-pixel shift --
    documented here (and pinned by tests) because resample parity with the
    reference hinges on it.
    """
    return out_size * 0.5
