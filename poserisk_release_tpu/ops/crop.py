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
import numpy as np


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


@partial(jax.jit, static_argnames=("scale", "out_size", "border_value", "compute_dtype"))
def crop_batch(
    images: jnp.ndarray,  # (N, H, W, C) uint8 or float32
    bboxes: jnp.ndarray,  # (N, 4) [cx, cy, w, h]
    scale: float = 1.2,
    out_size: int = 224,
    border_value: float = 0.0,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched device crop. Returns (N, out, out, C) float in [0, 1].

    compute_dtype=bfloat16 stores the resample intermediates in bf16 (halved
    HBM traffic for this bandwidth-bound op; the throughput graph feeds a
    bf16 backbone anyway). The default f32 keeps the strict-parity range.

    Memory note: intermediates scale with N * out * max(H, W) (the
    interpolation matrices and the row-resampled tensor). The pipeline's
    ingest resize rule caps frames at 800x450 (io/video.py), where a
    128-frame batch peaks ~0.5 GB; for direct library use on much larger
    frames, chunk the batch axis accordingly.
    """
    imgs = images.astype(compute_dtype)
    if images.dtype == jnp.uint8:
        imgs = imgs / jnp.asarray(255.0, compute_dtype)
    B, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    bboxes = bboxes.astype(jnp.float32)

    offsets = jnp.arange(out_size, dtype=jnp.float32) - out_size * 0.5
    xs = offsets[None, :] * (bboxes[:, 2:3] * scale / out_size) + bboxes[:, 0:1]
    ys = offsets[None, :] * (bboxes[:, 3:4] * scale / out_size) + bboxes[:, 1:2]

    # Tap weights stay f32 (sub-pixel fractions need the mantissa); only the
    # image-sized operands/products take compute_dtype.
    T = _interp_matrices(ys, H).astype(compute_dtype)  # (B, out, H)
    S = _interp_matrices(xs, W).astype(compute_dtype)  # (B, out, W)

    # DEFAULT precision: the MXU's single-pass bf16 product costs at most
    # ~1.5/255 of intensity (far inside the cv2 fixed-point parity tolerance,
    # tests/test_crop.py) and is ~13x faster than HIGHEST for these shapes.
    rows = jnp.einsum("boh,bhwc->bowc", T, imgs)
    out = jnp.einsum("bowc,bxw->boxc", rows, S)
    if border_value != 0.0:
        coverage = jnp.einsum("bo,bx->box", jnp.sum(T, axis=2), jnp.sum(S, axis=2))
        out = out + jnp.asarray(border_value, compute_dtype) * (
            jnp.asarray(1.0, compute_dtype) - coverage
        )[..., None]
    return out


def _letterbox_axis_matrix(out_size: int, pad: int, new_len: int, size: int):
    """(out_size, size) bilinear resample matrix for one letterbox axis with
    cv2.resize's EXACT half-pixel convention: src = (dst + 0.5) * size/new - 0.5
    inside the content band [pad, pad + new_len), coordinates clamped to
    [0, size - 1] (cv2's replicate edge handling); zero rows in the gray
    padding bands (the border term fills those). Built with numpy at trace
    time -- the letterbox geometry is static, so one (out, size) matrix is
    shared by the whole batch instead of crop_batch's per-image matrices."""
    mat = np.zeros((out_size, size), np.float32)
    o = np.arange(pad, pad + new_len)
    src = np.clip((o - pad + 0.5) * (size / new_len) - 0.5, 0.0, size - 1.0)
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, size - 1)
    mat[o, i0] += 1.0 - frac
    mat[o, i1] += frac
    return jnp.asarray(mat)


def letterbox_geometry(H: int, W: int, img_size: int):
    """(new_w, new_h, pad_x, pad_y): integer-rounded content size and integer
    pads, matching the host cv2 letterbox so box unmapping is exact."""
    ratio = img_size / max(H, W)
    new_w, new_h = int(round(W * ratio)), int(round(H * ratio))
    return new_w, new_h, (img_size - new_w) // 2, (img_size - new_h) // 2


def rect_canvas_geometry(H: int, W: int, img_size: int, multiple: int = 32):
    """Rectangular detector canvas: same content scale as the square
    letterbox (ratio = img_size / max(H, W), so anchors and box sizes are
    unchanged), but the canvas pads each axis only up to a multiple of the
    detector's total stride instead of a full img_size square.

    The leading pad is the SQUARE letterbox's pad modulo the stride, so every
    content pixel keeps its position relative to the stride-8/16/32 grids:
    YOLO heads are not invariant to sub-cell shifts, and grid congruence
    confines the square-vs-rect score drift to genuine boundary/receptive-
    field effects (bounded in tests/test_detector_tracking.py). For the
    reference ingest cap 800x450 this gives a 416x288 canvas vs 416x416 -- a
    1.44x detector-FLOP reduction spent entirely on gray padding in the
    square form. Returns (canvas_h, canvas_w, new_w, new_h, pad_x, pad_y)."""
    ratio = img_size / max(H, W)
    new_w, new_h = int(round(W * ratio)), int(round(H * ratio))
    pad_x = ((img_size - new_w) // 2) % multiple
    pad_y = ((img_size - new_h) // 2) % multiple
    canvas_w = -(-(new_w + pad_x) // multiple) * multiple
    canvas_h = -(-(new_h + pad_y) // multiple) * multiple
    return canvas_h, canvas_w, new_w, new_h, pad_x, pad_y


@partial(jax.jit, static_argnames=("img_size", "multiple", "compute_dtype"))
def letterbox_device_rect(images: jnp.ndarray, img_size: int = 416,
                          multiple: int = 32,
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """Rectangular-canvas letterbox (see rect_canvas_geometry): cv2.resize
    half-pixel convention, gray padding, (N, canvas_h, canvas_w, 3) output.
    compute_dtype=bfloat16 halves the HBM traffic of this bandwidth-bound op
    for the throughput graph (pixel error ~2/255, comparable to the int8
    detector's own quantization step)."""
    N, H, W = images.shape[0], images.shape[1], images.shape[2]
    canvas_h, canvas_w, new_w, new_h, pad_x, pad_y = rect_canvas_geometry(
        H, W, img_size, multiple
    )
    T = _letterbox_axis_matrix(canvas_h, pad_y, new_h, H).astype(compute_dtype)
    S = _letterbox_axis_matrix(canvas_w, pad_x, new_w, W).astype(compute_dtype)

    imgs = images.astype(compute_dtype)
    if images.dtype == jnp.uint8:
        imgs = imgs / jnp.asarray(255.0, compute_dtype)
    rows = jnp.einsum("oh,bhwc->bowc", T, imgs)
    out = jnp.einsum("bowc,xw->boxc", rows, S)
    coverage = jnp.einsum("o,x->ox", jnp.sum(T, axis=1), jnp.sum(S, axis=1))
    return out + jnp.asarray(128.0 / 255.0, compute_dtype) * (
        jnp.asarray(1.0, compute_dtype) - coverage
    )[None, :, :, None]


@partial(jax.jit, static_argnames=("img_size",))
def letterbox_device(images: jnp.ndarray, img_size: int = 416) -> jnp.ndarray:
    """Aspect-preserving letterbox to (img_size, img_size) with gray padding,
    as a separable matmul resample (~9 ms for 128 x 450 x 800 frames vs
    142 ms for jax.image.resize). Resampling follows cv2.resize's half-pixel
    + edge-clamp convention and the host letterbox's integer-rounded pads
    exactly (tests/test_letterbox.py pins per-pixel agreement), so the device
    and cv2 paths feed the detector identical tensors up to cv2's fixed-point
    rounding.
    """
    N, H, W = images.shape[0], images.shape[1], images.shape[2]
    new_w, new_h, pad_x, pad_y = letterbox_geometry(H, W, img_size)
    T = _letterbox_axis_matrix(img_size, pad_y, new_h, H)  # (out, H)
    S = _letterbox_axis_matrix(img_size, pad_x, new_w, W)  # (out, W)

    imgs = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        imgs = imgs / 255.0
    rows = jnp.einsum("oh,bhwc->bowc", T, imgs)
    out = jnp.einsum("bowc,xw->boxc", rows, S)
    coverage = jnp.einsum("o,x->ox", jnp.sum(T, axis=1), jnp.sum(S, axis=1))
    return out + (128.0 / 255.0) * (1.0 - coverage)[None, :, :, None]


def sample_augmentation(rng, aug_cfg=None, scale_factor: float = 0.3,
                        color_factor: float = 0.2):
    """Training-crop augmentation parameters, parity with the reference's
    do_augmentation (/root/reference/lib/utils/_img_utils.py:30-38): scale ~
    U(1.2, 1.2+scale_factor), color_scale ~ U(1-cf, 1+cf) per channel. The
    reference hard-disables its rot/flip hooks (rot=0, do_flip=False, the
    commented lines at :33-34); here they re-enable through AugConfig
    (config.py): rot ~ clip(N(0,1),-2,2) * rotate_factor, flip ~ Bernoulli(0.5)
    when aug_cfg.flip. Returns (scale, rot_deg, do_flip, color_scale(3,))."""
    scale = rng.uniform(1.2, 1.2 + scale_factor)
    rot = 0.0
    do_flip = False
    if aug_cfg is not None and getattr(aug_cfg, "rotate_factor", 0.0):
        rot = float(np.clip(rng.randn(), -2.0, 2.0) * aug_cfg.rotate_factor)
    if aug_cfg is not None and getattr(aug_cfg, "flip", False):
        do_flip = bool(rng.rand() <= 0.5)
    color_scale = np.array(
        [rng.uniform(1.0 - color_factor, 1.0 + color_factor) for _ in range(3)],
        np.float32,
    )
    return scale, rot, do_flip, color_scale


@partial(jax.jit, static_argnames=("out_size",))
def crop_batch_affine(
    images: jnp.ndarray,   # (N, H, W, C) uint8 or float
    bboxes: jnp.ndarray,   # (N, 4) [cx, cy, w, h]
    scales: jnp.ndarray,   # (N,)
    rots_deg: jnp.ndarray, # (N,)
    flips: jnp.ndarray,    # (N,) bool
    color_scales: jnp.ndarray,  # (N, C)
    out_size: int = 224,
) -> jnp.ndarray:
    """Augmentation crop: rotation / horizontal flip / per-channel color
    scale, [0,1] float output. Sampling follows the reference warp core
    (gen_trans_from_patch_cv + generate_patch_image_cv,
    /root/reference/lib/utils/_img_utils.py:53-101): the inverse map is
    src = c + R(rot) @ ((dst - out/2) * bbox*scale/out), with the flip
    applied as image mirror + c_x -> W-1-c_x before the warp.

    This is the documented GATHER fallback: a rotated warp is not separable,
    and TPUs have no hardware gather, so this path exists for the training/
    augmentation surface (reference parity) -- the rot=0 inference hot path
    must use the separable-matmul crop_batch above.
    """
    imgs = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        imgs = imgs / 255.0
    N, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    bboxes = bboxes.astype(jnp.float32)

    cx = jnp.where(flips, W - bboxes[:, 0] - 1.0, bboxes[:, 0])
    cy = bboxes[:, 1]
    step_x = bboxes[:, 2] * scales / out_size  # (N,)
    step_y = bboxes[:, 3] * scales / out_size

    offs = jnp.arange(out_size, dtype=jnp.float32) - out_size * 0.5
    dx = offs[None, None, :] * step_x[:, None, None]  # (N, 1, out)
    dy = offs[None, :, None] * step_y[:, None, None]  # (N, out, 1)
    rot = rots_deg * (jnp.pi / 180.0)
    cs, sn = jnp.cos(rot)[:, None, None], jnp.sin(rot)[:, None, None]
    src_x = cx[:, None, None] + dx * cs - dy * sn  # (N, out, out)
    src_y = cy[:, None, None] + dx * sn + dy * cs
    # undo the mirror: flipped-image pixel s == original pixel W-1-s
    src_x = jnp.where(flips[:, None, None], W - 1.0 - src_x, src_x)

    x0 = jnp.floor(src_x); y0 = jnp.floor(src_y)
    fx = src_x - x0; fy = src_y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).astype(jnp.float32)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        b = jnp.arange(N)[:, None, None]
        return imgs[b, yc, xc] * valid[..., None]

    out = (
        tap(y0i, x0i) * ((1 - fy) * (1 - fx))[..., None]
        + tap(y0i, x0i + 1) * ((1 - fy) * fx)[..., None]
        + tap(y0i + 1, x0i) * (fy * (1 - fx))[..., None]
        + tap(y0i + 1, x0i + 1) * (fy * fx)[..., None]
    )
    return jnp.clip(out * color_scales[:, None, None, :], 0.0, 1.0)


def crop_center_offset_reference_parity(out_size: int) -> float:
    """The reference maps dst pixel x to src offset (x - out/2) * step.

    cv2.getAffineTransform on the three (center, center+down, center+right)
    point pairs yields exactly dst = center + (src - c) * out/(size*scale),
    i.e. src = c + (x - out/2) * (size*scale)/out with NO half-pixel shift --
    documented here (and pinned by tests) because resample parity with the
    reference hinges on it.
    """
    return out_size * 0.5
