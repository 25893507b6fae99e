"""Fused letterbox + crop resampling as one Pallas kernel.

The throughput graph (throughput.make_full_frame_step) resamples every raw
frame twice: a shared-matrix letterbox feeding the detector
(ops.crop.letterbox_device_rect) and a per-bbox 224x224 crop feeding SPIN
(ops.crop.crop_batch). As separate XLA ops each pass re-reads the 450x800x3
uint8 frame from HBM and materialises a bf16 copy plus a row-resampled
intermediate -- ~5 full-frame HBM passes per step for what is arithmetically
~250 GFLOP of two-tap separable matmuls.

This kernel fuses both resamples over a (B,) grid, one frame per program:
the uint8 frame is DMA'd to VMEM ONCE, both row/column matmul pairs run on
the MXU from VMEM, and only the two small outputs (letterbox canvas + crop)
return to HBM. The per-frame crop interpolation matrices are built in-kernel
from the bbox scalars (SMEM), so the (B, 224, H) / (B, 224, W) tap tensors
the jnp path materialises never exist.

Layout note: frames enter as NCHW (channels-first) so the VMEM blocks tile
on (H, W); a 3-lane NHWC block would pad 3 -> 128 lanes and blow VMEM. The
jit wrapper transposes NHWC <-> NCHW at the boundaries (cheap single passes;
XLA fuses the output transpose into consumers).

Numerics match the jnp pair (letterbox_device_rect + crop_batch) to bf16
rounding: same cv2 half-pixel letterbox matrices (reused verbatim), same
crop tap construction as ops.crop._interp_matrices, same [0,1] + gray-border
semantics. The jnp paths remain the strict-parity default; this kernel is
the throughput option (see tests/test_resample_pallas.py for the parity
bound and bench history in docs/PERF.md).

Reference behaviour being reproduced: crop warp
/root/reference/lib/utils/_img_utils.py:53-101 (rot=0 path) and the
letterbox of the external detector dependency (SURVEY.md section 2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poserisk_release_tpu.ops.crop import (
    _letterbox_axis_matrix,
    rect_canvas_geometry,
)


def _taps_from_coords(coords, size: int, lane_axis: int):
    """Two-tap interpolation matrix for one crop axis, built in-kernel.

    coords: 2-D f32 sample positions -- (out, 1) when lane_axis=1 (returns
    (out, size), taps along lanes) or (1, out) when lane_axis=0 (returns
    (size, out), taps along sublanes; the pre-transposed column matrix).
    Mosaic-safe: int32 iota only, everything stays 2-D, no transposes.
    Semantics match ops.crop._interp_matrices: out-of-image taps carry zero
    weight (constant zero border)."""
    x0 = jnp.floor(coords)
    frac = coords - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    w0 = ((i0 >= 0) & (i0 <= size - 1)).astype(jnp.float32) * (1.0 - frac)
    w1 = ((i1 >= 0) & (i1 <= size - 1)).astype(jnp.float32) * frac
    out = coords.shape[0] if lane_axis == 1 else coords.shape[1]
    shape = (out, size) if lane_axis == 1 else (size, out)
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, lane_axis)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    return (idx == i0c) * w0 + (idx == i1c) * w1


def _bbox_tap_matrices(bbox_ref, H, W, out_size, scale, acc_dtype, b):
    """Per-frame crop tap matrices (t_c (out, H), s_c_t (W, out)) from the
    bbox scalars (cx, cy, w, h). bbox_ref is the WHOLE (B, 4) array in SMEM
    (per-block SMEM slices are not lowerable); indexed by the caller-passed
    grid position `b` (pl.program_id read at kernel top level -- reading it
    inside a pl.when body does not lower in interpret mode). The coordinate
    math is _crop_coords (also the windowed kernel's), so the sampling
    convention has exactly ONE definition."""
    ys, xs = _crop_coords(bbox_ref, out_size, scale, b)
    t_c = _taps_from_coords(ys, H, lane_axis=1).astype(acc_dtype)
    s_c_t = _taps_from_coords(xs, W, lane_axis=0).astype(acc_dtype)
    return t_c, s_c_t


def _load_channel(frame_ref, c, acc_dtype):
    # Mosaic has no direct u8 -> bf16 cast; hop through i32/f32 (VPU-only).
    return frame_ref[0, c].astype(jnp.int32).astype(jnp.float32).astype(acc_dtype)


def _resample(x, t, s_t, acc_dtype):
    rows = jnp.dot(t, x, preferred_element_type=jnp.float32)
    return jnp.dot(rows.astype(acc_dtype), s_t, preferred_element_type=jnp.float32)


def _kernel(bbox_ref, frame_ref, t_lb_ref, s_lb_t_ref, border_ref,
            letter_ref, crop_ref, *, H, W, out_size, scale, acc_dtype,
            det_stride, crop_stride):
    inv255 = 1.0 / 255.0
    b = pl.program_id(0)
    is_det_frame = b % det_stride == 0
    is_crop_frame = b % crop_stride == 0
    # Tap matrices are built unconditionally (tiny VPU work vs the gated
    # resample matmuls); only the resample + write sit under the pl.when.
    t_c, s_c_t = _bbox_tap_matrices(bbox_ref, H, W, out_size, scale,
                                    acc_dtype, b)
    for c in range(3):
        x = _load_channel(frame_ref, c, acc_dtype)

        # Detection-stride mode letterboxes only every Nth frame: the output
        # block index is b // det_stride, so the same letterbox block stays
        # VMEM-resident across the stride's grid steps and exactly one of
        # them (the stride multiple) writes it. The crop is gated the same
        # way under a crop (pose) stride.
        @pl.when(is_det_frame)
        def _write_letterbox(x=x, c=c):
            lb = _resample(x, t_lb_ref[:], s_lb_t_ref[:], acc_dtype)
            letter_ref[0, c] = (lb * inv255 + border_ref[:]).astype(letter_ref.dtype)

        @pl.when(is_crop_frame)
        def _write_crop(x=x, c=c):
            cr = _resample(x, t_c, s_c_t, acc_dtype)
            crop_ref[0, c] = (cr * inv255).astype(crop_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "out_size", "scale", "multiple",
                     "compute_dtype", "interpret", "det_stride",
                     "frame_stride", "crop_stride"),
)
def fused_letterbox_crop(
    frames: jnp.ndarray,  # (B, H, W, 3) uint8
    bboxes: jnp.ndarray,  # (B, 4) [cx, cy, w, h] float
    img_size: int = 416,
    out_size: int = 224,
    scale: float = 1.2,
    multiple: int = 32,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    det_stride: int = 1,
    frame_stride: int = 1,
    crop_stride: int = 1,
):
    """Returns (letterbox (ceil(B'/det_stride), ch, cw, 3), crops
    (ceil(B'/crop_stride), out, out, 3)) where B' = ceil(B / frame_stride),
    both compute_dtype in [0, 1], matching letterbox_device_rect (on
    frames[::frame_stride*det_stride]) + crop_batch (on
    frames[::frame_stride*crop_stride]).

    det_stride > 1 is the detection-stride throughput mode
    (DetectorConfig.detection_stride): the detector letterbox covers only
    every Nth processed frame -- still in ONE HBM pass (the per-frame
    program skips the letterbox matmuls and write on non-multiples).
    crop_stride gates the crop identically (the pose-stride mode when it
    does not divide the detection stride).

    frame_stride > 1 (the pose-stride mode, SpinConfig.pose_stride) walks
    the grid over frames[::frame_stride] WITHOUT materialising that slice:
    the frame BlockSpec index map strides the HBM reads, so only every
    frame_stride-th frame is ever DMA'd. det_stride/crop_stride then apply
    on top of the subsampled grid (throughput.make_full_frame_step passes
    the global strides divided by their gcd)."""
    if frames.dtype != jnp.uint8:
        raise TypeError("fused_letterbox_crop takes uint8 frames (the "
                        "in-kernel u8 -> f32 hop assumes integer pixel "
                        "values); use the jnp letterbox/crop for floats")
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    canvas_h, canvas_w, new_w, new_h, pad_x, pad_y = rect_canvas_geometry(
        H, W, img_size, multiple
    )
    t_lb = _letterbox_axis_matrix(canvas_h, pad_y, new_h, H)
    s_lb = _letterbox_axis_matrix(canvas_w, pad_x, new_w, W)
    coverage = jnp.sum(t_lb, axis=1)[:, None] * jnp.sum(s_lb, axis=1)[None, :]
    border = (128.0 / 255.0) * (1.0 - coverage)

    acc_dtype = compute_dtype
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2))
    bboxes = bboxes.astype(jnp.float32)
    if frame_stride > 1:
        # The (B', 4) bbox slice is negligible host-of-kernel work; the
        # FRAMES are never sliced -- the index map below strides the reads.
        bboxes = bboxes[::frame_stride]

    n_sub = -(-B // frame_stride)  # ceil: frames[::frame_stride] coverage
    n_det = -(-n_sub // det_stride)  # ceil: then every det_stride-th
    n_crop = -(-n_sub // crop_stride)
    letter_chw, crop_chw = pl.pallas_call(
        functools.partial(
            _kernel, H=H, W=W, out_size=out_size, scale=float(scale),
            acc_dtype=acc_dtype, det_stride=det_stride,
            crop_stride=crop_stride,
        ),
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, H, W), lambda b: (b * frame_stride, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((canvas_h, H), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, canvas_w), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((canvas_h, canvas_w), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, canvas_h, canvas_w),
                         lambda b: (b // det_stride, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, out_size, out_size),
                         lambda b: (b // crop_stride, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_det, 3, canvas_h, canvas_w), compute_dtype),
            jax.ShapeDtypeStruct((n_crop, 3, out_size, out_size), compute_dtype),
        ),
        interpret=interpret,
    )(
        bboxes,
        frames_chw,
        t_lb.astype(acc_dtype),
        jnp.transpose(s_lb).astype(acc_dtype),
        border.astype(acc_dtype),
    )
    letter = jnp.transpose(letter_chw, (0, 2, 3, 1))
    crops = jnp.transpose(crop_chw, (0, 2, 3, 1))
    return letter, crops


def _crop_coords(bbox_ref, out_size, scale, b=None):
    """Per-frame global sample coordinates (ys (out, 1), xs (1, out)) from
    the bbox scalars -- the coordinate half of _bbox_tap_matrices (which
    passes its top-level program id `b` explicitly), also consumed by the
    windowed kernel which builds its column taps chunk-locally."""
    if b is None:
        b = pl.program_id(0)
    offs_col = (
        jax.lax.broadcasted_iota(jnp.int32, (out_size, 1), 0).astype(jnp.float32)
        - out_size * 0.5
    )
    offs_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, out_size), 1).astype(jnp.float32)
        - out_size * 0.5
    )
    cx, cy = bbox_ref[b, 0], bbox_ref[b, 1]
    bw, bh = bbox_ref[b, 2], bbox_ref[b, 3]
    ys = offs_col * (bh * scale / out_size) + cy
    xs = offs_row * (bw * scale / out_size) + cx
    return ys, xs


def _window_col_taps(xs, W, xoff, chunk_w, acc_dtype):
    """Column tap matrix (chunk_w, out) for the window columns
    [xoff, xoff + chunk_w): _taps_from_coords(lane_axis=0) semantics with
    row identity = GLOBAL column id (iota + xoff). Taps whose source column
    falls outside this chunk simply match no row (their weight lands in the
    chunk that does contain them); out-of-image taps keep zero weight."""
    x0 = jnp.floor(xs)
    frac = xs - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    w0 = ((i0 >= 0) & (i0 <= W - 1)).astype(jnp.float32) * (1.0 - frac)
    w1 = ((i1 >= 0) & (i1 <= W - 1)).astype(jnp.float32) * frac
    out = xs.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (chunk_w, out), 0) + xoff
    return (
        (idx == jnp.clip(i0, 0, W - 1)) * w0 + (idx == jnp.clip(i1, 0, W - 1)) * w1
    ).astype(acc_dtype)


def _crop_win_kernel(xblk_ref, bbox_ref, frame_ref, crop_ref, t_scratch,
                     acc_scratch, *, H, W, out_size, scale, acc_dtype,
                     chunk_w):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    ys, xs = _crop_coords(bbox_ref, out_size, scale)

    @pl.when(j == 0)
    def _build_row_taps():
        t_scratch[:] = _taps_from_coords(ys, H, lane_axis=1).astype(acc_dtype)

    xoff = (xblk_ref[b] + j) * chunk_w
    s_c = _window_col_taps(xs, W, xoff, chunk_w, acc_dtype)
    for c in range(3):
        x = _load_channel(frame_ref, c, acc_dtype)  # (H, chunk_w)
        rows = jnp.dot(t_scratch[:], x, preferred_element_type=jnp.float32)
        contrib = jnp.dot(
            rows.astype(acc_dtype), s_c, preferred_element_type=jnp.float32
        )

        @pl.when(j == 0)
        def _init(c=c, contrib=contrib):
            acc_scratch[c] = contrib

        @pl.when(j > 0)
        def _accum(c=c, contrib=contrib):
            acc_scratch[c] += contrib

    @pl.when(j == n_j - 1)
    def _write():
        inv255 = 1.0 / 255.0
        for c in range(3):
            crop_ref[0, c] = (acc_scratch[c] * inv255).astype(crop_ref.dtype)


def crop_window_fits(bboxes, scale: float = 1.2, window: int = 384,
                     chunk_w: int = 128) -> bool:
    """Host-side exactness guard for the windowed crop kernel: every frame's
    scaled bbox width (plus the two-tap overhang and the chunk-alignment
    slack) must fit in the window, else crops would silently lose taps --
    callers fall back to the full-width kernel when this is False.

    The slack term is a FULL chunk_w, not chunk_w - 1: the window start is
    floor((xs_min - 1) / chunk_w) * chunk_w and xs_min is real-valued, so
    the left-edge offset (xs_min - 1) mod chunk_w reaches just under
    chunk_w (a chunk_w - 1 bound admitted bboxes whose rightmost
    interpolation tap fell one column past the window -- the crop's right
    edge silently lost up to a full tap weight; regression-pinned in
    tests/test_resample_pallas.py)."""
    import numpy as np

    bboxes = np.asarray(bboxes)
    if bboxes.size == 0:
        return True
    return bool(np.max(bboxes[:, 2]) * scale + 2.0 + chunk_w <= window)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "out_size", "window", "compute_dtype",
                     "interpret"),
)
def crop_batch_pallas_windowed(
    frames: jnp.ndarray,  # (B, H, W, 3) uint8
    bboxes: jnp.ndarray,  # (B, 4) [cx, cy, w, h] float
    scale: float = 1.2,
    out_size: int = 224,
    window: int = 384,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bbox-windowed variant of crop_batch_pallas: each frame's program DMAs
    only `window` columns around the scaled bbox (3 x 128-wide chunks chosen
    by a scalar-prefetched block index) instead of the full frame width --
    ~W/window times less HBM traffic, VPU cast work, and column-pass FLOPs.

    EXACTNESS PRECONDITION (caller-checked, host-side: crop_window_fits):
    max(bbox_w) * scale + 2 + 128 <= window. Bboxes are host-known (SORT
    output) in every product path, so the caller picks this kernel or the
    full-width one per batch. Within the precondition the result equals
    crop_batch_pallas up to f32 partial-sum accumulation order (the bf16
    tolerance class of tests/test_resample_pallas.py).

    Reference behaviour unchanged: crop warp
    /root/reference/lib/utils/_img_utils.py:53-101 (rot=0 path)."""
    if frames.dtype != jnp.uint8:
        raise TypeError("crop_batch_pallas_windowed takes uint8 frames; use "
                        "ops.crop.crop_batch for float inputs")
    chunk_w = 128
    if window % chunk_w:
        raise ValueError(f"window must be a multiple of {chunk_w}")
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    n_win = window // chunk_w
    n_blk_total = -(-W // chunk_w)
    if n_win >= n_blk_total:
        # Window covers the whole width: the plain kernel is strictly better.
        return crop_batch_pallas(
            frames, bboxes, scale=scale, out_size=out_size,
            compute_dtype=compute_dtype, interpret=interpret,
        )

    bboxes = bboxes.astype(jnp.float32)
    xs_min = bboxes[:, 0] - bboxes[:, 2] * (scale * 0.5)
    xblk = jnp.clip(
        jnp.floor((xs_min - 1.0) / chunk_w).astype(jnp.int32),
        0,
        n_blk_total - n_win,
    )
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_win),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, H, chunk_w),
                         lambda b, j, xblk: (b, 0, 0, xblk[b] + j)),
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda b, j, xblk: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((out_size, H), compute_dtype),
            pltpu.VMEM((3, out_size, out_size), jnp.float32),
        ],
    )
    crop_chw = pl.pallas_call(
        functools.partial(
            _crop_win_kernel, H=H, W=W, out_size=out_size, scale=float(scale),
            acc_dtype=compute_dtype, chunk_w=chunk_w,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, out_size, out_size), compute_dtype),
        interpret=interpret,
    )(xblk, bboxes, frames_chw)
    return jnp.transpose(crop_chw, (0, 2, 3, 1))


def _crop_kernel(bbox_ref, frame_ref, crop_ref, *, H, W, out_size, scale,
                 acc_dtype):
    t_c, s_c_t = _bbox_tap_matrices(bbox_ref, H, W, out_size, scale, acc_dtype,
                                    pl.program_id(0))
    inv255 = 1.0 / 255.0
    for c in range(3):
        x = _load_channel(frame_ref, c, acc_dtype)
        cr = _resample(x, t_c, s_c_t, acc_dtype)
        crop_ref[0, c] = (cr * inv255).astype(crop_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "out_size", "compute_dtype", "interpret"),
)
def crop_batch_pallas(
    frames: jnp.ndarray,  # (B, H, W, 3) uint8
    bboxes: jnp.ndarray,  # (B, 4) [cx, cy, w, h] float
    scale: float = 1.2,
    out_size: int = 224,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Crop-only variant of the fused kernel, for the product pose path
    (pipeline.PoseEstimator.run_from_frames), where the letterbox already
    happened in the detection stage: one VMEM pass per frame, crop taps
    built in-kernel, no bf16 frame copy / interp-matrix / row-intermediate
    HBM tensors. Semantics match ops.crop.crop_batch ([0,1], zero border)."""
    if frames.dtype != jnp.uint8:
        raise TypeError("crop_batch_pallas takes uint8 frames (the in-kernel "
                        "u8 -> f32 hop assumes integer pixel values); use "
                        "ops.crop.crop_batch for float inputs")
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2))
    crop_chw = pl.pallas_call(
        functools.partial(
            _crop_kernel, H=H, W=W, out_size=out_size, scale=float(scale),
            acc_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, out_size, out_size), compute_dtype),
        interpret=interpret,
    )(bboxes.astype(jnp.float32), frames_chw)
    return jnp.transpose(crop_chw, (0, 2, 3, 1))
