"""Shared helpers for the vectorised REBA/RULA rule engines."""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def chain(branches: Sequence[Tuple[jnp.ndarray, object]], default) -> jnp.ndarray:
    """Vectorised if/elif/else: first true branch wins, like Python's chain.

    `branches` is an ordered list of (condition_array, value) pairs; `default`
    is the else value. Implemented with jnp.select so the whole frame axis
    evaluates in one fused op while preserving the reference's branch
    ordering semantics (critical: several reference rules rely on earlier
    branches shadowing later, logically-overlapping ones).
    """
    conds = [jnp.asarray(c) for c, _ in branches]
    shape = jnp.broadcast_shapes(*[c.shape for c in conds]) if conds else ()
    vals = [jnp.broadcast_to(jnp.asarray(v, jnp.int32), shape) for _, v in branches]
    default_arr = jnp.broadcast_to(jnp.asarray(default, jnp.int32), shape)
    return jnp.select(conds, vals, default_arr)


SCORE_CHUNK_MAX = 1024


def score_chunk_size(n_frames: int) -> int:
    """Frame-axis bucket for one scoring dispatch: the next power of two,
    floored at 32 and capped at SCORE_CHUNK_MAX."""
    n = max(n_frames, 1)
    return min(SCORE_CHUNK_MAX, max(32, 1 << (n - 1).bit_length()))


def frame_scores_chunked(
    score_fn: Callable, poses: np.ndarray, info_packed
) -> Dict[str, np.ndarray]:
    """Dispatch a per-frame scoring jit (reba/rula_frame_scores) in
    fixed-bucket chunks along the frame axis.

    Scoring is purely per-frame (no cross-frame ops anywhere in the rule
    chains, /root/reference/lib/utils/reba.py:53 is a frame loop), so
    splitting the frame axis and zero-padding the tail is exact. Without
    this, every distinct clip length compiled a fresh XLA graph per scorer
    -- seconds per video on a real host (and 40-90 s through this image's
    relay). Chunk sizes are powers of two in [32, SCORE_CHUNK_MAX], so any
    mix of clip/window lengths reuses at most ~6 compiled shapes per scorer
    for the lifetime of the process.

    Dtype policy: the engine scores at the INPUT's precision. The reference
    evaluates its rule chains on float64 euler angles (numpy scalars from
    cv2.Rodrigues, reba.py:50-392), and the thresholds are integers, so an
    angle within f32-rounding distance of a threshold (e.g. 110 - 1e-6,
    which rounds to exactly 110.0 in f32) flips a branch if the engine
    downcasts -- caught by tests/test_reference_differential.py's epsilon
    band. Under production x64-disabled JAX, jnp.asarray performs the
    f64 -> f32 rounding regardless (and the pipeline's own euler input is
    already f32 off the device), so this preserves the production graphs
    bit-identically while x64 hosts get the reference's f64 semantics.
    """
    poses = np.asarray(poses)
    if not (poses.dtype == np.float64 and jax.config.jax_enable_x64):
        poses = np.asarray(poses, np.float32)
    n_frames = poses.shape[0]
    info_dev = jnp.asarray(info_packed)
    chunk = score_chunk_size(n_frames)
    outs = []
    for start in range(0, max(n_frames, 1), chunk):
        part = poses[start : start + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = np.concatenate(
                [part, np.zeros((pad,) + part.shape[1:], part.dtype)]
            )
        outs.append(jax.device_get(score_fn(jnp.asarray(part), info_dev)))
    return {
        k: np.concatenate([o[k] for o in outs], axis=0)[:n_frames]
        for k in outs[0]
    }


def table_gather(table: jnp.ndarray, *indices: jnp.ndarray) -> jnp.ndarray:
    """Gather table[idx0, idx1, ...] for per-frame index arrays (0-based)."""
    flat = indices[0]
    for dim, idx in zip(table.shape[1:], indices[1:]):
        flat = flat * dim + idx
    return jnp.take(table.reshape(-1), flat)
