"""Shared helpers for the vectorised REBA/RULA rule engines."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


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


def table_gather(table: jnp.ndarray, *indices: jnp.ndarray) -> jnp.ndarray:
    """Gather table[idx0, idx1, ...] for per-frame index arrays (0-based)."""
    flat = indices[0]
    for dim, idx in zip(table.shape[1:], indices[1:]):
        flat = flat * dim + idx
    return jnp.take(table.reshape(-1), flat)
