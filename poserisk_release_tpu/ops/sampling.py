"""Feature-map sampling utilities (JAX).

Rebuild of the reference's sample_image_feature
(/root/reference/lib/utils/funcs_utils.py:87-93): bilinear lookup of a
feature map at continuous 2-D points, torch grid_sample(align_corners=True)
semantics -- normalised coords in [-1, 1] map linearly onto pixel CENTERS of
the first/last pixels.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_image_feature(
    img_feat: jnp.ndarray,  # (C, H, W) feature map
    xy: jnp.ndarray,  # (N, 2) pixel coordinates in the ORIGINAL image frame
    width: float,
    height: float,
) -> jnp.ndarray:
    """Returns (N, C) bilinear feature samples at the given points.

    Mirrors the reference's normalisation x/width*2-1, y/height*2-1 followed
    by grid_sample(align_corners=True) over the feature map's own grid.
    """
    C, H, W = img_feat.shape
    # Normalised [-1, 1] -> feature pixel coordinates (align_corners=True).
    gx = (xy[:, 0] / width * 2.0 - 1.0 + 1.0) * 0.5 * (W - 1)
    gy = (xy[:, 1] / height * 2.0 - 1.0 + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    # Clip the TRUE neighbour indices, not clipped-x0 + 1: for a point just
    # left of the grid (gx in [-1, 0), x0 = -1) the x1 tap is pixel 0, but
    # clip(x0)+1 would read pixel 1 -- a real divergence from
    # grid_sample(padding_mode='zeros') in the one-pixel border band where
    # exactly one tap is still inside.
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip((x0 + 1).astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip((y0 + 1).astype(jnp.int32), 0, H - 1)

    # Zero-padding outside the grid (grid_sample default padding_mode='zeros').
    vx0 = ((x0 >= 0) & (x0 <= W - 1)).astype(img_feat.dtype)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(img_feat.dtype)
    vy0 = ((y0 >= 0) & (y0 <= H - 1)).astype(img_feat.dtype)
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(img_feat.dtype)

    f00 = img_feat[:, y0i, x0i] * (vy0 * vx0)  # (C, N)
    f01 = img_feat[:, y0i, x1i] * (vy0 * vx1)
    f10 = img_feat[:, y1i, x0i] * (vy1 * vx0)
    f11 = img_feat[:, y1i, x1i] * (vy1 * vx1)

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    out = f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11  # (C, N)
    return out.T


def count_parameters(tree) -> int:
    """Total element count of a parameter pytree (funcs_utils.py:143-144)."""
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
