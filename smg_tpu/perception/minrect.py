"""Minimum-area rotated rectangles of instance masks, fully batched.

The reference extracts a min-area rect per mask with
cv2.findContours + cv2.minAreaRect + cv2.boxPoints (masks.py:141-147) and
feeds the corners to the PE/OO action geometry (utils.py:316-612). Host
OpenCV calls per object per step would stall the device, so here the rect
is computed as a *rotating-projection sweep*, branchless and vmap-able:

1. reduce the mask to its row-wise and column-wise extreme pixels (for the
   convex silhouettes of our primitives these contain every convex-hull
   vertex);
2. project the candidate points onto K rotated axis pairs (the support
   function of the hull);
3. pick the angle minimizing the bounding-area and reconstruct corners.

With K = 180 the angle is exact to 0.5 deg — tighter than the pixel
quantization cv2 sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_ANGLES = 180


def _extreme_points(mask: jax.Array):
    """Candidate hull points of a (H, W) boolean mask.

    Returns (points (2H + 2W, 2) in (x=col, y=row) coords, valid (2H + 2W,)).
    """
    H, W = mask.shape
    cols = jnp.arange(W, dtype=jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)

    big = jnp.float32(1e9)
    row_any = jnp.any(mask, axis=1)
    row_min = jnp.min(jnp.where(mask, cols[None, :], big), axis=1)
    row_max = jnp.max(jnp.where(mask, cols[None, :], -big), axis=1)
    col_any = jnp.any(mask, axis=0)
    col_min = jnp.min(jnp.where(mask, rows[:, None], big), axis=0)
    col_max = jnp.max(jnp.where(mask, rows[:, None], -big), axis=0)

    pts = jnp.concatenate(
        [
            jnp.stack([row_min, rows], axis=1),
            jnp.stack([row_max, rows], axis=1),
            jnp.stack([cols, col_min], axis=1),
            jnp.stack([cols, col_max], axis=1),
        ],
        axis=0,
    )
    valid = jnp.concatenate([row_any, row_any, col_any, col_any], axis=0)
    return pts, valid


def min_area_rect(mask: jax.Array):
    """Min-area rotated rect of a (H, W) boolean mask.

    Returns:
      corners: (4, 2) float (x, y) pixel coords, cyclically adjacent
        (corner0-corner1 and corner1-corner2 are the two side directions,
        matching how the reference indexes cv2.boxPoints output at
        utils.py:335-355).
      center: (2,) float (x, y).
      size: (2,) float side lengths (|c0-c1|, |c1-c2|).
      angle: () float rect orientation in [0, pi/2).

    Empty masks return zeros (callers gate on their own validity masks).
    """
    pts, valid = _extreme_points(mask)
    x, y = pts[:, 0], pts[:, 1]

    theta = jnp.arange(N_ANGLES, dtype=jnp.float32) * (
        jnp.pi / 2.0 / N_ANGLES
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Projections: (P, K).
    u = x[:, None] * c[None, :] + y[:, None] * s[None, :]
    v = -x[:, None] * s[None, :] + y[:, None] * c[None, :]
    big = jnp.float32(1e9)
    vmask = valid[:, None]
    umin = jnp.min(jnp.where(vmask, u, big), axis=0)
    umax = jnp.max(jnp.where(vmask, u, -big), axis=0)
    vmin = jnp.min(jnp.where(vmask, v, big), axis=0)
    vmax = jnp.max(jnp.where(vmask, v, -big), axis=0)
    area = (umax - umin) * (vmax - vmin)

    k = jnp.argmin(area)
    ck, sk = c[k], s[k]
    u0, u1, v0, v1 = umin[k], umax[k], vmin[k], vmax[k]

    def back(uu, vv):
        return jnp.stack([uu * ck - vv * sk, uu * sk + vv * ck])

    corners = jnp.stack(
        [back(u0, v0), back(u0, v1), back(u1, v1), back(u1, v0)]
    )
    center = back(0.5 * (u0 + u1), 0.5 * (v0 + v1))
    size = jnp.stack([v1 - v0, u1 - u0])  # |c0-c1|, |c1-c2|
    any_valid = jnp.any(valid)
    corners = jnp.where(any_valid, corners, 0.0)
    center = jnp.where(any_valid, center, 0.0)
    size = jnp.where(any_valid, size, 0.0)
    return corners, center, size, theta[k]


# Batched over mask slots: (N, H, W) -> ((N,4,2), (N,2), (N,2), (N,)).
min_area_rects = jax.vmap(min_area_rect)
