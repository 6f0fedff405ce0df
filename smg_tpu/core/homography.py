"""Planar homographies in JAX: DLT fit from 4 point pairs + dense warps.

The reference builds its heightmaps by fitting a perspective transform from
four hand-picked image corners to the 224x224 / 448x448 output frames with
OpenCV and warping (reference: code/utils.py:49-66, cv2.getPerspectiveTransform
+ cv2.warpPerspective). Here the fit is a closed-form 8x8 linear solve and the
warp is a gather with either nearest or bilinear sampling — pure XLA, batched,
and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fit_homography(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Fit H (3, 3) such that dst ~ H @ src for 4 point pairs.

    src, dst: (4, 2) arrays of (x, y). Equivalent of
    cv2.getPerspectiveTransform (reference code/utils.py:58-59,66).
    """
    # Standard DLT with h22 = 1: solve A h = b, h in R^8.
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros(4)
    ones = jnp.ones(4)
    A_top = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=1)
    A_bot = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=1)
    A = jnp.concatenate([A_top, A_bot], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)  # (8,)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)


def apply_homography(H: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply H (3, 3) to points (..., 2) -> (..., 2)."""
    x, y = pts[..., 0], pts[..., 1]
    denom = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    u = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / denom
    v = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / denom
    return jnp.stack([u, v], axis=-1)


def warp_perspective(
    img: jax.Array,
    H: jax.Array,
    out_shape: tuple[int, int],
    mode: str = "bilinear",
) -> jax.Array:
    """Warp img (H_in, W_in[, C]) by homography H into (out_h, out_w[, C]).

    Matches cv2.warpPerspective semantics: for each destination pixel (u, v),
    sample the source at H^-1 @ (u, v). Out-of-range samples are 0.
    """
    out_h, out_w = out_shape
    Hinv = jnp.linalg.inv(H)
    vv, uu = jnp.meshgrid(
        jnp.arange(out_h, dtype=img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    src_xy = apply_homography(Hinv, jnp.stack([uu, vv], axis=-1))  # (oh, ow, 2)
    sx, sy = src_xy[..., 0], src_xy[..., 1]
    in_h, in_w = img.shape[0], img.shape[1]

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    imgf = img.astype(jnp.float32)

    def sample(ix, iy):
        ixc = jnp.clip(ix, 0, in_w - 1)
        iyc = jnp.clip(iy, 0, in_h - 1)
        return imgf[iyc, ixc]

    if mode == "nearest":
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        out = sample(ix, iy)
        valid = (ix >= 0) & (ix < in_w) & (iy >= 0) & (iy < in_h)
    else:
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        out = (
            sample(x0, y0) * (1 - fx) * (1 - fy)
            + sample(x0 + 1, y0) * fx * (1 - fy)
            + sample(x0, y0 + 1) * (1 - fx) * fy
            + sample(x0 + 1, y0 + 1) * fx * fy
        )
        valid = (sx >= 0) & (sx <= in_w - 1) & (sy >= 0) & (sy <= in_h - 1)

    out = jnp.where(valid[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else out
