"""Instance segmentation of the rendered scene — exact, on-device.

The functional replacement for the reference's Mask-R-CNN stage
(masks.instance_segmentation, reference code/masks.py:97-174): per-object
masks, axis-aligned boxes, min-area-rect corners and centers. Because the
renderer emits an instance-id buffer, segmentation here is *exact*; the
pipeline — masks -> NMS-style visibility gate -> minAreaRect -> centers —
mirrors the reference stage-for-stage so downstream policy code sees the
same interfaces (objects_mask, number, boxes, masks_cter, box_mask_cors).

A learned front-end with the same output contract (for realistic-camera
deployments) lives in smg_tpu.perception.learned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from smg_tpu.perception import minrect
from smg_tpu.physics.state import Objects

# Minimum visible pixel count for an object to be scoreable — the exact
# path's analog of the reference's NMS area gate (masks.py:73: boxes with
# area outside [224^2/60, 224^2/5] are dropped).
MIN_VISIBLE_PIXELS = 16


@struct.dataclass
class Segmentation:
    """Per-slot segmentation of one scene (fixed N slots, masked)."""

    masks: jax.Array          # (N, H, W) bool — instance masks at 224
    valid: jax.Array          # (N,) bool — live, visible objects
    number: jax.Array         # () int32 — count of valid objects
    boxes: jax.Array          # (N, 2, 2) [(x1, y1), (x2, y2)] AABBs
    centers: jax.Array        # (N, 2) (x, y) rect-corner means (masks_cter)
    box_corners: jax.Array    # (N, 4, 2) min-area-rect corners (box_mask_cors)
    rect_sizes: jax.Array     # (N, 2) rect side lengths |c0-c1|, |c1-c2|
    rect_angles: jax.Array    # (N,) rect orientation


def segment(obj: Objects, ids: jax.Array) -> Segmentation:
    """Exact segmentation from the renderer's instance-id buffer.

    Args:
      obj: the scene's object set (for liveness masks).
      ids: (H, W) int32 id buffer from render_heightmap.
    """
    n = obj.pos.shape[0]
    masks = ids[None, :, :] == jnp.arange(n)[:, None, None]  # (N, H, W)
    pix = masks.sum(axis=(1, 2))
    valid = obj.on_table & (pix >= MIN_VISIBLE_PIXELS)

    corners, centers_ma, sizes, angles = minrect.min_area_rects(masks)

    # Axis-aligned boxes from mask extents.
    H, W = ids.shape
    cols = jnp.arange(W, dtype=jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(masks, cols[None, None, :], big), axis=(1, 2))
    x2 = jnp.max(jnp.where(masks, cols[None, None, :], -big), axis=(1, 2))
    y1 = jnp.min(jnp.where(masks, rows[None, :, None], big), axis=(1, 2))
    y2 = jnp.max(jnp.where(masks, rows[None, :, None], -big), axis=(1, 2))
    boxes = jnp.stack(
        [jnp.stack([x1, y1], -1), jnp.stack([x2, y2], -1)], axis=1
    )
    boxes = jnp.where(valid[:, None, None], boxes, 0.0)

    # Centers as the mean of the rect corners, truncated to int like the
    # reference (masks.py:157-161).
    centers = jnp.where(
        valid[:, None], corners.mean(axis=1), 0.0
    ).astype(jnp.int32).astype(jnp.float32)

    return Segmentation(
        masks=masks & valid[:, None, None],
        valid=valid,
        number=valid.sum().astype(jnp.int32),
        boxes=boxes,
        centers=centers,
        box_corners=jnp.where(valid[:, None, None], corners, 0.0),
        rect_sizes=jnp.where(valid[:, None], sizes, 0.0),
        rect_angles=jnp.where(valid, angles, 0.0),
    )
