"""Greedy IoU non-maximum suppression as fixed-iteration masked updates.

Parity: reference code/NMS.py:8-59 (`py_cpu_nms`) — note its quirks, which
we reproduce exactly for the learned-detection path:
  * candidate order is *index order* after the min/max-area gate (the
    score-sort line is commented out in the reference, NMS.py:25);
  * the area gate uses raw (x2-x1)(y2-y1) while IoU uses +1-inclusive areas.

The exact-segmentation path doesn't need NMS (slots are disjoint by
construction); this exists for learned detectors and for behavioral parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of (N, 2, 2) corner boxes [(x1, y1), (x2, y2)].

    Uses the reference's +1-inclusive pixel areas (NMS.py:23,35-38).
    """
    x1, y1 = boxes[:, 0, 0], boxes[:, 0, 1]
    x2, y2 = boxes[:, 1, 0], boxes[:, 1, 1]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (areas[:, None] + areas[None, :] - inter)


def nms(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float = 0.40,
    min_area: float | None = None,
    max_area: float | None = None,
) -> jax.Array:
    """Greedy NMS keep-mask over fixed slots.

    Args:
      boxes: (N, 2, 2) [(x1, y1), (x2, y2)] boxes.
      valid: (N,) candidate mask (stands in for the score threshold the
        reference applied upstream at masks.py:40).
      iou_thresh: suppression threshold (0.40 at masks.py:73).
      min_area/max_area: the area gate (area/60, area/5 of the 224^2 frame
        at masks.py:73 — pass None to skip).

    Returns keep (N,) boolean mask. Greedy order = slot index order,
    matching the reference's unsorted `order` list.
    """
    n = boxes.shape[0]
    x1, y1 = boxes[:, 0, 0], boxes[:, 0, 1]
    x2, y2 = boxes[:, 1, 0], boxes[:, 1, 1]
    raw_area = (x2 - x1) * (y2 - y1)
    cand = valid
    if min_area is not None:
        cand = cand & (raw_area > min_area)
    if max_area is not None:
        cand = cand & (raw_area < max_area)

    iou = iou_matrix(boxes)

    def body(i, carry):
        keep, alive = carry
        take = alive[i]
        keep = keep.at[i].set(take)
        # Suppress remaining candidates overlapping slot i.
        suppress = take & (iou[i] > iou_thresh)
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return keep, alive

    keep0 = jnp.zeros((n,), bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, cand))
    return keep
