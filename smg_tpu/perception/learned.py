"""Learned instance segmentation: the Mask-R-CNN-parity front-end.

The reference segments its 448 color frame with a COCO-pretrained
Mask-R-CNN (reference code/masks.py:15,31-85) because CoppeliaSim gives it
only pixels. Our renderer gives exact masks, but a *learned* front-end
remains part of the component inventory for camera-realism deployments
(real RGB-D input, domain transfer). TPU-first design choice: instead of a
two-stage detector with dynamic proposal counts (hostile to XLA), the model
is a fully-convolutional *fixed-slot* segmenter — per-pixel logits over
N_SLOTS + background — which matches the framework's dense fixed-slot
world exactly and trains from the exact renderer's id-buffers for free
(self-supervised by the simulator).

The output contract converts into the same `Segmentation` pytree the exact
path produces (masks, boxes, min-area rects, centers), with the
reference's NMS + area gating applied to the predicted masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from smg_tpu.perception import minrect, nms
from smg_tpu.perception.segment import MIN_VISIBLE_PIXELS, Segmentation
from smg_tpu.physics.state import N_SLOTS


@dataclass(frozen=True)
class SegmenterConfig:
    width: int = 32
    depth: int = 3           # down/up levels
    num_slots: int = N_SLOTS
    dtype: str = "bfloat16"


class SlotSegmenter(nn.Module):
    """Small UNet: (H, W, C_in) -> per-pixel logits (H, W, num_slots + 1).

    Channel 0 is background; channel 1 + i claims object slot i. Slot
    identity is learnable because slots are rendered with stable color
    ordering (scene.spawn assigns the palette by slot); for real cameras
    the slot head can be replaced by an embedding-matching head.
    """

    cfg: SegmenterConfig = SegmenterConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        x = x.astype(dt)
        skips = []
        w = self.cfg.width
        for i in range(self.cfg.depth):
            x = nn.Conv(w * (2 ** i), (3, 3), padding=1, dtype=dt)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x))
            x = x.astype(dt)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(w * (2 ** self.cfg.depth), (3, 3), padding=1, dtype=dt)(x)
        x = nn.relu(x)
        for i in reversed(range(self.cfg.depth)):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = nn.Conv(w * (2 ** i), (3, 3), padding=1, dtype=dt)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x))
            x = x.astype(dt)
        x = nn.Conv(self.cfg.num_slots + 1, (1, 1), dtype=dt)(x)
        return x.astype(jnp.float32)


def init_segmenter(key, cfg: SegmenterConfig = SegmenterConfig(),
                   in_channels: int = 4):
    model = SlotSegmenter(cfg)
    variables = model.init(
        key, jnp.zeros((1, 224, 224, in_channels)), False
    )
    return model, variables["params"]


def segmenter_inputs(color_hm: jax.Array, depth_hm: jax.Array) -> jax.Array:
    """RGB + depth channels -> (H, W, 4) input."""
    return jnp.concatenate([color_hm, depth_hm[..., None]], axis=-1)


def train_step_segmenter(model, params, opt_state, tx, batch_inputs,
                         batch_ids, obj_weight: float = 10.0):
    """One supervised step against the exact renderer's id buffers.

    batch_inputs (B, H, W, 4); batch_ids (B, H, W) int32 in [-1, N).
    Object pixels are up-weighted (`obj_weight`) against the dominant
    background class, so the per-pixel CE does not collapse to
    all-background early in training. Returns (params, opt_state, loss).
    """
    labels = batch_ids + 1  # background -> class 0

    def loss_fn(p):
        logits = model.apply({"params": p}, batch_inputs, True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
        w = jnp.where(labels > 0, obj_weight, 1.0)
        return -(w * picked[..., 0]).sum() / w.sum()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def predict_segmentation(model, params, color_hm, depth_hm) -> Segmentation:
    """Predicted masks -> the exact-path Segmentation contract, with the
    reference's NMS + min/max-area gate applied (masks.py:69-83)."""
    x = segmenter_inputs(color_hm, depth_hm)[None]
    logits = model.apply({"params": params}, x, False)[0]
    pred = jnp.argmax(logits, axis=-1) - 1  # (H, W) slot ids, -1 = bg
    n = N_SLOTS
    masks = pred[None, :, :] == jnp.arange(n)[:, None, None]
    pix = masks.sum(axis=(1, 2))
    valid = pix >= MIN_VISIBLE_PIXELS

    corners, centers_ma, sizes, angles = minrect.min_area_rects(masks)

    H, W = pred.shape
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

    # NMS + area gate over predicted boxes — overlap threshold 0.40 and
    # the max-area gate (area/5) from masks.py:73. The reference's MIN
    # area gate (area/60 = 836 px at 224) is NOT kept: it was sized for
    # Mask-R-CNN's spurious proposals on COCO-scale objects, and this
    # catalog's true objects are 19-45 px boxes (361-825 px areas) — the
    # unmodified gate rejected pixel-perfect masks for ENTIRE scenes
    # (measured 2026-08-21: 5/5 objects dropped, IoU 1.0 each; the
    # `--segmentation learned` loop then trained at 27.6% success on
    # near-empty segmentations). The noise floor for this fixed-slot
    # argmax net is the exact path's visibility gate instead
    # (MIN_VISIBLE_PIXELS, already applied to the pixel counts above).
    area = float(H * W)
    keep = nms.nms(boxes, valid, 0.40, float(MIN_VISIBLE_PIXELS), area / 5.0)
    valid = valid & keep

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
