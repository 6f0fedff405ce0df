#!/usr/bin/env python
"""Learned-segmenter quality vs the exact id-buffer (VERDICT r3 #10).

The reference's production perception is a learned detector
(COCO-pretrained Mask-R-CNN, reference code/masks.py:15, score
threshold 0.01 + NMS 0.40 + area gates at masks.py:69-83). The rebuild's
analog is the self-supervised SlotSegmenter; this script reports how
close its masks come to the ground-truth id-buffer on HELD-OUT scenes
(fresh seeds, optionally the testing object catalog):

- per-slot IoU of predicted vs exact masks (matched by slot id — the
  segmenter is trained with stable slot ordering);
- mIoU over ground-truth-visible slots;
- detection rate: fraction of visible objects recovered with IoU >= 0.5;
- false positives: predicted-valid slots with no visible object.

Usage:
  python scripts/eval_segmenter.py --checkpoint logs/segmenter/checkpoint \
      [--scenes 32] [--cluttered] [--testing]

Prints one JSON line (consumed into RESULTS_seg.md).
"""

from __future__ import annotations

import argparse
import json

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--cluttered", action="store_true")
    ap.add_argument("--testing", action="store_true",
                    help="evaluate on the held-out testing catalog")
    ap.add_argument("--seed", type=int, default=123)
    # Hardening arms (VERDICT r4 weak #6: the noise-free ortho benchmark
    # is saturated at mIoU 1.0 and cannot fail):
    ap.add_argument("--depth_noise", type=float, default=0.0,
                    help="additive Gaussian depth noise sigma (m) on the "
                    "segmenter INPUT only (ground truth stays exact); "
                    "simulated depth sensors are ~0.001-0.01")
    ap.add_argument("--perspective", action="store_true",
                    help="feed the segmenter heightmaps produced by the "
                    "perspective raycaster + pointcloud + homography "
                    "pipeline (render/persp.py + core/camera.py — the "
                    "reference's camera path, utils.py:38-68) instead of "
                    "the exact ortho render: interpolation artifacts and "
                    "perspective occlusion are the distribution shift the "
                    "reference's COCO-pretrained Mask-R-CNN had to absorb")
    args = ap.parse_args()

    from smg_tpu.envs import smg_env
    from smg_tpu.perception import learned
    from smg_tpu.render import ortho
    from smg_tpu.train import checkpoints

    model, params0 = learned.init_segmenter(jax.random.PRNGKey(0))
    params = checkpoints.load_params(args.checkpoint, params0)

    ecfg = smg_env.EnvConfig(
        is_cluttered=args.cluttered, is_testing=args.testing
    )
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.scenes)
    scenes = jax.jit(jax.vmap(lambda k: smg_env.reset(k, ecfg)))(keys)

    render = jax.jit(jax.vmap(lambda o: ortho.render_heightmap(o)))
    depth, ids, color = render(scenes.objects)

    # Segmenter INPUTS may go through a harder path; the id-buffer ground
    # truth above stays exact.
    in_color, in_depth = color, depth
    if args.perspective:
        from smg_tpu.core import camera as cam
        from smg_tpu.render import persp

        camera = cam.Camera.reference_overhead()

        def persp_hm(o):
            c_img, d_img, _ = persp.render_reference_rgbd(o, camera)
            c_hm, d_hm, _, _, _ = cam.get_heightmap(
                c_img, d_img, camera.intrinsics, camera.pose
            )
            return c_hm, d_hm

        in_color, in_depth = jax.jit(jax.vmap(persp_hm))(scenes.objects)
    if args.depth_noise > 0.0:
        nkey = jax.random.PRNGKey(args.seed + 1)
        in_depth = in_depth + args.depth_noise * jax.random.normal(
            nkey, in_depth.shape
        )

    def pred_one(c, d):
        x = learned.segmenter_inputs(c, d)[None]
        logits = model.apply({"params": params}, x, False)[0]
        return jnp.argmax(logits, axis=-1) - 1  # (H, W), -1 = bg

    pred = jax.jit(jax.vmap(pred_one))(in_color, in_depth)

    ids = np.asarray(ids)
    pred = np.asarray(pred)
    n_slots = int(scenes.objects.pos.shape[1])

    from smg_tpu.perception.segment import MIN_VISIBLE_PIXELS as min_pix

    ious, detected, visible, false_pos = [], 0, 0, 0
    for b in range(ids.shape[0]):
        for s in range(n_slots):
            gt = ids[b] == s
            pd = pred[b] == s
            if gt.sum() >= min_pix:
                visible += 1
                inter = (gt & pd).sum()
                union = (gt | pd).sum()
                iou = inter / max(union, 1)
                ious.append(float(iou))
                if iou >= 0.5:
                    detected += 1
            elif pd.sum() >= min_pix:
                false_pos += 1

    bg_gt = ids < 0
    bg_pd = pred < 0
    pixel_acc = float((bg_gt == bg_pd).mean())

    print(json.dumps({
        "checkpoint": args.checkpoint,
        "scenes": args.scenes,
        "catalog": "testing" if args.testing else "training",
        "cluttered": bool(args.cluttered),
        "depth_noise": args.depth_noise,
        "perspective": bool(args.perspective),
        "visible_objects": visible,
        "miou": round(float(np.mean(ious)) if ious else 0.0, 4),
        "detection_rate_iou50": round(detected / max(visible, 1), 4),
        "false_positive_slots": false_pos,
        "fg_bg_pixel_acc": round(pixel_acc, 4),
    }))


if __name__ == "__main__":
    main()
