"""Train the learned segmentation front-end against the exact renderer.

The reference ships a COCO-pretrained Mask-R-CNN for its 448 color frame
(reference code/masks.py:15). This sandbox has no pretrained weights and no
egress, but it has something better: the simulator's own renderer produces
pixel-perfect instance id-buffers, so the fixed-slot segmenter
(perception/learned.SlotSegmenter) trains self-supervised — render a fresh
batch of cluttered scenes every step, supervise per-pixel slot logits on
the id-buffer, repeat. The checkpoint is then consumed by
`python -m smg_tpu.cli.main --segmentation learned --segmenter_checkpoint P`.

Usage:
    python -m smg_tpu.cli.train_segmenter --steps 500 --batch_size 16 \
        --out logs/segmenter
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.perception import learned
from smg_tpu.render import ortho
from smg_tpu.train import checkpoints


def make_batch_fn(cfg: EnvConfig):
    """key -> (inputs (B, H, W, 4), labels (B, H, W) slot ids, -1 = bg)."""
    from smg_tpu.physics import scene as scene_mod

    def one(key):
        scene = scene_mod.reset_scene(
            key, cfg.is_cluttered, cfg.is_testing, cfg.settle_steps
        )
        depth, ids, color = ortho.render_heightmap(scene.objects)
        return learned.segmenter_inputs(color, depth), ids

    def batch(key, B):
        return jax.vmap(one)(jax.random.split(key, B))

    return batch


def train(steps: int, batch_size: int, out: str, seed: int = 0,
          is_cluttered: bool = False, lr: float = 1e-3,
          settle_steps: int = 100, log_every: int = 20) -> str:
    from smg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    env_cfg = EnvConfig(is_cluttered=is_cluttered,
                        settle_steps=settle_steps)
    model, params = learned.init_segmenter(jax.random.PRNGKey(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    batch_fn = make_batch_fn(env_cfg)

    @jax.jit
    def step(params, opt_state, key):
        inputs, ids = batch_fn(key, batch_size)
        return learned.train_step_segmenter(
            model, params, opt_state, tx, inputs, ids
        )

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if (i + 1) % log_every == 0 or i == 0:
            print(
                f"segmenter step {i + 1}/{steps} | loss "
                f"{float(jax.device_get(loss)):.4f} | "
                f"{time.time() - t0:.1f}s"
            )
    checkpoints.save_params(out, params)
    print(f"segmenter checkpoint: {out}")
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="train the slot segmenter")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="logs/segmenter")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--is_cluttered", action="store_true", default=False)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)
    train(args.steps, args.batch_size, args.out, args.seed,
          args.is_cluttered, args.lr)


if __name__ == "__main__":
    main()
