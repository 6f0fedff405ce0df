"""Self-supervised trunk warm-start (the ImageNet-init substitute).

Renders fresh cluttered scenes every step and trains a trunk + decoder to
reconstruct patch-masked depth heightmaps (train/pretrain.py). The saved
checkpoint initializes all three affordance trunks via
`python -m smg_tpu.cli.main --pretrained_trunks <path>`.

Usage:
    python -m smg_tpu.cli.pretrain_trunks --steps 1000 --batch_size 16 \
        --out logs/trunk_pretrain
"""

from __future__ import annotations

import argparse
import time

import jax
import optax

from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train import checkpoints, pretrain


def train(steps: int, batch_size: int, out: str, seed: int = 0,
          trunk: str = "densenet121", is_cluttered: bool = False,
          lr: float = 1e-3, log_every: int = 20) -> str:
    from smg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = pretrain.PretrainConfig(
        model=ModelConfig(trunk=trunk, input_size=224), lr=lr
    )
    model = pretrain.ReconstructionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jax.numpy.zeros((1, 224, 224, 3)), False,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    from smg_tpu.envs.smg_env import EnvConfig

    batch_fn = pretrain.make_batch_fn(
        cfg, EnvConfig(is_cluttered=is_cluttered, settle_steps=50)
    )

    @jax.jit
    def step(params, stats, opt_state, key):
        inputs, target, hidden = batch_fn(key, batch_size)
        return pretrain.pretrain_step(
            model, params, stats, opt_state, tx, inputs, target, hidden
        )

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, stats, opt_state, loss = step(params, stats, opt_state, k)
        if (i + 1) % log_every == 0 or i == 0:
            print(
                f"pretrain step {i + 1}/{steps} | recon loss "
                f"{float(jax.device_get(loss)):.4f} | "
                f"{time.time() - t0:.1f}s"
            )
    checkpoints.save_params(out, {"params": params, "batch_stats": stats})
    print(f"trunk-pretrain checkpoint: {out}")
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="self-supervised trunk warm-start")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="logs/trunk_pretrain")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trunk", default="densenet121",
                   choices=["densenet121", "tiny"])
    p.add_argument("--is_cluttered", action="store_true", default=False)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)
    train(args.steps, args.batch_size, args.out, args.seed, args.trunk,
          args.is_cluttered, args.lr)


if __name__ == "__main__":
    main()
