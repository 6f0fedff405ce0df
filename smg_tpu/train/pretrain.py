"""Self-supervised trunk warm-start: masked-depth reconstruction.

The reference initializes its DenseNet-121 trunks from ImageNet
(reference models.py:22,308 `pretrained=True`); this sandbox has no
pretrained weights and no egress (PARITY.md deviation 4). The nearest
TPU-native substitute is self-supervision from the simulator itself:
render cluttered scenes, mask out random patches of the depth heightmap,
and train a trunk + light deconvolutional decoder to reconstruct the
full map (an MAE-style objective — the trunk must learn object shape,
boundary and support structure to inpaint). The trained trunk params can
then initialize all three affordance trunks
(`load_pretrained_trunks`), exactly where torchvision's ImageNet weights
went in the reference.

Entry point: `python -m smg_tpu.cli.pretrain_trunks`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from smg_tpu.models.affordance import ModelConfig, preprocess_depth
from smg_tpu.models.densenet import make_trunk


@dataclass(frozen=True)
class PretrainConfig:
    model: ModelConfig = ModelConfig(input_size=224)
    patch: int = 32          # mask patch size (pixels)
    mask_ratio: float = 0.5  # fraction of patches hidden
    lr: float = 1e-3


class ReconstructionModel(nn.Module):
    """trunk -> stride-32 features -> light deconv decoder -> depth map."""

    cfg: PretrainConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.cfg.model.jdtype
        feat = make_trunk(self.cfg.model.trunk, dt, name="trunk")(x, train)
        h = feat
        # 5 x2-upsamplings back to input resolution.
        for i, w in enumerate((256, 128, 64, 32, 16)):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            h = nn.Conv(w, (3, 3), padding=1, dtype=dt,
                        name=f"dec{i}")(h)
            h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=dt, name="out")(h)
        return h[..., 0].astype(jnp.float32)


def random_patch_mask(key: jax.Array, size: int, patch: int,
                      ratio: float) -> jax.Array:
    """(size, size) bool — True where the input is HIDDEN."""
    g = size // patch
    hide = (
        jax.random.uniform(key, (g, g)) < ratio
    )
    return jnp.repeat(jnp.repeat(hide, patch, axis=0), patch, axis=1)


def make_batch_fn(cfg: PretrainConfig, env_cfg=None):
    """key -> (masked_inputs (B, S, S, 3), target_depth (B, S, S),
    hidden (B, S, S))."""
    from smg_tpu.envs.smg_env import EnvConfig
    from smg_tpu.physics import scene as scene_mod
    from smg_tpu.render import ortho

    env_cfg = env_cfg or EnvConfig(settle_steps=50)

    def one(key):
        k_scene, k_mask = jax.random.split(key)
        scene = scene_mod.reset_scene(
            k_scene, env_cfg.is_cluttered, env_cfg.is_testing,
            env_cfg.settle_steps,
        )
        depth, _, _ = ortho.render_heightmap(scene.objects)
        hidden = random_patch_mask(
            k_mask, depth.shape[0], cfg.patch, cfg.mask_ratio
        )
        inp = preprocess_depth(jnp.where(hidden, 0.0, depth), cfg.model)
        return inp, depth, hidden

    def batch(key, B):
        return jax.vmap(one)(jax.random.split(key, B))

    return batch


def pretrain_step(model, params, stats, opt_state, tx, inputs, target,
                  hidden):
    """One reconstruction step; loss = MSE on the hidden patches (in
    normalized depth units). Returns (params, stats, opt_state, loss)."""
    from smg_tpu.models.affordance import DEPTH_MEAN, DEPTH_STD

    def loss_fn(p):
        pred, mut = model.apply(
            {"params": p, "batch_stats": stats}, inputs, True,
            mutable=["batch_stats"],
        )
        err = (pred - (target - DEPTH_MEAN) / DEPTH_STD) ** 2
        w = hidden.astype(jnp.float32)
        loss = (err * w).sum() / jnp.maximum(w.sum(), 1.0)
        return loss, mut["batch_stats"]

    import optax

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, loss


def load_pretrained_trunks(trainer_params: dict, trainer_stats: dict,
                           pretrained: dict) -> tuple[dict, dict]:
    """Copy a pretrained trunk (+ its BN statistics) into all three
    affordance trunks — where the reference loaded ImageNet weights
    (models.py:22-24,308-310). `pretrained` = {"params": ...,
    "batch_stats": ...} holding the ReconstructionModel's variables."""
    t_params = pretrained["params"]["trunk"]
    t_stats = pretrained.get("batch_stats", {}).get("trunk")
    out_p = dict(trainer_params)
    out_s = dict(trainer_stats)
    for name in ("grasp_trunk", "suction_trunk", "gs_trunk"):
        out_p[name] = jax.tree_util.tree_map(
            lambda _, p: jnp.asarray(p), out_p[name], t_params
        )
        if t_stats is not None:
            out_s[name] = jax.tree_util.tree_map(
                lambda _, s: jnp.asarray(s), out_s[name], t_stats
            )
    return out_p, out_s
