"""Self-supervised trunk warm-start (train/pretrain.py) — the
ImageNet-init substitute (PARITY.md deviation 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train import pretrain
from smg_tpu.train.trainer import TrainConfig, Trainer


import pytest

# Heavy integration module: excluded from the fast CI profile (pytest -m 'not slow').
pytestmark = pytest.mark.slow

def _setup():
    cfg = pretrain.PretrainConfig(
        model=ModelConfig(trunk="tiny", input_size=224), lr=1e-3
    )
    model = pretrain.ReconstructionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), False
    )
    return cfg, model, variables["params"], variables.get("batch_stats", {})


def test_patch_mask_ratio():
    m = pretrain.random_patch_mask(jax.random.PRNGKey(0), 224, 32, 0.5)
    assert m.shape == (224, 224)
    # Patch-aligned: each 32x32 block is constant.
    blocks = np.asarray(m).reshape(7, 32, 7, 32)
    assert (blocks.std(axis=(1, 3)) == 0).all()
    assert 0.2 < float(m.mean()) < 0.8


def test_reconstruction_loss_decreases():
    cfg, model, params, stats = _setup()
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    batch_fn = pretrain.make_batch_fn(cfg)

    @jax.jit
    def step(params, stats, opt_state, key):
        inputs, target, hidden = batch_fn(key, 4)
        return pretrain.pretrain_step(
            model, params, stats, opt_state, tx, inputs, target, hidden
        )

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(25):
        key, k = jax.random.split(key)
        params, stats, opt_state, loss = step(params, stats, opt_state, k)
        losses.append(float(jax.device_get(loss)))
    # Early steps can spike (fresh decoder against normalized depth);
    # require the settled tail to beat the start and be well-scaled.
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert np.mean(losses[-5:]) < 1.0, losses
    assert np.isfinite(losses).all()


def test_load_pretrained_trunks_roundtrip():
    cfg, model, params, stats = _setup()
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="tiny",
                              input_size=224),
            method="reinforcement",
        )
    )
    st = trainer.init_state(jax.random.PRNGKey(2))
    new_p, new_s = pretrain.load_pretrained_trunks(
        st.params, st.batch_stats,
        {"params": params, "batch_stats": stats},
    )
    # All three trunks now equal the pretrained trunk, heads untouched.
    for name in ("grasp_trunk", "suction_trunk", "gs_trunk"):
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(new_p[name])[0],
            jax.tree_util.tree_flatten_with_path(params["trunk"])[0],
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(ka))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_p["grasp_head"])[0],
        jax.tree_util.tree_flatten_with_path(st.params["grasp_head"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Warm-started trainer still scores (shapes/graph compatible).
    st2 = st.replace(params=new_p, batch_stats=new_s)
    depth = jax.random.uniform(jax.random.PRNGKey(3), (1, 224, 224),
                               maxval=0.05)
    masks = jnp.zeros((1, 12, 224, 224), bool).at[:, 0, 80:140, 80:140].set(
        True
    )
    valid = jnp.zeros((1, 12), bool).at[:, 0].set(True)
    scores = trainer.score_scene_batch(st2, depth, masks, valid)
    assert np.isfinite(np.asarray(scores.gra_conf[0, 0])).all()
