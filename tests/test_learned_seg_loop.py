"""Learned segmentation end-to-end: train the segmenter on renderer
id-buffers, then run the full training loop with the learned front-end
(EnvConfig.segmentation = "learned") — the Mask-R-CNN-parity capability
(reference main.py:139, masks.py:97) demonstrated in the loop, not just
as a standalone model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smg_tpu.envs.primitives import PrimitiveParams
from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.perception import learned
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import TrainConfig, Trainer


# Heavy integration module: excluded from the fast CI profile (pytest -m 'not slow').
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def trained_segmenter():
    """A briefly-trained SlotSegmenter (enough to beat random by a lot on
    the easy color-coded renderer output)."""
    from smg_tpu.cli.train_segmenter import make_batch_fn

    env_cfg = EnvConfig(settle_steps=20)
    model, params = learned.init_segmenter(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    batch_fn = make_batch_fn(env_cfg)

    @jax.jit
    def step(params, opt_state, key):
        inputs, ids = batch_fn(key, 4)
        return learned.train_step_segmenter(
            model, params, opt_state, tx, inputs, ids
        )

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(jax.device_get(loss)))
    assert losses[-1] < losses[0], losses
    return model, params


def test_loop_runs_on_learned_masks(trained_segmenter):
    env_cfg = EnvConfig(
        is_pe=True, is_oo=True, method="reinforcement", settle_steps=20,
        segmentation="learned",
    )
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="tiny",
                              input_size=224),
            method="reinforcement", scene_chunk=2,
        )
    )
    cfg = LoopConfig(
        env=env_cfg, batch_size=2, reset_settle_steps=10,
        primitive=PrimitiveParams(
            steps_move_above=6, steps_preclose=6, steps_descend=4,
            steps_squeeze=4, steps_lift=4, steps_pad_align=4,
            steps_finish=4,
        ),
        segmenter=trained_segmenter,
    )
    state = init_loop(jax.random.PRNGKey(0), trainer, cfg)
    import functools

    step = jax.jit(functools.partial(train_step, trainer, cfg))
    state, m1 = step(state)
    state, m2 = step(state)
    assert np.isfinite(float(jax.device_get(m2.loss)))
    assert int(jax.device_get(state.trainer.iteration)) == 2
    # The learned front-end actually found objects to act on.
    assert int(jax.device_get(m1.objects_number.sum())) > 0


def test_learned_requires_bundle():
    env_cfg = EnvConfig(segmentation="learned", settle_steps=20)
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="tiny",
                              input_size=224),
            method="reinforcement",
        )
    )
    cfg = LoopConfig(env=env_cfg, batch_size=2, reset_settle_steps=10)
    state = init_loop(jax.random.PRNGKey(0), trainer, cfg)
    with pytest.raises(ValueError, match="segmenter"):
        train_step(trainer, cfg, state)


def test_perfect_predictions_survive_the_gate():
    """A pixel-perfect prediction must come through predict_segmentation
    with every visible object kept. Regression for the round-5 bug: the
    reference's min-area NMS gate (area/60 = 836 px at 224, sized for
    COCO-scale Mask-R-CNN proposals) rejected this catalog's 361-825 px
    objects wholesale, so `--segmentation learned` trained on
    near-empty segmentations (27.6% success vs ~75% with exact masks)
    while the UNet itself was perfect."""
    from smg_tpu.perception import segment as seg_mod
    from smg_tpu.physics import scene as scene_mod
    from smg_tpu.physics.state import N_SLOTS
    from smg_tpu.render import ortho

    scene = scene_mod.reset_scene(jax.random.PRNGKey(43), False, False, 20)
    depth, ids, color = ortho.render_heightmap(scene.objects)
    exact = seg_mod.segment(scene.objects, ids)
    assert int(jax.device_get(exact.valid.sum())) >= 2, "need objects"

    class _Oracle:
        """Stub model: ignores the input, emits one-hot logits of the
        exact id-buffer (channel 0 = background)."""

        def apply(self, _vars, x, _train):
            onehot = jax.nn.one_hot(ids + 1, N_SLOTS + 1) * 10.0
            return onehot[None]

    pred = learned.predict_segmentation(_Oracle(), {}, color, depth)
    np.testing.assert_array_equal(
        jax.device_get(pred.valid), jax.device_get(exact.valid)
    )
    np.testing.assert_array_equal(
        jax.device_get(pred.masks), jax.device_get(exact.masks)
    )


def test_learned_masks_match_exact_after_training(trained_segmenter):
    """On a settled scene the learned masks should substantially overlap
    the exact id-buffer masks (IoU of the union area)."""
    from smg_tpu.perception import segment as seg_mod
    from smg_tpu.physics import scene as scene_mod
    from smg_tpu.render import ortho

    model, params = trained_segmenter
    scene = scene_mod.reset_scene(
        jax.random.PRNGKey(42), False, False, 20
    )
    depth, ids, color = ortho.render_heightmap(scene.objects)
    exact = seg_mod.segment(scene.objects, ids)
    pred = learned.predict_segmentation(model, params, color, depth)
    u_exact = jax.device_get(exact.masks.any(axis=0))
    u_pred = jax.device_get(pred.masks.any(axis=0))
    inter = (u_exact & u_pred).sum()
    union = (u_exact | u_pred).sum()
    assert union > 0
    assert inter / union > 0.3, inter / union
