"""BatchNorm-statistics semantics of Trainer.update.

The update's train-mode forward mutates per-scene BN statistics which are
where-selected per executed style and then batch-averaged
(train/trainer.py update). These tests pin the intended semantics:

- statistics move ONLY for the executed style's trunk/head (a scene that
  executed a grasp must not move the suction trunk's running stats);
- a mixed-style batch moves each executed style's stats;
- invalid experiences still run the forward (their loss is masked), so
  gating below is about *styles*, not validity — this mirrors the
  reference, whose backprop only ever runs the executed style's net
  (reference trainer.py:294-328).
"""

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.models.affordance import (
    ModelConfig, STYLE_ETS, STYLE_GRASP, STYLE_SUCTION,
)
from smg_tpu.train.trainer import Experience, TrainConfig, Trainer


import pytest

# Heavy integration module: excluded from the fast CI profile (pytest -m 'not slow').
pytestmark = pytest.mark.slow

def _trainer(scene_chunk=2):
    return Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="tiny",
                              input_size=224),
            method="reinforcement", scene_chunk=scene_chunk,
        )
    )


def _exp(styles):
    B = len(styles)
    key = jax.random.PRNGKey(3)
    depth = jax.random.uniform(key, (B, 224, 224), maxval=0.05)
    mask = jnp.zeros((B, 224, 224), bool).at[:, 80:140, 80:140].set(True)
    return Experience(
        scene_depth=depth,
        exec_mask=mask,
        style=jnp.asarray(styles, jnp.int32),
        valid=jnp.ones((B,), bool),
    )


def _stats_changed(before, after) -> dict:
    out = {}
    for group in before:
        b = jax.tree_util.tree_leaves(before[group])
        a = jax.tree_util.tree_leaves(after[group])
        out[group] = any(
            not np.allclose(np.asarray(x), np.asarray(y)) for x, y in
            zip(b, a)
        )
    return out


def test_uniform_grasp_batch_moves_only_grasp_stats():
    t = _trainer()
    st = t.init_state(jax.random.PRNGKey(0))
    exp = _exp([STYLE_GRASP, STYLE_GRASP])
    st2, loss = jax.jit(t.update)(st, exp, jnp.asarray([1.0, 0.0]))
    ch = _stats_changed(st.batch_stats, st2.batch_stats)
    assert ch["grasp_trunk"] and ch["grasp_head"], ch
    assert not ch["suction_trunk"] and not ch["gs_trunk"], ch
    assert not ch["suction_head"] and not ch["gs_head"], ch
    assert np.isfinite(float(loss))


def test_uniform_suction_batch_moves_only_suction_stats():
    t = _trainer()
    st = t.init_state(jax.random.PRNGKey(0))
    exp = _exp([STYLE_SUCTION, STYLE_SUCTION])
    st2, _ = jax.jit(t.update)(st, exp, jnp.asarray([0.5, 0.5]))
    ch = _stats_changed(st.batch_stats, st2.batch_stats)
    assert ch["suction_trunk"] and ch["suction_head"], ch
    assert not ch["grasp_trunk"] and not ch["gs_trunk"], ch


def test_mixed_batch_moves_each_executed_style():
    # Chunk size 2 over a [grasp, grasp, suction, ets] batch: one uniform
    # grasp chunk, one mixed chunk — both dispatch paths exercised.
    t = _trainer(scene_chunk=2)
    st = t.init_state(jax.random.PRNGKey(0))
    exp = _exp([STYLE_GRASP, STYLE_GRASP, STYLE_SUCTION, STYLE_ETS])
    st2, _ = jax.jit(t.update)(
        st, exp, jnp.asarray([1.0, 0.0, 0.5, 2.5])
    )
    ch = _stats_changed(st.batch_stats, st2.batch_stats)
    assert ch["grasp_trunk"] and ch["suction_trunk"] and ch["gs_trunk"], ch


def test_batch_mean_stats_match_manual_where_select():
    """The update's batch-averaged stats equal the mean over scenes of
    (executed style's mutated stats, other styles' stats unchanged) —
    computed manually per scene through the model."""
    from smg_tpu.models import affordance as aff
    from smg_tpu.models.affordance import AffordanceNet

    t = _trainer(scene_chunk=2)
    st = t.init_state(jax.random.PRNGKey(0))
    styles = [STYLE_GRASP, STYLE_SUCTION]
    exp = _exp(styles)
    st2, _ = jax.jit(t.update)(st, exp, jnp.asarray([1.0, 0.0]))

    model = AffordanceNet(t.cfg.model)
    per_scene = []
    for i, s in enumerate(styles):
        _, mut = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            aff.preprocess_depth(exp.scene_depth[i], t.cfg.model)[None],
            aff.preprocess_depth(
                exp.scene_depth[i] * exp.exec_mask[i], t.cfg.model
            )[None, None],
            s, True, method=AffordanceNet.score,
            mutable=["batch_stats"],
        )
        merged = jax.tree_util.tree_map(lambda old, new: new,
                                        st.batch_stats, mut["batch_stats"])
        # Only the executed style's groups actually differ; the flax call
        # returns the full collection either way.
        per_scene.append(merged)
    manual = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).mean(axis=0), *per_scene
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(manual)[0],
        jax.tree_util.tree_flatten_with_path(st2.batch_stats)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4,
            err_msg=str(pa),
        )
