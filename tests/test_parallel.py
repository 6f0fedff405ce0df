"""Multi-chip data-parallel path: shardings + numerical equivalence.

The reference has no parallelism (SURVEY section 2.4) — these tests cover
the TPU-native scaling axis: the full train_step jitted over an 8-device
`data` mesh (virtual CPU devices, conftest.py), asserting that

- the sharded step's outputs actually carry the pinned shardings
  (scenes/counters/prev/metrics split over `data`, trainer replicated), and
- two sharded steps produce the same numbers as two unsharded steps
  (the mesh changes placement and the gradient all-reduce, not semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.envs.primitives import PrimitiveParams
from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.parallel import mesh as mesh_mod
from smg_tpu.parallel import sharded
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import TrainConfig, Trainer


N_DEV = 8


# Heavy integration module: excluded from the fast CI profile (pytest -m 'not slow').
pytestmark = pytest.mark.slow

def _tiny_setup():
    env_cfg = EnvConfig(
        is_pe=True, is_oo=True, is_ets=False, method="reinforcement",
        settle_steps=20,
    )
    model_cfg = ModelConfig(
        method="reinforcement", trunk="tiny", input_size=224
    )
    trainer = Trainer(
        TrainConfig(model=model_cfg, method="reinforcement", is_ets=False,
                    scene_chunk=N_DEV)
    )
    loop_cfg = LoopConfig(
        env=env_cfg,
        batch_size=N_DEV,
        reset_settle_steps=10,
        primitive=PrimitiveParams(
            steps_move_above=6, steps_preclose=6, steps_descend=4,
            steps_squeeze=4, steps_lift=4, steps_pad_align=4,
            steps_finish=4,
        ),
    )
    return trainer, loop_cfg


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, jax.devices()
    return mesh_mod.make_mesh(N_DEV)


@pytest.fixture(scope="module")
def runs(mesh):
    """Two steps each of the sharded and unsharded step from one init."""
    trainer, loop_cfg = _tiny_setup()
    state0 = init_loop(jax.random.PRNGKey(0), trainer, loop_cfg)

    # Unsharded steps FIRST: place_loop_state may zero-copy alias state0's
    # buffers (XLA:CPU does), so run the unsharded path before anything
    # touches the placed copy.
    import functools
    u_step = jax.jit(functools.partial(train_step, trainer, loop_cfg))
    u_state = state0
    u_state, u_m1 = u_step(u_state)
    u_state, u_m2 = u_step(u_state)

    s_state = sharded.place_loop_state(state0, mesh)
    s_step = sharded.make_sharded_step(trainer, loop_cfg, mesh, s_state)
    s_state, s_m1 = s_step(s_state)
    s_state, s_m2 = s_step(s_state)
    jax.block_until_ready((s_m2, u_m2))
    return s_state, (s_m1, s_m2), u_state, (u_m1, u_m2)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"data": N_DEV}


def test_placed_state_shardings(mesh):
    trainer, loop_cfg = _tiny_setup()
    state = init_loop(jax.random.PRNGKey(0), trainer, loop_cfg)
    state = sharded.place_loop_state(state, mesh)
    data = mesh_mod.scene_sharding(mesh)
    repl = mesh_mod.replicated(mesh)
    for leaf in jax.tree_util.tree_leaves(state.scenes):
        assert leaf.sharding.is_equivalent_to(data, leaf.ndim), leaf.sharding
    for leaf in jax.tree_util.tree_leaves(state.trainer.params):
        assert leaf.sharding.is_equivalent_to(repl, leaf.ndim), leaf.sharding


def test_step_output_shardings(runs, mesh):
    s_state, (s_m1, s_m2), _, _ = runs
    data = mesh_mod.scene_sharding(mesh)
    repl = mesh_mod.replicated(mesh)
    # Per-scene outputs stay split over `data`; the batch axis is really
    # distributed (each shard holds B / N_DEV scenes).
    for leaf in jax.tree_util.tree_leaves(s_state.scenes):
        assert leaf.sharding.is_equivalent_to(data, leaf.ndim)
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert all(sh[0] == leaf.shape[0] // N_DEV for sh in shard_shapes)
    for leaf in jax.tree_util.tree_leaves(s_state.trainer.params):
        assert leaf.sharding.is_equivalent_to(repl, leaf.ndim)
    assert s_m2.loss.sharding.is_equivalent_to(repl, s_m2.loss.ndim)
    assert s_m2.reward.sharding.is_equivalent_to(data, s_m2.reward.ndim)


def test_sharded_matches_unsharded(runs):
    s_state, (s_m1, s_m2), u_state, (u_m1, u_m2) = runs
    for s_m, u_m in ((s_m1, u_m1), (s_m2, u_m2)):
        np.testing.assert_allclose(
            jax.device_get(s_m.loss), jax.device_get(u_m.loss),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            jax.device_get(s_m.action), jax.device_get(u_m.action)
        )
        np.testing.assert_allclose(
            jax.device_get(s_m.reward), jax.device_get(u_m.reward),
            rtol=1e-6,
        )
    # Trainer state (params after 2 Adam steps) agrees across placements.
    # Tolerance note: the sharded batch-mean gradient reduces in a
    # different order than the single-device one; for near-zero gradients
    # Adam's m/(sqrt(v)+eps) direction amplifies that last-ulp noise, so a
    # handful of params can differ by up to ~1 lr-step (1e-4) after two
    # updates without any semantic divergence.
    s_leaves = jax.tree_util.tree_leaves(s_state.trainer.params)
    u_leaves = jax.tree_util.tree_leaves(u_state.trainer.params)
    for s_l, u_l in zip(s_leaves, u_leaves):
        np.testing.assert_allclose(
            jax.device_get(s_l), jax.device_get(u_l), rtol=5e-2, atol=3e-4,
        )
    assert int(jax.device_get(s_state.trainer.iteration)) == 2
    # Step 2 trained on real (valid) experience.
    assert bool(jax.device_get(s_state.prev.exp.valid.any()))
