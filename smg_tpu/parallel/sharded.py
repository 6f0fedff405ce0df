"""Sharded training step: the full loop over a device mesh.

`make_sharded_step` jits `train_loop.train_step` with explicit shardings:
per-scene state (scenes, counters, prev experience, metrics) split over the
`data` axis, trainer state (params, target, optimizer, BN stats) and RNG
replicated. XLA inserts the gradient all-reduce for the batch-mean loss and
the metric reductions — the collectives ride ICI, the host stays out of the
hot path entirely.
"""

from __future__ import annotations

import functools

import jax

from smg_tpu.parallel import mesh as mesh_mod
from smg_tpu.train import loop as train_loop
from smg_tpu.train.trainer import Trainer


def _loopstate_shardings(mesh, state: train_loop.LoopState):
    """Sharding pytree matching a LoopState: batch-leading leaves on
    `data`, trainer + rng replicated."""
    data = mesh_mod.scene_sharding(mesh)
    repl = mesh_mod.replicated(mesh)
    return train_loop.LoopState(
        scenes=jax.tree_util.tree_map(lambda _: data, state.scenes),
        trainer=jax.tree_util.tree_map(lambda _: repl, state.trainer),
        counters=jax.tree_util.tree_map(lambda _: data, state.counters),
        prev=jax.tree_util.tree_map(lambda _: data, state.prev),
        key=repl,
    )


def _metrics_shardings(mesh):
    data = mesh_mod.scene_sharding(mesh)
    repl = mesh_mod.replicated(mesh)
    return train_loop.StepMetrics(
        loss=repl, reward=data, label_value=data, predicted_value=data,
        action=data, explored=data, best_pix=data, objects_number=data,
        episodes_done=data, episode_iter=data, episode_succ=data,
        grasp_success=data,
        suction_success=data, gs_success=data,
        # Scene-0 imagery has no batch axis; it replicates (a gather from
        # the shard holding scene 0).
        color_hm0=repl, depth_hm0=repl, exec_mask0=repl, seg_masks0=repl,
        seg_boxes0=repl, seg_valid0=repl,
    )


def place_loop_state(state: train_loop.LoopState, mesh):
    """Distribute an initialized LoopState onto the mesh.

    The placed arrays may zero-copy alias the source's buffers (XLA:CPU
    does this for compatible layouts); callers that keep using the
    source afterwards should treat it as read-only. Every caller rebinds
    (`state = place_loop_state(state, mesh)`)."""
    sh = _loopstate_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_sharded_step(trainer: Trainer, cfg: train_loop.LoopConfig, mesh,
                      state_template: train_loop.LoopState):
    """jit of train_step with in/out shardings pinned to the mesh."""
    in_sh = _loopstate_shardings(mesh, state_template)
    out_sh = (in_sh, _metrics_shardings(mesh))
    step = functools.partial(train_loop.train_step, trainer, cfg)
    # No donate_argnums: buffer donation asynchronously poisons execution
    # on the target TPU platform (INVALID_ARGUMENT at first readback;
    # bisected 2026-08-19 — see cli/main.py). The input copy costs one
    # state-sized HBM round trip per step.
    return jax.jit(step, in_shardings=(in_sh,), out_shardings=out_sh)
