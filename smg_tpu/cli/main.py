"""Experiment driver: the reference main.py, batched and on-device.

Usage mirrors the reference (reference README.md:40-113), e.g.:

    python -m smg_tpu.cli.main --is_sim --method reactive --is_pe --is_oo \
        --explore_rate_decay
    python -m smg_tpu.cli.main --is_sim --method reinforcement --is_ets \
        --is_pe --is_oo --is_cluttered
    python -m smg_tpu.cli.main --is_testing --load_snapshot \
        --snapshot_file logs/<ts>/models/snapshot

plus TPU-native knobs: --batch_size N --trunk tiny|densenet121
--input_size 224|640.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.core import camera as cam
from smg_tpu.train import checkpoints
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import Trainer
from smg_tpu.utils import config as cfg_mod
from smg_tpu.utils.logger import Logger


def log_step_metrics(logger: Logger, metrics, iteration: int) -> None:
    """Write the reference's 10 transitions arrays for every scene in the
    batch (executed-action layout from main.py:368-377, etc.)."""
    m = jax.device_get(metrics)
    B = m.action.shape[0]
    act_rows = np.concatenate(
        [m.action[:, None].astype(np.float64), m.best_pix.astype(np.float64)],
        axis=1,
    )
    logger.write_to_log("executed-action", act_rows)
    logger.write_to_log("label-value", m.label_value[:, None])
    logger.write_to_log("reward-value", m.reward[:, None])
    logger.write_to_log("predicted-value", m.predicted_value[:, None])
    logger.write_to_log("use-heuristic", np.zeros((B, 1)))
    # Testing mode logs exploit=1 (fixing the reference's unbound
    # explore_actions NameError in testing, main.py:242).
    logger.write_to_log(
        "is-exploit", (1 - m.explored.astype(np.float64))[:, None]
    )
    logger.write_to_log("grasping_type", m.action[:, None].astype(np.float64))
    logger.write_to_log("training_loss",
                        np.asarray([[iteration, float(m.loss)]]))
    done = np.nonzero(m.episodes_done)[0]
    if done.size:
        logger.write_to_log("clearance", np.full((done.size, 1), iteration))
        logger.write_to_log(
            "episode_success",
            np.stack(
                [done.astype(np.float64),
                 np.zeros(done.size),
                 m.episode_succ[done].astype(np.float64)], axis=1,
            ),
        )


def main(argv=None) -> None:
    cfg = cfg_mod.parse_args(argv)
    print(f"devices: {jax.devices()}")

    trainer = Trainer(cfg.train)
    logger = Logger(cfg.continue_logging, cfg.logging_directory)
    logger.save_camera_info(cam.DEFAULT_INTRINSICS, np.eye(4), 1.0)
    logger.save_heightmap_info(cam.WORKSPACE_LIMITS, cam.HEIGHTMAP_RESOLUTION)
    logger.save_config(cfg.to_dict())

    ckpt = checkpoints.CheckpointManager(
        os.path.join(logger.models_directory, "ckpt")
    )

    key = jax.random.PRNGKey(cfg.seed)
    print("initializing scenes + model...")
    state = init_loop(key, trainer, cfg.loop)

    if cfg.continue_logging:
        # Resume: restore the latest full checkpoint from the reused run
        # directory (the reference re-hydrated counters by re-parsing the
        # transitions logs, trainer.preload at trainer.py:118-158; here the
        # checkpoint carries the complete state incl. optimizer).
        latest = ckpt.latest_step()
        if latest is not None:
            state = state.replace(trainer=ckpt.restore(state.trainer))
            print(f"Resumed trainer state from checkpoint step {latest}")

    if cfg.load_snapshot and cfg.snapshot_file:
        params = checkpoints.load_params(
            cfg.snapshot_file, state.trainer.params
        )
        state = state.replace(
            trainer=state.trainer.replace(
                params=params,
                target_params=jax.tree_util.tree_map(jnp.copy, params),
            )
        )
        print(f"Pre-trained model snapshot loaded from: {cfg.snapshot_file}")

    step_fn = jax.jit(functools.partial(train_step, trainer, cfg.loop))

    episode_target = (
        cfg.testing_episode if cfg.env.is_testing else cfg.training_episode
    )
    iteration = 0
    t_start = time.time()
    while True:
        state, metrics = step_fn(state)
        iteration += 1
        episodes = int(jax.device_get(state.counters.episode_idx).sum())
        log_step_metrics(logger, metrics, iteration)
        succ_rate = float(
            jax.device_get(
                (
                    (metrics.grasp_success > 0)
                    | (metrics.suction_success > 0)
                    | (metrics.gs_success > 0)
                ).mean()
            )
        )
        print(
            f"{'Testing' if cfg.env.is_testing else 'Training'} iteration:"
            f" {iteration} | episodes: {episodes} | loss:"
            f" {float(jax.device_get(metrics.loss)):.4f} | success-rate:"
            f" {succ_rate:.3f} | {time.time() - t_start:.1f}s"
        )
        if not cfg.env.is_testing:
            ckpt.maybe_save(iteration, state.trainer)
        if episodes >= episode_target:
            break
        if 0 < cfg.max_iterations <= iteration:
            break

    if not cfg.env.is_testing:
        ckpt.save(iteration, state.trainer)
        # Params-only snapshot for --is_testing --load_snapshot
        # (the reference's logger.save_model state_dict, logger.py:121-123).
        snap = os.path.join(logger.models_directory, "snapshot")
        checkpoints.save_params(snap, state.trainer.params)
        print(f"snapshot: {snap}")
    logger.close()
    print(f"done: {iteration} iterations, {episodes} episodes")


if __name__ == "__main__":
    main()
