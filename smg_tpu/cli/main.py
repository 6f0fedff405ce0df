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
from smg_tpu.utils import vis as vis_mod
from smg_tpu.utils.logger import Logger
from smg_tpu.utils.profiling import PhaseTimer


def log_step_metrics(logger: Logger, metrics, iteration: int,
                     episode_base: int = 0) -> int:
    """Write the reference's 10 transitions arrays for every scene in the
    batch (executed-action layout from main.py:368-377, etc.).

    `episode_base` = globally completed episodes before this step (resume
    re-hydrates it from the episode_success log); returns the number of
    episodes that ended this step so the caller can advance it."""
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
        # [episode, episode_iter, episode_succ] (main.py:125-126); episodes
        # ending in the same batched step get sequential global numbers.
        logger.write_to_log(
            "episode_success",
            np.stack(
                [episode_base + np.arange(done.size, dtype=np.float64),
                 m.episode_iter[done].astype(np.float64),
                 m.episode_succ[done].astype(np.float64)], axis=1,
            ),
        )
    return int(done.size)


def save_step_imagery(logger: Logger, metrics, iteration: int) -> None:
    """Scene-0 heightmaps + segmentation/action overlays (the reference
    saves these every iteration: logger.py:94-115, the drawing block at
    main.py:252-294)."""
    color = np.asarray(jax.device_get(metrics.color_hm0))
    depth = np.asarray(jax.device_get(metrics.depth_hm0))
    logger.save_heightmaps(iteration, color, depth)
    overlay = vis_mod.overlay_masks(
        color,
        np.asarray(jax.device_get(metrics.seg_masks0)),
        np.asarray(jax.device_get(metrics.seg_boxes0)),
        np.asarray(jax.device_get(metrics.seg_valid0)),
    )
    # Tint the executed object(s) red on top of the instance overlay (the
    # reference's action visualization).
    exec_mask = np.asarray(jax.device_get(metrics.exec_mask0))
    overlay[exec_mask] = 0.5 * overlay[exec_mask] + np.array(
        [0.5, 0.0, 0.0], np.float32
    )
    logger.save_visualizations(iteration, overlay, "action")


@functools.lru_cache(maxsize=1)
def _rgbd_renderer():
    from smg_tpu.core import camera as cam
    from smg_tpu.render import persp

    camera = cam.Camera.overhead()
    return jax.jit(lambda obj: persp.render_rgbd(obj, camera))


def save_step_rgbd(logger: Logger, state, iteration: int) -> None:
    """Scene-0 raw camera RGB-D frame (the reference saves the sensor's
    color/depth images every iteration, logger.py:87-92 called at
    main.py:136-138; here on the --imagery_every cadence)."""
    obj0 = jax.tree_util.tree_map(lambda x: x[0], state.scenes.objects)
    color, depth = _rgbd_renderer()(obj0)
    logger.save_images(
        iteration, np.asarray(jax.device_get(color)),
        np.asarray(jax.device_get(depth)),
    )


def main(argv=None) -> None:
    from smg_tpu.utils.cache import enable_persistent_cache

    # parse_args applies --cpu (jax_platforms override) and must run
    # before anything that can initialize a backend: enabling the
    # compilation cache freezes the platform choice, which both breaks
    # --cpu and grabs the exclusive TPU chip for a CPU-only run.
    cfg = cfg_mod.parse_args(argv)
    enable_persistent_cache()
    print(f"devices: {jax.devices()}")

    if cfg.env.segmentation == "learned":
        # Load the trained SlotSegmenter (cli.train_segmenter) and bake it
        # into the loop as the observation front-end (the Mask-R-CNN-parity
        # path, reference main.py:139).
        import dataclasses

        from smg_tpu.perception import learned

        if not cfg.segmenter_checkpoint:
            raise SystemExit(
                "--segmentation learned requires --segmenter_checkpoint"
            )
        seg_model, seg_template = learned.init_segmenter(
            jax.random.PRNGKey(0)
        )
        seg_params = checkpoints.load_params(
            cfg.segmenter_checkpoint, seg_template
        )
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(
                cfg.loop, segmenter=(seg_model, seg_params)
            )
        )
        print(f"segmenter loaded from: {cfg.segmenter_checkpoint}")

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

    resumed_iteration = 0
    episode_base = 0
    if cfg.continue_logging:
        # Continue the global episode numbering from the reused run's
        # episode_success log (the reference restarted its episode loop
        # variable on resume; monotone numbering is strictly better for
        # the plotting scripts).
        try:
            prev_rows = np.atleast_2d(logger.read_log("episode_success"))
            episode_base = int(prev_rows.shape[0]) if prev_rows.size else 0
        except (OSError, FileNotFoundError, ValueError):
            episode_base = 0
        # Resume: restore the latest full checkpoint from the reused run
        # directory (the reference re-hydrated counters by re-parsing the
        # transitions logs, trainer.preload at trainer.py:118-158; here the
        # checkpoint carries the complete state incl. optimizer).
        latest = ckpt.latest_step()
        if latest is not None:
            state = state.replace(trainer=ckpt.restore(state.trainer))
            # Continue the global step numbering past the restored
            # checkpoint, so post-resume saves are numbered monotonically
            # (a counter restart would write steps 50,100,... below the
            # existing ones, and max_to_keep would garbage-collect them
            # while latest_step() kept returning the stale pre-resume step).
            resumed_iteration = int(
                jax.device_get(state.trainer.iteration)
            )
            print(
                f"Resumed trainer state from checkpoint step {latest}"
                f" (iteration {resumed_iteration})"
            )

    if cfg.pretrained_trunks:
        # Self-supervised warm start: copy the reconstruction-pretrained
        # trunk (+ BN stats) into all three affordance trunks — where the
        # reference loaded ImageNet weights (models.py:22-24,308-310).
        from smg_tpu.train import pretrain

        pcfg = pretrain.PretrainConfig(model=cfg.train.model)
        pmodel = pretrain.ReconstructionModel(pcfg)
        template = pmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), False
        )
        template = {"params": template["params"],
                    "batch_stats": template.get("batch_stats", {})}
        loaded = checkpoints.load_params(cfg.pretrained_trunks, template)
        new_p, new_s = pretrain.load_pretrained_trunks(
            state.trainer.params, state.trainer.batch_stats, loaded
        )
        state = state.replace(
            trainer=state.trainer.replace(
                params=new_p, batch_stats=new_s,
                target_params=jax.tree_util.tree_map(jnp.copy, new_p),
                target_stats=jax.tree_util.tree_map(jnp.copy, new_s),
            )
        )
        print(f"pretrained trunks loaded from: {cfg.pretrained_trunks}")

    if cfg.load_snapshot and cfg.snapshot_file:
        # The snapshot carries params + BN running statistics (the
        # reference's state_dict includes BN buffers, logger.py:121-123);
        # pre-round-3 snapshots were params-only, so fall back for them.
        try:
            loaded = checkpoints.load_params(
                cfg.snapshot_file,
                {"params": state.trainer.params,
                 "batch_stats": state.trainer.batch_stats},
            )
            params, stats = loaded["params"], loaded["batch_stats"]
        except Exception:
            params = checkpoints.load_params(
                cfg.snapshot_file, state.trainer.params
            )
            stats = state.trainer.batch_stats
            print("(params-only snapshot: BN statistics from init)")
        state = state.replace(
            trainer=state.trainer.replace(
                params=params,
                batch_stats=stats,
                target_params=jax.tree_util.tree_map(jnp.copy, params),
                target_stats=jax.tree_util.tree_map(jnp.copy, stats),
            )
        )
        print(f"Pre-trained model snapshot loaded from: {cfg.snapshot_file}")

    if cfg.data_parallel > 1:
        # Multi-chip data parallelism: scenes sharded over the mesh's
        # `data` axis, params/optimizer replicated; XLA inserts the
        # gradient all-reduce over ICI (SURVEY section 2.4).
        from smg_tpu.parallel import mesh as mesh_mod
        from smg_tpu.parallel import sharded

        if cfg.loop.batch_size % cfg.data_parallel != 0:
            raise SystemExit(
                f"--batch_size {cfg.loop.batch_size} must be divisible by "
                f"--data_parallel {cfg.data_parallel}"
            )
        mesh = mesh_mod.make_mesh(cfg.data_parallel)
        state = sharded.place_loop_state(state, mesh)
        step_fn = sharded.make_sharded_step(trainer, cfg.loop, mesh, state)
        print(f"data-parallel mesh: {mesh.shape}")
    else:
        step_fn = jax.jit(functools.partial(train_step, trainer, cfg.loop))

    # Execute the AOT-compiled object directly: dispatching through the
    # jit wrapper re-flattens the ~2000-leaf LoopState pytree on the host
    # every iteration, host-load-sensitive overhead the compiled call
    # avoids (measured on the update bench: scripts/bench_update_modes).
    # NOTE: no donate_argnums — buffer donation asynchronously poisons
    # execution on this TPU platform (INVALID_ARGUMENT at the first
    # readback; bisected 2026-08-19: plain jit ok, AOT-only ok, any
    # donated variant fails). Inputs are copied instead.
    step_fn = step_fn.lower(state).compile()

    episode_target = (
        cfg.testing_episode if cfg.env.is_testing else cfg.training_episode
    )
    iteration = resumed_iteration
    t_start = time.time()
    timer = PhaseTimer()
    while True:
        with timer.phase("step"):
            state, metrics = step_fn(state)
            jax.block_until_ready(metrics.loss)
        with timer.phase("device_get"):
            metrics = jax.device_get(metrics)
        iteration += 1
        episodes = int(jax.device_get(state.counters.episode_idx).sum())
        with timer.phase("log"):
            episode_base += log_step_metrics(
                logger, metrics, iteration, episode_base
            )
            if cfg.imagery_every and iteration % cfg.imagery_every == 0:
                save_step_imagery(logger, metrics, iteration)
                save_step_rgbd(logger, state, iteration)
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
        # Model snapshot for --is_testing --load_snapshot: params + BN
        # running statistics (the reference's logger.save_model
        # state_dict includes BN buffers, logger.py:121-123).
        snap = os.path.join(logger.models_directory, "snapshot")
        checkpoints.save_params(
            snap,
            {"params": state.trainer.params,
             "batch_stats": state.trainer.batch_stats},
        )
        print(f"snapshot: {snap}")
    logger.close()
    print(timer.report())
    print(f"done: {iteration} iterations, {episodes} episodes")


if __name__ == "__main__":
    main()
