"""The batched multistage training loop — main.py's episode/step spine.

One `train_step` = the body of the reference's per-step loop
(reference code/main.py:106-422) over a whole scene batch:

  observe -> segment -> score (O(N)+O(N^2) nets, batched) -> arbitrate
  -> PE/OO geometry -> [delayed: label + update on the previous step]
  -> execute primitive -> counters / episode bookkeeping / auto-reset

Scenes run *continuously*: a scene whose episode terminates (cleared /
stuck / success cap, main.py:121) is re-spawned in place, so the batch
always advances in lockstep — the vectorized form of the reference's
sequential episode loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import struct

from smg_tpu.envs import primitives as prim
from smg_tpu.envs import smg_env as env
from smg_tpu.physics import scene as scene_mod
from smg_tpu.physics import stepper
from smg_tpu.physics.state import Scene
from smg_tpu.policy import arbitrate as arb
from smg_tpu.policy.arbitrate import (
    ACTION_GRASP,
    ACTION_SUCTION,
    ActionChoice,
)
from smg_tpu.train.trainer import Experience, Trainer, TrainerState


@dataclass(frozen=True)
class LoopConfig:
    env: env.EnvConfig = field(default_factory=env.EnvConfig)
    batch_size: int = 8
    explore_rate_decay: bool = False  # main.py:443
    reset_settle_steps: int = 100
    primitive: prim.PrimitiveParams = field(
        default_factory=prim.PrimitiveParams
    )
    # Primitive executor: "batched" rolls physics phases through the
    # Pallas fast stepper (TPU), "vmap" uses the per-scene reference path,
    # "auto" picks batched on TPU.
    executor: str = "auto"
    # Learned segmentation front-end: a (model, params) pair consumed when
    # env.segmentation == "learned". The params are frozen during grasp
    # training (the segmenter trains separately against the exact
    # renderer, cli/train_segmenter.py) and bake into the jitted step as
    # constants. eq/hash exclude it so LoopConfig stays usable as a
    # static jit argument.
    segmenter: tuple | None = field(
        default=None, compare=False, hash=False
    )


@struct.dataclass
class EpisodeCounters:
    """Per-scene episode bookkeeping (main.py:77,94-95,304-313)."""

    no_change: jax.Array      # (B, 2) [grasp-family, suction] fail streaks
    episode_iter: jax.Array   # (B,)
    episode_succ: jax.Array   # (B,)
    episode_idx: jax.Array    # (B,) episodes completed in this scene slot

    @staticmethod
    def zeros(B: int) -> "EpisodeCounters":
        return EpisodeCounters(
            no_change=jnp.zeros((B, 2), jnp.int32),
            episode_iter=jnp.zeros((B,), jnp.int32),
            episode_succ=jnp.zeros((B,), jnp.int32),
            episode_idx=jnp.zeros((B,), jnp.int32),
        )


@struct.dataclass
class PrevStep:
    """The prev_* carry (main.py:399-418)."""

    exp: Experience                 # batched (B, ...)
    choice: ActionChoice            # batched
    outcome: env.StepOutcome        # batched
    objects_number: jax.Array       # (B,)


@struct.dataclass
class LoopState:
    scenes: Scene                   # batched
    trainer: TrainerState
    counters: EpisodeCounters
    prev: PrevStep
    key: jax.Array


@struct.dataclass
class StepMetrics:
    loss: jax.Array                 # ()
    reward: jax.Array               # (B,)
    label_value: jax.Array          # (B,)
    predicted_value: jax.Array      # (B,)
    action: jax.Array               # (B,)
    explored: jax.Array             # (B,)
    best_pix: jax.Array             # (B, 6)
    objects_number: jax.Array       # (B,)
    episodes_done: jax.Array        # (B,) bool
    episode_iter: jax.Array         # (B,) steps into the episode
    episode_succ: jax.Array         # (B,)
    grasp_success: jax.Array        # (B,)
    suction_success: jax.Array      # (B,)
    gs_success: jax.Array           # (B,)
    # Scene-0 imagery for the run's observability tree (the reference
    # saves heightmaps + action visualizations every iteration,
    # logger.py:94-115, main.py:136-154).
    color_hm0: jax.Array            # (224, 224, 3)
    depth_hm0: jax.Array            # (224, 224)
    exec_mask0: jax.Array           # (224, 224) bool — executed object(s)
    seg_masks0: jax.Array           # (N, 224, 224) bool
    seg_boxes0: jax.Array           # (N, 2, 2)
    seg_valid0: jax.Array           # (N,)


def blank_prev(B: int) -> PrevStep:
    z = jnp.zeros((B,), jnp.int32)
    zf = jnp.zeros((B,))
    exp = Experience(
        scene_depth=jnp.zeros((B, 224, 224)),
        exec_mask=jnp.zeros((B, 224, 224), bool),
        style=z,
        valid=jnp.zeros((B,), bool),
    )
    choice = ActionChoice(
        action=z, grasp_obj=z, grasp_rot=z, suction_obj=z, suction_rot=z,
        predicted_value=zf, explored=jnp.zeros((B,), bool),
        best_pix=jnp.zeros((B, 6), jnp.int32),
        bestg_id=jnp.zeros((B, 2), jnp.int32),
        bests_id=jnp.zeros((B, 2), jnp.int32),
        bestgs_g_id=jnp.zeros((B, 2), jnp.int32),
        bestgs_s_id=jnp.zeros((B, 2), jnp.int32),
        bestgs_pair=jnp.zeros((B, 2), jnp.int32),
        bestg_conf=zf, bests_conf=zf, bestgs_conf=zf, exploit_action=z,
    )
    outcome = env.StepOutcome(
        suction_success=zf, grasp_success=zf, gs_success=zf,
        tip_divergence=zf,
    )
    return PrevStep(exp=exp, choice=choice, outcome=outcome,
                    objects_number=z)


def _strong(tree):
    """Strip weak types: Python-scalar arithmetic (Gripper.home, reward
    where-chains) produces weak float32s whose avals differ from computed
    arrays — a mismatch between init_loop's state and train_step's output
    would recompile the whole step program once per run."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.convert_element_type(x, jnp.asarray(x).dtype),
        tree,
    )


def init_loop(
    key: jax.Array, trainer: Trainer, cfg: LoopConfig
) -> LoopState:
    k_scenes, k_model, k_loop = jax.random.split(key, 3)
    # jit the batched reset: eager vmap dispatches the settle scan
    # op-by-op through the batching interpreter (minutes at batch >= 4).
    scenes = jax.jit(
        jax.vmap(lambda k: env.reset(k, cfg.env))
    )(jax.random.split(k_scenes, cfg.batch_size))
    return _strong(LoopState(
        scenes=scenes,
        trainer=trainer.init_state(k_model),
        counters=EpisodeCounters.zeros(cfg.batch_size),
        prev=blank_prev(cfg.batch_size),
        key=k_loop,
    ))


def train_step(
    trainer: Trainer, cfg: LoopConfig, state: LoopState
) -> tuple[LoopState, StepMetrics]:
    """One full sense-score-select-label-update-execute step for the batch."""
    B = cfg.batch_size
    ecfg = cfg.env
    key, k_sel, k_reset = jax.random.split(state.key, 3)

    # --- Observe (main.py:108-117) ---
    seg_fn = None
    if ecfg.segmentation == "learned":
        if cfg.segmenter is None:
            raise ValueError(
                "env.segmentation == 'learned' requires LoopConfig"
                ".segmenter = (model, params)"
            )
        seg_model, seg_params = cfg.segmenter

        def seg_fn(color_hm, depth_hm):
            from smg_tpu.perception import learned

            return learned.predict_segmentation(
                seg_model, seg_params, color_hm, depth_hm
            )

    obs = jax.vmap(lambda s: env.observe(s, seg_fn))(state.scenes)
    scene_depths = jax.vmap(env.masked_scene_depth)(obs)  # (B, 224, 224)
    masks = obs.seg.masks                                  # (B, N, 224, 224)
    valid = obs.seg.valid

    # --- Score with the online net (main.py:158-192) ---
    scores = trainer.score_scene_batch(
        state.trainer, scene_depths, masks, valid
    )

    # --- Arbitrate + explore (main.py:205-243) ---
    explore_prob = arb.explore_probability(
        state.trainer.iteration, cfg.explore_rate_decay, ecfg.is_testing
    )
    choice = jax.vmap(
        lambda k, g, s, gs, v, c: arb.select_action(
            k, g, s, gs, v, c,
            method=ecfg.method, is_ets=ecfg.is_ets,
            is_testing=ecfg.is_testing, explore_prob=explore_prob,
        )
    )(jax.random.split(k_sel, B), scores.gra_conf, scores.suc_conf,
      scores.gs_conf, valid, obs.seg.centers)

    # --- Delayed training on the previous step (main.py:302-343) ---
    if ecfg.is_testing:
        label_values = jnp.zeros((B,))
        reward_values = trainer.current_reward(
            state.prev.choice, state.prev.outcome
        )
        new_trainer = state.trainer
        loss = jnp.asarray(0.0)
    elif trainer.cfg.method == "reactive":
        label_values = trainer.reactive_labels(
            state.prev.choice, state.prev.outcome
        ).astype(jnp.float32)
        reward_values = trainer.current_reward(
            state.prev.choice, state.prev.outcome
        )
        new_trainer, loss = trainer.update(
            state.trainer, state.prev.exp, label_values
        )
    else:
        label_values, reward_values = trainer.dqn_labels(
            state.trainer, state.prev.choice, state.prev.outcome,
            state.prev.objects_number, scene_depths, masks, choice,
        )
        new_trainer, loss = trainer.update(
            state.trainer, state.prev.exp, label_values
        )

    # --- Geometry + execute (main.py:245-294, 384-396) ---
    geom = jax.vmap(lambda c, o: env.compute_geometry(c, o, ecfg))(
        choice, obs
    )
    executor = cfg.executor
    if executor == "auto":
        executor = "batched" if jax.default_backend() == "tpu" else "vmap"
    if executor == "batched":
        from smg_tpu.envs import batched as batched_env

        new_scenes, outcome = batched_env.execute_batched(
            state.scenes, choice, geom, cfg.primitive
        )
    else:
        new_scenes, outcome = jax.vmap(
            lambda s, c, g: env.execute(s, c, g, cfg.primitive)
        )(state.scenes, choice, geom)

    # --- Counters (main.py:304-313, 420-422) ---
    succ_any = jax.vmap(lambda o: o.any_success)(outcome)
    is_suction = choice.action == ACTION_SUCTION
    nc = state.counters.no_change
    nc_suction = jnp.where(
        is_suction, jnp.where(succ_any, 0, nc[:, 1] + 1), nc[:, 1]
    )
    nc_grasp = jnp.where(
        ~is_suction, jnp.where(succ_any, 0, nc[:, 0] + 1), nc[:, 0]
    )
    no_change = jnp.stack([nc_grasp, nc_suction], axis=1)
    episode_iter = state.counters.episode_iter + 1
    episode_succ = state.counters.episode_succ + succ_any.astype(jnp.int32)

    # --- Episode termination + auto-reset (main.py:92-104,121) ---
    next_obs_number = jax.vmap(
        lambda s: (s.objects.active & ~s.objects.removed).sum()
    )(new_scenes)
    # Stability + servo-divergence checks (robot.py:207-215 and the
    # main.py:119-121 tt_distance episode end; the reference's threshold
    # is 0.01 on the SQUARED distance = 0.1 m).
    sim_ok = jax.vmap(env.ik_ok)(new_scenes) & (
        outcome.tip_divergence < 0.1
    )
    done = jax.vmap(
        lambda n, nc, ok, es, ei: env.episode_done(n, nc, ok, es, ei, ecfg)
    )(next_obs_number, no_change, sim_ok, episode_succ, episode_iter)
    # Spawn per-scene; settle through the batched Pallas stepper when the
    # executor is batched: bit-equivalent to the vmapped settle
    # (tests/test_physics.py::TestPallasBatchedStepper) and ~2x faster at
    # batch >= 256 (42 -> 24 ms of settle at B=256).
    settle_n = cfg.reset_settle_steps if executor == "vmap" else 0
    fresh = jax.vmap(
        lambda k: scene_mod.reset_scene(
            k, ecfg.is_cluttered, ecfg.is_testing, settle_n,
            catalogs=env.resolve_catalogs(ecfg),
        )
    )(jax.random.split(k_reset, B))
    if executor != "vmap":
        fresh = stepper.run_steps_batched(
            fresh, fresh.gripper, cfg.reset_settle_steps
        )
    scenes_next = jax.tree_util.tree_map(
        lambda new, fr: jnp.where(
            done.reshape((B,) + (1,) * (new.ndim - 1)), fr, new
        ),
        new_scenes, fresh,
    )
    counters_next = EpisodeCounters(
        no_change=jnp.where(done[:, None], 0, no_change),
        episode_iter=jnp.where(done, 0, episode_iter),
        episode_succ=jnp.where(done, 0, episode_succ),
        episode_idx=state.counters.episode_idx + done.astype(jnp.int32),
    )

    # --- Build this step's experience for the next update ---
    bidx = jnp.arange(B)
    mask_g = masks[bidx, choice.grasp_obj]
    mask_s = masks[bidx, choice.suction_obj]
    exec_mask = jnp.where(
        (choice.action == ACTION_GRASP)[:, None, None], mask_g,
        jnp.where((choice.action == ACTION_SUCTION)[:, None, None], mask_s,
                  mask_g | mask_s),
    )
    style = jnp.where(
        choice.action == ACTION_GRASP, 0,
        jnp.where(choice.action == ACTION_SUCTION, 1, 2),
    ).astype(jnp.int32)
    exp = Experience(
        scene_depth=scene_depths,
        exec_mask=exec_mask,
        style=style,
        valid=valid.any(axis=1),
    )
    prev = PrevStep(
        exp=exp, choice=choice, outcome=outcome,
        objects_number=obs.seg.number,
    )

    metrics = StepMetrics(
        loss=loss,
        # Pairs row-for-row with label_value (the reference logs the PREV
        # step's reward next to its label, main.py:324-326).
        reward=reward_values,
        label_value=label_values,
        predicted_value=choice.predicted_value,
        action=choice.action,
        explored=choice.explored,
        best_pix=choice.best_pix,
        objects_number=obs.seg.number,
        episodes_done=done,
        episode_iter=episode_iter,
        episode_succ=episode_succ,
        grasp_success=outcome.grasp_success,
        suction_success=outcome.suction_success,
        gs_success=outcome.gs_success,
        color_hm0=obs.color_hm[0],
        depth_hm0=obs.depth_hm[0],
        exec_mask0=exec_mask[0],
        seg_masks0=masks[0],
        seg_boxes0=obs.seg.boxes[0],
        seg_valid0=valid[0],
    )
    # Strip weak types so the returned state's avals match the input's
    # (see _strong; a mismatch recompiles the whole program once).
    return (
        _strong(LoopState(
            scenes=scenes_next, trainer=new_trainer,
            counters=counters_next, prev=prev, key=key,
        )),
        _strong(metrics),
    )
