"""The multistage trainer: batched scoring, DQN labels, gradient updates.

Re-design of the reference `Trainer` (code/trainer.py) for dense scene
batches:

- `score_scene_batch`  <- the O(N) + O(N^2) trainer.forward loop of
  main.py:158-192, as three batched two-stream evaluations with the scene
  features shared and pair streams chunked;
- `dqn_labels`         <- trainer.get_label_value (trainer.py:238-274):
  r + gamma * Q_target(s', argmax_online(s')) with the future term zeroed
  on failure or table-cleared, evaluated by the target net at the online
  net's chosen ids (double-DQN flavor);
- `reactive_labels`    <- trainer.py:218-236 (class 0 success / 1 failure);
- `update`             <- trainer.backprop (trainer.py:278-384): re-forward
  the executed (scene, object-mask, style) with gradients, CE or Huber
  loss, Adam(1e-4) — except the step averages over the whole scene batch
  instead of the reference's batch-of-1 (a strictly better estimator; the
  per-scene semantics are unchanged).

Optimizer state, params, target params, BN statistics and the RNG all live
in one `TrainerState` pytree, sharding-friendly for pjit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from smg_tpu.models import affordance as aff
from smg_tpu.models.affordance import (
    AffordanceNet,
    ModelConfig,
    STYLE_ETS,
    STYLE_GRASP,
    STYLE_SUCTION,
)
from smg_tpu.physics.state import N_SLOTS
from smg_tpu.policy.arbitrate import (
    ACTION_GRASP,
    ACTION_SUCTION,
    ActionChoice,
)
from smg_tpu.train import losses


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    method: str = "reinforcement"
    future_reward_discount: float = 0.5  # gamma (main.py:442)
    learning_rate: float = 1e-4          # Adam (trainer.py:99)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    target_update_freq: int = 10         # main.py:450
    is_ets: bool = False
    pair_chunk: int = 11                 # ETS pair streams per chunk
    scene_chunk: int = 4                 # scenes scored per model call


@struct.dataclass
class TrainerState:
    params: dict
    batch_stats: dict
    target_params: dict    # DQN target net (reactive: alias of params)
    opt_state: optax.OptState
    iteration: jax.Array   # () int32 global step


@struct.dataclass
class Experience:
    """One step's training sample per scene (the prev_* carry of
    main.py:399-418, reduced to what backprop needs)."""

    scene_depth: jax.Array   # (224, 224) masked scene heightmap
    exec_mask: jax.Array     # (224, 224) bool — executed object-mask union
    style: jax.Array         # () int32 STYLE_*
    valid: jax.Array         # () bool — there is something to train on


@struct.dataclass
class SceneScores:
    gra_conf: jax.Array   # (N, R)
    suc_conf: jax.Array   # (N, R)
    gs_conf: jax.Array    # (N, N)


# Pair index table for ETS (i < j upper triangle of N_SLOTS).
_PI, _PJ = jnp.triu_indices(N_SLOTS, k=1)
N_PAIRS = int(_PI.shape[0])


class Trainer:
    """Owns the model + optimizer; all methods are pure in TrainerState."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.model = AffordanceNet(cfg.model)
        self.tx = optax.adam(
            cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps,
        )

    # ------------------------------------------------------------------
    # State
    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainerState:
        params, stats = aff.init_params(key, self.cfg.model)
        return TrainerState(
            params=params,
            batch_stats=stats,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            iteration=jnp.asarray(0, jnp.int32),
        )

    def maybe_sync_target(self, state: TrainerState) -> TrainerState:
        """Copy online -> target every target_update_freq iterations
        (main.py:351-353)."""
        sync = (state.iteration % self.cfg.target_update_freq) == 0
        new_target = jax.tree_util.tree_map(
            lambda t, p: jnp.where(sync, p, t), state.target_params,
            state.params,
        )
        return state.replace(target_params=new_target)

    # ------------------------------------------------------------------
    # Scoring (inference)
    # ------------------------------------------------------------------

    def _apply(self, params, stats, scene_in, mask_ins, style, train=False):
        return self.model.apply(
            {"params": params, "batch_stats": stats},
            scene_in, mask_ins, style, train, method=AffordanceNet.score,
        )

    def _apply_eval(self, params, stats, scene_in, mask_ins, style):
        """Eval-mode score (running-average BN, no gradients).

        The model merges the scene and mask streams into one trunk batch
        in eval mode (affordance.AffordanceNet.score), so this is already
        the full-tile MXU path.
        """
        return self._apply(params, stats, scene_in, mask_ins, style)

    def _prep(self, depth_hm):
        return aff.preprocess_depth(depth_hm, self.cfg.model)

    def score_scene(
        self, params, stats, scene_depth: jax.Array, masks: jax.Array,
        valid: jax.Array,
    ) -> SceneScores:
        """Score one scene: (224, 224) masked depth + (N, 224, 224) masks.

        The per-object styles 0/1 run as one N-wide batch each, with the
        scene stream rotated for each of cfg.model.num_rotations (the
        in-network rotation of reference models.py:85-93, generalized past
        the reference's fixed 1); ETS pairs run in chunks of
        cfg.pair_chunk at rotation 0 (models.py:128 pins rotate_idx = 0).
        """
        cfg = self.cfg
        R = cfg.model.num_rotations
        scene_img = self._prep(scene_depth)  # (S, S, 3)
        obj_depths = scene_depth[None] * masks  # (N, 224, 224)
        obj_ins = jax.vmap(self._prep)(obj_depths)[None]  # (1, N, S, S, 3)

        gra_rots, suc_rots = [], []
        for r in range(R):
            theta = jnp.asarray(r * (2.0 * jnp.pi / R))
            rot_img = (
                scene_img if r == 0
                else aff.rotate_image_nearest(scene_img, theta)
            )[None]
            gra = self._apply_eval(
                params, stats, rot_img, obj_ins, STYLE_GRASP
            )
            suc = self._apply_eval(
                params, stats, rot_img, obj_ins, STYLE_SUCTION
            )
            gra_rots.append(self._postprocess(gra[0])[:, 0])
            suc_rots.append(self._postprocess(suc[0])[:, 0])
        scene_in = scene_img[None]
        gra_conf = jnp.stack(gra_rots, axis=1)  # (N, R)
        suc_conf = jnp.stack(suc_rots, axis=1)

        gs_conf = jnp.full((N_SLOTS, N_SLOTS), -100.0)
        if cfg.is_ets:
            pair_depths = (
                scene_depth[None] * (masks[_PI] | masks[_PJ])
            )  # (P, 224, 224)
            n_chunks = -(-N_PAIRS // cfg.pair_chunk)
            pad = n_chunks * cfg.pair_chunk - N_PAIRS
            pair_depths = jnp.pad(pair_depths, ((0, pad), (0, 0), (0, 0)))
            chunks = pair_depths.reshape(
                n_chunks, cfg.pair_chunk, *pair_depths.shape[1:]
            )

            def score_chunk(chunk):
                ins = jax.vmap(self._prep)(chunk)[None]
                out = self._apply_eval(
                    params, stats, scene_in, ins, STYLE_ETS
                )
                return self._postprocess(out[0])[:, 0]

            vals = jax.lax.map(score_chunk, chunks).reshape(-1)[:N_PAIRS]
            gs_conf = gs_conf.at[_PI, _PJ].set(vals)
        return SceneScores(
            gra_conf=jnp.where(valid[:, None], gra_conf, -1e9),
            suc_conf=jnp.where(valid[:, None], suc_conf, -1e9),
            gs_conf=gs_conf,
        )

    def _postprocess(self, out: jax.Array) -> jax.Array:
        """(M, num_out) head output -> (M, R=1) confidences.

        reactive: P(class 0) via softmax (trainer.py:196-199);
        reinforcement: raw Q (trainer.py:205-207).
        """
        if self.cfg.method == "reactive":
            return jax.nn.softmax(out, axis=-1)[:, :1]
        return out

    def score_scene_batch(
        self, state: TrainerState, scene_depths, masks, valid,
        use_target: bool = False,
    ) -> SceneScores:
        """Batched scoring over scenes, chunked to bound activation memory."""
        params = state.target_params if use_target else state.params
        fn = partial(self.score_scene, params, state.batch_stats)
        return jax.lax.map(
            lambda args: fn(*args), (scene_depths, masks, valid),
            batch_size=self.cfg.scene_chunk,
        )

    # ------------------------------------------------------------------
    # Labels (trainer.get_label_value)
    # ------------------------------------------------------------------

    def reactive_labels(self, choice: ActionChoice, outcome) -> jax.Array:
        """Class label per scene: 0 success / 1 failure (trainer.py:218-236;
        ETS succeeds only at reward 2.5, trainer.py:229-234)."""
        success = jnp.where(
            choice.action == ACTION_SUCTION, outcome.suction_success > 0,
            jnp.where(
                choice.action == ACTION_GRASP, outcome.grasp_success > 0,
                outcome.gs_success == 2.5,
            ),
        )
        return jnp.where(success, 0, 1).astype(jnp.int32)

    def current_reward(self, choice: ActionChoice, outcome) -> jax.Array:
        return jnp.where(
            choice.action == ACTION_SUCTION, outcome.suction_success,
            jnp.where(
                choice.action == ACTION_GRASP, outcome.grasp_success,
                outcome.gs_success,
            ),
        )

    def dqn_labels(
        self,
        state: TrainerState,
        prev_choice: ActionChoice,
        prev_outcome,
        prev_objects_number: jax.Array,     # (B,)
        next_scene_depths: jax.Array,       # (B, 224, 224) masked
        next_masks: jax.Array,              # (B, N, 224, 224)
        next_choice: ActionChoice,          # online net's choice on s'
    ):
        """Expected reward r + gamma * Q_target(s', a*_online) per scene.

        Parity: trainer.py:238-274 including the future-term zeroing on
        failure (trainer.py:248-249) and on table-cleared
        (trainer.py:250-251).
        """
        r = self.current_reward(prev_choice, prev_outcome)

        # Target-net Q at the online net's exploit ids on s'.
        exploit = next_choice.exploit_action
        g_obj = next_choice.bestg_id[:, 0]
        s_obj = next_choice.bests_id[:, 0]
        eg_obj = next_choice.bestgs_g_id[:, 0]
        es_obj = next_choice.bestgs_s_id[:, 0]
        B = next_scene_depths.shape[0]
        bidx = jnp.arange(B)
        mask_g = next_masks[bidx, g_obj]
        mask_s = next_masks[bidx, s_obj]
        mask_e = next_masks[bidx, eg_obj] | next_masks[bidx, es_obj]
        exec_mask = jnp.where(
            (exploit == ACTION_GRASP)[:, None, None], mask_g,
            jnp.where((exploit == ACTION_SUCTION)[:, None, None], mask_s,
                      mask_e),
        )
        style = jnp.where(
            exploit == ACTION_GRASP, STYLE_GRASP,
            jnp.where(exploit == ACTION_SUCTION, STYLE_SUCTION, STYLE_ETS),
        )
        # The exploit action's rotation index (specific_rotation of
        # trainer.py:261-269); identity at num_rotations = 1.
        rot_idx = jnp.where(
            exploit == ACTION_GRASP, next_choice.bestg_id[:, 1],
            jnp.where(exploit == ACTION_SUCTION,
                      next_choice.bests_id[:, 1],
                      next_choice.bestgs_g_id[:, 1]),
        )
        future = self._eval_styled(
            state.target_params, state.batch_stats, next_scene_depths,
            exec_mask, style, rot_idx,
        )

        # Zero rules (trainer.py:248-251).
        any_succ = (
            (prev_outcome.suction_success > 0)
            | (prev_outcome.grasp_success > 0)
            | (prev_outcome.gs_success > 0)
        )
        cleared = (
            ((prev_objects_number == 1) & (prev_outcome.suction_success == 1))
            | ((prev_objects_number == 1) & (prev_outcome.grasp_success == 1))
            | ((prev_objects_number == 2) & (prev_outcome.gs_success == 2.5))
        )
        future = jnp.where(~any_succ | cleared, 0.0, future)
        return r + self.cfg.future_reward_discount * future, r

    # ------------------------------------------------------------------
    # Style-sorted dispatch: one trunk per scene, not three
    # ------------------------------------------------------------------
    #
    # The executed style varies per scene at runtime, but running all three
    # trunks and jnp.select-ing (the naive vmap answer) triples the model
    # FLOPs on the training path. Instead: sort the batch by style, chunk
    # it, and process chunks under a sequential lax.map (scan) where
    # control flow stays scalar — a style-uniform chunk dispatches through
    # lax.switch on its first style so exactly ONE trunk executes; only
    # the <=2 chunks straddling a style boundary fall back to the
    # all-three+select path. Sorting is a gather, fully differentiable.

    def _style_chunks(self, arrays: tuple, styles: jax.Array):
        """Sort per-scene arrays by style and reshape to (n_chunks, C, ...).

        Returns (chunked_arrays, chunked_styles, inverse_order, B). Padding
        (when C does not divide B) repeats the last sorted scene, keeping
        the tail chunk style-uniform; padded lanes are dropped on unsort.
        """
        B = styles.shape[0]
        C = min(self.cfg.scene_chunk, B)
        order = jnp.argsort(styles)           # stable
        inv = jnp.argsort(order)
        pad = (-B) % C

        def prep(x):
            x = x[order]
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
            return x.reshape((x.shape[0] // C, C) + x.shape[1:])

        return tuple(prep(a) for a in arrays), prep(styles), inv, B

    def _eval_styled(self, params, stats, scene_depths, exec_masks, styles,
                     rotations=None):
        """Q/confidence of (scene, mask) pairs whose style varies per scene.

        (B, 224, 224) x2 + (B,) -> (B,). `rotations` rotates the scene
        stream by idx * 2pi / num_rotations (identity when
        num_rotations == 1). Eval mode (running-average BN), so a uniform
        chunk runs as one real batch-C model call on the MXU.
        """
        R = self.cfg.model.num_rotations
        if rotations is None:
            rotations = jnp.zeros((scene_depths.shape[0],), jnp.int32)
        (sd, em, ro), st, inv, B = self._style_chunks(
            (scene_depths, exec_masks, rotations), styles
        )

        def prep_one(scene_depth, mask, rot_idx):
            scene_img = self._prep(scene_depth)
            if R > 1:
                theta = rot_idx.astype(jnp.float32) * (2.0 * jnp.pi / R)
                scene_img = aff.rotate_image_nearest(scene_img, theta)
            return scene_img, self._prep(scene_depth * mask)

        def chunk_fn(args):
            sd_c, em_c, ro_c, st_c = args
            scene_imgs, mask_imgs = jax.vmap(prep_one)(sd_c, em_c, ro_c)

            def one_style(s):
                def br(_):
                    out = self._apply_eval(
                        params, stats, scene_imgs, mask_imgs[:, None], s
                    )  # (C, 1, num_out)
                    return self._postprocess(out[:, 0])[:, 0]
                return br

            def mixed(_):
                outs = [
                    self._postprocess(
                        self._apply_eval(
                            params, stats, scene_imgs, mask_imgs[:, None], s
                        )[:, 0]
                    )[:, 0]
                    for s in (STYLE_GRASP, STYLE_SUCTION, STYLE_ETS)
                ]
                return jnp.select(
                    [st_c == STYLE_GRASP, st_c == STYLE_SUCTION],
                    [outs[0], outs[1]], outs[2],
                )

            s0 = st_c[0]
            uniform = jnp.all(st_c == s0)
            return jax.lax.cond(
                uniform,
                lambda _: jax.lax.switch(
                    s0, [one_style(s) for s in range(3)], None
                ),
                mixed, None,
            )

        vals = jax.lax.map(chunk_fn, (sd, em, ro, st)).reshape(-1)
        return vals[:B][inv]

    # ------------------------------------------------------------------
    # Update (trainer.backprop)
    # ------------------------------------------------------------------

    def update(
        self, state: TrainerState, exp: Experience, labels: jax.Array
    ) -> tuple[TrainerState, jax.Array]:
        """One Adam step on the batch of executed experiences.

        labels: (B,) float Q targets (DQN) or int class labels (reactive).
        Invalid experiences (first step of an episode) contribute 0 loss.
        """
        reactive = self.cfg.method == "reactive"

        def loss_fn(params):
            stats = state.batch_stats

            def one_scene(s, scene_depth, mask):
                """Batch-1 train-mode forward with style s (per-scene BN
                statistics = the reference's minibatch-of-1 backprop,
                trainer.py:278-384)."""
                out, mut = self.model.apply(
                    {"params": params, "batch_stats": stats},
                    self._prep(scene_depth)[None],
                    self._prep(scene_depth * mask)[None, None],
                    s, True, method=AffordanceNet.score,
                    mutable=["batch_stats"],
                )
                return out[0, 0], mut["batch_stats"]

            def chunk_fn(args):
                sd_c, em_c, valid_c, label_c, st_c = args

                def one_style(s):
                    # Uniform chunk: ONE trunk runs; its mutated stats
                    # collection already carries the other trunks' stats
                    # through unchanged.
                    def br(_):
                        return jax.vmap(
                            lambda sd1, em1: one_scene(s, sd1, em1)
                        )(sd_c, em_c)
                    return br

                def mixed(_):
                    def per_scene(sd1, em1, st1):
                        outs, new_stats = [], stats
                        for s in (STYLE_GRASP, STYLE_SUCTION, STYLE_ETS):
                            out, mut = one_scene(s, sd1, em1)
                            outs.append(out)
                            new_stats = jax.tree_util.tree_map(
                                lambda ns, m: jnp.where(st1 == s, m, ns),
                                new_stats, mut,
                            )
                        out = jnp.select(
                            [st1 == STYLE_GRASP, st1 == STYLE_SUCTION],
                            [outs[0], outs[1]], outs[2],
                        )
                        return out, new_stats
                    return jax.vmap(per_scene)(sd_c, em_c, st_c)

                s0 = st_c[0]
                uniform = jnp.all(st_c == s0)
                outs_c, stats_c = jax.lax.cond(
                    uniform,
                    lambda _: jax.lax.switch(
                        s0, [one_style(s) for s in range(3)], None
                    ),
                    mixed, None,
                )  # (C, num_out), stats with a leading (C,) axis
                if reactive:
                    loss_c = jax.vmap(losses.reactive_ce)(
                        outs_c, label_c.astype(jnp.int32)
                    )
                else:
                    loss_c = jax.vmap(losses.huber_q)(outs_c[:, 0], label_c)
                return jnp.where(valid_c, loss_c, 0.0), stats_c

            (sd, em, va, la), st, inv, B = self._style_chunks(
                (exp.scene_depth, exp.exec_mask, exp.valid, labels),
                exp.style,
            )
            losses_ch, stats_ch = jax.lax.map(
                chunk_fn, (sd, em, va, la, st)
            )
            # Padding repeats the last sorted scene (valid flag included),
            # so slice back to the B real scenes before any reduction.
            losses_b = losses_ch.reshape(-1)[:B][inv]
            n = jnp.maximum(exp.valid.sum(), 1)
            new_stats = jax.tree_util.tree_map(
                lambda s: s.reshape((-1,) + s.shape[2:])[:B].mean(axis=0),
                stats_ch,
            )
            return losses_b.sum() / n, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_stats,
            iteration=state.iteration + 1,
        )
        if self.cfg.method == "reinforcement":
            state = self.maybe_sync_target(state)
        return state, loss
