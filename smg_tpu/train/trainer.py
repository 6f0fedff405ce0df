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
import numpy as np
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
    scene_chunk: int = 4                 # scenes scored per model call
    # Eval-mode forward implementation: 'auto' uses the fast trunk
    # (models/fast_trunk.py — fully-fused dense-layer Pallas kernels,
    # 2.3x the Flax apply at the 640 parity shape, 1.9x at 224/65) on
    # TPU for the DenseNet trunk, and the Flax/XLA path elsewhere (CPU
    # tests, tiny trunks, train mode). 'on'/'off' force it.
    fast_eval: str = "auto"
    # Train-mode (update gradient pass) forward implementation: the
    # grouped-prefix batch-BN forward (fast_trunk.score_train) with the
    # lowering named by fast_train_conv2. The readback-timed AOT matrix
    # (scripts/bench_update_modes.py, one v5e, batch 32, 2026-08-19):
    # Flax 283.6 ms vs grouped+autodiff 'conv' 204.2 (1.39x), 'taps'
    # 376.6, hand-VJP 'vjp' 411.8 (XLA's fused autodiff backward beats
    # the hand backward's elementwise recomputes). Round 3's matrix that
    # decided 'auto'=off was measured with early-returning
    # block_until_ready and was void (PERF.md measurement correction).
    # 'auto' = on for the DenseNet-121 trunk on TPU, off elsewhere.
    fast_train: str = "auto"
    fast_train_conv2: str = "conv"
    # Styled-dispatch form: 'auto' unrolls all three styles on CPU (grad-
    # carrying control flow is ~35x slower there) and uses the
    # style-sorted chunked dispatch on TPU. 'on'/'off' force it — 'off'
    # exists mainly so CPU tests can exercise the TPU (chunked) path.
    unroll_styles: str = "auto"


@struct.dataclass
class TrainerState:
    params: dict
    batch_stats: dict
    target_params: dict    # DQN target net (reactive: alias of params)
    target_stats: dict     # target net's BN statistics, synced with it:
                           # the reference target is a deep copy whose
                           # buffers freeze between syncs (trainer.py:74-75)
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
_PI, _PJ = np.triu_indices(N_SLOTS, k=1)  # numpy: no backend init at import
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
            target_stats=jax.tree_util.tree_map(jnp.copy, stats),
            opt_state=self.tx.init(params),
            iteration=jnp.asarray(0, jnp.int32),
        )

    def maybe_sync_target(self, state: TrainerState) -> TrainerState:
        """Copy online -> target every target_update_freq iterations
        (main.py:351-353). The BN statistics ride along: the reference's
        target is a deep copy (trainer.py:74-75), so its buffers freeze
        at sync time instead of tracking the online net's."""
        sync = (state.iteration % self.cfg.target_update_freq) == 0
        pick = lambda t, p: jax.tree_util.tree_map(
            lambda a, b: jnp.where(sync, b, a), t, p
        )
        return state.replace(
            target_params=pick(state.target_params, state.params),
            target_stats=pick(state.target_stats, state.batch_stats),
        )

    # ------------------------------------------------------------------
    # Scoring (inference)
    # ------------------------------------------------------------------

    def _apply(self, params, stats, scene_in, mask_ins, style, train=False):
        return self.model.apply(
            {"params": params, "batch_stats": stats},
            scene_in, mask_ins, style, train, method=AffordanceNet.score,
        )

    # ------------------------------------------------------------------
    # Styled dispatch through ONE compiled trunk instance
    # ------------------------------------------------------------------
    #
    # The three per-style trunks/heads share one architecture, so their
    # param trees stack on a leading style axis and a *traced* style index
    # selects a slice. The slice is fed through the model's style-0 slots
    # (grasp_trunk / grasp_head), so every style's evaluation — scoring,
    # DQN targets, the update's gradient pass — reuses a single compiled
    # DenseNet instance instead of inlining one per style and per branch.
    # The old structure compiled ~12 forward + 6 backward trunk graphs
    # into one train_step (25+ min of XLA time at DenseNet-121); this
    # compiles ~3.

    def _stack_styles(self, tree: dict) -> tuple[dict, dict]:
        """(trunk_stacked, head_stacked) with leading style axis 3.

        With tied_ets_head the ETS slot aliases the suction head
        (reference models.py:144: style 2 applies suctionnet_val)."""
        def stack3(a, b, c):
            return jax.tree_util.tree_map(
                lambda x, y, z: jnp.stack([x, y, z]), a, b, c
            )

        tied = self.cfg.model.tied_ets_head
        trunk = stack3(
            tree["grasp_trunk"], tree["suction_trunk"], tree["gs_trunk"]
        )
        head = stack3(
            tree["grasp_head"], tree["suction_head"],
            tree["suction_head"] if tied else tree["gs_head"],
        )
        return trunk, head

    def _apply_styled(self, params, stats, scene_in, mask_ins, style_idx,
                      train: bool = False):
        """model.score with a traced style index; one trunk instance.

        Returns out (train=False) or (out, mut) where mut =
        {"grasp_trunk": ..., "grasp_head": ...} holding the selected
        style's mutated BN statistics (train=True)."""
        trunk_p, head_p = self._stack_styles(params)
        trunk_s, head_s = self._stack_styles(stats)
        # dynamic_index_in_dim, NOT x[style_idx]: a traced-index gather
        # transposes to a scatter (pathological on XLA:CPU — 40x slower
        # update steps); dynamic_slice transposes to a dense
        # dynamic_update_slice.
        sel = lambda t: jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(
                x, style_idx, axis=0, keepdims=False
            ),
            t,
        )
        p = {**params, "grasp_trunk": sel(trunk_p), "grasp_head": sel(head_p)}
        s = {**stats, "grasp_trunk": sel(trunk_s), "grasp_head": sel(head_s)}
        if not train:
            if self._use_fast_eval:
                from smg_tpu.models import fast_trunk

                return fast_trunk.score_eval(
                    p, s, scene_in, mask_ins, self.cfg.model.num_out
                )
            return self.model.apply(
                {"params": p, "batch_stats": s}, scene_in, mask_ins,
                STYLE_GRASP, False, method=AffordanceNet.score,
            )
        if self._use_fast_train:
            from smg_tpu.models import fast_trunk

            return fast_trunk.score_train(
                p, s, scene_in, mask_ins, self.cfg.model.num_out,
                conv2=self.cfg.fast_train_conv2,
            )
        out, mut = self.model.apply(
            {"params": p, "batch_stats": s}, scene_in, mask_ins,
            STYLE_GRASP, True, method=AffordanceNet.score,
            mutable=["batch_stats"],
        )
        mut = mut["batch_stats"]
        return out, {"grasp_trunk": mut["grasp_trunk"],
                     "grasp_head": mut["grasp_head"]}

    def _scatter_stats(self, old_stats: dict, mut: dict, style) -> dict:
        """Write a styled call's mutated BN stats back into the named
        tree at the executed style (tied ETS head -> suction_head)."""
        where = lambda cond, new_t, old_t: jax.tree_util.tree_map(
            lambda n, o: jnp.where(cond, n, o), new_t, old_t
        )
        tied = self.cfg.model.tied_ets_head
        new = dict(old_stats)
        for i, name in enumerate(
            ("grasp_trunk", "suction_trunk", "gs_trunk")
        ):
            new[name] = where(style == i, mut["grasp_trunk"],
                              old_stats[name])
        new["grasp_head"] = where(style == 0, mut["grasp_head"],
                                  old_stats["grasp_head"])
        upd_s = (style == 1) | (style == 2) if tied else (style == 1)
        new["suction_head"] = where(upd_s, mut["grasp_head"],
                                    old_stats["suction_head"])
        if not tied:
            new["gs_head"] = where(style == 2, mut["grasp_head"],
                                   old_stats["gs_head"])
        return new

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
        the reference's fixed 1); ETS pairs run in N_SLOTS-wide chunks at
        rotation 0 (models.py:128 pins rotate_idx = 0).
        """
        cfg = self.cfg
        R = cfg.model.num_rotations
        scene_img = self._prep(scene_depth)  # (S, S, 3)
        obj_depths = scene_depth[None] * masks  # (N, 224, 224)
        obj_ins = jax.vmap(self._prep)(obj_depths)  # (N, S, S, 3)

        # Every scoring unit — (rotation x {grasp, suction}) over the N
        # object slots, plus the ETS pair chunks padded to the same slot
        # width — runs through ONE lax.map whose body is the single
        # styled trunk instance (see _apply_styled).
        unit_scenes, unit_masks, unit_styles = [], [], []
        for r in range(R):
            theta = jnp.asarray(r * (2.0 * jnp.pi / R))
            rot_img = (
                scene_img if r == 0
                else aff.rotate_image_nearest(scene_img, theta)
            )
            for s in (STYLE_GRASP, STYLE_SUCTION):
                unit_scenes.append(rot_img)
                unit_masks.append(obj_ins)
                unit_styles.append(s)
        if cfg.is_ets:
            pair_depths = (
                scene_depth[None] * (masks[_PI] | masks[_PJ])
            )  # (P, 224, 224)
            n_chunks = -(-N_PAIRS // N_SLOTS)
            pad = n_chunks * N_SLOTS - N_PAIRS
            pair_ins = jax.vmap(self._prep)(
                jnp.pad(pair_depths, ((0, pad), (0, 0), (0, 0)))
            ).reshape(n_chunks, N_SLOTS, *obj_ins.shape[1:])
            for c in range(n_chunks):
                unit_scenes.append(scene_img)  # ETS pins rotation 0
                unit_masks.append(pair_ins[c])
                unit_styles.append(STYLE_ETS)

        def unit(args):
            sc, mk, s = args
            out = self._apply_styled(params, stats, sc[None], mk[None], s)
            return self._postprocess(out[0])[:, 0]  # (N_SLOTS,)

        if self._unroll_styles:
            # CPU: inline the units (forward passes inside scan bodies
            # also run single-threaded on XLA:CPU).
            outs = jnp.stack([
                unit((sc, mk, jnp.asarray(s)))
                for sc, mk, s in zip(unit_scenes, unit_masks, unit_styles)
            ])
        else:
            outs = jax.lax.map(
                unit,
                (jnp.stack(unit_scenes), jnp.stack(unit_masks),
                 jnp.asarray(unit_styles)),
            )  # (E, N_SLOTS)

        gra_conf = jnp.stack([outs[2 * r] for r in range(R)], axis=1)
        suc_conf = jnp.stack([outs[2 * r + 1] for r in range(R)], axis=1)
        gs_conf = jnp.full((N_SLOTS, N_SLOTS), -100.0)
        if cfg.is_ets:
            vals = outs[2 * R:].reshape(-1)[:N_PAIRS]
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
        stats = state.target_stats if use_target else state.batch_stats
        fn = partial(self.score_scene, params, stats)
        if self._unroll_styles:
            # CPU: plain vmap (scan chunking would run single-threaded).
            return jax.vmap(fn)(scene_depths, masks, valid)
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
            state.target_params, state.target_stats, next_scene_depths,
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
    # Style-sorted dispatch: one trunk evaluation per scene, not three
    # ------------------------------------------------------------------
    #
    # The executed style varies per scene at runtime, but running all three
    # trunks and jnp.select-ing (the naive vmap answer) triples the model
    # FLOPs on the training path. Instead: sort the batch by style, chunk
    # it, and process chunks under a sequential lax.map (scan) where
    # control flow stays scalar — a style-uniform chunk runs the styled
    # trunk ONCE (params gathered by the chunk's style index); only the
    # <=2 chunks straddling a style boundary fall back to the
    # all-three+select path. Sorting is a gather, fully differentiable.
    #
    # Backend split: XLA:CPU executes control-flow bodies WITHOUT intra-op
    # parallelism, making any grad-carrying lax.cond/scan ~35x slower than
    # the same body inline (measured: 0.55s -> 21s for one styled grad).
    # On CPU (tests, the virtual-mesh dryrun — tiny models) the dispatch
    # therefore unrolls to the naive all-three+select form with no control
    # flow; on TPU (real runs — DenseNet-121) the styled chunked form
    # keeps compile time and executed FLOPs low. Both forms are oracle-
    # tested equal.

    @property
    def _unroll_styles(self) -> bool:
        if self.cfg.unroll_styles != "auto":
            return self.cfg.unroll_styles == "on"
        return jax.default_backend() == "cpu"

    @property
    def _use_fast_eval(self) -> bool:
        """Pallas fused-trunk eval forward (trace-time backend split, like
        _unroll_styles: the kernel targets Mosaic/TPU only)."""
        if self.cfg.fast_eval == "on":
            return True
        return (
            self.cfg.fast_eval == "auto"
            and self.cfg.model.trunk == "densenet121"
            and jax.default_backend() == "tpu"
        )

    @property
    def _use_fast_train(self) -> bool:
        """Grouped-prefix train-mode forward (fast_trunk.score_train).

        'auto' resolves on like _use_fast_eval (TPU + DenseNet-121):
        measured 1.39x the Flax update at batch 32 (see the fast_train
        field comment). CPU tests keep the Flax path, whose train-mode
        semantics the grouped forward is oracle-tested against.
        """
        if self.cfg.fast_train == "on":
            return True
        return (
            self.cfg.fast_train == "auto"
            and self.cfg.model.trunk == "densenet121"
            and jax.default_backend() == "tpu"
        )

    def _style_chunks(self, arrays: tuple, styles: jax.Array):
        """Scatter per-scene arrays into style-PURE chunks of width C.

        Returns (chunked_arrays (N, C, ...), chunked_styles (N, C),
        flat_pos (B,) — scene j's flat position in the (N*C,) layout).
        Every chunk is style-uniform BY CONSTRUCTION: each style's scenes
        occupy its own run of chunks (N = ceil(B/C) + 2 covers the worst
        ceil-sum over 3 styles), so consumers run exactly ONE styled
        trunk pass per chunk. The previous sorted-reshape layout left up
        to two chunks straddling style boundaries, and each such chunk
        evaluated all three styled trunks — ~2x the executed trunk work
        at batch 32 / chunk 8. Unused lanes hold zeros (valid=False
        scatters to False); callers gather real scenes via flat_pos.
        """
        B = styles.shape[0]
        C = min(self.cfg.scene_chunk, B)
        N = -(-B // C) + 2
        i32 = jnp.int32
        order = jnp.argsort(styles)           # stable
        ss = styles[order].astype(i32)
        counts = jnp.stack(
            [(styles == i).sum() for i in range(3)]
        ).astype(i32)                          # scenes per style
        chunks_per = -(-counts // C)           # chunks per style
        chunk_off = jnp.concatenate(
            [jnp.zeros((1,), i32), jnp.cumsum(chunks_per)[:2]]
        )                                      # first chunk of each style
        start = jnp.concatenate(
            [jnp.zeros((1,), i32), jnp.cumsum(counts)[:2]]
        )                                      # first sorted index per style
        k = jnp.arange(B, dtype=i32)
        rank = k - start[ss]                   # rank within own style
        pos = chunk_off[ss] * C + rank         # flat destination

        def prep(x):
            xs = x[order]
            flat = jnp.zeros((N * C,) + x.shape[1:], x.dtype).at[pos].set(xs)
            return flat.reshape((N, C) + x.shape[1:])

        c_idx = jnp.arange(N, dtype=i32)
        chunk_style = (
            (c_idx >= chunk_off[1]).astype(i32)
            + (c_idx >= chunk_off[2]).astype(i32)
        ).astype(styles.dtype)                 # zero-count styles collapse
        st = jnp.broadcast_to(chunk_style[:, None], (N, C))
        flat_pos = jnp.zeros((B,), i32).at[order].set(pos)
        return tuple(prep(a) for a in arrays), st, flat_pos, B

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

        def prep_one(scene_depth, mask, rot_idx):
            scene_img = self._prep(scene_depth)
            if R > 1:
                theta = rot_idx.astype(jnp.float32) * (2.0 * jnp.pi / R)
                scene_img = aff.rotate_image_nearest(scene_img, theta)
            return scene_img, self._prep(scene_depth * mask)

        if self._unroll_styles:
            # CPU: no control flow (see the backend-split note above).
            scene_imgs, mask_imgs = jax.vmap(prep_one)(
                scene_depths, exec_masks, rotations
            )
            outs = [
                self._postprocess(
                    self._apply_styled(
                        params, stats, scene_imgs, mask_imgs[:, None],
                        jnp.asarray(s),
                    )[:, 0]
                )[:, 0]
                for s in range(3)
            ]
            return jnp.select(
                [styles == STYLE_GRASP, styles == STYLE_SUCTION],
                [outs[0], outs[1]], outs[2],
            )

        (sd, em, ro), st, flat_pos, B = self._style_chunks(
            (scene_depths, exec_masks, rotations), styles
        )

        def chunk_fn(args):
            sd_c, em_c, ro_c, st_c = args
            scene_imgs, mask_imgs = jax.vmap(prep_one)(sd_c, em_c, ro_c)
            # Chunks are style-pure by construction: one styled call.
            out = self._apply_styled(
                params, stats, scene_imgs, mask_imgs[:, None], st_c[0]
            )  # (C, 1, num_out)
            return self._postprocess(out[:, 0])[:, 0]

        vals = jax.lax.map(chunk_fn, (sd, em, ro, st)).reshape(-1)
        return vals[flat_pos]

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

            # Rematerialized per-scene forward: without jax.checkpoint the
            # chunk scan stacks every trip's trunk activations for the
            # backward (batch x styles x DenseNet activations — OOMs a
            # 16 GB chip at batch 32); with it the backward recomputes
            # them per chunk from the tiny saved inputs.
            @jax.checkpoint
            def one_scene_p(params, s, scene_depth, mask):
                """Batch-1 train-mode forward with style s (per-scene BN
                statistics = the reference's minibatch-of-1 backprop,
                trainer.py:278-384)."""
                out, mut = self._apply_styled(
                    params, stats,
                    self._prep(scene_depth)[None],
                    self._prep(scene_depth * mask)[None, None],
                    s, train=True,
                )
                return out[0, 0], mut

            def one_scene(s, scene_depth, mask):
                return one_scene_p(params, s, scene_depth, mask)

            if self._unroll_styles:
                # CPU: no control flow (see the backend-split note).
                def per_scene(sd1, em1, st1):
                    outs, muts = [], []
                    for s in range(3):
                        out, mut = one_scene(jnp.asarray(s), sd1, em1)
                        outs.append(out)
                        muts.append(mut)
                    sel = lambda a, b, c: jnp.select(
                        [st1 == STYLE_GRASP, st1 == STYLE_SUCTION],
                        [a, b], c,
                    )
                    out = sel(*outs)
                    mut = jax.tree_util.tree_map(sel, *muts)
                    return out, mut

                outs_b, mut_b = jax.vmap(per_scene)(
                    exp.scene_depth, exp.exec_mask, exp.style
                )
                stats_b = jax.vmap(
                    lambda m, st1: self._scatter_stats(stats, m, st1)
                )(mut_b, exp.style)
                if reactive:
                    loss_b = jax.vmap(losses.reactive_ce)(
                        outs_b, labels.astype(jnp.int32)
                    )
                else:
                    loss_b = jax.vmap(losses.huber_q)(outs_b[:, 0], labels)
                loss_b = jnp.where(exp.valid, loss_b, 0.0)
                n = jnp.maximum(exp.valid.sum(), 1)
                new_stats = jax.tree_util.tree_map(
                    lambda s: s.mean(axis=0), stats_b
                )
                return loss_b.sum() / n, new_stats

            def chunk_fn(args):
                sd_c, em_c, valid_c, label_c, st_c = args
                # Chunks are style-pure by construction: one styled
                # trunk pass per chunk, no mixed-chunk fallback.
                outs_c, mut_c = jax.vmap(
                    lambda sd1, em1: one_scene(st_c[0], sd1, em1)
                )(sd_c, em_c)
                # Full named stats per scene: the executed style's slots
                # take the mutated values, the rest stay.
                stats_c = jax.vmap(
                    lambda m, st1: self._scatter_stats(stats, m, st1)
                )(mut_c, st_c)
                if reactive:
                    loss_c = jax.vmap(losses.reactive_ce)(
                        outs_c, label_c.astype(jnp.int32)
                    )
                else:
                    loss_c = jax.vmap(losses.huber_q)(outs_c[:, 0], label_c)
                return jnp.where(valid_c, loss_c, 0.0), stats_c

            (sd, em, va, la), st, flat_pos, B = self._style_chunks(
                (exp.scene_depth, exp.exec_mask, exp.valid, labels),
                exp.style,
            )
            losses_ch, stats_ch = jax.lax.map(
                chunk_fn, (sd, em, va, la, st)
            )
            # Unused lanes hold zero scenes (valid=False): gather the B
            # real scenes by their flat positions before any reduction.
            losses_b = losses_ch.reshape(-1)[flat_pos]
            n = jnp.maximum(exp.valid.sum(), 1)
            new_stats = jax.tree_util.tree_map(
                lambda s: s.reshape((-1,) + s.shape[2:])[flat_pos]
                .mean(axis=0),
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
