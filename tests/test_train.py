"""Trainer + loop tests with the tiny trunk at 224 input on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.envs.smg_env import EnvConfig, StepOutcome
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train import losses
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import (
    Experience,
    TrainConfig,
    Trainer,
)
from smg_tpu.policy.arbitrate import ACTION_GRASP, ACTION_SUCTION

TINY_MODEL = ModelConfig(method="reinforcement", trunk="tiny", input_size=224)
TINY_REACTIVE = ModelConfig(method="reactive", trunk="tiny", input_size=224)


def tiny_trainer(method="reinforcement", is_ets=False):
    model = TINY_MODEL if method == "reinforcement" else TINY_REACTIVE
    return Trainer(
        TrainConfig(model=model, method=method, is_ets=is_ets,
                    scene_chunk=2)
    )


class TestLosses:
    def test_reactive_ce_class2_no_loss(self):
        logits = jnp.array([1.0, 2.0, 3.0])
        l0 = float(losses.reactive_ce(logits, jnp.asarray(0)))
        l2 = float(losses.reactive_ce(logits, jnp.asarray(2)))
        assert l0 > 0
        assert l2 == 0.0

    def test_huber_matches_reference_formula(self):
        for q, lab in [(0.3, 0.8), (2.0, 0.0), (0.0, 2.5)]:
            d = abs(q - lab)
            expected = 0.5 * d * d if d < 1 else d - 0.5
            got = float(losses.huber_q(jnp.asarray(q), jnp.asarray(lab)))
            assert abs(got - expected) < 1e-6


class TestScoring:
    @pytest.mark.slow
    def test_score_scene_batch_shapes(self):
        tr = tiny_trainer(is_ets=True)
        state = tr.init_state(jax.random.PRNGKey(0))
        B = 2
        depths = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224) * 0.05)
        masks = jnp.zeros((B, 12, 224, 224), bool)
        masks = masks.at[:, 0, 50:80, 50:80].set(True)
        masks = masks.at[:, 1, 120:150, 120:150].set(True)
        valid = jnp.zeros((B, 12), bool).at[:, :2].set(True)
        scores = tr.score_scene_batch(state, depths, masks, valid)
        assert scores.gra_conf.shape == (B, 12, 1)
        assert scores.gs_conf.shape == (B, 12, 12)
        # Valid slots finite, invalid -inf-ish.
        assert np.isfinite(np.asarray(scores.gra_conf[:, :2])).all()
        assert np.all(np.asarray(scores.gra_conf[:, 2:]) < -1e8)
        # ETS: only upper-triangle valid pairs above the -100 fill.
        gs = np.asarray(scores.gs_conf[0])
        assert gs[0, 1] > -100.0
        assert gs[1, 0] == -100.0

    @pytest.mark.slow
    def test_update_reduces_q_error(self):
        """Adam steps on a fixed experience drive Q toward the label."""
        tr = tiny_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        B = 2
        exp = Experience(
            scene_depth=jnp.asarray(rng.rand(B, 224, 224) * 0.05),
            exec_mask=jnp.zeros((B, 224, 224), bool).at[:, 60:120, 60:120].set(True),
            style=jnp.zeros((B,), jnp.int32),
            valid=jnp.ones((B,), bool),
        )
        labels = jnp.asarray([1.0, 1.0])
        losses_seen = []
        for _ in range(12):
            state, loss = tr.update(state, exp, labels)
            losses_seen.append(float(loss))
        assert losses_seen[-1] < losses_seen[0]

    def test_update_skips_invalid(self):
        tr = tiny_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        exp = Experience(
            scene_depth=jnp.zeros((2, 224, 224)),
            exec_mask=jnp.zeros((2, 224, 224), bool),
            style=jnp.zeros((2,), jnp.int32),
            valid=jnp.zeros((2,), bool),
        )
        p_before = jax.tree_util.tree_leaves(state.params)[0]
        state2, loss = tr.update(state, exp, jnp.zeros(2))
        assert float(loss) == 0.0
        # Zero loss -> (adam still steps on zero grads) params unchanged.
        p_after = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_allclose(
            np.asarray(p_before), np.asarray(p_after), atol=1e-8
        )

    def test_target_sync_cadence(self):
        tr = tiny_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        # Perturb online params; target still the old copy.
        state = state.replace(
            params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params),
            iteration=jnp.asarray(3, jnp.int32),
        )
        state2 = tr.maybe_sync_target(state)
        # iteration 3 % 10 != 0 -> no sync.
        diff = jax.tree_util.tree_map(
            lambda t, p: float(jnp.abs(t - p).max()),
            state2.target_params, state2.params,
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0.5
        state3 = tr.maybe_sync_target(
            state.replace(iteration=jnp.asarray(10, jnp.int32))
        )
        diff3 = jax.tree_util.tree_map(
            lambda t, p: float(jnp.abs(t - p).max()),
            state3.target_params, state3.params,
        )
        assert max(jax.tree_util.tree_leaves(diff3)) < 1e-7


class TestStyledDispatch:
    """The style-sorted one-trunk-per-scene dispatch must be numerically
    identical to the naive evaluate-all-three-and-select path (float32
    model so bf16 batching noise can't mask a logic error)."""

    @staticmethod
    def _f32_trainer(chunk=3):
        return Trainer(
            TrainConfig(
                model=ModelConfig(method="reinforcement", trunk="tiny",
                                  input_size=224, dtype="float32"),
                method="reinforcement", scene_chunk=chunk,
            )
        )

    @staticmethod
    def _mixed_batch(B=7):
        rng = np.random.RandomState(0)
        sd = jnp.asarray(rng.rand(B, 224, 224) * 0.05)
        em = jnp.zeros((B, 224, 224), bool).at[:, 60:120, 60:120].set(True)
        styles = jnp.asarray([0, 2, 1, 1, 0, 2, 1][:B], jnp.int32)
        return sd, em, styles

    def test_eval_styled_matches_naive(self):
        tr = self._f32_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        sd, em, styles = self._mixed_batch()  # B=7, chunk=3: padded + mixed

        def naive(d, m, s):
            si = tr._prep(d)[None]
            mi = tr._prep(d * m)[None, None]
            outs = [
                tr._postprocess(
                    tr._apply(state.params, state.batch_stats, si, mi, x)[0]
                )[0, 0]
                for x in (0, 1, 2)
            ]
            return jnp.select([s == 0, s == 1], [outs[0], outs[1]], outs[2])

        v_new = jax.jit(tr._eval_styled)(
            state.params, state.batch_stats, sd, em, styles
        )
        v_naive = jax.jit(jax.vmap(naive))(sd, em, styles)
        np.testing.assert_allclose(
            np.asarray(v_new), np.asarray(v_naive), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.slow
    def test_update_matches_naive(self):
        from smg_tpu.models.affordance import AffordanceNet
        from smg_tpu.train import losses as loss_mod

        tr = self._f32_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        sd, em, styles = self._mixed_batch()
        B = sd.shape[0]
        valid = jnp.asarray([1, 1, 0, 1, 1, 1, 1], bool)
        labels = jnp.asarray(np.random.RandomState(1).rand(B), jnp.float32)
        exp = Experience(scene_depth=sd, exec_mask=em, style=styles,
                         valid=valid)

        def naive_loss(params, stats):
            def per_scene(d, m, s, v, l):
                si = tr._prep(d)[None]
                mi = tr._prep(d * m)[None, None]
                outs, new_stats = [], stats
                for x in (0, 1, 2):
                    out, mut = tr.model.apply(
                        {"params": params, "batch_stats": stats}, si, mi,
                        x, True, method=AffordanceNet.score,
                        mutable=["batch_stats"],
                    )
                    outs.append(out[0, 0])
                    new_stats = jax.tree_util.tree_map(
                        lambda ns, mm: jnp.where(s == x, mm, ns),
                        new_stats, mut["batch_stats"],
                    )
                out = jnp.select([s == 0, s == 1], [outs[0], outs[1]],
                                 outs[2])
                return jnp.where(v, loss_mod.huber_q(out[0], l), 0.0), \
                    new_stats

            lb, st_b = jax.vmap(per_scene)(sd, em, styles, valid, labels)
            n = jnp.maximum(valid.sum(), 1)
            return lb.sum() / n, jax.tree_util.tree_map(
                lambda s: s.mean(axis=0), st_b
            )

        new_state, new_loss = jax.jit(tr.update)(state, exp, labels)
        nl, nstats = jax.jit(naive_loss)(state.params, state.batch_stats)
        assert abs(float(new_loss) - float(nl)) < 1e-5
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.batch_stats),
            jax.tree_util.tree_leaves(nstats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    @pytest.mark.slow
    def test_bn_stats_move_only_for_executed_style(self):
        """A uniform style-0 (grasp) batch must update the grasp trunk's BN
        statistics and leave the suction / gs trunks' untouched."""
        tr = self._f32_trainer(chunk=2)
        state = tr.init_state(jax.random.PRNGKey(0))
        B = 4
        rng = np.random.RandomState(2)
        exp = Experience(
            scene_depth=jnp.asarray(rng.rand(B, 224, 224) * 0.05),
            exec_mask=jnp.zeros((B, 224, 224), bool)
            .at[:, 60:120, 60:120].set(True),
            style=jnp.zeros((B,), jnp.int32),
            valid=jnp.ones((B,), bool),
        )
        new_state, _ = tr.update(state, exp, jnp.ones((B,)))

        def max_delta(sub):
            before = jax.tree_util.tree_leaves(state.batch_stats[sub])
            after = jax.tree_util.tree_leaves(new_state.batch_stats[sub])
            return max(
                float(jnp.abs(a - b).max()) for a, b in zip(after, before)
            )

        names = list(state.batch_stats.keys())
        grasp = [n for n in names if "grasp" in n and "head" not in n]
        other_trunks = [
            n for n in names
            if ("suction" in n or "gs" in n) and "head" not in n
        ]
        assert grasp and other_trunks, names
        assert any(max_delta(n) > 1e-8 for n in grasp), grasp
        for n in other_trunks:
            assert max_delta(n) == 0.0, n


class TestChunkedDispatch:
    """The TPU production path (style-sorted chunked dispatch) forced on
    CPU via unroll_styles='off' must match the unrolled path exactly —
    without this override the chunked code would only ever execute on
    chip (it is backend-gated)."""

    @staticmethod
    def _trainers(chunk=3):
        mk = lambda unroll: Trainer(
            TrainConfig(
                model=ModelConfig(method="reinforcement", trunk="tiny",
                                  input_size=224, dtype="float32"),
                method="reinforcement", scene_chunk=chunk,
                unroll_styles=unroll,
            )
        )
        return mk("auto"), mk("off")

    def test_eval_styled_chunked_matches_unrolled(self):
        tr_u, tr_c = self._trainers()
        state = tr_u.init_state(jax.random.PRNGKey(0))
        sd, em, styles = TestStyledDispatch._mixed_batch()  # B=7: pad+mixed
        v_u = jax.jit(tr_u._eval_styled)(
            state.params, state.batch_stats, sd, em, styles
        )
        v_c = jax.jit(tr_c._eval_styled)(
            state.params, state.batch_stats, sd, em, styles
        )
        np.testing.assert_allclose(
            np.asarray(v_c), np.asarray(v_u), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.slow
    def test_update_chunked_matches_unrolled(self):
        tr_u, tr_c = self._trainers()
        state = tr_u.init_state(jax.random.PRNGKey(0))
        sd, em, styles = TestStyledDispatch._mixed_batch()
        B = sd.shape[0]
        valid = jnp.asarray([1, 1, 0, 1, 1, 1, 1], bool)
        labels = jnp.asarray(np.random.RandomState(1).rand(B), jnp.float32)
        exp = Experience(scene_depth=sd, exec_mask=em, style=styles,
                         valid=valid)
        su, lu = jax.jit(tr_u.update)(state, exp, labels)
        sc, lc = jax.jit(tr_c.update)(state, exp, labels)
        assert abs(float(lu) - float(lc)) < 1e-5
        for a, b in zip(
            jax.tree_util.tree_leaves(su.batch_stats),
            jax.tree_util.tree_leaves(sc.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(su.params),
            jax.tree_util.tree_leaves(sc.params),
        ):
            # atol 5e-4 (> 2*lr): one Adam step from init normalizes each
            # gradient element to ~sign(g)*lr, so f32 summation-order
            # dust on a near-zero element can move the post-step param by
            # up to 2*lr = 2e-4. Semantics are pinned by the loss and
            # batch_stats comparisons above at tight tolerance.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-4
            )


class TestLabels:
    def test_reactive_labels(self):
        tr = tiny_trainer(method="reactive")
        from tests.test_env import choice_for

        choice = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x),
            *[choice_for(ACTION_GRASP), choice_for(ACTION_SUCTION),
              choice_for(2), choice_for(2)],
        )
        outcome = StepOutcome(
            suction_success=jnp.array([0.0, 1.0, 0.0, 0.0]),
            grasp_success=jnp.array([1.0, 0.0, 0.0, 0.0]),
            gs_success=jnp.array([0.0, 0.0, 2.5, 0.5]),
        )
        labels = tr.reactive_labels(choice, outcome)
        # success -> 0; failure -> 1; ETS 0.5 counts as failure
        # (trainer.py:229-234).
        assert labels.tolist() == [0, 0, 0, 1]

    @pytest.mark.slow
    def test_dqn_future_zero_rules(self):
        """future term zeroed on failure and on table-cleared."""
        tr = tiny_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        from tests.test_env import choice_for

        B = 3
        prev_choice = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[choice_for(ACTION_GRASP)] * B
        )
        prev_outcome = StepOutcome(
            suction_success=jnp.zeros(B),
            grasp_success=jnp.array([0.0, 1.0, 1.0]),
            gs_success=jnp.zeros(B),
        )
        prev_num = jnp.array([3, 1, 3])  # scene 1: cleared the table
        depths = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224) * 0.05)
        masks = jnp.zeros((B, 12, 224, 224), bool).at[:, 0, 50:90, 50:90].set(True)
        next_choice = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[choice_for(ACTION_GRASP)] * B
        )
        labels, rewards = tr.dqn_labels(
            state, prev_choice, prev_outcome, prev_num, depths, masks,
            next_choice,
        )
        assert rewards.tolist() == [0.0, 1.0, 1.0]
        # Scene 0 failed -> label == 0 + gamma*0 = 0.
        assert float(labels[0]) == 0.0
        # Scene 1 cleared -> label == 1 exactly.
        assert float(labels[1]) == 1.0
        # Scene 2: 1 + 0.5 * Q_target != 1 generically.
        assert abs(float(labels[2]) - 1.0) > 1e-6


class TestLoop:
    @pytest.mark.slow
    @pytest.mark.slow
    def test_one_train_step_runs(self):
        tr = tiny_trainer(is_ets=True)
        cfg = LoopConfig(
            env=EnvConfig(is_pe=True, is_oo=True, is_ets=True,
                          settle_steps=100),
            batch_size=2,
            reset_settle_steps=50,
        )
        state = init_loop(jax.random.PRNGKey(0), tr, cfg)
        state2, metrics = train_step(tr, cfg, state)
        assert metrics.action.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(metrics.reward)))
        assert int(state2.trainer.iteration) == 1
        # Second step trains on the first step's experience.
        state3, metrics3 = train_step(tr, cfg, state2)
        assert np.isfinite(float(metrics3.loss))
        assert bool(state2.prev.exp.valid.any())
