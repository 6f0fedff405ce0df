"""Environment/primitive tests — the end-to-end slice: scripted primitives
physically pick objects out of rendered+segmented scenes."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from smg_tpu.envs import primitives as prim
from smg_tpu.envs import smg_env as env
from smg_tpu.physics import shapes, stepper
from smg_tpu.physics.state import Gripper, Objects, Scene
from smg_tpu.policy.arbitrate import (
    ACTION_ETS,
    ACTION_GRASP,
    ACTION_SUCTION,
    ActionChoice,
)


def scene_with(entries):
    from tests.test_render_perception import make_objects

    obj = make_objects(entries)
    return Scene(objects=obj, gripper=Gripper.home(), t=jnp.asarray(0, jnp.int32))


def choice_for(action, g_obj=0, s_obj=0):
    z = jnp.asarray(0, jnp.int32)
    zz = jnp.asarray(0.0)
    return ActionChoice(
        action=jnp.asarray(action, jnp.int32),
        grasp_obj=jnp.asarray(g_obj, jnp.int32), grasp_rot=z,
        suction_obj=jnp.asarray(s_obj, jnp.int32), suction_rot=z,
        predicted_value=zz, explored=jnp.asarray(False),
        best_pix=jnp.zeros(6, jnp.int32),
        bestg_id=jnp.zeros(2, jnp.int32), bests_id=jnp.zeros(2, jnp.int32),
        bestgs_g_id=jnp.zeros(2, jnp.int32), bestgs_s_id=jnp.zeros(2, jnp.int32),
        bestgs_pair=jnp.zeros(2, jnp.int32),
        bestg_conf=zz, bests_conf=zz, bestgs_conf=zz,
        exploit_action=jnp.asarray(action, jnp.int32),
    )


class TestGraspPrimitive:
    @pytest.mark.slow
    def test_envelop_lifts_bar(self):
        """A graspable bar at a known pose: grasp() succeeds and removes it."""
        scene = scene_with(
            [(shapes.BOX, (0.03, 0.015, 0.015), (-0.5, 0.0, 0.015), 0.0)]
        )
        scene = stepper.settle(scene, 150)
        pos = jnp.array([-0.5, 0.0, 0.03])
        sc2, success = prim.grasp_first(
            scene, jnp.asarray(0.03 * 1.2), pos, jnp.asarray(0.0)
        )
        assert float(success) == 1.0
        assert bool(sc2.objects.removed[0])
        # Object parked on the shelf, not on the table.
        assert float(sc2.objects.pos[0, 1]) > 0.3

    @pytest.mark.slow
    def test_wrong_opening_fails(self):
        """PE opening far smaller than the object: fingers can't admit it."""
        scene = scene_with(
            [(shapes.BOX, (0.03, 0.025, 0.02), (-0.5, 0.0, 0.02), 0.0)]
        )
        scene = stepper.settle(scene, 150)
        pos = jnp.array([-0.5, 0.0, 0.04])
        sc2, success = prim.grasp_first(
            scene, jnp.asarray(0.012), pos, jnp.asarray(0.0)
        )
        assert float(success) == 0.0
        assert not bool(sc2.objects.removed[0])

    def test_grasp_far_from_object_fails(self):
        scene = scene_with(
            [(shapes.BOX, (0.03, 0.015, 0.015), (-0.6, -0.15, 0.015), 0.0)]
        )
        scene = stepper.settle(scene, 150)
        pos = jnp.array([-0.35, 0.18, 0.03])  # empty corner
        sc2, success = prim.grasp_first(
            scene, jnp.asarray(0.036), pos, jnp.asarray(0.0)
        )
        assert float(success) == 0.0


class TestSuctionPrimitive:
    def test_suck_flat_plate(self):
        scene = scene_with(
            [(shapes.BOX, (0.025, 0.025, 0.008), (-0.5, 0.0, 0.008), 0.0)]
        )
        scene = stepper.settle(scene, 150)
        pos = jnp.array([-0.5, 0.0, 0.016])
        sc2, success = prim.suction_first(scene, pos, jnp.asarray(0.0))
        assert float(success) == 1.0
        assert bool(sc2.objects.removed[0])

    def test_suction_misses_empty_spot(self):
        scene = scene_with(
            [(shapes.BOX, (0.025, 0.025, 0.008), (-0.6, -0.15, 0.008), 0.0)]
        )
        scene = stepper.settle(scene, 150)
        pos = jnp.array([-0.35, 0.18, 0.0])
        sc2, success = prim.suction_first(scene, pos, jnp.asarray(0.0))
        assert float(success) == 0.0

    @pytest.mark.slow
    def test_suction_each_quadrant_angle(self):
        """The pad-per-quadrant selection still lands on the object."""
        for ang in (0.0, jnp.pi / 2, jnp.pi, 3 * jnp.pi / 2):
            scene = scene_with(
                [(shapes.BOX, (0.025, 0.025, 0.008), (-0.5, 0.0, 0.008), 0.0)]
            )
            scene = stepper.settle(scene, 100)
            pos = jnp.array([-0.5, 0.0, 0.016])
            _, success = prim.suction_first(scene, pos, jnp.asarray(ang))
            assert float(success) == 1.0, ang


class TestETS:
    @pytest.mark.slow
    def test_grasp_then_suction_both(self):
        scene = scene_with(
            [
                (shapes.BOX, (0.03, 0.015, 0.015), (-0.55, -0.08, 0.015), 0.0),
                (shapes.BOX, (0.025, 0.025, 0.008), (-0.42, 0.10, 0.008), 0.0),
            ]
        )
        scene = stepper.settle(scene, 150)
        sc2, reward = prim.grasp_then_suction(
            scene,
            jnp.asarray(0.036), jnp.array([-0.55, -0.08, 0.03]),
            jnp.asarray(0.0),
            jnp.array([-0.42, 0.10, 0.016]), jnp.asarray(0.0),
        )
        assert float(reward) == 2.5
        assert bool(sc2.objects.removed[0]) and bool(sc2.objects.removed[1])

    @pytest.mark.slow
    def test_grasp_then_suction_partial(self):
        """Grasp fails (bad opening), suction succeeds -> 0.5."""
        scene = scene_with(
            [
                (shapes.BOX, (0.03, 0.025, 0.02), (-0.55, -0.08, 0.02), 0.0),
                (shapes.BOX, (0.025, 0.025, 0.008), (-0.42, 0.10, 0.008), 0.0),
            ]
        )
        scene = stepper.settle(scene, 150)
        sc2, reward = prim.grasp_then_suction(
            scene,
            jnp.asarray(0.012), jnp.array([-0.55, -0.08, 0.04]),
            jnp.asarray(0.0),
            jnp.array([-0.42, 0.10, 0.016]), jnp.asarray(0.0),
        )
        assert float(reward) == 0.5


class TestEnvPipeline:
    def test_observe_and_geometry(self):
        cfg = env.EnvConfig(is_pe=True, is_oo=True)
        scene = scene_with(
            [
                (shapes.BOX, (0.03, 0.015, 0.015), (-0.55, -0.08, 0.015), 0.3),
                (shapes.BOX, (0.025, 0.025, 0.008), (-0.42, 0.10, 0.008), 0.0),
            ]
        )
        scene = stepper.settle(scene, 150)
        obs = env.observe(scene)
        assert int(obs.seg.number) == 2
        choice = choice_for(ACTION_GRASP, g_obj=0, s_obj=1)
        geom = env.compute_geometry(choice, obs, cfg)
        # PE opening ~ 2 * 0.015 * 1.2 (bar short side).
        assert 0.025 < float(geom.open_distance) < 0.045
        assert abs(float(geom.grasp_angle) - 0.3) < 0.1
        np.testing.assert_allclose(
            np.asarray(geom.grasp_position[:2]), [-0.55, -0.08], atol=0.01
        )

    @pytest.mark.slow
    def test_execute_unified_batch(self):
        """Mixed actions across a vmapped batch in ONE compiled program."""
        cfg = env.EnvConfig(is_pe=True, is_oo=False, is_ets=True)

        def build(i):
            scene = scene_with(
                [
                    (shapes.BOX, (0.03, 0.015, 0.015), (-0.55, -0.08, 0.015), 0.0),
                    (shapes.BOX, (0.025, 0.025, 0.008), (-0.42, 0.10, 0.008), 0.0),
                ]
            )
            return stepper.settle(scene, 150)

        scenes = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[build(i) for i in range(3)]
        )
        actions = [ACTION_GRASP, ACTION_SUCTION, ACTION_ETS]
        choices = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[choice_for(a, g_obj=0, s_obj=1) for a in actions],
        )

        def one(scene, choice):
            obs = env.observe(scene)
            geom = env.compute_geometry(choice, obs, cfg)
            return env.execute(scene, choice, geom)

        sc2, out = jax.jit(jax.vmap(one))(scenes, choices)
        assert float(out.grasp_success[0]) == 1.0
        assert float(out.suction_success[1]) == 1.0
        assert float(out.gs_success[2]) == 2.5
        # Cross-contamination: grasp scene got no suction credit etc.
        assert float(out.suction_success[0]) == 0.0
        assert float(out.grasp_success[1]) == 0.0

    def test_episode_done_predicate(self):
        cfg = env.EnvConfig()

        def done(n, nc, ok, succ, it):
            return bool(
                env.episode_done(
                    jnp.asarray(n), jnp.asarray(nc, jnp.float32),
                    jnp.asarray(ok), jnp.asarray(succ), jnp.asarray(it), cfg,
                )
            )

        assert done(0, [0, 0], True, 0, 1)        # table empty
        assert not done(3, [0, 0], True, 2, 5)    # nothing trips
        assert done(3, [2, 2], True, 2, 5)        # no-change cutoff
        assert done(3, [0, 0], False, 2, 5)       # sim unstable
        assert done(3, [0, 0], True, 10, 5)       # success cap
        assert done(3, [0, 0], True, 2, 20)       # step limit


class TestBatchedExecutor:
    @pytest.mark.slow
    def test_matches_vmapped_execute(self):
        """batched.execute_batched == vmap(env.execute), bit-for-bit
        (interpret-mode Pallas on CPU)."""
        from smg_tpu.envs import batched

        cfg = env.EnvConfig(is_pe=True, is_oo=True, is_ets=True)

        def build():
            s = scene_with([
                (shapes.BOX, (0.03, 0.015, 0.015), (-0.55, -0.08, 0.015), 0.0),
                (shapes.BOX, (0.025, 0.025, 0.008), (-0.42, 0.10, 0.008), 0.0),
            ])
            return stepper.settle(s, 100)

        scenes = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x), *[build() for _ in range(3)]
        )
        choices = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x),
            *[choice_for(a, g_obj=0, s_obj=1)
              for a in (ACTION_GRASP, ACTION_SUCTION, ACTION_ETS)],
        )
        obs = jax.vmap(env.observe)(scenes)
        geom = jax.vmap(lambda c, o: env.compute_geometry(c, o, cfg))(
            choices, obs
        )
        ref_s, ref_o = jax.vmap(lambda s, c, g: env.execute(s, c, g))(
            scenes, choices, geom
        )
        bat_s, bat_o = batched.execute_batched(
            scenes, choices, geom, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(ref_o.grasp_success), np.asarray(bat_o.grasp_success)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_o.gs_success), np.asarray(bat_o.gs_success)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_s.objects.pos), np.asarray(bat_s.objects.pos)
        )
