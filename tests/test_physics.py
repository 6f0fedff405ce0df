"""Physics stepper tests: analytic contact cases, settling, attachment.

The reference has no physics tests (CoppeliaSim was the oracle); these are
the analytic-case suite SURVEY.md section 4 calls for.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from smg_tpu.physics import gripper as gr
from smg_tpu.physics import scene as sc
from smg_tpu.physics import shapes, stepper
from smg_tpu.physics.state import (
    ATTACHED_GRASP,
    Gripper,
    Objects,
    Scene,
)


def single_box_scene(z=0.1, he=(0.03, 0.02, 0.015)):
    obj = Objects.empty()
    he_arr = jnp.array(he)
    st = jnp.asarray(shapes.BOX)
    m, I = shapes.mass_properties(st, he_arr)
    off, rad = shapes.sphere_compound(st, he_arr)
    obj = obj.replace(
        pos=obj.pos.at[0].set(jnp.array([-0.5, 0.0, z])),
        active=obj.active.at[0].set(True),
        half_extents=obj.half_extents.at[0].set(he_arr),
        mass=obj.mass.at[0].set(m),
        inertia=obj.inertia.at[0].set(I),
        sph_offsets=obj.sph_offsets.at[0].set(off),
        sph_radii=obj.sph_radii.at[0].set(rad),
    )
    return Scene(objects=obj, gripper=Gripper.home(), t=jnp.asarray(0, jnp.int32))


class TestShapes:
    def test_box_compound_support(self):
        he = jnp.array([0.03, 0.02, 0.015])
        off, rad = shapes.sphere_compound(jnp.asarray(shapes.BOX), he)
        # Bottom support: min(center_z - r) == -hz.
        bottom = float(jnp.min(off[:, 2] - rad))
        assert abs(bottom + 0.015) < 1e-6
        # Lateral support matches half extents.
        assert abs(float(jnp.max(off[:, 0] + rad)) - 0.03) < 1e-6

    def test_cylinder_compound_support(self):
        he = jnp.array([0.02, 0.02, 0.03])
        off, rad = shapes.sphere_compound(jnp.asarray(shapes.CYLINDER), he)
        assert abs(float(jnp.min(off[:, 2] - rad)) + 0.03) < 1e-6

    def test_mass_properties(self):
        he = jnp.array([0.03, 0.02, 0.015])
        m, I = shapes.mass_properties(jnp.asarray(shapes.BOX), he)
        expected_m = 300.0 * 8 * 0.03 * 0.02 * 0.015
        assert abs(float(m) - expected_m) < 1e-6
        assert np.all(np.asarray(I) > 0)


class TestStepper:
    def test_box_falls_and_rests(self):
        """A box dropped above the table settles at z ~ hz."""
        scene = single_box_scene(z=0.1)
        scene = stepper.settle(scene, 500)
        z = float(scene.objects.pos[0, 2])
        assert abs(z - 0.015) < 0.004, z
        v = float(jnp.linalg.norm(scene.objects.vel[0]))
        assert v < 0.01

    def test_energy_bounded_no_explosion(self):
        # Drop away from the gripper's home hover (-0.5, 0, 0.3).
        scene = single_box_scene(z=0.25)
        obj = scene.objects
        scene = scene.replace(
            objects=obj.replace(
                pos=obj.pos.at[0, :2].set(jnp.array([-0.62, -0.12]))
            )
        )
        scene = stepper.settle(scene, 800)
        assert bool(jnp.all(jnp.isfinite(scene.objects.pos)))
        assert float(scene.objects.pos[0, 2]) < 0.05

    def test_two_boxes_stack(self):
        """A box dropped onto another stacks (rests near sum of heights)."""
        scene = single_box_scene(z=0.02, he=(0.025, 0.025, 0.02))
        obj = scene.objects
        he2 = jnp.array([0.02, 0.02, 0.015])
        st = jnp.asarray(shapes.BOX)
        m, I = shapes.mass_properties(st, he2)
        off, rad = shapes.sphere_compound(st, he2)
        obj = obj.replace(
            pos=obj.pos.at[1].set(jnp.array([-0.5, 0.0, 0.09])),
            active=obj.active.at[1].set(True),
            half_extents=obj.half_extents.at[1].set(he2),
            mass=obj.mass.at[1].set(m),
            inertia=obj.inertia.at[1].set(I),
            sph_offsets=obj.sph_offsets.at[1].set(off),
            sph_radii=obj.sph_radii.at[1].set(rad),
        )
        scene = scene.replace(objects=obj)
        scene = stepper.settle(scene, 700)
        z0 = float(scene.objects.pos[0, 2])
        z1 = float(scene.objects.pos[1, 2])
        assert abs(z0 - 0.02) < 0.006, z0
        # Top box rests on bottom box: ~ 0.04 + 0.015.
        assert z1 > 0.04, z1

    def test_objects_separate_if_overlapping(self):
        """Two interpenetrating boxes push apart to non-overlapping rest."""
        scene = single_box_scene(z=0.05, he=(0.02, 0.02, 0.02))
        obj = scene.objects
        he = jnp.array([0.02, 0.02, 0.02])
        st = jnp.asarray(shapes.BOX)
        m, I = shapes.mass_properties(st, he)
        off, rad = shapes.sphere_compound(st, he)
        obj = obj.replace(
            pos=obj.pos.at[1].set(jnp.array([-0.51, 0.0, 0.05])),
            active=obj.active.at[1].set(True),
            half_extents=obj.half_extents.at[1].set(he),
            mass=obj.mass.at[1].set(m),
            inertia=obj.inertia.at[1].set(I),
            sph_offsets=obj.sph_offsets.at[1].set(off),
            sph_radii=obj.sph_radii.at[1].set(rad),
        )
        scene = scene.replace(objects=obj)
        scene = stepper.settle(scene, 600)
        d = float(jnp.linalg.norm(scene.objects.pos[0] - scene.objects.pos[1]))
        assert d > 0.025, d
        assert bool(jnp.all(jnp.isfinite(scene.objects.pos)))

    def test_attachment_follows_gripper(self):
        scene = single_box_scene(z=0.015)
        g = scene.gripper
        obj = stepper.attach(
            scene.objects, g,
            jnp.arange(12) == 0, jnp.asarray(ATTACHED_GRASP),
        )
        scene = scene.replace(objects=obj)
        target = Gripper(
            pos=jnp.array([-0.4, 0.1, 0.35]), yaw=jnp.asarray(0.5),
            tilt=jnp.zeros(2), curl=jnp.asarray(0.4),
        )
        scene = stepper.run_steps(scene, target, 120)
        # Gripper reached target; object moved with it keeping rel offset.
        np.testing.assert_allclose(
            np.asarray(scene.gripper.pos), [-0.4, 0.1, 0.35], atol=1e-3
        )
        obj_pos = np.asarray(scene.objects.pos[0])
        # Original offset was obj - gripper = (0, 0, 0.015-0.3); after the
        # move (incl. yaw about z through the anchor) the offset magnitude
        # is preserved.
        d0 = np.array([0.0, 0.0, 0.015 - 0.3])
        d1 = obj_pos - np.asarray(scene.gripper.pos)
        assert abs(np.linalg.norm(d1) - np.linalg.norm(d0)) < 1e-4

    def test_gripper_pushes_object(self):
        """Descending closed gripper onto a box displaces it."""
        scene = single_box_scene(z=0.015, he=(0.02, 0.02, 0.015))
        scene = stepper.settle(scene, 200)
        # Descend with the tool axis 4.5 cm from the box center so the
        # closing fingers land on the box rather than caging it.
        target = Gripper(
            pos=jnp.array([-0.455, 0.0, 0.08]), yaw=jnp.asarray(0.0),
            tilt=jnp.zeros(2), curl=jnp.asarray(jnp.pi / 2.5),
        )
        scene2 = stepper.run_steps(scene, target, 300)
        moved = float(
            jnp.linalg.norm(scene2.objects.pos[0] - scene.objects.pos[0])
        )
        assert moved > 0.005, moved
        assert bool(jnp.all(jnp.isfinite(scene2.objects.pos)))

    def test_cage_contains_centered_object(self):
        """Closing the cage around a small centered box leaves it near its
        spot (inside the fingers) instead of ejecting it."""
        scene = single_box_scene(z=0.015, he=(0.02, 0.02, 0.015))
        scene = stepper.settle(scene, 200)
        target = Gripper(
            pos=jnp.array([-0.5, 0.0, 0.08]), yaw=jnp.asarray(0.0),
            tilt=jnp.zeros(2), curl=jnp.asarray(jnp.pi / 2.5),
        )
        scene2 = stepper.run_steps(scene, target, 300)
        moved = float(
            jnp.linalg.norm(scene2.objects.pos[0, :2] - scene.objects.pos[0, :2])
        )
        assert moved < 0.03, moved

    def test_vmap_batch_of_scenes(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        reset = jax.jit(jax.vmap(lambda k: sc.reset_scene(k, settle_steps=150)))
        batch = reset(keys)
        assert batch.objects.pos.shape == (4, 12, 3)
        live = np.asarray(batch.objects.on_table)
        # Every scene has at least one live object.
        assert np.all(live.sum(axis=1) >= 1)
        # Live objects rest within the workspace at sane heights.
        z = np.asarray(batch.objects.pos[..., 2])
        assert np.all(z[live] > -0.01)
        assert np.all(z[live] < 0.12)

    def test_sim_stable_predicate(self):
        g = Gripper.home()
        assert bool(stepper.sim_stable(g))
        g_bad = g.replace(pos=jnp.array([5.0, 0.0, 0.3]))
        assert not bool(stepper.sim_stable(g_bad))


class TestGripperFK:
    def test_collider_count_and_tips(self):
        g = Gripper.home()
        centers, radii = gr.collider_spheres(g)
        assert centers.shape == (gr.N_GRIPPER_SPHERES, 3)
        assert radii.shape == (gr.N_GRIPPER_SPHERES,)
        tips = gr.fingertip_positions(g)
        assert tips.shape == (4, 3)
        # Open fingers: tip circle diameter ~ max opening.
        d = float(jnp.linalg.norm(tips[0] - tips[2]))
        from smg_tpu.core import tendon
        # Discrete-linkage tip opening (see test_core tolerance note).
        assert abs(d - tendon.max_opening()) < 0.03

    def test_closing_shrinks_cage(self):
        r_open = float(gr.cage_radius(jnp.asarray(0.0)))
        r_closed = float(gr.cage_radius(jnp.asarray(jnp.pi / 2.5)))
        assert r_closed < r_open

    def test_pad_selection_quadrants(self):
        angles = [0.1, jnp.pi / 2, jnp.pi, 3 * jnp.pi / 2, 2 * jnp.pi - 0.1]
        pads = [int(gr.suction_pad_for_yaw(jnp.asarray(a))) for a in angles]
        assert pads == [0, 1, 2, 3, 0]

    def test_tool_angle_for_grasp(self):
        a = float(gr.tool_angle_for_grasp(jnp.asarray(jnp.pi / 3)))
        assert abs(a - (jnp.pi / 3 - jnp.pi / 4)) < 1e-6
        a2 = float(gr.tool_angle_for_grasp(jnp.asarray(2.0)))
        assert abs(a2 - (2.0 - 3 * jnp.pi / 4)) < 1e-6


class TestPallasBatchedStepper:
    @pytest.mark.slow
    def test_matches_reference_path(self):
        """run_steps_batched (Pallas kernel, interpret on CPU) must be
        bit-equivalent to vmapped physics_step."""
        keys = jax.random.split(jax.random.PRNGKey(2), 128)
        batch = jax.vmap(lambda k: sc.reset_scene(k, settle_steps=20))(keys)
        ref = jax.vmap(lambda s: stepper.run_steps(s, s.gripper, 5))(batch)
        fast = stepper.run_steps_batched(
            batch, batch.gripper, 5, interpret=True
        )
        for name in ("pos", "vel", "quat", "omega"):
            a = np.asarray(getattr(ref.objects, name))
            b = np.asarray(getattr(fast.objects, name))
            np.testing.assert_array_equal(a, b, err_msg=name)

    def test_batched_with_attached_and_moving_gripper(self):
        """Attachment kinematics + servo agree between the two paths."""
        keys = jax.random.split(jax.random.PRNGKey(3), 128)
        batch = jax.vmap(lambda k: sc.reset_scene(k, settle_steps=20))(keys)
        obj = batch.objects
        obj = jax.vmap(
            lambda o, g: stepper.attach(
                o, g, jnp.arange(12) == 0, jnp.asarray(ATTACHED_GRASP)
            )
        )(obj, batch.gripper)
        batch = batch.replace(objects=obj)
        tgt = jax.vmap(
            lambda g: Gripper(
                pos=g.pos + jnp.array([0.05, -0.03, 0.02]),
                yaw=g.yaw + 0.4, tilt=g.tilt, curl=g.curl + 0.3,
            )
        )(batch.gripper)
        ref = jax.vmap(lambda s, t: stepper.run_steps(s, t, 8))(batch, tgt)
        fast = stepper.run_steps_batched(batch, tgt, 8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(ref.objects.pos), np.asarray(fast.objects.pos),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref.gripper.pos), np.asarray(fast.gripper.pos),
            atol=1e-6,
        )
