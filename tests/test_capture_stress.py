"""Capture-model stress sweeps (the Vortex-fidelity guard rails).

Envelop/suction capture here is a geometry-gated weld (envs/primitives.py
capture masks; PARITY.md deviations 2/7) standing in for Vortex's contact
equilibrium (reference robot.py:555-626). These sweeps pin the *learnable*
structure of that model — the failure modes the affordance networks must
discover: a PE opening that lands the fingers ON the object fails, a
correct opening succeeds, a suction pad off the surface fails — and a
12-object highly-cluttered pile must settle and survive a grasp without
numerical explosion.

The boundary of the envelop success band is contact-noisy (a few-mm nudge
from brushing fingers can push the object off the cage axis), so the
sweeps assert the clear regions and the monotone envelope, not exact
threshold values.
"""

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.envs import primitives as prim
from smg_tpu.physics import scene as scene_mod
from smg_tpu.physics import shapes, stepper
from smg_tpu.physics.state import Gripper, Scene, WORKSPACE
from tests.test_render_perception import make_objects


import pytest

# Heavy integration module: excluded from the fast CI profile (pytest -m 'not slow').
pytestmark = pytest.mark.slow

def _scene(entries):
    return Scene(
        objects=make_objects(entries), gripper=Gripper.home(),
        t=jnp.asarray(0, jnp.int32),
    )


BAR = (shapes.BOX, (0.03, 0.015, 0.015), (-0.5, 0.0, 0.015), 0.0)
BAR_WIDTH = 0.03  # 2 * half_extent_y — the PE closing width


class TestEnvelopVsOpeningError:
    def _grasp_at(self, open_distance):
        @jax.jit
        def run(od):
            sc = stepper.settle(_scene([BAR]), 150)
            pos = jnp.array([-0.5, 0.0, 0.03])
            _, succ = prim.grasp_first(sc, od, pos, jnp.asarray(0.0))
            return succ

        return float(run(jnp.asarray(open_distance)))

    def test_success_band_and_failure_tails(self):
        """Openings near the object's width capture; fingers landing ON
        the object (opening far too small) or a cage far too wide both
        fail — the degradation the networks must learn from."""
        too_small = [0.010, 0.016, 0.020]   # pre-open < object width
        band = [0.030, 0.036, 0.045, 0.060]
        too_large = [0.080, 0.110]
        small_r = [self._grasp_at(od) for od in too_small]
        band_r = [self._grasp_at(od) for od in band]
        large_r = [self._grasp_at(od) for od in too_large]
        assert small_r == [0.0] * len(too_small), small_r
        assert band_r == [1.0] * len(band), band_r
        assert large_r == [0.0] * len(too_large), large_r

    def test_fingers_on_object_push_not_capture(self):
        """The canonical PE failure: a near-zero opening descends the
        fingertips onto the object; it must not weld."""
        assert self._grasp_at(0.005) == 0.0


class TestSuctionVsLateralOffset:
    PLATE = (shapes.BOX, (0.025, 0.025, 0.01), (-0.5, 0.0, 0.01), 0.0)

    def _suck_at(self, dx):
        @jax.jit
        def run(d):
            sc = stepper.settle(_scene([self.PLATE]), 150)
            pos = jnp.stack([-0.5 + d, jnp.asarray(0.0), jnp.asarray(0.02)])
            _, succ = prim.suction_first(sc, pos, jnp.asarray(0.0))
            return succ

        return float(run(jnp.asarray(dx)))

    def test_offset_sweep_monotone(self):
        """Success while the pad lands within the surface + skin margin
        (half-width 0.025 + SUCTION_SKIN 0.010), failure beyond — and the
        transition is monotone."""
        offsets = [0.0, 0.010, 0.020, 0.030, 0.045, 0.060]
        results = [self._suck_at(d) for d in offsets]
        assert results[:4] == [1.0] * 4, results
        assert results[4:] == [0.0] * 2, results
        # Monotone non-increasing success envelope.
        assert all(a >= b for a, b in zip(results, results[1:])), results


class TestClutterStress:
    def _pile(self):
        """12 touching boxes on the hc drop grid — denser than any
        sampled episode (reset caps at 10 objects)."""
        cells = np.asarray(scene_mod.drop_grid(True))
        entries = [
            (shapes.BOX, (0.022, 0.018, 0.015),
             (float(cells[i, 0]), float(cells[i, 1]), 0.05 + 0.02 * (i % 3)),
             0.5 * i)
            for i in range(12)
        ]
        return _scene(entries)

    def test_12_object_pile_settles(self):
        sc = jax.jit(lambda s: stepper.settle(s, 400))(self._pile())
        obj = sc.objects
        pos = np.asarray(obj.pos)
        vel = np.asarray(obj.vel)
        # No explosion: everything on/near the table inside the workspace
        # margin, resting (tiny velocities), not below the floor.
        assert np.all(np.abs(vel) < 0.05), np.abs(vel).max()
        assert np.all(pos[:, 2] > -0.005), pos[:, 2].min()
        assert np.all(pos[:, 2] < 0.25), pos[:, 2].max()
        assert np.all(pos[:, 0] > WORKSPACE[0, 0] - 0.1)
        assert np.all(pos[:, 0] < WORKSPACE[0, 1] + 0.1)
        assert np.all(pos[:, 1] > WORKSPACE[1, 0] - 0.1)
        assert np.all(pos[:, 1] < WORKSPACE[1, 1] + 0.1)

    def test_grasp_in_pile_no_explosion(self):
        """Enveloping one box out of the settled pile leaves the rest
        physically sane (Vortex-stability proxy for robot.py:207-215)."""

        @jax.jit
        def run(s):
            s = stepper.settle(s, 400)
            target = s.objects.pos[5]
            pos = jnp.stack([target[0], target[1], jnp.asarray(0.03)])
            return prim.grasp_first(s, jnp.asarray(0.045), pos,
                                    jnp.asarray(0.0))

        sc, _ = run(self._pile())
        obj = sc.objects
        keep = ~np.asarray(obj.removed)
        pos = np.asarray(obj.pos)[keep]
        vel = np.asarray(obj.vel)[keep]
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
        assert np.all(np.abs(vel) < 0.5), np.abs(vel).max()
        assert np.all(pos[:, 2] > -0.01), pos[:, 2].min()
        assert np.all(np.abs(pos[:, :2]) < 1.5)
        # The sim-stability predicate holds (gripper inside workspace+0.1).
        assert bool(stepper.sim_stable(sc.gripper))
