"""Policy tests: arbitration rules, epsilon-greedy, PE / OO geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.policy import action_geom as ag
from smg_tpu.policy import arbitrate as arb
from smg_tpu.policy.arbitrate import ACTION_ETS, ACTION_GRASP, ACTION_SUCTION

N = 12


def confs(gvals, svals, gsvals=None):
    g = jnp.full((N, 1), -1e9).at[: len(gvals), 0].set(jnp.asarray(gvals))
    s = jnp.full((N, 1), -1e9).at[: len(svals), 0].set(jnp.asarray(svals))
    gs = jnp.full((N, N), -100.0)
    if gsvals is not None:
        for (i, j), v in gsvals.items():
            gs = gs.at[i, j].set(v)
    valid = jnp.arange(N) < len(gvals)
    centers = jnp.tile(jnp.arange(N, dtype=jnp.float32)[:, None], (1, 2)) * 10
    return g, s, gs, valid, centers


class TestArbitrate:
    def test_grasp_beats_suction(self):
        g, s, gs, valid, centers = confs([0.9, 0.2], [0.5, 0.1])
        c = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers,
            is_testing=True,
        )
        assert int(c.action) == ACTION_GRASP
        assert int(c.grasp_obj) == 0
        assert abs(float(c.predicted_value) - 0.9) < 1e-6
        # best_pix: [g_rot, g_row, g_col, 0, 0, 0] with center (0, 0).
        assert c.best_pix.tolist() == [0, 0, 0, 0, 0, 0]

    def test_suction_wins(self):
        g, s, gs, valid, centers = confs([0.3, 0.2], [0.5, 0.8])
        c = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers, is_testing=True
        )
        assert int(c.action) == ACTION_SUCTION
        assert int(c.suction_obj) == 1
        assert c.best_pix.tolist() == [0, 0, 0, 0, 10, 10]

    def test_ets_dqn_rule(self):
        g, s, gs, valid, centers = confs(
            [0.3, 0.2, 0.1], [0.25, 0.2, 0.1], {(0, 2): 0.6}
        )
        c = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers,
            method="reinforcement", is_ets=True, is_testing=True,
        )
        assert int(c.action) == ACTION_ETS
        # Object 0 has the better enveloping score -> grasped; 2 sucked.
        assert int(c.grasp_obj) == 0 and int(c.suction_obj) == 2

    def test_ets_reactive_double_rule(self):
        # reactive: ETS needs 2 * gs > max(g, s) (main.py:221-233).
        g, s, gs, valid, centers = confs(
            [0.5, 0.2], [0.4, 0.1], {(0, 1): 0.3}
        )
        c = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers,
            method="reactive", is_ets=True, is_testing=True,
        )
        assert int(c.action) == ACTION_ETS  # 2*0.3 = 0.6 > 0.5
        c2 = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers,
            method="reinforcement", is_ets=True, is_testing=True,
        )
        assert int(c2.action) == ACTION_GRASP  # 0.3 < 0.5

    def test_ets_single_object_falls_back(self):
        g, s, gs, valid, centers = confs([0.3], [0.5], {})
        c = arb.select_action(
            jax.random.PRNGKey(0), g, s, gs, valid, centers,
            is_ets=True, is_testing=True,
        )
        assert int(c.action) == ACTION_SUCTION

    def test_exploration_distribution(self):
        g, s, gs, valid, centers = confs([0.9, 0.2], [0.1, 0.1])
        acts = []
        for i in range(200):
            c = arb.select_action(
                jax.random.PRNGKey(i), g, s, gs, valid, centers,
                is_testing=False, explore_prob=1.0,
            )
            acts.append(int(c.action))
            assert bool(c.explored)
        acts = np.array(acts)
        assert (acts == ACTION_SUCTION).sum() > 50
        assert (acts == ACTION_GRASP).sum() > 50
        assert int(c.exploit_action) == ACTION_GRASP  # exploit unchanged

    def test_explore_probability_decay(self):
        p0 = float(arb.explore_probability(jnp.asarray(0), True, False))
        p_late = float(arb.explore_probability(jnp.asarray(20000), True, False))
        assert abs(p0 - 0.5) < 1e-6
        assert abs(p_late - 0.1) < 1e-6
        assert float(arb.explore_probability(jnp.asarray(5), False, False)) == 0.5
        assert float(arb.explore_probability(jnp.asarray(5), True, True)) == 0.0

    def test_vmap_over_scenes(self):
        g, s, gs, valid, centers = confs([0.9, 0.2], [0.5, 0.1])
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        fn = jax.jit(jax.vmap(
            lambda k: arb.select_action(
                k, g, s, gs, valid, centers, is_testing=True
            )
        ))
        out = fn(keys)
        assert out.action.shape == (4,)


class TestPE:
    def test_axis_aligned_box(self):
        """30 x 10 px rect at the workspace center: opening = short side x
        1.2, angle = long-axis direction (0 here)."""
        depth = jnp.zeros((224, 224)).at[107:117, 97:127].set(0.03)
        corners = jnp.array(
            [[97.0, 107.0], [97.0, 116.0], [126.0, 116.0], [126.0, 107.0]]
        )
        pos, angle, dist = ag.pe_grasp_geometry(corners, depth, is_pe=True)
        # Short side 9 px = 0.018 m -> 0.018 * 1.2.
        assert abs(float(dist) - 0.018 * 1.2) < 1e-3
        assert abs(float(angle)) < 1e-5
        assert abs(float(pos[2]) - 0.03) < 1e-6
        # Center world position ~ workspace center.
        assert abs(float(pos[0]) - (-0.5)) < 0.01
        assert abs(float(pos[1]) - 0.0) < 0.02

    def test_rotated_rect_angle(self):
        theta = 0.5
        c, s = np.cos(theta), np.sin(theta)
        base = np.array([[-15, -5], [-15, 5], [15, 5], [15, -5]], float)
        R = np.array([[c, -s], [s, c]])
        corners = jnp.asarray(base @ R.T + 112.0)
        depth = jnp.full((224, 224), 0.02)
        pos, angle, dist = ag.pe_grasp_geometry(corners, depth, is_pe=True)
        assert abs(float(angle) - theta) < 0.02
        assert abs(float(dist) - 10 * 0.002 * 1.2) < 1e-3

    def test_no_pe(self):
        corners = jnp.zeros((4, 2)).at[:, 0].set(jnp.array([0, 0, 10, 10.0]))
        depth = jnp.zeros((224, 224))
        pos, angle, dist = ag.pe_grasp_geometry(corners, depth, is_pe=False)
        assert float(angle) == 0.0 and float(dist) == 2.0

    def test_aspect_cap(self):
        """Opening distance capped at 1.2x the short side even for long
        objects (min(1.2, aspect), utils.py:339)."""
        depth = jnp.full((224, 224), 0.02)
        corners = jnp.array(
            [[50.0, 110.0], [50.0, 120.0], [150.0, 120.0], [150.0, 110.0]]
        )
        _, _, dist = ag.pe_grasp_geometry(corners, depth, is_pe=True)
        assert abs(float(dist) - 10 * 0.002 * 1.2) < 1e-3


def rect_corners(cx, cy, hw=5.0, hh=5.0):
    return jnp.array(
        [[cx - hw, cy - hh], [cx - hw, cy + hh], [cx + hw, cy + hh],
         [cx + hw, cy - hh]]
    )


def oo_scene(neighbors, target_xy=(112.0, 112.0), target_h=0.02,
             neighbor_h=0.06):
    """neighbors: list of (cx, cy). Returns args for oo_suction_angle."""
    n_all = 1 + len(neighbors)
    centers = jnp.zeros((N, 2))
    corners = jnp.zeros((N, 4, 2))
    valid = jnp.arange(N) < n_all
    depth = jnp.zeros((224, 224))
    tx, ty = target_xy
    centers = centers.at[0].set(jnp.array([tx, ty]))
    corners = corners.at[0].set(rect_corners(tx, ty))
    depth = depth.at[
        int(ty) - 5 : int(ty) + 5, int(tx) - 5 : int(tx) + 5
    ].set(target_h)
    for i, (cx, cy) in enumerate(neighbors, start=1):
        centers = centers.at[i].set(jnp.array([cx, cy]))
        corners = corners.at[i].set(rect_corners(cx, cy))
        depth = depth.at[
            int(cy) - 5 : int(cy) + 5, int(cx) - 5 : int(cx) + 5
        ].set(neighbor_h)
    return centers, corners, valid, depth


class TestOO:
    def test_no_neighbors(self):
        centers, corners, valid, depth = oo_scene([])
        pos, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth
        )
        assert float(angle) == 0.0
        assert abs(float(pos[2]) - 0.02) < 1e-6

    def test_lower_neighbors_ignored(self):
        centers, corners, valid, depth = oo_scene(
            [(140.0, 112.0), (84.0, 112.0)], neighbor_h=0.01
        )
        _, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth
        )
        assert float(angle) == 0.0

    def test_tall_neighbor_pushes_angle_away(self):
        """One tall neighbor 'above' the target in image coords (smaller y):
        its bearing is ~0 deg, so the free window midpoint is ~180 deg."""
        centers, corners, valid, depth = oo_scene([(112.0, 84.0)])
        _, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth
        )
        deg = np.degrees(float(angle))
        assert 150 < deg < 210, deg

    def test_gap_midpoint(self):
        """Tall neighbors at bearings ~0, ~90, ~180 leave the ~270 window."""
        centers, corners, valid, depth = oo_scene(
            [(112.0, 84.0), (84.0, 112.0), (112.0, 140.0)]
        )
        _, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth
        )
        deg = np.degrees(float(angle))
        assert 240 < deg < 300, deg

    def test_fully_surrounded_relaxes(self):
        """Neighbors on all four sides: relaxation must still return a
        finite angle (the reference re-admits the least-occluding)."""
        centers, corners, valid, depth = oo_scene(
            [(112.0, 84.0), (84.0, 112.0), (112.0, 140.0), (140.0, 112.0)]
        )
        _, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth
        )
        assert np.isfinite(float(angle))

    def test_no_oo_flag(self):
        centers, corners, valid, depth = oo_scene([(112.0, 84.0)])
        _, angle = ag.oo_suction_angle(
            jnp.asarray(0), centers, corners, valid, depth, is_oo=False
        )
        assert float(angle) == 0.0

    def test_jit_vmap(self):
        centers, corners, valid, depth = oo_scene([(112.0, 84.0)])
        fn = jax.jit(jax.vmap(
            lambda t: ag.oo_suction_angle(t, centers, corners, valid, depth)[1]
        ))
        out = fn(jnp.zeros((3,), jnp.int32))
        assert out.shape == (3,)
