"""Unit tests for smg_tpu.core: rotations, homography, camera, tendon model.

Oracles: NumPy/OpenCV/SciPy re-statements of the reference semantics
(reference code/utils.py:38-81,169-302 and code/robot.py:282-292).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.core import camera, homography, rotation, tendon


class TestRotation:
    def test_euler_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            theta = rng.uniform(-1.2, 1.2, size=3)
            R = rotation.euler2rotm(jnp.asarray(theta))
            back = rotation.rotm2euler(R)
            np.testing.assert_allclose(np.asarray(back), theta, atol=1e-5)

    def test_euler_matches_reference_formula(self):
        # Reference euler2rotm = Rz @ Ry @ Rx (code/utils.py:169-183).
        theta = np.array([0.3, -0.5, 1.1])

        def rx(a):
            return np.array(
                [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
            )

        def ry(a):
            return np.array(
                [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
            )

        def rz(a):
            return np.array(
                [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
            )

        expected = rz(theta[2]) @ ry(theta[1]) @ rx(theta[0])
        got = np.asarray(rotation.euler2rotm(jnp.asarray(theta)))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_quat_rotm_roundtrip(self):
        rng = np.random.RandomState(1)
        for _ in range(30):
            axis = rng.randn(3)
            angle = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3)
            R = rotation.angle_axis2rotm(jnp.asarray(angle), jnp.asarray(axis))
            q = rotation.rotm2quat(R)
            R2 = rotation.quat2rotm(q)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.RandomState(2)
        q = rotation.quat_from_axis_angle(
            jnp.asarray(rng.randn(3)), jnp.asarray(0.7)
        )
        v = jnp.asarray(rng.randn(5, 3))
        Rv = v @ rotation.quat2rotm(q).T
        np.testing.assert_allclose(
            np.asarray(rotation.quat_rotate(q, v)), np.asarray(Rv), atol=1e-5
        )

    def test_quat_integrate_constant_omega(self):
        # Integrating omega = (0, 0, w) for t seconds yields yaw = w t.
        q = rotation.quat_identity()
        omega = jnp.array([0.0, 0.0, 2.0])
        dt = 1e-3
        for _ in range(500):
            q = rotation.quat_integrate(q, omega, dt)
        R = rotation.quat2rotm(q)
        yaw = np.arctan2(float(R[1, 0]), float(R[0, 0]))
        assert abs(yaw - 1.0) < 1e-3

    def test_rotm2angle_axis(self):
        angle, axis = rotation.rotm2angle_axis(
            rotation.angle_axis2rotm(jnp.asarray(0.9), jnp.array([0.0, 0.0, 1.0]))
        )
        assert abs(float(angle) - 0.9) < 1e-5
        np.testing.assert_allclose(np.asarray(axis), [0, 0, 1], atol=1e-5)


class TestHomography:
    def test_fit_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        src = np.array([[110, 0], [110, 400], [510, 400], [510, 0]], np.float32)
        dst = np.array([[0, 0], [0, 224], [224, 224], [224, 0]], np.float32)
        H_cv = cv2.getPerspectiveTransform(src, dst)
        H = np.asarray(homography.fit_homography(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(H / H[2, 2], H_cv / H_cv[2, 2], atol=1e-4)

    def test_apply_roundtrip(self):
        src = jnp.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
        dst = jnp.array([[1.0, 2.0], [0.0, 12.0], [11.0, 13.0], [12.0, 1.0]])
        H = homography.fit_homography(src, dst)
        out = homography.apply_homography(H, src)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dst), atol=1e-4)

    def test_warp_identity(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 16).astype(np.float32))
        H = jnp.eye(3)
        out = homography.warp_perspective(img, H, (16, 16), mode="nearest")
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


class TestCamera:
    def test_heightmap_of_flat_plane(self):
        """A constant-depth plane seen by the overhead camera maps to a
        constant-height heightmap equal to the true world z."""
        cam = camera.Camera.overhead(height=0.5)
        depth = jnp.full((camera.IMAGE_H, camera.IMAGE_W), 0.5)  # table at z=0
        color = jnp.zeros((camera.IMAGE_H, camera.IMAGE_W, 3))
        _, depth_hm, _, depth_448, A_htor = camera.get_heightmap(
            color, depth, cam.intrinsics, cam.pose
        )
        assert depth_hm.shape == (224, 224)
        assert depth_448.shape == (448, 448)
        np.testing.assert_allclose(np.asarray(depth_hm), 0.0, atol=1e-4)

    def test_global_position_roundtrip(self):
        """Pick a heightmap pixel; global_position should land on a world
        point whose reprojection through the camera hits that depth pixel."""
        cam = camera.Camera.overhead(height=0.5)
        depth = jnp.full((camera.IMAGE_H, camera.IMAGE_W), 0.45)  # obj top z=0.05
        color = jnp.zeros((camera.IMAGE_H, camera.IMAGE_W, 3))
        *_, A_htor = camera.get_heightmap(color, depth, cam.intrinsics, cam.pose)
        pix = jnp.array([0, 112, 112])  # (rot, row, col) center of heightmap
        pos = camera.global_position(pix, A_htor, cam.intrinsics, cam.pose, depth)
        pos = np.asarray(pos)
        assert abs(pos[2] - 0.05) < 1e-3  # height above table
        # Center of ROI is near the camera axis -> near workspace center.
        assert abs(pos[0] - (-0.5)) < 0.05
        assert abs(pos[1] - 0.0) < 0.05


class TestTendon:
    def test_forward_limits(self):
        d_open = tendon.opening_distance(jnp.asarray(0.0))
        assert abs(float(d_open) - tendon.max_opening()) < 1e-6
        # Monotone decreasing in curl.
        rots = jnp.linspace(0.0, tendon.DEFAULT.max_close_angle, 50)
        ds = np.asarray(tendon.opening_distance(rots))
        assert np.all(np.diff(ds) < 0)

    def test_inverse_matches_scipy_fsolve(self):
        """pre_rotate_angle must reproduce the reference's fsolve solution
        (reference code/robot.py:282-292)."""
        from scipy.optimize import fsolve

        p = tendon.DEFAULT
        theta_s, L, D0 = p.torspring_angle, p.finger_length, p.D0

        def reference_pre_rotate(distance):
            if distance >= (D0 + 2 * L * np.sin(theta_s - np.pi / 2)) / np.sqrt(2):
                return 0.0
            distance = max(distance * np.sqrt(2), 0.03)

            def func(x):
                return [
                    D0
                    - 2 * L * (np.cos(theta_s - np.pi / 2) - np.sin(x[0]))
                    / (theta_s - x[0])
                    - distance * x[1],
                    x[1] - 1,
                ]

            root = fsolve(func, [np.pi / 100, 1])
            return theta_s - root[0]

        fn = jax.jit(tendon.pre_rotate_angle)
        for d in [0.02, 0.04, 0.06, 0.08, 0.10, 0.12]:
            expected = reference_pre_rotate(d)
            got = float(fn(jnp.asarray(d)))
            assert abs(got - expected) < 1e-4, (d, got, expected)

    def test_inverse_of_forward(self):
        rots = jnp.linspace(0.2, 1.1, 7)
        ds = tendon.opening_distance(rots) / jnp.sqrt(2.0)
        back = tendon.pre_rotate_angle(ds)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rots), atol=1e-4)

    def test_chain_tip_approximates_curve(self):
        """4-segment FK fingertip opening ~ continuous-curvature model.

        The discrete linkage (what the simulated gripper articulates,
        reference robot.py:253-280) and the continuous tendon formula (what
        the reference's pre-close solve assumes, robot.py:282-292) disagree
        by up to ~2.5 cm at high curl — the same modelling gap exists in the
        reference. We assert they agree to that bound and exactly at 0 curl.
        """
        for rot_v in (0.0, 0.3, 0.8):
            rot = jnp.asarray(rot_v)
            r, _ = tendon.finger_chain_points(rot)
            d_fk = 2.0 * float(r[..., -1])
            d_model = float(tendon.opening_distance(rot))
            tol = 1e-6 if rot_v == 0.0 else 0.03
            assert abs(d_fk - d_model) < tol

    def test_vmap_jit(self):
        ds = jnp.linspace(0.02, 0.15, 16)
        out = jax.jit(jax.vmap(tendon.pre_rotate_angle))(ds)
        assert out.shape == (16,)
        assert bool(jnp.all(jnp.isfinite(out)))
