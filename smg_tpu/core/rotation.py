"""Rotation math: Euler angles, rotation matrices, axis-angle, quaternions.

Functional JAX equivalents of the reference's NumPy helpers
(reference: code/utils.py:169-302 — euler2rotm, rotm2euler, angle2rotm,
rotm2angle), plus the quaternion algebra the batched physics stepper is
built on (the reference delegated orientation integration to CoppeliaSim).

All functions are pure, jit-safe, and batch via `jax.vmap`. Quaternions are
(w, x, y, z), unit-norm, Hamilton convention, rotating column vectors by
R(q) @ v.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Euler (XYZ intrinsic, matching reference euler2rotm: R = Rz @ Ry @ Rx)
# ---------------------------------------------------------------------------


def euler2rotm(theta: jax.Array) -> jax.Array:
    """Euler angles (3,) -> rotation matrix (3, 3). R = Rz(c) @ Ry(b) @ Rx(a).

    Parity: reference code/utils.py:169-183.
    """
    a, b, c = theta[0], theta[1], theta[2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    return jnp.array(
        [
            [cc * cb, cc * sb * sa - sc * ca, cc * sb * ca + sc * sa],
            [sc * cb, sc * sb * sa + cc * ca, sc * sb * ca - cc * sa],
            [-sb, cb * sa, cb * ca],
        ]
    )


def rotm2euler(R: jax.Array) -> jax.Array:
    """Rotation matrix (3, 3) -> Euler angles (3,) inverting `euler2rotm`.

    Parity: reference code/utils.py:196-212 (branchless singular handling).
    """
    sy = jnp.sqrt(R[0, 0] * R[0, 0] + R[1, 0] * R[1, 0])
    singular = sy < 1e-6
    x_ns = jnp.arctan2(R[2, 1], R[2, 2])
    z_ns = jnp.arctan2(R[1, 0], R[0, 0])
    x_s = jnp.arctan2(-R[1, 2], R[1, 1])
    y = jnp.arctan2(-R[2, 0], sy)
    x = jnp.where(singular, x_s, x_ns)
    z = jnp.where(singular, 0.0, z_ns)
    return jnp.stack([x, y, z])


# ---------------------------------------------------------------------------
# Axis-angle
# ---------------------------------------------------------------------------


def angle_axis2rotm(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Rodrigues rotation: angle (scalar), axis (3,) -> (3, 3).

    Parity: reference code/utils.py:215-236 (`angle2rotm`, rotation part).
    """
    axis = axis / (jnp.linalg.norm(axis) + 1e-12)
    sina, cosa = jnp.sin(angle), jnp.cos(angle)
    K = jnp.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    return cosa * jnp.eye(3) + (1.0 - cosa) * jnp.outer(axis, axis) + sina * K


def rotm2angle_axis(R: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rotation matrix -> (angle, axis). Smooth inverse of `angle_axis2rotm`.

    Behavioural equivalent of reference code/utils.py:239-302 (`rotm2angle`)
    without its epsilon-cascade branching: we recover the axis from the
    quaternion form, which is stable at 0 and pi.
    """
    q = rotm2quat(R)
    angle = 2.0 * jnp.arctan2(jnp.linalg.norm(q[1:]), q[0])
    axis = q[1:] / (jnp.linalg.norm(q[1:]) + 1e-12)
    # At angle ~ 0 the axis is arbitrary; pick +z like the reference's identity
    # case (utils.py:252 returns [0,1,0,0] i.e. arbitrary axis).
    axis = jnp.where(angle < 1e-8, jnp.array([0.0, 0.0, 1.0]), axis)
    return angle, axis


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2; shapes (..., 4)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """axis (..., 3), angle (...,) -> quaternion (..., 4)."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    half = 0.5 * jnp.asarray(angle)
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def quat_from_yaw(yaw: jax.Array) -> jax.Array:
    """Quaternion for rotation by `yaw` about +z; yaw shape (...,)."""
    half = 0.5 * yaw
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def quat2rotm(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def rotm2quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (3, 3) -> unit quaternion (4,), w >= 0. Branchless."""
    # Shepperd's method via the four squared magnitudes.
    t = jnp.trace(R)
    qw2 = jnp.maximum(0.0, 1.0 + t) / 4.0
    qx2 = jnp.maximum(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2]) / 4.0
    qy2 = jnp.maximum(0.0, 1.0 - R[0, 0] + R[1, 1] - R[2, 2]) / 4.0
    qz2 = jnp.maximum(0.0, 1.0 - R[0, 0] - R[1, 1] + R[2, 2]) / 4.0
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    # Candidate reconstructions, one per dominant component.
    def from_w():
        w = jnp.sqrt(qw2)
        return jnp.stack(
            [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
             (R[1, 0] - R[0, 1]) / (4 * w)]
        )

    def from_x():
        x = jnp.sqrt(qx2)
        return jnp.stack(
            [(R[2, 1] - R[1, 2]) / (4 * x), x, (R[0, 1] + R[1, 0]) / (4 * x),
             (R[0, 2] + R[2, 0]) / (4 * x)]
        )

    def from_y():
        y = jnp.sqrt(qy2)
        return jnp.stack(
            [(R[0, 2] - R[2, 0]) / (4 * y), (R[0, 1] + R[1, 0]) / (4 * y), y,
             (R[1, 2] + R[2, 1]) / (4 * y)]
        )

    def from_z():
        z = jnp.sqrt(qz2)
        return jnp.stack(
            [(R[1, 0] - R[0, 1]) / (4 * z), (R[0, 2] + R[2, 0]) / (4 * z),
             (R[1, 2] + R[2, 1]) / (4 * z), z]
        )

    q = jax.lax.switch(jnp.argmax(mags), [from_w, from_x, from_y, from_z])
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[0] < 0, -q, q)


def quat_integrate(q: jax.Array, omega: jax.Array, dt: float) -> jax.Array:
    """Integrate unit quaternion (..., 4) by angular velocity (..., 3) [rad/s].

    First-order exponential-map update, renormalised; the stepper's
    orientation integrator (the reference left this to CoppeliaSim's engine).
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-based so omega == 0 is exact.
    k = 0.5 * dt * jnp.sinc(half / jnp.pi)  # sin(half)/angle * ... safe at 0
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-1)
    out = quat_mul(dq, q)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)


def is_rotm(R: jax.Array, tol: float = 1e-6) -> jax.Array:
    """True if R is a valid rotation matrix. Parity: code/utils.py:187-192."""
    err = jnp.linalg.norm(R.T @ R - jnp.eye(3))
    return err < tol
