"""Tendon-drive model of the SMG's enveloping fingers, as differentiable JAX.

The physical SMG closes four layer-jamming soft fingers with a single tendon
motor. The reference encodes the inverse model (desired fingertip opening ->
motor pre-rotation angle) as a `scipy.fsolve` call per grasp
(reference: code/robot.py:282-292) using the uniform-curvature finger model

    d(rot) = D0 - 2 L (cos(theta_s - pi/2) - sin(theta_s - rot)) / rot

with rest (torsion-spring) angle theta_s = 110 deg, finger length L and base
separation D0 from the CAD (reference robot.py:21-24, Mechanical/*.STL).

Here both directions are closed-form XLA: the forward map `opening_distance`
is the formula itself (with an exact rot -> 0 limit), and the inverse
`pre_rotate_angle` is a fixed-iteration Newton solve — fully jit/vmap-safe
and differentiable, replacing the host-side fsolve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SMGParams:
    """Geometry of the soft multimodal gripper (reference robot.py:21-24)."""

    torspring_angle: float = float(np.deg2rad(110.0))
    H: float = (47.0 + 6.0 + 55.0) / 1000.0  # palm stack height [m]
    D: float = 116.0 / 1000.0  # fingertip circle diameter, open [m]
    finger_length: float = 118.0 / 1000.0
    finger_width: float = 28.77 / 1000.0
    finger_depth: float = 18.29 / 1000.0
    sucker_height: float = 10.0 / 1000.0
    num_fingers: int = 4
    segments_per_finger: int = 4  # jointA..D per finger, robot.py:170-185

    @property
    def D0(self) -> float:
        return self.D - self.finger_depth

    @property
    def max_close_angle(self) -> float:
        """Full-close curl used for the suction posture (robot.py:253)."""
        return float(np.pi / 2.5)


DEFAULT = SMGParams()


def opening_distance(rotate_angle: jax.Array, p: SMGParams = DEFAULT) -> jax.Array:
    """Fingertip opening d [m] for a tendon curl `rotate_angle` [rad].

    Uniform-curvature forward model; smooth at rotate_angle -> 0 where it
    tends to D0 + 2 L sin(theta_s - pi/2) (fully open).
    """
    rot = jnp.asarray(rotate_angle)
    a0 = p.torspring_angle - jnp.pi / 2.0  # rest splay from vertical
    x = p.torspring_angle - rot
    # (cos(a0) - sin(x)) / rot with series fallback near rot = 0:
    #   sin(theta_s - rot) ~ sin(theta_s) - rot cos(theta_s) and
    #   cos(a0) = sin(theta_s), so the ratio -> cos(theta_s).
    safe_rot = jnp.where(jnp.abs(rot) < 1e-6, 1.0, rot)
    ratio = (jnp.cos(a0) - jnp.sin(x)) / safe_rot
    ratio = jnp.where(
        jnp.abs(rot) < 1e-6, jnp.cos(p.torspring_angle), ratio
    )
    return p.D0 - 2.0 * p.finger_length * ratio


def max_opening(p: SMGParams = DEFAULT) -> float:
    """Opening at zero curl: D0 + 2 L sin(theta_s - pi/2)."""
    return p.D0 + 2.0 * p.finger_length * float(
        np.sin(p.torspring_angle - np.pi / 2.0)
    )


def pre_rotate_angle(
    distance: jax.Array, p: SMGParams = DEFAULT, newton_iters: int = 12
) -> jax.Array:
    """Tendon curl [rad] that sets the fingertip opening to `distance` [m].

    Parity: reference code/robot.py:282-292 — including the sqrt(2) diagonal
    factor, the 0.03 m floor, and the 'already open enough' early-out
    (returns 0 when distance * sqrt(2) >= max opening). Implemented as a
    fixed-iteration Newton solve on the forward model, so it is jit-safe,
    vmap-safe, and differentiable (the reference used scipy.fsolve on host).
    """
    d_target = jnp.maximum(jnp.asarray(distance) * jnp.sqrt(2.0), 0.03)
    no_close = d_target >= max_opening(p)

    def f(rot):
        return opening_distance(rot, p) - d_target

    dfdr = jax.grad(lambda r: opening_distance(r, p).sum())

    rot = jnp.full_like(d_target, p.torspring_angle - jnp.pi / 100.0)

    def body(_, rot):
        fr = f(rot)
        dfr = dfdr(rot)
        step = fr / jnp.where(jnp.abs(dfr) < 1e-9, 1e-9, dfr)
        return jnp.clip(rot - step, 1e-4, p.torspring_angle - 1e-3)

    rot = jax.lax.fori_loop(0, newton_iters, body, rot)
    return jnp.where(no_close, 0.0, rot)


def finger_joint_angles(rotate_angle: jax.Array, p: SMGParams = DEFAULT) -> jax.Array:
    """Per-joint bend for a total curl: all 16 joints move in lockstep.

    The reference commands every jointA..D_1..4 to rotate_angle / 4
    (robot.py:253-280), i.e. uniform curvature over the 4 segments.
    """
    return jnp.asarray(rotate_angle)[..., None] / p.segments_per_finger * jnp.ones(
        p.segments_per_finger
    )


def finger_chain_points(
    rotate_angle: jax.Array, p: SMGParams = DEFAULT
) -> tuple[jax.Array, jax.Array]:
    """In-plane finger polyline for a given curl.

    Returns (r, z): radial offsets from the gripper axis and downward drops
    from the finger base, each of shape (..., segments + 1), for the joint
    positions of a 4-segment finger bent uniformly by `rotate_angle`.
    Segment i leaves at angle (theta_s - pi/2) - i * rot/4 from straight-down
    (positive = splayed outward).
    """
    rot = jnp.asarray(rotate_angle)
    nseg = p.segments_per_finger
    seg_len = p.finger_length / nseg
    a0 = p.torspring_angle - jnp.pi / 2.0
    # Angle of each segment after its leading joint has bent by rot/4 each.
    i = jnp.arange(1, nseg + 1)
    seg_angle = a0 - (i * rot[..., None] / nseg)
    dr = seg_len * jnp.sin(seg_angle)
    dz = seg_len * jnp.cos(seg_angle)
    r0 = jnp.broadcast_to(
        jnp.asarray(p.D0 / 2.0), rot.shape
    )[..., None]
    z0 = jnp.zeros_like(r0)
    r = jnp.concatenate([r0, r0 + jnp.cumsum(dr, axis=-1)], axis=-1)
    z = jnp.concatenate([z0, z0 + jnp.cumsum(dz, axis=-1)], axis=-1)
    return r, z
