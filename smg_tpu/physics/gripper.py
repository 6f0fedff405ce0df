"""Kinematic SMG gripper: FK of the four tendon-coupled fingers + pads.

The reference articulates 16 finger joints (jointA..D_1..4) in lockstep over
RPC (reference code/robot.py:154-300) and lets Vortex collide the finger
bodies with the objects. Here the gripper is a *kinematic collider set*: FK
maps (tool pose, curl) to a fixed set of spheres (palm + 4 fingers x chain
spheres + 4 suction pads), and the contact layer applies penalty forces from
those spheres to the objects. The tendon linkage itself is
smg_tpu.core.tendon.

Layout (tool frame, z up, fingers hanging toward -z):
- Finger k sits at azimuth k * 90deg, its base on a circle of diameter D0.
- Suction pad k is mounted at fingertip k (pad axis outward at azimuth
  k * 90deg), matching the pad-per-quadrant selection of the reference's
  suction primitive (robot.py:639-653).
- `pos` (the servoed gs_target) is the palm center; finger bases hang at
  palm_drop below it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.core import tendon
from smg_tpu.physics.state import Gripper

P = tendon.DEFAULT

# Collider sphere counts. Each finger contributes its 5 chain points plus
# segment midpoints (9 spheres) so consecutive collider spheres overlap and
# objects cannot slip between them.
SPHERES_PER_FINGER = 2 * tendon.DEFAULT.segments_per_finger + 1
N_FINGERS = 4
PALM_SPHERES = 1
N_GRIPPER_SPHERES = PALM_SPHERES + N_FINGERS * SPHERES_PER_FINGER  # 37

# The physical finger half-depth (9.1 mm): with midpoint-interpolated
# chain spheres (~15 mm apart) the colliders still overlap, and thinner
# fingers keep the descend clearance the reference's 1.2/1.3 pre-open
# factors were designed to give.
FINGER_RADIUS = 0.0095
PALM_RADIUS = P.D0 / 2.0
PALM_DROP = 0.02  # palm center sits just above the finger-base ring
PAD_OFFSET = P.sucker_height  # pad tip protrudes below the fingertip

FINGER_AZIMUTHS = np.arange(N_FINGERS) * (np.pi / 2.0)  # numpy: no backend init


def collider_spheres(g: Gripper):
    """World-frame collider spheres for the gripper.

    Returns (centers (G, 3), radii (G,)) with G = N_GRIPPER_SPHERES.
    """
    R = g.tool_rotm()

    # Finger chain in the (radial, drop) plane for the current curl, with
    # segment midpoints interleaved for gap-free coverage.
    r_j, z_j = tendon.finger_chain_points(g.curl)  # (S+1,), (S+1,)
    r_mid = 0.5 * (r_j[..., :-1] + r_j[..., 1:])
    z_mid = 0.5 * (z_j[..., :-1] + z_j[..., 1:])
    r_chain = jnp.concatenate([r_j, r_mid], axis=-1)
    z_chain = jnp.concatenate([z_j, z_mid], axis=-1)

    # Place each finger at its azimuth.
    ca = jnp.cos(FINGER_AZIMUTHS)[:, None]
    sa = jnp.sin(FINGER_AZIMUTHS)[:, None]
    fx = ca * r_chain[None, :]
    fy = sa * r_chain[None, :]
    fz = jnp.broadcast_to(-PALM_DROP - z_chain[None, :], fx.shape)
    finger_pts = jnp.stack([fx, fy, fz], axis=-1).reshape(-1, 3)  # (4*(S+1), 3)

    palm = jnp.array([[0.0, 0.0, 0.0]])
    local = jnp.concatenate([palm, finger_pts], axis=0)  # (G, 3)
    centers = g.pos[None, :] + local @ R.T

    radii = jnp.concatenate(
        [
            jnp.array([PALM_RADIUS]),
            jnp.full((N_FINGERS * SPHERES_PER_FINGER,), FINGER_RADIUS),
        ]
    )
    return centers, radii


def fingertip_positions(g: Gripper) -> jax.Array:
    """World positions of the four fingertips, (4, 3)."""
    R = g.tool_rotm()
    r_chain, z_chain = tendon.finger_chain_points(g.curl)
    r_tip, z_tip = r_chain[-1], z_chain[-1]
    ca = jnp.cos(FINGER_AZIMUTHS)
    sa = jnp.sin(FINGER_AZIMUTHS)
    local = jnp.stack(
        [ca * r_tip, sa * r_tip, jnp.full((N_FINGERS,), -PALM_DROP - z_tip)],
        axis=-1,
    )
    return g.pos[None, :] + local @ R.T


def pad_tip_positions(g: Gripper) -> jax.Array:
    """World positions of the four suction-pad tips, (4, 3).

    Pads protrude from the fingertips along the (curled) finger direction;
    with fingers fully curled for the suction posture the active pad points
    down.
    """
    R = g.tool_rotm()
    r_chain, z_chain = tendon.finger_chain_points(g.curl)
    r_tip, z_tip = r_chain[-1], z_chain[-1]
    # Direction of the last segment in the finger plane.
    dr = r_chain[-1] - r_chain[-2]
    dz = z_chain[-1] - z_chain[-2]
    seg_norm = jnp.sqrt(dr * dr + dz * dz) + 1e-9
    ur, uz = dr / seg_norm, dz / seg_norm
    ca = jnp.cos(FINGER_AZIMUTHS)
    sa = jnp.sin(FINGER_AZIMUTHS)
    tip_r = r_tip + PAD_OFFSET * ur
    tip_z = z_tip + PAD_OFFSET * uz
    local = jnp.stack(
        [ca * tip_r, sa * tip_r, jnp.full((N_FINGERS,), -PALM_DROP) - tip_z],
        axis=-1,
    )
    return g.pos[None, :] + local @ R.T


def grasp_tip_position(g: Gripper) -> jax.Array:
    """The 'grasp_tip' reference point used by the stability/IK checks.

    Equivalent of the grasp_tip handle polled at reference
    robot.py:199,210-215: a point at the center of the fingertip circle.
    """
    tips = fingertip_positions(g)
    return tips.mean(axis=0)


def cage_radius(curl: jax.Array) -> jax.Array:
    """Horizontal fingertip-circle radius for a given curl (cage aperture)."""
    r_chain, _ = tendon.finger_chain_points(curl)
    return r_chain[..., -1]


def cage_depth(curl: jax.Array) -> jax.Array:
    """Vertical drop of the fingertips below the palm center."""
    _, z_chain = tendon.finger_chain_points(curl)
    return PALM_DROP + z_chain[..., -1]


def suction_pad_for_yaw(heightmap_rotation_angle: jax.Array) -> jax.Array:
    """Select the suction pad by approach-yaw quadrant.

    Parity: reference robot.py:639-653 — pad 0 for angle < pi/4 or
    >= 7pi/4, pad 1 for [pi/4, 3pi/4), pad 2 for [3pi/4, 5pi/4),
    pad 3 for [5pi/4, 7pi/4).
    """
    a = jnp.mod(heightmap_rotation_angle, 2 * jnp.pi)
    return jnp.select(
        [a < jnp.pi / 4, a < 3 * jnp.pi / 4, a < 5 * jnp.pi / 4,
         a < 7 * jnp.pi / 4],
        [0, 1, 2, 3],
        0,
    ).astype(jnp.int32)


def tool_angle_for_suction(heightmap_rotation_angle: jax.Array) -> jax.Array:
    """Tool z-rotation for the selected pad (reference robot.py:639-653)."""
    a = jnp.mod(heightmap_rotation_angle, 2 * jnp.pi)
    return jnp.select(
        [a < jnp.pi / 4, a < 3 * jnp.pi / 4, a < 5 * jnp.pi / 4,
         a < 7 * jnp.pi / 4],
        [a, a - jnp.pi / 2, a - jnp.pi, a - 3 * jnp.pi / 2],
        a - 2 * jnp.pi,
    )


def tool_angle_for_grasp(rotation_angle: jax.Array) -> jax.Array:
    """Tool z-rotation for enveloping (reference robot.py:559-563).

    Fingers sit on the axes of the tool frame, so grasping along the
    object's long axis phi means rotating the finger square's diagonal onto
    phi: tool = phi - pi/4 (or phi - 3pi/4 for phi > pi/2).
    """
    return jnp.where(
        rotation_angle <= jnp.pi / 2,
        rotation_angle - jnp.pi / 4,
        rotation_angle - 3 * jnp.pi / 4,
    )


def collider_spheres_soa(pos_b, yaw_b, tilt_b, curl_b):
    """Batched SoA collider spheres: scenes in the minor axis.

    Args: pos_b (B, 3), yaw_b (B,), tilt_b (B, 2), curl_b (B,).
    Returns (gx, gy, gz) each (G, B) and radii (G,) (shared).

    Same FK as collider_spheres, laid out for the Pallas contact kernel
    (lane axis = scenes); the (3, 3) tool rotation is applied via its nine
    (B,) components so no trailing-3 arrays are materialized.
    """
    B = yaw_b.shape[0]
    r_j, z_j = tendon.finger_chain_points(curl_b)  # (B, 5)
    r_mid = 0.5 * (r_j[:, :-1] + r_j[:, 1:])
    z_mid = 0.5 * (z_j[:, :-1] + z_j[:, 1:])
    r_chain = jnp.concatenate([r_j, r_mid], axis=1).T  # (9, B)
    z_chain = jnp.concatenate([z_j, z_mid], axis=1).T

    ca = jnp.cos(FINGER_AZIMUTHS)[:, None, None]  # (4, 1, 1)
    sa = jnp.sin(FINGER_AZIMUTHS)[:, None, None]
    fx = (ca * r_chain[None]).reshape(-1, B)      # (36, B)
    fy = (sa * r_chain[None]).reshape(-1, B)
    fz = jnp.broadcast_to(
        -PALM_DROP - z_chain[None], (N_FINGERS,) + z_chain.shape
    ).reshape(-1, B)

    lx = jnp.concatenate([jnp.zeros((1, B)), fx])  # (G, B) local coords
    ly = jnp.concatenate([jnp.zeros((1, B)), fy])
    lz = jnp.concatenate([jnp.zeros((1, B)), fz])

    # Tool rotation components (B,) each.
    cy_, sy_ = jnp.cos(yaw_b), jnp.sin(yaw_b)
    cx_, sx_ = jnp.cos(tilt_b[:, 0]), jnp.sin(tilt_b[:, 0])
    cb_, sb_ = jnp.cos(tilt_b[:, 1]), jnp.sin(tilt_b[:, 1])
    # R = Rz(yaw) @ Rx(tx) @ Ry(ty), matching Gripper.tool_rotm.
    r00 = cy_ * cb_ - sy_ * sx_ * sb_
    r01 = -sy_ * cx_
    r02 = cy_ * sb_ + sy_ * sx_ * cb_
    r10 = sy_ * cb_ + cy_ * sx_ * sb_
    r11 = cy_ * cx_
    r12 = sy_ * sb_ - cy_ * sx_ * cb_
    r20 = -cx_ * sb_
    r21 = sx_
    r22 = cx_ * cb_

    gx = pos_b[:, 0][None] + r00[None] * lx + r01[None] * ly + r02[None] * lz
    gy = pos_b[:, 1][None] + r10[None] * lx + r11[None] * ly + r12[None] * lz
    gz = pos_b[:, 2][None] + r20[None] * lx + r21[None] * ly + r22[None] * lz

    radii = jnp.concatenate(
        [
            jnp.array([PALM_RADIUS]),
            jnp.full((N_FINGERS * SPHERES_PER_FINGER,), FINGER_RADIUS),
        ]
    )
    return gx, gy, gz, radii
