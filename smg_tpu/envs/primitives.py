"""Scripted grasp / suction / envelop-then-suck primitives.

The reference executes primitives by servoing a kinematic IK target in
millimeter steps over blocking RPC — several hundred round-trips per grasp
(reference code/robot.py:302-375 move_to, 555-626 grasp, 629-713 suction,
420-471 grasp_then_suction). Here each primitive is a fixed sequence of
*phases*; every phase servos the gripper toward a target pose while the
physics stepper advances, all inside one `lax.scan`-compiled program and
fully vmap-able over scenes.

Captures are constraint switches gated by geometry, mirroring how the
scene's Lua scripts implement suction (proximity-gated attach,
robot.py:395-412) and standing in for Vortex's finger-cage contact
equilibrium on the envelop side:

- envelop capture: after the final squeeze, the object nearest the tool
  axis is welded iff it sat inside the pre-opened cage, the squeezed cage
  is narrower than the object, and the fingers flank it vertically —
  so a wrong PE opening (fingers landing on the object) pushes it away
  instead of capturing, exactly the failure mode the networks must learn;
- suction capture: the selected pad tip must lie within a skin margin of
  the target object's surface.

Success bookkeeping (z > 0.11 lift check, teleport-out to the shelf,
fallen-object resurrection, rewards {0,1} / {0, 0.5, 2.5}) reproduces
robot.py:378-392,420-553.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from smg_tpu.core import rotation as rot
from smg_tpu.core import tendon
from smg_tpu.physics import gripper as gr
from smg_tpu.physics import stepper
from smg_tpu.physics.state import (
    ATTACHED_GRASP,
    ATTACHED_SUCTION,
    FREE,
    LIFT_SUCCESS_Z,
    PARK_POS,
    Gripper,
    Scene,
)

FULL_CLOSE = float(jnp.pi / 2.5)  # suction posture (robot.py:253)

APPROACH_MARGIN = 0.2  # hover height above the target (robot.py:575,656)
TIP_TARGET_Z = 0.008   # fingertip height during the enveloping descend
PAD_PRESS = 0.004      # press the pad slightly into the surface
SUCTION_SKIN = 0.010   # pad-to-surface attach tolerance


@dataclass(frozen=True)
class PrimitiveParams:
    """Stepper gains + phase step counts (static shapes).

    At the stepper's servo rates (4 mm, 0.06 rad, 0.015 rad curl per 1 ms
    step) the defaults bound the longest travel each phase needs (~0.45 m
    cross-workspace moves, full-curl closes) plus settling margin. Smaller
    counts compile/execute the same program faster for smoke tests and the
    multi-chip dryrun.
    """

    stepper: stepper.StepperParams = stepper.DEFAULT
    steps_move_above: int = 130
    steps_preclose: int = 95
    steps_descend: int = 65
    steps_squeeze: int = 55
    steps_lift: int = 65
    steps_pad_align: int = 45
    steps_finish: int = 40


DEFAULT = PrimitiveParams()


def _phase(scene: Scene, target: Gripper, n: int, p: PrimitiveParams) -> Scene:
    return stepper.run_steps(scene, target, n, p.stepper)


def _grip(pos, yaw, tilt, curl) -> Gripper:
    return Gripper(
        pos=jnp.asarray(pos), yaw=jnp.asarray(yaw),
        tilt=jnp.asarray(tilt), curl=jnp.asarray(curl),
    )


# ---------------------------------------------------------------------------
# Capture tests
# ---------------------------------------------------------------------------


def _object_min_width(obj) -> jax.Array:
    """Horizontal closing width proxy: the smallest lateral extent."""
    return 2.0 * jnp.minimum(obj.half_extents[:, 0], obj.half_extents[:, 1])


def _envelop_capture_mask(scene: Scene, pre_curl, final_curl) -> jax.Array:
    """Which single object (one-hot or all-False) the squeeze captured."""
    obj = scene.objects
    g = scene.gripper
    d_axis = jnp.linalg.norm(obj.pos[:, :2] - g.pos[None, :2], axis=-1)
    cage_pre = gr.cage_radius(pre_curl)
    open_pre = tendon.opening_distance(pre_curl)
    open_final = tendon.opening_distance(final_curl)
    w_obj = _object_min_width(obj)
    top = obj.pos[:, 2] + obj.half_extents[:, 2]

    eligible = (
        obj.on_table
        & (obj.attached == FREE)
        & (d_axis < cage_pre * 0.9 + 0.012)     # near the cage axis (allow
                                                # the few-mm nudge brushing
                                                # fingers impart on descend)
        & (open_pre >= w_obj - 0.005)           # it fit through the opening
        & (open_final < w_obj + 0.010)          # fingers squeeze onto it
        & (top > TIP_TARGET_Z + 0.005)          # fingers flank it vertically
    )
    # Envelop the nearest eligible object only.
    best = jnp.argmin(jnp.where(eligible, d_axis, jnp.inf))
    return eligible & (jnp.arange(obj.pos.shape[0]) == best)


def _suction_capture_mask(scene: Scene, pad_id) -> jax.Array:
    """Which single object the selected pad attached to (skin test)."""
    obj = scene.objects
    tip = gr.pad_tip_positions(scene.gripper)[pad_id]  # (3,)
    # Point-near-primitive: pad tip inside the margin-expanded body box.
    Rm = rot.quat2rotm(obj.quat)
    local = jnp.einsum("nji,nj->ni", Rm, tip[None, :] - obj.pos)
    inside = jnp.all(
        jnp.abs(local) <= obj.half_extents + SUCTION_SKIN, axis=-1
    )
    eligible = obj.on_table & (obj.attached == FREE) & inside
    # Attach the closest eligible object center.
    d = jnp.linalg.norm(obj.pos - tip[None, :], axis=-1)
    best = jnp.argmin(jnp.where(eligible, d, jnp.inf))
    return eligible & (jnp.arange(obj.pos.shape[0]) == best)


# ---------------------------------------------------------------------------
# Success bookkeeping (robot.py:378-392, 456-471, 489-508)
# ---------------------------------------------------------------------------


def _teleport_out_lifted(scene: Scene,
                         enabled: jax.Array | bool = True) -> Scene:
    """Held objects lifted above the success threshold go to the shelf.

    The reference teleports the 1 (grasp/suction) or 2 (ETS) highest
    objects above z = 0.11 (robot.py:378-392, 430-447); in this sim the
    only way past that height is being welded to the gripper, so gating on
    attachment is equivalent — and it excludes the sweep-through scoop
    artifact a penalty-contact stepper can produce where Vortex would
    deflect the object instead.
    """
    obj = scene.objects
    z = obj.pos[:, 2]
    slots = jnp.arange(obj.pos.shape[0])
    take = (
        obj.on_table & (obj.attached != FREE) & (z > LIFT_SUCCESS_Z)
        & jnp.asarray(enabled)
    )
    shelf = PARK_POS[None, :] + jnp.stack(
        [jnp.zeros_like(z), 0.1 * slots.astype(jnp.float32),
         jnp.zeros_like(z)], axis=-1
    )
    return scene.replace(
        objects=obj.replace(
            pos=jnp.where(take[:, None], shelf, obj.pos),
            vel=jnp.where(take[:, None], 0.0, obj.vel),
            omega=jnp.where(take[:, None], 0.0, obj.omega),
            removed=obj.removed | take,
            attached=jnp.where(take, FREE, obj.attached),
        )
    )


def _finish(scene: Scene, p: PrimitiveParams = None) -> Scene:
    """Detach everything, open the gripper, resurrect fallen objects and
    let the table settle briefly (robot.py:489-508 epilogue)."""
    p = DEFAULT if p is None else p
    obj = stepper.detach_all(scene.objects)
    obj = stepper.resurrect_fallen(obj)
    scene = scene.replace(objects=obj)
    open_target = scene.gripper.replace(curl=jnp.asarray(0.0))
    return _phase(scene, open_target, p.steps_finish, p)


# ---------------------------------------------------------------------------
# Stage parameter computation (shared by the per-scene and batched paths)
# ---------------------------------------------------------------------------


def grasp_stage_params(open_distance, position, rotation_angle):
    """Per-scene scalars for the enveloping sequence (robot.py:555-619)."""
    tool_yaw = gr.tool_angle_for_grasp(rotation_angle)
    factor = jnp.where(open_distance < 0.08, 1.3, 1.2)
    pre_curl = tendon.pre_rotate_angle(open_distance * factor)
    final_curl = jnp.where(
        open_distance < 0.08, jnp.asarray(FULL_CLOSE), pre_curl + jnp.pi / 5
    )
    final_curl = jnp.minimum(final_curl, FULL_CLOSE)
    descend_z = TIP_TARGET_Z + gr.cage_depth(pre_curl)
    above = jnp.stack(
        [position[0], position[1], descend_z + APPROACH_MARGIN]
    )
    down = jnp.stack([position[0], position[1], descend_z])
    return tool_yaw, pre_curl, final_curl, above, down


def suction_stage_params(cur_curl, position, rotation_angle, finger_angle):
    """Per-scene scalars for the sucking sequence (robot.py:629-696)."""
    pad_id = gr.suction_pad_for_yaw(rotation_angle)
    tool_yaw = gr.tool_angle_for_suction(rotation_angle)
    curl = jnp.where(
        finger_angle == 1.0, jnp.asarray(FULL_CLOSE),
        jnp.where(finger_angle == 0.0, cur_curl, finger_angle),
    )
    r_j, z_j = tendon.finger_chain_points(curl)
    dr = r_j[..., -1] - r_j[..., -2]
    dz = z_j[..., -1] - z_j[..., -2]
    mis = jnp.arctan2(dr, dz)
    # Tilt that swings the selected pad's axis onto -z (verified: with the
    # fully-curled posture mis = -52deg and pad 0 needs tilt_y = +mis).
    tilt = jnp.stack(
        [jnp.where(pad_id == 1, -mis, jnp.where(pad_id == 3, mis, 0.0)),
         jnp.where(pad_id == 0, mis, jnp.where(pad_id == 2, -mis, 0.0))]
    )
    probe_g = _grip(jnp.zeros(3), tool_yaw, tilt, curl)
    pad_off = gr.pad_tip_positions(probe_g)[pad_id]
    touch = position + jnp.array([0.0, 0.0, -PAD_PRESS]) - pad_off
    above = touch + jnp.array([0.0, 0.0, APPROACH_MARGIN])
    return pad_id, tool_yaw, tilt, curl, touch, above


def gate_target(target: Gripper, hold: Gripper, enabled) -> Gripper:
    """Per-scene stage gating: disabled scenes hold the entry pose."""
    return Gripper(
        pos=jnp.where(enabled, target.pos, hold.pos),
        yaw=jnp.where(enabled, target.yaw, hold.yaw),
        tilt=jnp.where(enabled, target.tilt, hold.tilt),
        curl=jnp.where(enabled, target.curl, hold.curl),
    )


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def grasp(
    scene: Scene,
    open_distance: jax.Array,
    position: jax.Array,       # (3,) surface point (x, y, z_surface)
    rotation_angle: jax.Array,
    p: PrimitiveParams = DEFAULT,
    enabled: jax.Array | bool = True,
):
    """Inner enveloping sequence (robot.grasp, robot.py:555-626).

    Returns (scene, success (), reached_curl ()) — the scene still holds
    the object (attached) like the reference's pre-detach state.

    `enabled` gates the whole stage per scene (for the unified vmapped
    executor): disabled scenes hold the entry pose and capture nothing.
    """
    enabled = jnp.asarray(enabled)
    hold = scene.gripper
    tool_yaw, pre_curl, final_curl, above, down = grasp_stage_params(
        open_distance, position, rotation_angle
    )
    zero_tilt = jnp.zeros(2)

    def gate(g: Gripper) -> Gripper:
        return gate_target(g, hold, enabled)

    # A: travel above the target, opening the fingers (robot.py:580-596).
    scene = _phase(scene, gate(_grip(above, tool_yaw, zero_tilt, 0.0)),
                   p.steps_move_above, p)
    # B: pre-close to the computed aperture (robot.py:607).
    scene = _phase(scene, gate(_grip(above, tool_yaw, zero_tilt, pre_curl)),
                   p.steps_preclose, p)
    # C: descend (robot.py:609).
    scene = _phase(scene, gate(_grip(down, tool_yaw, zero_tilt, pre_curl)),
                   p.steps_descend, p)
    # D: squeeze (robot.py:611-619).
    scene = _phase(scene, gate(_grip(down, tool_yaw, zero_tilt, final_curl)),
                   p.steps_squeeze, p)
    # Capture (Vortex finger-cage equilibrium -> geometric weld).
    cap = _envelop_capture_mask(scene, pre_curl, final_curl) & enabled
    scene = scene.replace(
        objects=stepper.attach(
            scene.objects, scene.gripper, cap, jnp.asarray(ATTACHED_GRASP)
        )
    )
    # E: lift (robot.py:621).
    scene = _phase(scene, gate(_grip(above, tool_yaw, zero_tilt, final_curl)),
                   p.steps_lift, p)
    # Success: a held object above the lift threshold + immediate
    # teleport-out (check_grasp_success, robot.py:623,378-392).
    obj = scene.objects
    lifted = obj.on_table & (obj.attached == ATTACHED_GRASP) & (
        obj.pos[:, 2] > LIFT_SUCCESS_Z
    )
    success = (lifted.any() & enabled).astype(jnp.float32)
    scene = _teleport_out_lifted(scene, enabled=enabled)
    return scene, success, final_curl


def suction(
    scene: Scene,
    position: jax.Array,
    rotation_angle: jax.Array,
    finger_angle: jax.Array,   # 1 -> full close; 0 -> keep; else that curl
    p: PrimitiveParams = DEFAULT,
    enabled: jax.Array | bool = True,
):
    """Inner sucking sequence (robot.suction, robot.py:629-713).

    Returns (scene, success ()) with the sucked object still attached.
    """
    enabled = jnp.asarray(enabled)
    hold = scene.gripper
    pad_id, tool_yaw, tilt, curl, touch, above = suction_stage_params(
        scene.gripper.curl, position, rotation_angle, finger_angle
    )

    def gate(g: Gripper) -> Gripper:
        return gate_target(g, hold, enabled)

    # A: travel above + yaw (robot.py:684-689).
    scene = _phase(scene, gate(_grip(above, tool_yaw, jnp.zeros(2), curl)),
                   p.steps_move_above, p)
    # B: pad-align tilt + posture (robot.py:692-693).
    scene = _phase(scene, gate(_grip(above, tool_yaw, tilt, curl)),
                   p.steps_pad_align, p)
    # C: descend to touch (robot.py:696).
    scene = _phase(scene, gate(_grip(touch, tool_yaw, tilt, curl)),
                   p.steps_descend, p)
    # Attach (suctionPad Lua active_true, robot.py:698).
    cap = _suction_capture_mask(scene, pad_id) & enabled
    attached_any = cap.any()
    scene = scene.replace(
        objects=stepper.attach(
            scene.objects, scene.gripper, cap, jnp.asarray(ATTACHED_SUCTION)
        )
    )
    # D: lift + untilt (robot.py:703-711).
    scene = _phase(scene, gate(_grip(above, tool_yaw, jnp.zeros(2), curl)),
                   p.steps_lift, p)
    # The reference's suction success flag is the attach result itself
    # (robot.py:698-713).
    return scene, attached_any.astype(jnp.float32)


def grasp_first(
    scene: Scene, open_distance, position, rotation_angle,
    p: PrimitiveParams = DEFAULT,
):
    """robot.grasp_first (robot.py:474-510): grasp -> bookkeeping -> 0/1."""
    scene, success, _ = grasp(scene, open_distance, position, rotation_angle, p)
    scene = _finish(scene, p)
    return scene, success


def suction_first(
    scene: Scene, position, rotation_angle, p: PrimitiveParams = DEFAULT
):
    """robot.suction_first (robot.py:512-553): suck -> lift -> 0/1."""
    scene, success = suction(
        scene, position, rotation_angle, jnp.asarray(1.0), p
    )
    scene = _teleport_out_lifted(scene)
    scene = _finish(scene, p)
    return scene, success


def grasp_then_suction(
    scene: Scene,
    open_distance, grasp_position, grasp_rotation_angle,
    suction_position, suction_rotation_angle,
    p: PrimitiveParams = DEFAULT,
):
    """robot.grasp_then_suction (robot.py:420-471): envelop one object,
    keep holding, suck a second; reward 2.5 both / 0.5 one / 0 none."""
    scene, g_succ, reached_curl = grasp(
        scene, open_distance, grasp_position, grasp_rotation_angle, p
    )
    # On grasp failure the fingers stay at the reached angle during the
    # suction retry (robot.py:424-428).
    finger_angle = jnp.where(g_succ > 0, 0.0, reached_curl)
    scene, s_succ = suction(
        scene, suction_position, suction_rotation_angle, finger_angle, p
    )
    scene = _teleport_out_lifted(scene)
    scene = _finish(scene, p)
    reward = jnp.where(
        (g_succ > 0) & (s_succ > 0), 2.5,
        jnp.where((g_succ > 0) | (s_succ > 0), 0.5, 0.0),
    )
    return scene, reward
