"""The batched rigid-body stepper: step(scene, gripper_target) -> scene.

This is the TPU-native replacement for the CoppeliaSim/Vortex process the
reference drove over blocking RPC (reference code/robot.py:302-375 moved a
kinematic IK target in millimeter steps, one TCP round-trip each; here one
`step` advances physics with the gripper servoed toward its target, and the
whole thing vmaps over thousands of scenes).

Integration: semi-implicit Euler on (vel, pos) and first-order exponential
map on quaternions; gyroscopic torque in world frame with angular damping.
Attached objects (grasped / sucked) follow the gripper kinematically via
their stored tool-frame transform — the constraint-switch replacement for
the suctionPad Lua scripts and the Vortex finger-cage contacts.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from smg_tpu.core import rotation as rot
from smg_tpu.physics import contact as ct
from smg_tpu.physics import gripper as gr
from smg_tpu.physics.state import (
    ATTACHED_GRASP,
    ATTACHED_SUCTION,
    FREE,
    Gripper,
    Objects,
    Scene,
    WORKSPACE,
)


@dataclass(frozen=True)
class StepperParams:
    dt: float = 1e-3
    gravity: float = -9.81
    contact: ct.ContactParams = ct.DEFAULT_PARAMS
    lin_damping: float = 0.15   # air drag [1/s]
    ang_damping: float = 2.0    # rotational drag [1/s]
    max_vel: float = 3.0
    max_omega: float = 30.0
    # Gripper servo rates. The reference stepped 2-20 mm per blocking RPC
    # (robot.py:302-375); at dt = 1 ms these rates bound the tool speed to
    # ~4 m/s so kinematic sweeps don't launch objects ballistically.
    servo_v: float = 0.004     # m per step toward position target
    servo_w: float = 0.06      # rad per step toward yaw/tilt target
    servo_curl: float = 0.015  # rad per step of tendon closing


DEFAULT = StepperParams()


def _servo_gripper(g: Gripper, target: Gripper, p: StepperParams) -> Gripper:
    """Rate-limited kinematic move of the gripper toward a target pose."""
    d = target.pos - g.pos
    dist = jnp.linalg.norm(d)
    step = jnp.minimum(dist, p.servo_v)
    new_pos = g.pos + d / (dist + 1e-9) * step

    def ang_step(cur, tgt, rate):
        diff = tgt - cur
        return cur + jnp.clip(diff, -rate, rate)

    return Gripper(
        pos=new_pos,
        yaw=ang_step(g.yaw, target.yaw, p.servo_w),
        tilt=ang_step(g.tilt, target.tilt, p.servo_w),
        curl=ang_step(g.curl, target.curl, p.servo_curl),
    )


def _attached_pose(g: Gripper, obj: Objects):
    """World pose that attached objects must follow (tool frame anchor)."""
    R = g.tool_rotm()
    q_tool = rot.rotm2quat(R)
    pos = g.pos[None, :] + obj.attach_pos @ R.T
    quat = rot.quat_mul(q_tool[None, :], obj.attach_quat)
    return pos, quat


def physics_step(
    scene: Scene,
    gripper_target: Gripper,
    p: StepperParams = DEFAULT,
) -> Scene:
    """Advance one physics step with the gripper servoing toward its target."""
    obj = scene.objects
    g_old = scene.gripper
    g_new = _servo_gripper(g_old, gripper_target, p)

    # Kinematic gripper collider sweep: positions now, velocities by FD.
    c_new, radii = gr.collider_spheres(g_new)
    c_old, _ = gr.collider_spheres(g_old)
    g_vels = (c_new - c_old) / p.dt

    # Forces.
    f_tab, tau_tab = ct.table_forces(obj, p.contact)
    f_oo, tau_oo = ct.object_object_forces(obj, p.contact)
    f_gr, tau_gr, _ = ct.gripper_object_forces(obj, c_new, radii, g_vels, p.contact)

    force = f_tab + f_oo + f_gr
    torque = tau_tab + tau_oo + tau_gr

    live = obj.active & ~obj.removed
    free = live & (obj.attached == FREE)

    # Linear integration (semi-implicit Euler).
    acc = force / obj.mass[:, None]
    acc = acc.at[:, 2].add(p.gravity)
    vel = obj.vel + p.dt * acc
    vel = vel * (1.0 - p.lin_damping * p.dt)
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = vel * jnp.minimum(1.0, p.max_vel / (speed + 1e-9))
    vel = jnp.where(free[:, None], vel, 0.0)
    pos = obj.pos + p.dt * vel

    # Angular integration: I_world w_dot = tau - w x (I_world w).
    R = rot.quat2rotm(obj.quat)  # (N, 3, 3)
    Iw = jnp.einsum("nij,nj,nkj->nik", R, obj.inertia, R)  # R diag(I) R^T
    Lw = jnp.einsum("nij,nj->ni", Iw, obj.omega)
    tau_eff = torque - jnp.cross(obj.omega, Lw)
    omega_dot = jnp.linalg.solve(
        Iw + 1e-10 * jnp.eye(3), tau_eff[..., None]
    ).squeeze(-1)
    omega = obj.omega + p.dt * omega_dot
    omega = omega * (1.0 - p.ang_damping * p.dt)
    wmag = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    omega = omega * jnp.minimum(1.0, p.max_omega / (wmag + 1e-9))
    omega = jnp.where(free[:, None], omega, 0.0)
    quat = rot.quat_integrate(obj.quat, omega, p.dt)
    quat = jnp.where(free[:, None], quat, obj.quat)
    pos = jnp.where(free[:, None], pos, obj.pos)

    # Attached objects ride the tool frame.
    att_pos, att_quat = _attached_pose(g_new, obj)
    is_att = live & (obj.attached != FREE)
    pos = jnp.where(is_att[:, None], att_pos, pos)
    quat = jnp.where(is_att[:, None], att_quat, quat)

    new_obj = obj.replace(pos=pos, quat=quat, vel=vel, omega=omega)
    return scene.replace(objects=new_obj, gripper=g_new, t=scene.t + 1)


def run_steps(
    scene: Scene,
    gripper_target: Gripper,
    n_steps: int,
    p: StepperParams = DEFAULT,
) -> Scene:
    """Roll the stepper for a fixed number of steps (static bound)."""

    def body(s, _):
        return physics_step(s, gripper_target, p), None

    out, _ = jax.lax.scan(body, scene, None, length=n_steps)
    return out


def settle(scene: Scene, n_steps: int = 300, p: StepperParams = DEFAULT) -> Scene:
    """Let free objects come to rest (gripper held at its current pose)."""
    return run_steps(scene, scene.gripper, n_steps, p)


# ---------------------------------------------------------------------------
# Attachment switching (the Lua suction scripts / Vortex grasp capture)
# ---------------------------------------------------------------------------


def attach(
    obj: Objects, g: Gripper, slot_mask: jax.Array, mode: jax.Array
) -> Objects:
    """Weld masked object slots to the tool frame in their current pose."""
    R = g.tool_rotm()
    q_tool = rot.rotm2quat(R)
    rel_pos = (obj.pos - g.pos[None, :]) @ R  # R^T applied row-wise
    rel_quat = rot.quat_mul(rot.quat_conj(q_tool)[None, :], obj.quat)
    attached = jnp.where(slot_mask, mode, obj.attached)
    return obj.replace(
        attached=attached.astype(jnp.int32),
        attach_pos=jnp.where(slot_mask[:, None], rel_pos, obj.attach_pos),
        attach_quat=jnp.where(slot_mask[:, None], rel_quat, obj.attach_quat),
        vel=jnp.where(slot_mask[:, None], 0.0, obj.vel),
        omega=jnp.where(slot_mask[:, None], 0.0, obj.omega),
    )


def detach_all(obj: Objects) -> Objects:
    """Release every attachment (reference suction_active(False) on all pads,
    robot.py:408-412, plus open_gripper)."""
    return obj.replace(attached=jnp.zeros_like(obj.attached))


# ---------------------------------------------------------------------------
# Episode predicates (reference failure-detection semantics)
# ---------------------------------------------------------------------------


def lift_success_mask(obj: Objects, thresh: float = 0.11) -> jax.Array:
    """Objects lifted above the success threshold (reference robot.py:378-392
    checks only the single highest object; see envs.primitives for that
    arbitration)."""
    return obj.on_table & (obj.pos[:, 2] > thresh)


def fallen_mask(obj: Objects, thresh: float = 0.001) -> jax.Array:
    """Objects that fell through/off the table (reference robot.py:457-460)."""
    return obj.on_table & (obj.pos[:, 2] < thresh) & (obj.attached == FREE)


def resurrect_fallen(obj: Objects, drop_z: float = 0.08) -> Objects:
    """Teleport fallen objects back above the table (robot.py:457-460)."""
    fallen = fallen_mask(obj)
    pos = jnp.where(
        fallen[:, None],
        jnp.stack([obj.pos[:, 0], obj.pos[:, 1],
                   jnp.full_like(obj.pos[:, 2], drop_z)], axis=-1),
        obj.pos,
    )
    zero = jnp.zeros_like(obj.vel)
    return obj.replace(
        pos=pos,
        vel=jnp.where(fallen[:, None], zero, obj.vel),
        omega=jnp.where(fallen[:, None], zero, obj.omega),
    )


def sim_stable(g: Gripper, margin: float = 0.1) -> jax.Array:
    """Gripper-within-workspace stability check (reference robot.py:207-215)."""
    tip = gr.grasp_tip_position(g)
    wl = WORKSPACE
    return (
        (tip[0] > wl[0, 0] - margin)
        & (tip[0] < wl[0, 1] + margin)
        & (tip[1] > wl[1, 0] - margin)
        & (tip[1] < wl[1, 1] + margin)
        & (tip[2] > wl[2, 0])
        & (tip[2] < wl[2, 1])
    )
