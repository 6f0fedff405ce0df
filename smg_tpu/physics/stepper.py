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

    # Forces: one fused SoA sweep over table + object-object +
    # gripper-object contacts (see contact.fused_contact_forces).
    force, torque = ct.fused_contact_forces(
        obj, c_new, radii, g_vels, p.contact
    )
    new_obj = _integrate_objects(obj, force, torque, g_new, p)
    return scene.replace(objects=new_obj, gripper=g_new, t=scene.t + 1)


def _integrate_objects(
    obj: Objects, force: jax.Array, torque: jax.Array, g_new: Gripper,
    p: StepperParams,
) -> Objects:
    """Semi-implicit integration + attachment kinematics for one scene."""
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

    # Angular integration: I_world w_dot = tau - w x (I_world w). The body
    # inertia is diagonal, so I_world^-1 = R diag(1/I) R^T in closed form
    # (a batched tiny LU solve is far slower on TPU).
    R = rot.quat2rotm(obj.quat)  # (N, 3, 3)
    w_body = jnp.einsum("nji,nj->ni", R, obj.omega)
    L_world = jnp.einsum("nij,nj->ni", R, obj.inertia * w_body)
    tau_eff = torque - jnp.cross(obj.omega, L_world)
    tau_body = jnp.einsum("nji,nj->ni", R, tau_eff)
    omega_dot = jnp.einsum(
        "nij,nj->ni", R, tau_body / jnp.maximum(obj.inertia, 1e-10)
    )
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

    return obj.replace(pos=pos, quat=quat, vel=vel, omega=omega)


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

# ---------------------------------------------------------------------------
# Batched fast path: SoA state prep + Pallas pairwise kernel
# ---------------------------------------------------------------------------
#
# `physics_step` above is the readable per-scene reference path (vmap it for
# modest batches / CPU tests). For production-scale scene batches the
# pairwise contact sweep runs in the Pallas kernel
# (smg_tpu.ops.contact_pallas): state is transposed once per step into
# scene-minor SoA arrays, the kernel keeps all O(S*T) pair terms on-chip,
# and integration reuses the per-scene helper under vmap (it is cheap).


def _world_spheres_soa(obj: Objects):
    """Batched world spheres, scenes minor.

    obj: batched Objects with leading B. Returns 9 arrays:
    cx cy cz vx vy vz (S, B), plus radii (S, B), mass (S, B), live (S, B).
    """
    B, N, K = obj.sph_radii.shape
    S = N * K

    def t(x):  # (B, N) -> (N, B)
        return jnp.transpose(x, (1, 0))

    # Rotation components from quats, all (N, B).
    qw, qx, qy, qz = (t(obj.quat[..., i]) for i in range(4))
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    ox = jnp.transpose(obj.sph_offsets[..., 0], (1, 2, 0))  # (N, K, B)
    oy = jnp.transpose(obj.sph_offsets[..., 1], (1, 2, 0))
    oz = jnp.transpose(obj.sph_offsets[..., 2], (1, 2, 0))
    px, py, pz = (t(obj.pos[..., i]) for i in range(3))

    # Rotated offsets (arm vectors), (N, K, B).
    ax = r00[:, None] * ox + r01[:, None] * oy + r02[:, None] * oz
    ay = r10[:, None] * ox + r11[:, None] * oy + r12[:, None] * oz
    az = r20[:, None] * ox + r21[:, None] * oy + r22[:, None] * oz
    cx = (px[:, None] + ax).reshape(S, B)
    cy = (py[:, None] + ay).reshape(S, B)
    cz = (pz[:, None] + az).reshape(S, B)

    lvx, lvy, lvz = (t(obj.vel[..., i]) for i in range(3))
    wx, wy, wz = (t(obj.omega[..., i]) for i in range(3))
    vx = (lvx[:, None] + wy[:, None] * az - wz[:, None] * ay).reshape(S, B)
    vy = (lvy[:, None] + wz[:, None] * ax - wx[:, None] * az).reshape(S, B)
    vz = (lvz[:, None] + wx[:, None] * ay - wy[:, None] * ax).reshape(S, B)

    rad = jnp.transpose(obj.sph_radii, (1, 2, 0)).reshape(S, B)
    mass = jnp.repeat(t(obj.mass), K, axis=0)
    live = obj.active & ~obj.removed
    live_s = jnp.repeat(t(live).astype(cx.dtype), K, axis=0)
    arm = (ax.reshape(S, B), ay.reshape(S, B), az.reshape(S, B))
    return (cx, cy, cz, vx, vy, vz, rad, mass, live_s), arm


def physics_step_batched(
    scenes: Scene,
    gripper_target: Gripper,
    p: StepperParams = DEFAULT,
    interpret: bool = False,
) -> Scene:
    """One physics step for a batched Scene (leading B, B % 128 == 0)."""
    from smg_tpu.ops import contact_pallas

    obj = scenes.objects
    B, N, K = obj.sph_radii.shape
    S = N * K

    g_new = jax.vmap(lambda g, t: _servo_gripper(g, t, p))(
        scenes.gripper, gripper_target
    )
    # SoA gripper spheres now and previous (for FD velocities).
    gx1, gy1, gz1, grad = gr.collider_spheres_soa(
        g_new.pos, g_new.yaw, g_new.tilt, g_new.curl
    )
    gx0, gy0, gz0, _ = gr.collider_spheres_soa(
        scenes.gripper.pos, scenes.gripper.yaw, scenes.gripper.tilt,
        scenes.gripper.curl,
    )
    gvx = (gx1 - gx0) / p.dt
    gvy = (gy1 - gy0) / p.dt
    gvz = (gz1 - gz0) / p.dt
    G = grad.shape[0]

    row, arm = _world_spheres_soa(obj)
    cx, cy, cz, vx, vy, vz, rad, mass, live_s = row
    # Receivers exclude attached objects (their pose is kinematic).
    receives = (obj.active & ~obj.removed & (obj.attached == FREE))
    recv_s = jnp.repeat(
        jnp.transpose(receives, (1, 0)).astype(cx.dtype), K, axis=0
    )
    row_state = (cx, cy, cz, vx, vy, vz, rad, mass, recv_s)

    ones_g = jnp.ones((G, B), cx.dtype)
    col_state = (
        jnp.concatenate([cx, gx1]),
        jnp.concatenate([cy, gy1]),
        jnp.concatenate([cz, gz1]),
        jnp.concatenate([vx, gvx]),
        jnp.concatenate([vy, gvy]),
        jnp.concatenate([vz, gvz]),
        jnp.concatenate([rad, grad[:, None] * ones_g]),
        jnp.concatenate([mass, ones_g]),
        jnp.concatenate([live_s, ones_g]),
    )

    prm = p.contact
    fx, fy, fz = contact_pallas.pairwise_forces(
        row_state, col_state, K,
        kn=prm.kn, zeta=prm.zeta, share=prm.contact_share, mu=prm.mu,
        mu_grip=prm.mu_gripper, v_eps=prm.v_eps, max_pen=prm.max_pen,
        max_vn=prm.max_vn, interpret=interpret,
    )

    # Table contact per row sphere (SoA, XLA).
    pen_t = rad - (cz - prm.table_z)
    vn_t = jnp.clip(vz, -prm.max_vn, prm.max_vn)
    cn_t = 2.0 * prm.zeta * jnp.sqrt(prm.kn * mass / prm.contact_share)
    fn_t = jnp.maximum(
        0.0, prm.kn * jnp.minimum(pen_t, prm.max_pen) - cn_t * vn_t
    )
    fn_t = jnp.where((pen_t > 0.0) & (recv_s > 0.0), fn_t, 0.0)
    vtm = jnp.sqrt(vx * vx + vy * vy + 1e-18)
    ft_t = prm.mu * fn_t * jnp.tanh(vtm / prm.v_eps) / vtm
    fx = fx - ft_t * vx
    fy = fy - ft_t * vy
    fz = fz + fn_t

    # Torques about COM + per-object reduction (scene-minor SoA).
    ax, ay, az = arm
    tqx = (ay * fz - az * fy).reshape(N, K, B).sum(1)
    tqy = (az * fx - ax * fz).reshape(N, K, B).sum(1)
    tqz = (ax * fy - ay * fx).reshape(N, K, B).sum(1)
    fox = fx.reshape(N, K, B).sum(1)
    foy = fy.reshape(N, K, B).sum(1)
    foz = fz.reshape(N, K, B).sum(1)

    force = jnp.stack([fox, foy, foz], axis=-1).transpose(1, 0, 2)  # (B,N,3)
    torque = jnp.stack([tqx, tqy, tqz], axis=-1).transpose(1, 0, 2)

    new_obj = jax.vmap(
        lambda o, f, t, g: _integrate_objects(o, f, t, g, p)
    )(obj, force, torque, g_new)
    return scenes.replace(objects=new_obj, gripper=g_new, t=scenes.t + 1)


def run_steps_batched(
    scenes: Scene,
    gripper_target: Gripper,
    n_steps: int,
    p: StepperParams = DEFAULT,
    interpret: bool = False,
) -> Scene:
    """Batched scan of physics_step_batched (the bench / large-batch path)."""

    def body(s, _):
        return physics_step_batched(s, gripper_target, p, interpret), None

    out, _ = jax.lax.scan(body, scenes, None, length=n_steps)
    return out
