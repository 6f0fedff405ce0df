"""Dense branchless contact model: penalty normal forces + smooth Coulomb.

The reference delegated contact dynamics to CoppeliaSim's Vortex engine in a
separate process (reference README.md:31, robot.py RPC stepping). The
TPU-native stepper instead resolves contacts as *compliant (spring-damper)
penalties between sphere compounds* — the classic MuJoCo/MJX-style soft
contact — because it is branchless, needs no iterative solver, and maps to
one batched distance computation per contact class:

  - object sphere  vs  table plane        (N*K contacts)
  - object sphere  vs  object sphere      (N*K x N*K, same-object masked)
  - gripper sphere vs  object sphere      (G x N*K, gripper kinematic)

Friction is smooth Coulomb: F_t = -mu * |F_n| * tanh(|v_t| / v_eps) * v_hat,
which is exact enough for grasp/push dynamics and keeps everything C^1 for
potential end-to-end differentiation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from smg_tpu.physics.state import Objects


@dataclass(frozen=True)
class ContactParams:
    """Soft-contact gains, tuned for explicit stability at dt = 1 ms.

    With up to `contact_share` compound spheres touching simultaneously,
    total stiffness is contact_share * kn; the floored object mass
    (shapes.MIN_MASS) keeps omega * dt = sqrt(share * kn / m) * dt <= ~0.4
    and the per-contact damping uses m / share so c_total * dt / m < 1.
    """

    kn: float = 800.0         # normal stiffness per contact [N/m]
    zeta: float = 0.6         # damping ratio
    mu: float = 0.8           # Coulomb friction coefficient
    v_eps: float = 0.01       # friction smoothing velocity [m/s]
    # Gripper-object friction. Captures are welds (not friction-held), so
    # this only shapes pushing; the soft fingers' sides are smooth — high
    # values drag brushed objects out of the cage during descend.
    mu_gripper: float = 0.6
    table_z: float = 0.0
    contact_share: float = 4.0  # expected simultaneous contacts per object
    # Robustness clamps: deep sweeps and fast kinematic colliders otherwise
    # produce impulsive forces that eject objects.
    max_pen: float = 0.006      # [m] penetration depth cap for the spring
    max_vn: float = 0.5         # [m/s] normal-velocity cap for the damper


DEFAULT_PARAMS = ContactParams()


def _pair_forces(p_a, v_a, r_a, p_b, v_b, r_b, mass_eff, prm: ContactParams):
    """Penalty force ON a FROM b for sphere sets broadcast against each other.

    All inputs broadcast to a common shape (..., 3) / (...,). Returns force
    (..., 3); zero where not penetrating.
    """
    d = p_a - p_b
    dist = jnp.linalg.norm(d, axis=-1)
    pen = (r_a + r_b) - dist
    n = d / (dist + 1e-9)[..., None]
    vrel = v_a - v_b
    vn = jnp.clip(jnp.sum(vrel * n, axis=-1), -prm.max_vn, prm.max_vn)
    cn = 2.0 * prm.zeta * jnp.sqrt(prm.kn * mass_eff / prm.contact_share)
    fn_mag = jnp.maximum(
        0.0, prm.kn * jnp.minimum(pen, prm.max_pen) - cn * vn
    )
    active = pen > 0.0
    fn_mag = jnp.where(active, fn_mag, 0.0)
    f_n = fn_mag[..., None] * n
    # Friction.
    vt = vrel - vn[..., None] * n
    vt_mag = jnp.linalg.norm(vt, axis=-1)
    ft_mag = prm.mu * fn_mag * jnp.tanh(vt_mag / prm.v_eps)
    f_t = -ft_mag[..., None] * vt / (vt_mag + 1e-9)[..., None]
    return f_n + f_t


def table_forces(obj: Objects, prm: ContactParams = DEFAULT_PARAMS):
    """Ground-plane contacts for every compound sphere.

    Returns (force (N, 3), torque (N, 3)) about each object's COM.
    """
    centers, radii, vels = obj.world_spheres()  # (N, K, 3), (N, K), (N, K, 3)
    pen = radii - (centers[..., 2] - prm.table_z)
    vn = jnp.clip(vels[..., 2], -prm.max_vn, prm.max_vn)
    m = obj.mass[:, None]
    cn = 2.0 * prm.zeta * jnp.sqrt(prm.kn * m / prm.contact_share)
    fn = jnp.maximum(0.0, prm.kn * jnp.minimum(pen, prm.max_pen) - cn * vn)
    fn = jnp.where(pen > 0.0, fn, 0.0)
    # Tangential velocity in the table plane.
    vt = vels.at[..., 2].set(0.0)
    vt_mag = jnp.linalg.norm(vt, axis=-1)
    ft = prm.mu * fn * jnp.tanh(vt_mag / prm.v_eps)
    f = jnp.stack(
        [
            -ft * vt[..., 0] / (vt_mag + 1e-9),
            -ft * vt[..., 1] / (vt_mag + 1e-9),
            fn,
        ],
        axis=-1,
    )  # (N, K, 3)
    arm = centers - obj.pos[:, None, :]
    torque = jnp.cross(arm, f)
    return f.sum(axis=1), torque.sum(axis=1)


def object_object_forces(obj: Objects, prm: ContactParams = DEFAULT_PARAMS):
    """All-pairs object-object sphere contacts (same-object pairs masked).

    Dense (N, K, N, K) formulation — with N = 12, K = 8 this is 9216 pair
    tests per scene, a single fused VPU sweep under vmap.

    Returns (force (N, 3), torque (N, 3)).
    """
    centers, radii, vels = obj.world_spheres()
    N, K = radii.shape
    pa = centers[:, :, None, None, :]
    pb = centers[None, None, :, :, :]
    va = vels[:, :, None, None, :]
    vb = vels[None, None, :, :, :]
    ra = radii[:, :, None, None]
    rb = radii[None, None, :, :]
    # Effective mass for damping: harmonic mean.
    ma = obj.mass[:, None, None, None]
    mb = obj.mass[None, None, :, None]
    meff = ma * mb / (ma + mb)
    f = _pair_forces(pa, va, ra, pb, vb, rb, meff, prm)  # (N, K, N, K, 3)
    # Mask: no self-pairs; both objects must be live colliders.
    live = obj.active & ~obj.removed
    eye = jnp.eye(N, dtype=bool)
    mask = (~eye)[:, None, :, None] & live[:, None, None, None] & live[None, None, :, None]
    f = jnp.where(mask[..., None], f, 0.0)
    force = f.sum(axis=(1, 2, 3))  # on each object a
    arm = centers[:, :, None, None, :] - obj.pos[:, None, None, None, :]
    torque = jnp.cross(arm, f).sum(axis=(1, 2, 3))
    return force, torque


def gripper_object_forces(
    obj: Objects,
    grip_centers: jax.Array,  # (G, 3)
    grip_radii: jax.Array,    # (G,)
    grip_vels: jax.Array,     # (G, 3)
    prm: ContactParams = DEFAULT_PARAMS,
):
    """Forces from the kinematic gripper spheres onto the objects.

    Returns (force (N, 3), torque (N, 3), contact_force_per_finger_sphere
    (G,) — total normal-ish load on each gripper sphere, useful for grasp
    diagnostics).
    """
    centers, radii, vels = obj.world_spheres()  # (N, K, ...)
    pa = centers[:, :, None, :]
    va = vels[:, :, None, :]
    ra = radii[:, :, None]
    pb = grip_centers[None, None, :, :]
    vb = grip_vels[None, None, :, :]
    rb = grip_radii[None, None, :]
    meff = obj.mass[:, None, None]  # gripper is infinite-mass
    gprm = ContactParams(
        kn=prm.kn, zeta=prm.zeta, mu=prm.mu_gripper, v_eps=prm.v_eps,
        mu_gripper=prm.mu_gripper, table_z=prm.table_z,
        contact_share=prm.contact_share, max_pen=prm.max_pen,
        max_vn=prm.max_vn,
    )
    f = _pair_forces(pa, va, ra, pb, vb, rb, meff, gprm)  # (N, K, G, 3)
    live = obj.active & ~obj.removed & (obj.attached == 0)
    f = jnp.where(live[:, None, None, None], f, 0.0)
    force = f.sum(axis=(1, 2))
    arm = centers[:, :, None, :] - obj.pos[:, None, None, :]
    torque = jnp.cross(arm, f).sum(axis=(1, 2))
    per_sphere_load = jnp.linalg.norm(f, axis=-1).sum(axis=(0, 1))  # (G,)
    return force, torque, per_sphere_load


# ---------------------------------------------------------------------------
# Fused flat-SoA contact sweep (the production path)
# ---------------------------------------------------------------------------
#
# The class-by-class functions above keep the readable reference semantics
# (and the unit tests); the stepper uses this fused version: all compound
# spheres flattened to S = N*K rows, all force sources (object spheres +
# gripper spheres) as T = N*K + G columns, and every pairwise quantity kept
# as separate per-coordinate (S, T) matrices. Struct-of-arrays matters on
# TPU: the nested (N, K, N, K, 3) broadcasts put a size-3 axis in the minor
# dimension, which pads to the 128-lane register width and wastes ~40x the
# HBM bandwidth.


def fused_contact_forces(
    obj: Objects,
    grip_centers: jax.Array,  # (G, 3)
    grip_radii: jax.Array,    # (G,)
    grip_vels: jax.Array,     # (G, 3)
    prm: ContactParams = DEFAULT_PARAMS,
):
    """Total contact force/torque on each object from the table, every
    other object, and the kinematic gripper, in one sweep.

    Returns (force (N, 3), torque (N, 3)).
    """
    centers, radii, vels = obj.world_spheres()  # (N, K, ...)
    N, K = radii.shape
    S = N * K
    G = grip_centers.shape[0]

    live = obj.active & ~obj.removed
    receives = live & (obj.attached == 0)

    # Row (receiver) side: object spheres.
    cx = centers[..., 0].reshape(S)
    cy = centers[..., 1].reshape(S)
    cz = centers[..., 2].reshape(S)
    vx = vels[..., 0].reshape(S)
    vy = vels[..., 1].reshape(S)
    vz = vels[..., 2].reshape(S)
    r_row = radii.reshape(S)
    owner = jnp.repeat(jnp.arange(N), K)                  # (S,)
    m_row = jnp.repeat(obj.mass, K)
    live_row = jnp.repeat(receives, K)

    # Column (source) side: object spheres then gripper spheres.
    sx = jnp.concatenate([cx, grip_centers[:, 0]])
    sy = jnp.concatenate([cy, grip_centers[:, 1]])
    sz = jnp.concatenate([cz, grip_centers[:, 2]])
    svx = jnp.concatenate([vx, grip_vels[:, 0]])
    svy = jnp.concatenate([vy, grip_vels[:, 1]])
    svz = jnp.concatenate([vz, grip_vels[:, 2]])
    r_col = jnp.concatenate([r_row, grip_radii])
    owner_col = jnp.concatenate(
        [owner, jnp.full((G,), -1, owner.dtype)]
    )
    live_col = jnp.concatenate(
        [jnp.repeat(live, K), jnp.ones((G,), bool)]
    )
    is_grip_col = jnp.concatenate(
        [jnp.zeros((S,), bool), jnp.ones((G,), bool)]
    )
    # Effective mass per pair for damping: harmonic for obj-obj, m_row for
    # gripper (infinite source mass).
    m_col = jnp.concatenate([m_row, jnp.full((G,), jnp.inf)])
    mu_col = jnp.where(is_grip_col, prm.mu_gripper, prm.mu)

    dx = cx[:, None] - sx[None, :]
    dy = cy[:, None] - sy[None, :]
    dz = cz[:, None] - sz[None, :]
    dist2 = dx * dx + dy * dy + dz * dz
    inv_dist = jax.lax.rsqrt(dist2 + 1e-18)
    dist = dist2 * inv_dist
    pen = (r_row[:, None] + r_col[None, :]) - dist

    pair_ok = (
        (owner[:, None] != owner_col[None, :])
        & live_row[:, None]
        & live_col[None, :]
        & (pen > 0.0)
    )

    nx = dx * inv_dist
    ny = dy * inv_dist
    nz = dz * inv_dist
    rvx = vx[:, None] - svx[None, :]
    rvy = vy[:, None] - svy[None, :]
    rvz = vz[:, None] - svz[None, :]
    vn = jnp.clip(
        rvx * nx + rvy * ny + rvz * nz, -prm.max_vn, prm.max_vn
    )
    meff = (m_row[:, None] * m_col[None, :]) / (
        m_row[:, None] + m_col[None, :]
    )
    meff = jnp.where(jnp.isfinite(meff), meff, m_row[:, None])
    cn = 2.0 * prm.zeta * jnp.sqrt(prm.kn * meff / prm.contact_share)
    fn = jnp.maximum(
        0.0, prm.kn * jnp.minimum(pen, prm.max_pen) - cn * vn
    )
    fn = jnp.where(pair_ok, fn, 0.0)

    tx = rvx - vn * nx
    ty = rvy - vn * ny
    tz = rvz - vn * nz
    vt2 = tx * tx + ty * ty + tz * tz
    inv_vt = jax.lax.rsqrt(vt2 + 1e-18)
    vt = vt2 * inv_vt
    ft = mu_col[None, :] * fn * jnp.tanh(vt / prm.v_eps)

    fx = fn * nx - ft * tx * inv_vt
    fy = fn * ny - ft * ty * inv_vt
    fz = fn * nz - ft * tz * inv_vt

    # Table contact per row sphere (added before the per-object reduce).
    pen_t = r_row - (cz - prm.table_z)
    vn_t = jnp.clip(vz, -prm.max_vn, prm.max_vn)
    cn_t = 2.0 * prm.zeta * jnp.sqrt(prm.kn * m_row / prm.contact_share)
    fn_t = jnp.maximum(
        0.0, prm.kn * jnp.minimum(pen_t, prm.max_pen) - cn_t * vn_t
    )
    fn_t = jnp.where((pen_t > 0.0) & live_row, fn_t, 0.0)
    vtm = jnp.sqrt(vx * vx + vy * vy + 1e-18)
    ft_t = prm.mu * fn_t * jnp.tanh(vtm / prm.v_eps) / vtm

    fsx = fx.sum(axis=1) - ft_t * vx
    fsy = fy.sum(axis=1) - ft_t * vy
    fsz = fz.sum(axis=1) + fn_t

    # Torques about each owner's COM.
    ox = jnp.repeat(obj.pos[:, 0], K)
    oy = jnp.repeat(obj.pos[:, 1], K)
    oz = jnp.repeat(obj.pos[:, 2], K)
    ax, ay, az = cx - ox, cy - oy, cz - oz
    tqx = ay * fsz - az * fsy
    tqy = az * fsx - ax * fsz
    tqz = ax * fsy - ay * fsx

    force = jnp.stack(
        [fsx.reshape(N, K).sum(1), fsy.reshape(N, K).sum(1),
         fsz.reshape(N, K).sum(1)], axis=-1,
    )
    torque = jnp.stack(
        [tqx.reshape(N, K).sum(1), tqy.reshape(N, K).sum(1),
         tqz.reshape(N, K).sum(1)], axis=-1,
    )
    return force, torque
