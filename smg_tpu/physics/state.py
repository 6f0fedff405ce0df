"""Scene state pytrees: the on-device replacement for CoppeliaSim handles.

Where the reference holds simulator *handles* and queries poses over RPC
(reference code/robot.py:154-204, get_obj_positions robot.py:244-251), here
the scene IS the state: flat fixed-slot arrays in device memory, batched
over scenes by vmap and sharded over chips by pjit.

Conventions:
- Fixed N_SLOTS object slots; `active` masks real objects (variable 1-10
  objects per scene, reference robot.py:113-117, become masked dense slots).
- `attached`: 0 = free, 1 = enveloped (finger cage), 2 = sucked (pad).
  Attached objects follow the gripper kinematically via the stored relative
  transform — the constraint-switch equivalent of the scene Lua
  suctionPad*.active_true scripts (reference robot.py:395-412).
- Successful objects are teleported to the parking strip like the
  reference's (-0.5, 0.5 + 0.1 * idx, 0.1) shelf (robot.py:388).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from smg_tpu.core import rotation as rot
from smg_tpu.physics import shapes

N_SLOTS = 12

# Object kinds (mirrors the enveloping/sucking mesh directories,
# reference robot.py:36-49).
KIND_ENVELOPING = 0
KIND_SUCKING = 1

# Attachment states.
FREE = 0
ATTACHED_GRASP = 1
ATTACHED_SUCTION = 2

# Workspace (reference main.py:31) and episode thresholds.
# numpy, not jnp: module-level device arrays initialize the jax backend
# at import time (breaking the CLI's --cpu override; grabbing the TPU).
WORKSPACE = np.array([[-0.724, -0.276], [-0.224, 0.224], [-0.0001, 0.4]])
LIFT_SUCCESS_Z = 0.11  # reference robot.py:385
FALLEN_Z = 0.001  # reference robot.py:458
DROP_Z = 0.08  # reference robot.py:133
PARK_POS = np.array([-0.5, 0.5, 0.1])  # reference robot.py:388


@struct.dataclass
class Objects:
    """Fixed-slot rigid bodies. Leading dim N_SLOTS (add scene dim via vmap)."""

    pos: jax.Array          # (N, 3)
    quat: jax.Array         # (N, 4) unit, (w, x, y, z)
    vel: jax.Array          # (N, 3)
    omega: jax.Array        # (N, 3) world frame
    shape_type: jax.Array   # (N,) int32
    half_extents: jax.Array  # (N, 3)
    color: jax.Array        # (N, 3) in [0, 1]
    kind: jax.Array         # (N,) int32 KIND_*
    active: jax.Array       # (N,) bool — slot holds a live object
    removed: jax.Array      # (N,) bool — cleared from table (success shelf)
    attached: jax.Array     # (N,) int32 FREE / ATTACHED_*
    attach_pos: jax.Array   # (N, 3) position in gripper (tool) frame
    attach_quat: jax.Array  # (N, 4) orientation in gripper frame
    mass: jax.Array         # (N,)
    inertia: jax.Array      # (N, 3) body-frame diagonal
    sph_offsets: jax.Array  # (N, K, 3) compound sphere centers, body frame
    sph_radii: jax.Array    # (N, K)

    @staticmethod
    def empty(n: int = N_SLOTS) -> "Objects":
        K = shapes.SPHERES_PER_OBJECT
        return Objects(
            pos=jnp.zeros((n, 3)).at[:, 2].set(-10.0),  # inactive slots parked far below
            quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            vel=jnp.zeros((n, 3)),
            omega=jnp.zeros((n, 3)),
            shape_type=jnp.zeros((n,), jnp.int32),
            half_extents=jnp.full((n, 3), 0.01),
            color=jnp.ones((n, 3)) * 0.5,
            kind=jnp.zeros((n,), jnp.int32),
            active=jnp.zeros((n,), bool),
            removed=jnp.zeros((n,), bool),
            attached=jnp.zeros((n,), jnp.int32),
            attach_pos=jnp.zeros((n, 3)),
            attach_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            mass=jnp.ones((n,)),
            inertia=jnp.ones((n, 3)) * 1e-4,
            sph_offsets=jnp.zeros((n, K, 3)),
            sph_radii=jnp.full((n, K), 0.01),
        )

    def world_spheres(self):
        """Compound spheres in world frame.

        Returns (centers (N, K, 3), radii (N, K), velocities (N, K, 3)).
        """
        R = rot.quat2rotm(self.quat)  # (N, 3, 3)
        centers = self.pos[:, None, :] + jnp.einsum(
            "nij,nkj->nki", R, self.sph_offsets
        )
        arm = centers - self.pos[:, None, :]
        vels = self.vel[:, None, :] + jnp.cross(
            self.omega[:, None, :], arm
        )
        return centers, self.sph_radii, vels

    @property
    def on_table(self) -> jax.Array:
        """Active objects still in play (not cleared to the shelf)."""
        return self.active & ~self.removed


@struct.dataclass
class Gripper:
    """Kinematic SMG gripper state — the gs_target dummy + tendon DOF.

    `pos` is the tool point the reference servos (grasp_target / gs_target,
    reference robot.py:192,302-375): the palm center, fingers hanging below.
    `tilt` is the pad-alignment rotation applied for orientation-optimized
    suction (the relative-orientation correction loop, robot.py:671-693),
    expressed as rotations about the tool x/y axes.
    """

    pos: jax.Array   # (3,)
    yaw: jax.Array   # () tool rotation about z
    tilt: jax.Array  # (2,) about tool x, y
    curl: jax.Array  # () tendon closing angle in [0, pi/2.5]

    @staticmethod
    def home() -> "Gripper":
        # Reference parks the target at (-0.5, 0, 0.3) (robot.py:195).
        return Gripper(
            pos=jnp.array([-0.5, 0.0, 0.3]),
            yaw=jnp.asarray(0.0),
            tilt=jnp.zeros(2),
            curl=jnp.asarray(0.0),
        )

    def tool_rotm(self) -> jax.Array:
        Rz = rot.angle_axis2rotm(self.yaw, jnp.array([0.0, 0.0, 1.0]))
        Rx = rot.angle_axis2rotm(self.tilt[0], jnp.array([1.0, 0.0, 0.0]))
        Ry = rot.angle_axis2rotm(self.tilt[1], jnp.array([0.0, 1.0, 0.0]))
        return Rz @ Rx @ Ry


@struct.dataclass
class Scene:
    """One simulated tabletop scene. vmap over a leading batch axis."""

    objects: Objects
    gripper: Gripper
    t: jax.Array  # () int32 physics step counter

    @staticmethod
    def empty() -> "Scene":
        return Scene(
            objects=Objects.empty(),
            gripper=Gripper.home(),
            t=jnp.asarray(0, jnp.int32),
        )
