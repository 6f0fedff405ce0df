"""Collision/visual primitives and their sphere-compound proxies.

The reference spawns arbitrary .obj meshes into CoppeliaSim and lets Vortex
resolve mesh-mesh contacts (reference code/robot.py:106-143 via the scene's
Lua `importShape`). A TPU-native stepper wants *static shapes and dense
branchless math* instead: every object is one of three analytic primitives
(box / cylinder / sphere) — the same families the reference's enveloping /
sucking object sets decompose into — and contacts are generated between
fixed-size *sphere compounds* (K spheres per object), which turns
narrow-phase collision into a single batched distance computation that the
VPU eats. Analytic primitives also give the renderer exact ray heights and
exact instance masks (replacing the Mask-R-CNN stage).

Mesh import parity: the native host library (native/smg_host) parses .obj
meshes and fits primitive + sphere-compound approximations offline; see
smg_tpu.utils.meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Shape type codes.
BOX = 0
CYLINDER = 1
SPHERE = 2

# Spheres per object in the collision compound: 8 support spheres (corners
# / ring) + 1 inscribed center sphere. The center sphere fills the middle
# of the compound so two objects' corner spheres cannot interlock
# lattice-style under deep overlap.
SPHERES_PER_OBJECT = 9

DEFAULT_DENSITY = 300.0  # kg/m^3 — light foam/plastic objects

# Simulation mass floor: very thin objects (flat sucking plates) otherwise
# make the explicit penalty contacts stiff relative to dt. Grasp semantics
# only depend on geometry, so flooring the dynamic mass is benign.
MIN_MASS = 0.02  # kg


def sphere_compound(shape_type: jax.Array, half_extents: jax.Array):
    """Sphere-compound proxy for one object.

    Args:
      shape_type: scalar int (BOX / CYLINDER / SPHERE).
      half_extents: (3,) — box: half sizes; cylinder: (R, R, half_h);
        sphere: (R, R, R).

    Returns:
      offsets: (K, 3) sphere centers in the body frame.
      radii: (K,) sphere radii.

    Construction guarantees the compound's support matches the primitive on
    the principal axes (a box rests on the plane at exactly z = hz, etc.).
    """
    he = half_extents

    def box_compound():
        r = 0.5 * jnp.min(he)
        inset = he - r
        signs = jnp.array(
            [
                [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
            ],
            dtype=he.dtype,
        )
        offs = jnp.concatenate([signs * inset, jnp.zeros((1, 3), he.dtype)])
        radii = jnp.concatenate([jnp.full((8,), r), jnp.min(he)[None]])
        return offs, radii

    def cyl_compound():
        R, hh = he[0], he[2]
        r = 0.5 * jnp.minimum(R, hh)
        ring_r = R - r
        zoff = hh - r
        ang = jnp.arange(8, dtype=he.dtype) * (2 * jnp.pi / 8)
        z = jnp.where(jnp.arange(8) % 2 == 0, -zoff, zoff)
        offs = jnp.stack(
            [ring_r * jnp.cos(ang), ring_r * jnp.sin(ang), z], axis=1
        )
        offs = jnp.concatenate([offs, jnp.zeros((1, 3), he.dtype)])
        radii = jnp.concatenate(
            [jnp.full((8,), r), jnp.minimum(R, hh)[None]]
        )
        return offs, radii

    def sph_compound():
        return jnp.zeros((9, 3), he.dtype), jnp.full((9,), he[0])

    return jax.lax.switch(
        shape_type, [box_compound, cyl_compound, sph_compound]
    )


def mass_properties(shape_type: jax.Array, half_extents: jax.Array,
                    density: float = DEFAULT_DENSITY):
    """(mass, body-frame diagonal inertia (3,)) for one object."""
    he = half_extents

    def box_mp():
        vol = 8.0 * he[0] * he[1] * he[2]
        m = density * vol
        I = (m / 3.0) * jnp.array(
            [he[1] ** 2 + he[2] ** 2,
             he[0] ** 2 + he[2] ** 2,
             he[0] ** 2 + he[1] ** 2]
        )
        return m, I

    def cyl_mp():
        R, hh = he[0], he[2]
        vol = jnp.pi * R * R * 2 * hh
        m = density * vol
        Ixy = m * (3 * R * R + 4 * hh * hh) / 12.0
        Iz = 0.5 * m * R * R
        return m, jnp.array([Ixy, Ixy, Iz])

    def sph_mp():
        R = he[0]
        vol = 4.0 / 3.0 * jnp.pi * R ** 3
        m = density * vol
        I = 0.4 * m * R * R
        return m, jnp.array([I, I, I])

    m, I = jax.lax.switch(shape_type, [box_mp, cyl_mp, sph_mp])
    scale = jnp.maximum(1.0, MIN_MASS / m)
    return m * scale, I * scale


def bounding_radius(shape_type: jax.Array, half_extents: jax.Array) -> jax.Array:
    """Conservative bounding-sphere radius (broadphase)."""
    he = half_extents
    box_r = jnp.linalg.norm(he)
    cyl_r = jnp.sqrt(he[0] ** 2 + he[2] ** 2)
    sph_r = he[0]
    return jnp.select(
        [shape_type == BOX, shape_type == CYLINDER], [box_r, cyl_r], sph_r
    )


# ---------------------------------------------------------------------------
# Procedural object catalogs
# ---------------------------------------------------------------------------
# Stand-ins for datasets/{training,testing}/{enveloping,sucking} (the .obj
# meshes referenced at robot.py:36-49 live behind a missing git-LFS blob in
# the reference). "Enveloping" objects are elongated / tall shapes a finger
# cage can wrap; "sucking" objects present a flat-ish top face for a pad.


def _catalog(entries):
    types = np.array([e[0] for e in entries], np.int32)
    hexts = np.array([e[1] for e in entries], np.float32)
    return types, hexts


# (type, (hx, hy, hz)) in meters.
ENVELOPING_CATALOG = _catalog(
    [
        (BOX, (0.030, 0.015, 0.015)),   # bar
        (BOX, (0.035, 0.012, 0.012)),   # long thin bar
        (BOX, (0.025, 0.025, 0.020)),   # chunky block
        (CYLINDER, (0.016, 0.016, 0.035)),  # tall cylinder (bottle-ish)
        (CYLINDER, (0.014, 0.014, 0.028)),  # can
        (BOX, (0.028, 0.018, 0.014)),   # brick
        (CYLINDER, (0.020, 0.020, 0.024)),  # fat can
        (SPHERE, (0.020, 0.020, 0.020)),    # ball
    ]
)

SUCKING_CATALOG = _catalog(
    [
        (BOX, (0.025, 0.025, 0.008)),   # flat plate
        (BOX, (0.030, 0.020, 0.010)),   # flat box
        (BOX, (0.020, 0.020, 0.012)),   # squat box
        (CYLINDER, (0.022, 0.022, 0.008)),  # puck
        (CYLINDER, (0.018, 0.018, 0.012)),  # thick puck
        (BOX, (0.035, 0.025, 0.009)),   # card box
        (BOX, (0.022, 0.016, 0.010)),   # small flat box
        (CYLINDER, (0.026, 0.026, 0.010)),  # wide puck
    ]
)

# Held-out evaluation catalogs: the datasets/testing analog (reference
# robot.py:36-49 scans a separate mesh directory for testing;
# README.md:76-113 passes --obj_mesh_dir datasets/testing). Every entry
# differs from the training catalogs in size and/or type mix, so testing
# success cannot come from memorizing training geometry.
TESTING_ENVELOPING_CATALOG = _catalog(
    [
        (BOX, (0.033, 0.013, 0.018)),   # long flat bar
        (BOX, (0.022, 0.022, 0.026)),   # tall block
        (CYLINDER, (0.018, 0.018, 0.032)),  # bottle, wider
        (CYLINDER, (0.012, 0.012, 0.034)),  # slim tube
        (BOX, (0.031, 0.016, 0.011)),   # thin brick
        (SPHERE, (0.017, 0.017, 0.017)),    # small ball
        (CYLINDER, (0.022, 0.022, 0.021)),  # stout can
    ]
)

TESTING_SUCKING_CATALOG = _catalog(
    [
        (BOX, (0.027, 0.022, 0.009)),   # flat box, new aspect
        (BOX, (0.018, 0.018, 0.013)),   # small squat box
        (CYLINDER, (0.024, 0.024, 0.009)),  # puck, new radius
        (CYLINDER, (0.016, 0.016, 0.013)),  # small thick puck
        (BOX, (0.032, 0.028, 0.008)),   # wide plate
        (BOX, (0.024, 0.014, 0.011)),   # narrow flat box
        (CYLINDER, (0.028, 0.028, 0.011)),  # extra-wide puck
    ]
)
