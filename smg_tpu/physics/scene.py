"""Scene lifecycle: spawn, drop grid, reset — the add_objects/restart_sim
equivalents, as pure functions of a PRNG key.

Parity notes (reference code/robot.py):
- object counts: 0-5 enveloping + 1-5 sucking (robot.py:113-117);
- the 3 x 4 drop grid with lightly/highly-cluttered spacing
  (robot.py:51-61) and sampling of drop cells from the first 10 cells
  without replacement (robot.py:125);
- drop height z = 0.08 with a random orientation (robot.py:133-136);
- restart = re-spawn + settle (robot.py:154-204's stop/start dance is a
  CoppeliaSim workaround with no analog here — reset is just a function
  call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.core import rotation as rot
from smg_tpu.physics import shapes, stepper
from smg_tpu.physics.state import (
    DROP_Z,
    KIND_ENVELOPING,
    KIND_SUCKING,
    N_SLOTS,
    Gripper,
    Objects,
    Scene,
    WORKSPACE,
)

_COLORS = np.array(  # numpy: no backend init at import time
    [
        [0.89, 0.28, 0.22], [0.25, 0.55, 0.88], [0.32, 0.73, 0.35],
        [0.95, 0.71, 0.19], [0.67, 0.38, 0.84], [0.25, 0.78, 0.78],
        [0.91, 0.45, 0.63], [0.55, 0.48, 0.30], [0.45, 0.85, 0.35],
        [0.35, 0.40, 0.85], [0.85, 0.55, 0.25], [0.60, 0.60, 0.60],
    ]
)


def drop_grid(is_cluttered: bool) -> jax.Array:
    """The 12-cell (x, y) drop grid. Parity: reference robot.py:51-61."""
    wl = WORKSPACE
    xx, yy = jnp.meshgrid(jnp.arange(3.0), jnp.arange(4.0), indexing="xy")
    xx = xx.reshape(-1)
    yy = yy.reshape(-1)
    if is_cluttered:
        gx = wl[0, 0] + (wl[0, 1] - wl[0, 0] - 0.28) / 2 + 0.1 * xx + 0.09
        gy = wl[1, 0] + (wl[1, 1] - wl[1, 0] - 0.3) / 2 + 0.1 * yy
    else:
        gx = wl[0, 0] + (wl[0, 1] - wl[0, 0] - 0.28) / 2 + 0.14 * xx - 0.03
        gy = wl[1, 0] + (wl[1, 1] - wl[1, 0] - 0.3) / 2 + 0.1 * yy
    return jnp.stack([gx, gy], axis=-1)  # (12, 2)


def default_catalogs(is_testing: bool = False):
    """((g_types, g_he), (s_types, s_he)): the procedural analog of the
    reference's datasets/{training,testing} mesh sets (robot.py:36-49)."""
    if is_testing:
        return (shapes.TESTING_ENVELOPING_CATALOG,
                shapes.TESTING_SUCKING_CATALOG)
    return shapes.ENVELOPING_CATALOG, shapes.SUCKING_CATALOG


def spawn_objects(key: jax.Array, is_cluttered: bool = False,
                  is_testing: bool = False, catalogs=None) -> Objects:
    """Sample a fresh object set into the fixed slots (no settling yet).

    `catalogs` = ((g_types, g_he), (s_types, s_he)) — from
    utils.meshes.load_object_sets (an --obj_mesh_dir ingest) or
    default_catalogs; None picks the procedural set by `is_testing`.
    """
    if catalogs is None:
        catalogs = default_catalogs(is_testing)
    k_ng, k_ns, k_catg, k_cats, k_cells, k_yaw, k_tax, k_tang = (
        jax.random.split(key, 8)
    )

    # Counts: 0-5 enveloping; 1-5 sucking when no enveloping objects.
    n_g = jax.random.randint(k_ng, (), 0, 6)
    n_s_raw = jax.random.randint(k_ns, (), 0, 6)
    n_s = jnp.where(n_g > 0, n_s_raw, jnp.maximum(n_s_raw, 1))
    n_total = n_g + n_s

    slot = jnp.arange(N_SLOTS)
    active = slot < n_total
    kind = jnp.where(slot < n_g, KIND_ENVELOPING, KIND_SUCKING).astype(jnp.int32)

    # Catalog picks (independent index streams: the two catalogs may have
    # different lengths, reference robot.py:119-120).
    (g_types, g_he), (s_types, s_he) = (
        (jnp.asarray(t), jnp.asarray(h)) for t, h in catalogs
    )
    gi = jax.random.randint(k_catg, (N_SLOTS,), 0, g_types.shape[0])
    si = jax.random.randint(k_cats, (N_SLOTS,), 0, s_types.shape[0])
    shape_type = jnp.where(kind == KIND_ENVELOPING, g_types[gi], s_types[si])
    half_extents = jnp.where(
        (kind == KIND_ENVELOPING)[:, None], g_he[gi], s_he[si]
    )

    # Drop cells: permutation of the first 10 grid cells (robot.py:125).
    cells = drop_grid(is_cluttered)
    perm = jax.random.permutation(k_cells, 10)
    cell_idx = jnp.where(slot < 10, perm[jnp.minimum(slot, 9)], 0)
    xy = cells[cell_idx]

    # Pose: drop height + random yaw, with a random slight tip so objects
    # settle into varied orientations (reference used random Euler spins).
    yaw = jax.random.uniform(k_yaw, (N_SLOTS,), minval=0.0, maxval=2 * jnp.pi)
    tip_ax = jax.random.normal(k_tax, (N_SLOTS, 3))
    tip_ang = jax.random.uniform(k_tang, (N_SLOTS,), minval=0.0, maxval=0.4)
    quat = rot.quat_mul(
        rot.quat_from_yaw(yaw), rot.quat_from_axis_angle(tip_ax, tip_ang)
    )

    # Stagger drop heights a touch so coincident settling stays clean.
    z = DROP_Z + 0.01 * (slot % 3).astype(jnp.float32)
    pos = jnp.concatenate([xy, z[:, None]], axis=-1)
    # Park inactive slots far away.
    pos = jnp.where(active[:, None], pos, jnp.array([0.0, 2.0, -5.0]))

    mass, inertia = jax.vmap(shapes.mass_properties)(shape_type, half_extents)
    sph_off, sph_r = jax.vmap(shapes.sphere_compound)(shape_type, half_extents)

    # Stable slot -> color mapping: slot identity must be inferable from
    # appearance for the learned fixed-slot segmenter to be well-posed.
    # (jnp conversion here: numpy constants indexed by traced ids inside
    # vmap raise TracerArrayConversionError, e.g. ortho.render_heightmap.)
    color = jnp.asarray(_COLORS)

    base = Objects.empty(N_SLOTS)
    return base.replace(
        pos=pos,
        quat=quat,
        shape_type=shape_type,
        half_extents=half_extents,
        color=color,
        kind=kind,
        active=active,
        mass=mass,
        inertia=inertia,
        sph_offsets=sph_off,
        sph_radii=sph_r,
    )


def reset_scene(
    key: jax.Array,
    is_cluttered: bool = False,
    is_testing: bool = False,
    settle_steps: int = 250,
    params: stepper.StepperParams = stepper.DEFAULT,
    catalogs=None,
) -> Scene:
    """Fresh episode scene: spawn objects, settle, home the gripper.

    The restart_sim + add_objects pair (reference main.py:97-100) as one
    pure function — jit/vmap over keys for a batch of scenes.
    """
    sc = Scene(
        objects=spawn_objects(key, is_cluttered, is_testing, catalogs),
        gripper=Gripper.home(), t=jnp.asarray(0, jnp.int32),
    )
    return stepper.settle(sc, settle_steps, params)
