"""Orthographic heightmap + instance rasterizer — the on-device camera.

The reference's perception front-end is: render a 640x480 perspective RGB-D
frame in CoppeliaSim (robot.py:218-241), warp it into a 224x224 heightmap
(utils.py:38-68), then run a COCO Mask-R-CNN + NMS + minAreaRect to recover
per-object masks (masks.py:97-174). Because our scene is analytic, the
TPU-native camera rasterizes the heightmap *directly* on the workspace grid
— one vertical ray per pixel against every object primitive — and the same
pass yields the exact instance-id buffer, so segmentation is exact and free.
(The perspective + homography + learned-segmentation parity path lives in
smg_tpu.render.persp and smg_tpu.perception.learned.)

Outputs per scene:
  depth_hm  (H, W)    world-z height above the table (valid_depth_heightmap)
  id_hm     (H, W)    int32 object slot of the top surface, -1 for table
  color_hm  (H, W, 3) object colors over a table-gray background
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.core import rotation as rot
from smg_tpu.physics.state import Objects, WORKSPACE
from smg_tpu.render import raycast

TABLE_COLOR = np.array([0.35, 0.35, 0.38])  # numpy: no backend init at import
RAY_TOP = 0.5  # rays start above the tallest reachable configuration


def pixel_grid(resolution: int = 224, workspace=None):
    """Pixel-center world (x, y) for an HxW heightmap over the workspace.

    Row indexes y, col indexes x (see core.camera.heightmap_pixel_to_world).
    """
    wl = WORKSPACE if workspace is None else workspace
    res_x = (wl[0, 1] - wl[0, 0]) / resolution
    res_y = (wl[1, 1] - wl[1, 0]) / resolution
    xs = wl[0, 0] + (jnp.arange(resolution) + 0.5) * res_x
    ys = wl[1, 0] + (jnp.arange(resolution) + 0.5) * res_y
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    return xx, yy


def render_heightmap(obj: Objects, resolution: int = 224):
    """Render one scene's heightmap, instance ids and colors.

    vmap over a leading scene axis for batched rendering.
    """
    xx, yy = pixel_grid(resolution)
    H = W = resolution
    origins = jnp.stack(
        [xx, yy, jnp.full_like(xx, RAY_TOP)], axis=-1
    ).reshape(-1, 3)  # (P, 3)
    d_world = jnp.array([0.0, 0.0, -1.0])

    Rm = rot.quat2rotm(obj.quat)  # (N, 3, 3)
    visible = obj.on_table
    n = obj.pos.shape[0]
    P = origins.shape[0]

    # Scan over object slots carrying the per-pixel z-buffer: peak memory
    # is O(P), not O(N * P) — at large scene batches the dense (N, P, 3)
    # ray intermediates otherwise dominate HBM.
    def body(i, carry):
        best_h, best_id = carry
        o_local = (origins - obj.pos[i]) @ Rm[i]  # row-vector R^T transform
        d_local = Rm[i].T @ d_world
        t = raycast.ray_primitive(
            o_local,
            jnp.broadcast_to(d_local, o_local.shape),
            obj.shape_type[i],
            obj.half_extents[i],
        )  # (P,)
        height = RAY_TOP - t
        height = jnp.where(
            visible[i] & jnp.isfinite(t), height, -jnp.inf
        )
        take = height > best_h
        return (
            jnp.where(take, height, best_h),
            jnp.where(take, i, best_id),
        )

    best_h, best = jax.lax.fori_loop(
        0, n,
        body,
        (jnp.full((P,), -jnp.inf), jnp.zeros((P,), jnp.int32)),
    )
    hit = best_h > 0.0
    depth = jnp.where(hit, best_h, 0.0).reshape(H, W)
    ids = jnp.where(hit, best, -1).reshape(H, W).astype(jnp.int32)
    color = jnp.where(
        hit[:, None], jnp.asarray(obj.color)[best], TABLE_COLOR[None, :]
    ).reshape(H, W, 3)
    return depth, ids, color


def instance_masks(ids: jax.Array, n_slots: int) -> jax.Array:
    """Per-slot boolean masks (N, H, W) from the id buffer."""
    return ids[None, :, :] == jnp.arange(n_slots)[:, None, None]


def upsample2x(img: jax.Array) -> jax.Array:
    """Nearest 2x upsample: the 224 -> 448 mask-frame path
    (reference utils.py:41 colormask_size; trainer.py:165 zoom order=0)."""
    img2 = jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)
    return img2
