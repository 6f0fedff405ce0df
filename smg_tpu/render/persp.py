"""Perspective RGB-D raycaster: emulates the CoppeliaSim vision sensor.

Parity path for the reference's camera stack: renders the 640x480 RGB-D
frame the reference's `get_camera_data` returned over RPC
(reference code/robot.py:218-241, zNear/zFar = 0.01/10), so the full
image -> pointcloud -> homography heightmap pipeline (smg_tpu.core.camera,
reference utils.py:38-68) can be exercised end-to-end on device — and so a
*learned* segmentation front-end can be trained against realistic inputs
instead of the exact id-buffer.
"""

from __future__ import annotations

import jax.numpy as jnp

from smg_tpu.core import camera as cam
from smg_tpu.core import rotation as rot
from smg_tpu.physics.state import Objects
from smg_tpu.render import raycast
from smg_tpu.render.ortho import TABLE_COLOR


def render_rgbd(
    obj: Objects,
    camera: cam.Camera,
    height: int = cam.IMAGE_H,
    width: int = cam.IMAGE_W,
):
    """Render (color (H, W, 3), depth (H, W)) through a pinhole camera.

    Depth is the camera-frame z of the nearest surface (what the reference's
    depth buffer holds after the zNear/zFar rescale); background rays return
    the table-plane depth (the tabletop fills the sim camera's view).
    """
    fx, fy = camera.intrinsics[0, 0], camera.intrinsics[1, 1]
    cx, cy = camera.intrinsics[0, 2], camera.intrinsics[1, 2]
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    # Camera-frame ray directions (not normalized; z component = 1 so that
    # t equals camera-frame depth).
    dirs_cam = jnp.stack(
        [(px - cx) / fx, (py - cy) / fy, jnp.ones_like(px)], axis=-1
    ).reshape(-1, 3)  # (P, 3)
    Rcw = camera.pose[:3, :3]
    origin_w = camera.pose[:3, 3]
    dirs_w = dirs_cam @ Rcw.T  # (P, 3)

    Rm = rot.quat2rotm(obj.quat)  # (N, 3, 3)
    o_local = (
        jnp.einsum("nji,j->ni", Rm, origin_w)
        - jnp.einsum("nji,nj->ni", Rm, obj.pos)
    )[:, None, :]  # (N, 1, 3)
    d_local = jnp.einsum("nji,pj->npi", Rm, dirs_w)  # (N, P, 3)

    t = raycast.ray_primitive(
        jnp.broadcast_to(o_local, d_local.shape),
        d_local,
        obj.shape_type[:, None],
        obj.half_extents[:, None, :],
    )  # (N, P)
    t = jnp.where(obj.on_table[:, None], t, jnp.inf)

    # Table plane z=0: origin_z + t * dz = 0.
    dz = dirs_w[:, 2]
    t_table = raycast._safe_div(-origin_w[2], dz)
    t_table = jnp.where(t_table >= 0.0, t_table, jnp.inf)

    t_obj = jnp.min(t, axis=0)
    best = jnp.argmin(t, axis=0)
    t_near = jnp.minimum(t_obj, t_table)
    obj_hit = t_obj <= t_table

    depth = jnp.where(jnp.isfinite(t_near), t_near, 10.0)
    color = jnp.where(
        obj_hit[:, None] & jnp.isfinite(t_obj)[:, None],
        obj.color[best],
        TABLE_COLOR[None, :],
    )
    return color.reshape(height, width, 3), depth.reshape(height, width)


def render_reference_rgbd(obj: Objects, camera: cam.Camera | None = None):
    """The frames the reference's `get_camera_data` returns: render
    through the ROI-consistent camera and fliplr both buffers
    (reference code/robot.py:218-241 flips the sim sensor's images;
    utils.py:49-50's ROI corners are calibrated on the flipped frames).
    Feed the result to `core.camera.get_heightmap` with the same
    camera's intrinsics/pose for exact reference heightmap geometry."""
    if camera is None:
        camera = cam.Camera.reference_overhead()
    color, depth = render_rgbd(obj, camera)
    return color[:, ::-1], depth[:, ::-1], camera
