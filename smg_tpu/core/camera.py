"""Pinhole camera model + heightmap projection, as pure JAX.

TPU-native equivalents of the reference's CPU/OpenCV perception front-end:

- `get_pointcloud`       <- reference code/utils.py:12-35
- `get_heightmap`        <- reference code/utils.py:38-68
- `global_position`      <- reference code/utils.py:70-81
- camera constants       <- reference code/robot.py:86-103 (pose from sim,
                            hardcoded intrinsics fx=fy=618.62, c=(320,240),
                            depth buffer scaled to [0.01, 10] m at 640x480)

On-device the orthographic rasterizer (smg_tpu.render.ortho) produces
heightmaps directly, so this module is the *parity path*: it reproduces the
reference's perspective-image pipeline in XLA (same homographies, same
INTER_LINEAR warps) so a user can feed real RGB-D frames (or our
perspective renderer's output) through the same projection the reference
used.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.core import homography as hg
from smg_tpu.core import rotation as rot

# --- Reference constants ---------------------------------------------------

# Hardcoded intrinsics, reference code/robot.py:99.
DEFAULT_INTRINSICS = np.array(
    [[618.62, 0.0, 320.0], [0.0, 618.62, 240.0], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
# Vision-sensor depth range, reference code/robot.py:237-239.
Z_NEAR, Z_FAR = 0.01, 10.0
IMAGE_H, IMAGE_W = 480, 640

# Heightmap geometry, reference code/utils.py:41-57.
HEIGHTMAP_SIZE = 224
COLORMASK_SIZE = 448
# The four source-image corners of the workspace ROI (sim values).
ROI_SRC = np.array(
    [[110.0, 0.0], [110.0, 400.0], [510.0, 400.0], [510.0, 0.0]],
    dtype=np.float32,
)

# Workspace limits, reference code/main.py:31.
WORKSPACE_LIMITS = np.array(
    [[-0.724, -0.276], [-0.224, 0.224], [-0.0001, 0.4]], dtype=np.float32
)
HEIGHTMAP_RESOLUTION = 0.002  # m / px, reference main.py:433


@dataclass(frozen=True)
class Camera:
    """A posed pinhole camera. `pose` maps camera frame -> robot frame."""

    intrinsics: jax.Array  # (3, 3)
    pose: jax.Array  # (4, 4)
    depth_scale: float = 1.0  # reference robot.py:100

    @staticmethod
    def overhead(
        height: float = 0.5,
        center_xy: tuple[float, float] = (-0.5, 0.0),
    ) -> "Camera":
        """A straight-down camera over the workspace center.

        Stand-in for the scene's `Vision_sensor_persp` (reference
        code/robot.py:89-98): position above the table, optical +z pointing
        down at the workspace.
        """
        # Camera x -> robot -x, camera y -> robot +y, camera z -> robot -z:
        # a 180 deg rotation about the robot y axis.
        R = rot.angle_axis2rotm(jnp.pi, jnp.array([0.0, 1.0, 0.0]))
        pose = jnp.eye(4)
        pose = pose.at[:3, :3].set(R)
        pose = pose.at[:3, 3].set(
            jnp.array([center_xy[0], center_xy[1], height])
        )
        return Camera(
            intrinsics=jnp.asarray(DEFAULT_INTRINSICS), pose=pose
        )

    @staticmethod
    def reference_overhead() -> "Camera":
        """The overhead camera whose fliplr'd image maps the workspace
        exactly onto ROI_SRC.

        The reference reads the camera pose from its sim scene
        (robot.py:86-103, scene binary not in the repo) and flips the
        raw frames (robot.py:226,234); its hardcoded ROI corners
        (utils.py:49-50) therefore pin the pose: the workspace x-span
        [-0.724, -0.276] must land at post-flip columns [110, 510] and
        the y-span at rows [0, 400]. Solving the pinhole model for the
        `overhead` rotation gives height fx * 0.448 / 400 = 0.6929 m and
        a center offset of (+0.0101, +0.0448) from the workspace center.
        Use with `persp.render_reference_rgbd` (which applies the flip)
        to drive `get_heightmap` in exact reference geometry —
        Camera.overhead's 0.5 m default does NOT reproduce ROI_SRC.
        """
        fx = float(DEFAULT_INTRINSICS[0, 0])
        cx = float(DEFAULT_INTRINSICS[0, 2])
        cy = float(DEFAULT_INTRINSICS[1, 2])
        x_min, x_max = float(WORKSPACE_LIMITS[0, 0]), float(
            WORKSPACE_LIMITS[0, 1]
        )
        y_min = float(WORKSPACE_LIMITS[1, 0])
        # Post-flip columns u = (W - 1) - px; ROI_SRC x corners 110/510.
        u0, u1 = float(ROI_SRC[0, 0]), float(ROI_SRC[2, 0])
        v0 = float(ROI_SRC[0, 1])
        px0 = (IMAGE_W - 1) - u0          # pre-flip column of x_min
        px1 = (IMAGE_W - 1) - u1          # pre-flip column of x_max
        height = fx * (x_max - x_min) / (px0 - px1)
        x0 = x_min + (px0 - cx) * height / fx
        y0 = y_min + (cy - v0) * height / fx
        R = rot.angle_axis2rotm(jnp.pi, jnp.array([0.0, 1.0, 0.0]))
        pose = jnp.eye(4)
        pose = pose.at[:3, :3].set(R)
        pose = pose.at[:3, 3].set(jnp.array([x0, y0, height]))
        return Camera(intrinsics=jnp.asarray(DEFAULT_INTRINSICS), pose=pose)


def get_pointcloud(
    depth_img: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Back-project a depth image (H, W) into camera-frame points (H*W, 3).

    Parity: reference code/utils.py:12-35 (color replication omitted — colors
    stay aligned by construction since the cloud is kept in image order).
    """
    im_h, im_w = depth_img.shape
    pix_y, pix_x = jnp.meshgrid(
        jnp.arange(im_h, dtype=depth_img.dtype),
        jnp.arange(im_w, dtype=depth_img.dtype),
        indexing="ij",
    )
    x = (pix_x - intrinsics[0, 2]) * depth_img / intrinsics[0, 0]
    y = (pix_y - intrinsics[1, 2]) * depth_img / intrinsics[1, 1]
    return jnp.stack([x.ravel(), y.ravel(), depth_img.ravel()], axis=1)


def transform_points(pose: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a rigid transform (4, 4) to points (..., 3)."""
    return pts @ pose[:3, :3].T + pose[:3, 3]


def get_heightmap(
    color_img: jax.Array,
    depth_img: jax.Array,
    cam_intrinsics: jax.Array,
    cam_pose: jax.Array,
):
    """RGB-D image -> (color_hm 224, depth_hm 224, color_448, depth_448, A_htor).

    Parity: reference code/utils.py:38-68. The depth heightmap holds
    *world-frame z* (height above the table), warped by the fixed workspace
    homography; `A_htor` maps heightmap pixels back to source-image pixels
    for `global_position`.
    """
    surface_pts = get_pointcloud(depth_img, cam_intrinsics)
    surface_pts = transform_points(cam_pose, surface_pts)
    world_z = surface_pts[:, 2].reshape(depth_img.shape)

    src = jnp.asarray(ROI_SRC)
    dst_hm = jnp.array(
        [
            [0.0, 0.0],
            [0.0, HEIGHTMAP_SIZE],
            [HEIGHTMAP_SIZE, HEIGHTMAP_SIZE],
            [HEIGHTMAP_SIZE, 0.0],
        ]
    )
    dst_mask = dst_hm * (COLORMASK_SIZE / HEIGHTMAP_SIZE)

    A_hm = hg.fit_homography(src, dst_hm)
    A_mask = hg.fit_homography(src, dst_mask)
    A_htor = hg.fit_homography(dst_hm, src)

    # cv2.warpPerspective defaults to INTER_LINEAR (reference utils.py:62-65).
    color_hm = hg.warp_perspective(
        color_img, A_hm, (HEIGHTMAP_SIZE, HEIGHTMAP_SIZE), mode="bilinear"
    )
    depth_hm = hg.warp_perspective(
        world_z, A_hm, (HEIGHTMAP_SIZE, HEIGHTMAP_SIZE), mode="bilinear"
    )
    color_448 = hg.warp_perspective(
        color_img, A_mask, (COLORMASK_SIZE, COLORMASK_SIZE), mode="bilinear"
    )
    depth_448 = hg.warp_perspective(
        world_z, A_mask, (COLORMASK_SIZE, COLORMASK_SIZE), mode="bilinear"
    )
    return color_hm, depth_hm, color_448, depth_448, A_htor


def global_position(
    pix_mask_position: jax.Array,
    A_htor: jax.Array,
    cam_intrinsics: jax.Array,
    cam_pose: jax.Array,
    depth_img: jax.Array,
) -> jax.Array:
    """Heightmap pixel (rot, row, col) -> robot-frame 3D position (3,).

    Parity: reference code/utils.py:70-81 — maps the 224-frame pixel back to
    the source image via A_htor, reads depth there, and back-projects through
    the camera pose. Index layout matches the reference exactly:
    pix[1] = row (y), pix[2] = col (x).
    """
    col = pix_mask_position[2].astype(A_htor.dtype)
    row = pix_mask_position[1].astype(A_htor.dtype)
    denom = col * A_htor[2, 0] + row * A_htor[2, 1] + A_htor[2, 2]
    px = ((col * A_htor[0, 0] + row * A_htor[0, 1] + A_htor[0, 2]) / denom)
    py = ((col * A_htor[1, 0] + row * A_htor[1, 1] + A_htor[1, 2]) / denom)
    # Reference truncates to int (utils.py:72-73).
    pxi = px.astype(jnp.int32)
    pyi = py.astype(jnp.int32)
    z = depth_img[pyi, pxi]
    x = (pxi - cam_intrinsics[0, 2]) * z / cam_intrinsics[0, 0]
    y = (pyi - cam_intrinsics[1, 2]) * z / cam_intrinsics[1, 1]
    cam_pt = jnp.stack([x, y, z])
    return cam_pose[:3, :3] @ cam_pt + cam_pose[:3, 3]


def heightmap_pixel_to_world(
    row: jax.Array, col: jax.Array, workspace_limits=None, resolution: float = HEIGHTMAP_RESOLUTION
):
    """Direct heightmap-pixel -> world (x, y) using the workspace grid.

    The on-device fast path (no perspective round-trip): the orthographic
    rasterizer lays pixels out on the workspace grid, so position recovery is
    a linear map. Row indexes y, col indexes x (matching the reference's
    heightmap orientation where A_htor maps (col, row) -> image (x, y)).
    """
    wl = WORKSPACE_LIMITS if workspace_limits is None else workspace_limits
    x = wl[0][0] + (jnp.asarray(col, jnp.float32) + 0.5) * resolution
    y = wl[1][0] + (jnp.asarray(row, jnp.float32) + 0.5) * resolution
    return x, y
