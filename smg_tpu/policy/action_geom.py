"""Action geometry: PE (pre-enveloping) and OO (orientation optimization).

Vectorized fixed-shape re-designs of the reference's geometric
post-processing (reference code/utils.py:316-612):

- `pe_grasp_geometry` <- get_best_grasp_angle (utils.py:316-366): min-area
  rect corners -> world frame; short side x min(1.2, aspect) = finger
  opening distance; long-side direction folded into [0, pi) = grasp yaw.
  Without PE: distance 2.0 (no pre-close) and angle 0 (utils.py:326-327).

- `oo_suction_angle` <- get_best_suction_angle (utils.py:370-612): each
  neighbor object occludes the angular interval its rect corners subtend
  around the target, weighted exp(-dh/dist); the widest fully-free window
  >= 45 deg wins, iteratively re-admitting the least-occluding neighbors
  until one exists (value/angle thresholds 0.95 / 45 deg, utils.py:462).
  The reference's Python run-length scan becomes a branchless
  fixed-shape selection with the same ordering: the 0/360-wrapping
  window is preferred when its combined width clears the threshold,
  otherwise the widest interior run (end - start >= 45) wins.

Positions are recovered on the fast path via the linear heightmap-pixel ->
world map (the ortho renderer lays pixels on the workspace grid); the
camera/homography parity path (core.camera.global_position) remains
available for perspective inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smg_tpu.core import camera as cam

VALUE_THRESHOLD = 0.95   # utils.py:462
ANGLE_THRESHOLD = 45     # degrees, utils.py:462
FREE_EPS = 1e-6


def _pixel_to_world_xy(px: jax.Array, resolution: float = cam.HEIGHTMAP_RESOLUTION):
    """(x_px, y_px) -> world (x, y). px (..., 2) in (col, row) order."""
    wl = jnp.asarray(cam.WORKSPACE_LIMITS)
    x = wl[0, 0] + (px[..., 0] + 0.5) * resolution
    y = wl[1, 0] + (px[..., 1] + 0.5) * resolution
    return jnp.stack([x, y], axis=-1)


def _sample_height(depth_hm: jax.Array, px: jax.Array) -> jax.Array:
    """Heights at pixel coords px (..., 2) = (col, row), clipped to bounds."""
    H, W = depth_hm.shape
    col = jnp.clip(px[..., 0].astype(jnp.int32), 0, W - 1)
    row = jnp.clip(px[..., 1].astype(jnp.int32), 0, H - 1)
    return depth_hm[row, col]


def surface_position(
    center_px: jax.Array, depth_hm: jax.Array,
    resolution: float = cam.HEIGHTMAP_RESOLUTION,
) -> jax.Array:
    """World (x, y, z) of a heightmap pixel's surface point.

    The on-device equivalent of utils.global_position (utils.py:70-81): xy
    from the workspace grid, z from the rendered height at that pixel.
    """
    xy = _pixel_to_world_xy(center_px, resolution)
    z = _sample_height(depth_hm, center_px)
    return jnp.concatenate([xy, z[None]], axis=-1)


def pe_grasp_geometry(
    corners_px: jax.Array,   # (4, 2) min-area-rect corners of the target
    depth_hm: jax.Array,     # (H, W) height map
    is_pe: bool = True,
    resolution: float = cam.HEIGHTMAP_RESOLUTION,
):
    """Returns (position (3,), rotation_angle (), open_distance ()).

    Parity: utils.get_best_grasp_angle (utils.py:316-366).
    """
    center_px = corners_px.mean(axis=0).astype(jnp.int32).astype(jnp.float32)
    position = surface_position(center_px, depth_hm, resolution)

    if not is_pe:
        return position, jnp.asarray(0.0), jnp.asarray(2.0)

    w = _pixel_to_world_xy(corners_px, resolution)  # (4, 2)
    d01 = jnp.linalg.norm(w[0] - w[1])
    d12 = jnp.linalg.norm(w[2] - w[1])

    def side_angle(a, b):
        # Long-side direction folded into [0, pi): equals the reference's
        # y-sign acos cascade (utils.py:340-354).
        d = a - b
        return jnp.mod(jnp.arctan2(d[1], d[0]), jnp.pi)

    long01 = d01 > d12
    open_dist = jnp.where(
        long01,
        d12 * jnp.minimum(1.2, d01 / jnp.maximum(d12, 1e-9)),
        d01 * jnp.minimum(1.2, d12 / jnp.maximum(d01, 1e-9)),
    )
    angle = jnp.where(
        long01, side_angle(w[0], w[1]), side_angle(w[2], w[1])
    )
    return position, angle, open_dist


def _bearings_deg(points_px: jax.Array, center_px: jax.Array) -> jax.Array:
    """Reference bearing convention (utils.py:405-425): 0 = -y direction,
    increasing toward -x (counterclockwise in image coords), in degrees."""
    dx = center_px[0] - points_px[..., 0]
    dy = center_px[1] - points_px[..., 1]
    ang = jnp.mod(jnp.arctan2(dx, dy), 2 * jnp.pi)
    return ang * (180.0 / jnp.pi)


def _select_free_window(free: jax.Array):
    """Reference-order free-window selection over a (360,) mask.

    Parity with utils.py:475-494: the 0/360-wrapping window is checked
    FIRST — if the mask is free on both sides of 0 and the combined width
    angle_left + angle_right >= 45, its (asymmetric) midpoint wins even if
    a wider interior run exists. Otherwise the widest linear run with
    end - start >= 45 wins, midpoint (start + end) // 2. Returns
    (found (bool), angle_deg (float)).
    """
    f = free.astype(jnp.int32)
    n = f.shape[0]

    # Leading / trailing free-bin counts.
    leading = jnp.where(jnp.all(f == 1), n, jnp.argmin(f))
    trailing = jnp.where(jnp.all(f == 1), n, jnp.argmin(f[::-1]))

    # Wrap candidate (utils.py:475-484): angle_left = end index of the
    # first run, angle_right = end - start of the last run.
    angle_left = leading - 1
    angle_right = trailing - 1
    start_last = n - trailing
    wrap_ok = (
        (f[0] == 1) & (f[n - 1] == 1)
        & ((angle_left + angle_right) >= ANGLE_THRESHOLD)
    )
    wrap_mid = jnp.where(
        angle_left > angle_right,
        angle_left - (angle_left + angle_right) // 2,
        start_last + (angle_left + angle_right) // 2,
    )

    # Linear runs (utils.py:485-494): L[i] = run length ending at i.
    def body(carry, x):
        run = (carry + 1) * x
        return run, run

    _, runs = jax.lax.scan(body, jnp.asarray(0, jnp.int32), f)
    is_end = (f == 1) & jnp.concatenate([f[1:] == 0, jnp.array([True])])
    # end - start = L - 1 must be >= threshold.
    widths = jnp.where(is_end & (runs - 1 >= ANGLE_THRESHOLD), runs, 0)
    best_end = jnp.argmax(widths)
    best_w = widths[best_end]
    lin_ok = best_w > 0
    start = best_end - best_w + 1
    lin_mid = (start + best_end) // 2

    found = wrap_ok | lin_ok
    angle = jnp.where(wrap_ok, wrap_mid, lin_mid)
    return found, jnp.mod(angle, n).astype(jnp.float32)


def oo_suction_angle(
    target: jax.Array,        # () int32 target slot
    centers_px: jax.Array,    # (N, 2) mask centers (x, y)
    corners_px: jax.Array,    # (N, 4, 2) rect corners
    valid: jax.Array,         # (N,)
    depth_hm: jax.Array,      # (H, W)
    is_oo: bool = True,
    resolution: float = cam.HEIGHTMAP_RESOLUTION,
):
    """Returns (position (3,), rotation_angle () in radians).

    Parity: utils.get_best_suction_angle (utils.py:370-612).
    """
    # The reference takes the suction point from the rect-corner mean of
    # the target (utils.py:373-377), like the grasp center.
    center_px = corners_px[target].mean(axis=0).astype(jnp.int32).astype(
        jnp.float32
    )
    position = surface_position(center_px, depth_hm, resolution)
    if not is_oo:
        return position, jnp.asarray(0.0)

    n = centers_px.shape[0]
    tc = centers_px[target]

    # Heights: max over center + corners (utils.py:391-392).
    h_center = _sample_height(depth_hm, centers_px)
    h_corners = _sample_height(depth_hm, corners_px).max(axis=1)
    heights = jnp.maximum(h_center, h_corners)

    # World-frame center distances to the target (utils.py:393-394).
    cw = _pixel_to_world_xy(centers_px, resolution)
    dist = jnp.linalg.norm(cw - cw[target], axis=-1)

    # Occlusion weights (utils.py:436-439).
    dh = jnp.maximum(0.0, heights - heights[target])
    w = jnp.exp(-dh / jnp.maximum(0.001, dist))

    # Occluded interval per neighbor: the corner pair subtending the widest
    # circular angle (utils.py:426-433).
    bear = _bearings_deg(corners_px, tc)  # (N, 4) degrees
    ai = bear[:, :, None]
    aj = bear[:, None, :]
    diff = jnp.abs(ai - aj)
    circ = jnp.minimum(diff, 360.0 - diff)
    pair_flat = jnp.argmax(circ.reshape(n, 16), axis=1)
    pk, pl = pair_flat // 4, pair_flat % 4
    rows = jnp.arange(n)
    lo = jnp.minimum(bear[rows, pk], bear[rows, pl])
    hi = jnp.maximum(bear[rows, pk], bear[rows, pl])
    lo_i = lo.astype(jnp.int32)
    hi_i = hi.astype(jnp.int32)

    bins = jnp.arange(360)
    narrow = (hi - lo) <= 180.0
    cover = jnp.where(
        narrow[:, None],
        (bins[None, :] >= lo_i[:, None]) & (bins[None, :] < hi_i[:, None]),
        (bins[None, :] < lo_i[:, None]) | (bins[None, :] >= hi_i[:, None]),
    )  # (N, 360) — matches the reference's range() fills (utils.py:441-451)

    occluder = valid & (jnp.arange(n) != target) & (w < 1.0 - FREE_EPS)

    def angle_val_for(admitted):
        act = occluder & ~admitted
        contrib = jnp.where(act[:, None] & cover, w[:, None], 1.0)
        return jnp.prod(contrib, axis=0)

    def round_fn(carry, _):
        admitted, done, result = carry
        av = angle_val_for(admitted)
        # Rule 1: everything already tolerable -> angle 0 (utils.py:471-472).
        all_ok = av.min() >= VALUE_THRESHOLD
        # Rule 2: free window selection, wrap-first (utils.py:475-494).
        free = av >= 1.0 - FREE_EPS
        found, mid = _select_free_window(free)
        new_result = jnp.where(
            done, result,
            jnp.where(all_ok, 0.0, jnp.where(found, mid, result)),
        )
        new_done = done | all_ok | found
        # Relax: re-admit the least-occluding remaining neighbors
        # (utils.py:514-517).
        rem = occluder & ~admitted
        wmax = jnp.where(rem, w, -jnp.inf).max()
        admit_now = rem & (jnp.abs(w - wmax) < 0.001)
        new_admitted = jnp.where(new_done, admitted, admitted | admit_now)
        return (new_admitted, new_done, new_result), None

    init = (jnp.zeros((n,), bool), jnp.asarray(False), jnp.asarray(0.0))
    (_, _, result), _ = jax.lax.scan(round_fn, init, None, length=n + 1)
    return position, jnp.deg2rad(result)
