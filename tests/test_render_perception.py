"""Renderer + perception tests: analytic heights, exact masks, minrect vs
cv2, NMS parity vs the reference algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.core import camera as cam
from smg_tpu.perception import minrect, nms, segment
from smg_tpu.physics import scene as sc
from smg_tpu.physics import shapes
from smg_tpu.physics.state import Gripper, Objects, Scene
from smg_tpu.render import ortho, persp


def make_objects(entries):
    """entries: list of (shape_type, half_extents, pos, yaw)."""
    obj = Objects.empty()
    from smg_tpu.core import rotation as rot

    for i, (st, he, pos, yaw) in enumerate(entries):
        he = jnp.asarray(he)
        st = jnp.asarray(st)
        m, I = shapes.mass_properties(st, he)
        off, rad = shapes.sphere_compound(st, he)
        obj = obj.replace(
            pos=obj.pos.at[i].set(jnp.asarray(pos)),
            quat=obj.quat.at[i].set(rot.quat_from_yaw(jnp.asarray(yaw))),
            shape_type=obj.shape_type.at[i].set(st),
            half_extents=obj.half_extents.at[i].set(he),
            active=obj.active.at[i].set(True),
            mass=obj.mass.at[i].set(m),
            inertia=obj.inertia.at[i].set(I),
            sph_offsets=obj.sph_offsets.at[i].set(off),
            sph_radii=obj.sph_radii.at[i].set(rad),
        )
    return obj


class TestOrtho:
    def test_box_height_and_mask(self):
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.02, 0.015), (-0.5, 0.0, 0.015), 0.0)]
        )
        depth, ids, color = ortho.render_heightmap(obj)
        assert depth.shape == (224, 224)
        # Center pixel: workspace center = box center.
        assert abs(float(depth[112, 112]) - 0.03) < 1e-4
        assert int(ids[112, 112]) == 0
        # Table pixel.
        assert float(depth[5, 5]) == 0.0
        assert int(ids[5, 5]) == -1
        # Mask footprint ~ (2*0.03 / 0.002) x (2*0.02 / 0.002) = 30 x 20 px.
        mask = np.asarray(ids == 0)
        assert abs(mask.sum() - 30 * 20) <= 60

    def test_occlusion_order(self):
        """Higher object wins the pixel."""
        obj = make_objects(
            [
                (shapes.BOX, (0.03, 0.03, 0.01), (-0.5, 0.0, 0.01), 0.0),
                (shapes.BOX, (0.01, 0.01, 0.01), (-0.5, 0.0, 0.03), 0.0),
            ]
        )
        depth, ids, _ = ortho.render_heightmap(obj)
        assert int(ids[112, 112]) == 1  # top box
        assert abs(float(depth[112, 112]) - 0.04) < 1e-4

    def test_rotated_box_footprint(self):
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.01, 0.01), (-0.5, 0.0, 0.01), np.pi / 4)]
        )
        depth, ids, _ = ortho.render_heightmap(obj)
        mask = np.asarray(ids == 0)
        # Footprint area preserved under rotation: 30 x 10 px = 300.
        assert abs(mask.sum() - 300) < 50
        ys, xs = np.nonzero(mask)
        # At 45 deg the AABB is (30 + 10) / sqrt(2) ~ 28 px on both axes.
        assert abs((xs.max() - xs.min()) - 28) <= 3
        assert abs((ys.max() - ys.min()) - 28) <= 3

    def test_sphere_and_cylinder(self):
        obj = make_objects(
            [
                (shapes.SPHERE, (0.02, 0.02, 0.02), (-0.6, -0.1, 0.02), 0.0),
                (shapes.CYLINDER, (0.015, 0.015, 0.03), (-0.4, 0.1, 0.03), 0.0),
            ]
        )
        depth, ids, _ = ortho.render_heightmap(obj)
        # Sphere apex: z = 0.04 at its center pixel.
        r = int((-0.1 - (-0.224)) / 0.002)
        c = int((-0.6 - (-0.724)) / 0.002)
        assert abs(float(depth[r, c]) - 0.04) < 2e-3
        r2 = int((0.1 - (-0.224)) / 0.002)
        c2 = int((-0.4 - (-0.724)) / 0.002)
        assert abs(float(depth[r2, c2]) - 0.06) < 1e-3
        assert int(ids[r2, c2]) == 1

    def test_batched_render(self):
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        batch = jax.vmap(lambda k: sc.reset_scene(k, settle_steps=100))(keys)
        render = jax.jit(jax.vmap(lambda o: ortho.render_heightmap(o)))
        depth, ids, color = render(batch.objects)
        assert depth.shape == (4, 224, 224)
        assert color.shape == (4, 224, 224, 3)
        assert bool(jnp.all(depth >= 0.0))


class TestPersp:
    def test_flat_table_depth(self):
        obj = Objects.empty()
        camera = cam.Camera.overhead(height=0.5)
        color, depth = persp.render_rgbd(obj, camera, height=48, width=64)
        # Straight-down camera: center pixel depth = camera height.
        assert abs(float(depth[24, 32]) - 0.5) < 1e-3

    def test_full_parity_pipeline(self):
        """persp render -> core.camera.get_heightmap reproduces the ortho
        renderer's heightmap for a simple scene."""
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.03, 0.02), (-0.5, 0.0, 0.02), 0.0)]
        )
        camera = cam.Camera.overhead(height=0.5)
        color, depth = persp.render_rgbd(obj, camera)
        chm, dhm, c448, d448, A = cam.get_heightmap(
            color, depth, camera.intrinsics, camera.pose
        )
        # The ROI homography maps the workspace into the 224 frame; at the
        # frame center the box top (z = 0.04) must be recovered.
        center_val = float(dhm[112, 112])
        assert abs(center_val - 0.04) < 5e-3, center_val

    def test_reference_camera_heightmap_alignment(self):
        """reference_overhead + fliplr'd frames + get_heightmap land an
        OFF-CENTER object on the same workspace-grid pixels as the ortho
        renderer (the centered-box test above cannot catch a flip or a
        wrong camera height — round 5 found Camera.overhead's 0.5 m
        default maps objects ~90 px away from their ortho positions)."""
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.03, 0.02), (-0.6, 0.1, 0.02), 0.0)]
        )
        camera = cam.Camera.reference_overhead()
        color, depth, _ = persp.render_reference_rgbd(obj, camera)
        chm, dhm, _, _, _ = cam.get_heightmap(
            color, depth, camera.intrinsics, camera.pose
        )
        de, _, _ = ortho.render_heightmap(obj)
        got = np.asarray(dhm > 0.01)
        ref = np.asarray(de > 0.01)
        gy, gx = np.nonzero(got)
        ry, rx = np.nonzero(ref)
        assert len(gy) > 0 and len(ry) > 0
        # Center of mass within a few pixels (perspective parallax of a
        # 0.04 m-tall object seen ~0.1 m off-axis is ~2 px — physical).
        assert abs(gy.mean() - ry.mean()) < 4.0, (gy.mean(), ry.mean())
        assert abs(gx.mean() - rx.mean()) < 4.0, (gx.mean(), rx.mean())
        inter = (got & ref).sum()
        union = (got | ref).sum()
        assert inter / max(union, 1) > 0.6


class TestMinRect:
    @pytest.mark.parametrize("yaw", [0.0, 0.3, np.pi / 4, 1.2])
    def test_matches_cv2(self, yaw):
        cv2 = pytest.importorskip("cv2")
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.012, 0.01), (-0.5, 0.0, 0.01), yaw)]
        )
        _, ids, _ = ortho.render_heightmap(obj)
        mask = np.asarray(ids == 0).astype(np.uint8)
        corners, center, size, angle = minrect.min_area_rect(jnp.asarray(mask))

        contours, _ = cv2.findContours(
            mask * 255, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
        )
        rect = cv2.minAreaRect(contours[0])
        cv2_center = rect[0]
        cv2_size = sorted(rect[1])
        our_size = sorted(np.asarray(size).tolist())
        np.testing.assert_allclose(
            np.asarray(center), cv2_center, atol=1.5
        )
        np.testing.assert_allclose(our_size, cv2_size, atol=2.5)

    def test_empty_mask(self):
        corners, center, size, angle = minrect.min_area_rect(
            jnp.zeros((224, 224), bool)
        )
        assert float(jnp.abs(corners).sum()) == 0.0

    def test_corner_adjacency(self):
        obj = make_objects(
            [(shapes.BOX, (0.03, 0.012, 0.01), (-0.5, 0.0, 0.01), 0.5)]
        )
        _, ids, _ = ortho.render_heightmap(obj)
        corners, _, size, _ = minrect.min_area_rect(ids == 0)
        c = np.asarray(corners)
        d01 = np.linalg.norm(c[0] - c[1])
        d12 = np.linalg.norm(c[1] - c[2])
        np.testing.assert_allclose(
            sorted([d01, d12]), sorted(np.asarray(size).tolist()), atol=1e-3
        )


class TestNMS:
    def test_matches_reference_algorithm(self):
        """Dense keep-mask == the reference's py_cpu_nms (NMS.py:8-59)."""

        def py_cpu_nms(boxes, co_thresh, min_area, max_area):
            x1, y1 = boxes[:, 0, 0], boxes[:, 0, 1]
            x2, y2 = boxes[:, 1, 0], boxes[:, 1, 1]
            order = []
            for i in range(len(boxes)):
                area = (x2[i] - x1[i]) * (y2[i] - y1[i])
                if min_area < area < max_area:
                    order.append(i)
            areas = (x2 - x1 + 1) * (y2 - y1 + 1)
            order = np.array(order)
            keep = []
            while order.size > 0:
                i = order[0]
                keep.append(i)
                xx1 = np.maximum(x1[i], x1[order[1:]])
                yy1 = np.maximum(y1[i], y1[order[1:]])
                xx2 = np.minimum(x2[i], x2[order[1:]])
                yy2 = np.minimum(y2[i], y2[order[1:]])
                w = np.maximum(0.0, xx2 - xx1 + 1)
                h = np.maximum(0.0, yy2 - yy1 + 1)
                inter = w * h
                ovr = inter / (areas[i] + areas[order[1:]] - inter)
                inds = np.where(ovr <= co_thresh)[0]
                order = order[inds + 1]
            return keep

        rng = np.random.RandomState(0)
        for trial in range(10):
            n = 10
            xy = rng.uniform(0, 180, size=(n, 2))
            wh = rng.uniform(5, 60, size=(n, 2))
            boxes = np.stack([xy, xy + wh], axis=1).astype(np.float32)
            area = 224 * 224
            ref_keep = py_cpu_nms(boxes, 0.40, area / 60, area / 5)
            got = nms.nms(
                jnp.asarray(boxes), jnp.ones((n,), bool), 0.40,
                area / 60, area / 5,
            )
            got_idx = sorted(np.nonzero(np.asarray(got))[0].tolist())
            assert got_idx == sorted(ref_keep), (trial, got_idx, ref_keep)


class TestSegment:
    def test_exact_segmentation(self):
        obj = make_objects(
            [
                (shapes.BOX, (0.03, 0.02, 0.015), (-0.55, -0.1, 0.015), 0.2),
                (shapes.CYLINDER, (0.02, 0.02, 0.01), (-0.42, 0.1, 0.01), 0.0),
            ]
        )
        _, ids, _ = ortho.render_heightmap(obj)
        seg = segment.segment(obj, ids)
        assert int(seg.number) == 2
        assert bool(seg.valid[0]) and bool(seg.valid[1])
        assert not bool(seg.valid[2])
        # Center of object 0 near its world position in pixels.
        cx = (-0.55 - (-0.724)) / 0.002
        cy = (-0.1 - (-0.224)) / 0.002
        np.testing.assert_allclose(
            np.asarray(seg.centers[0]), [cx, cy], atol=2.0
        )
        # Rect sizes ~ footprint in px.
        s = sorted(np.asarray(seg.rect_sizes[1]).tolist())
        assert abs(s[0] - 20) < 3 and abs(s[1] - 20) < 3

    def test_occluded_object_invalid(self):
        obj = make_objects(
            [
                (shapes.BOX, (0.012, 0.012, 0.01), (-0.5, 0.0, 0.01), 0.0),
                (shapes.BOX, (0.03, 0.03, 0.01), (-0.5, 0.0, 0.03), 0.0),
            ]
        )
        _, ids, _ = ortho.render_heightmap(obj)
        seg = segment.segment(obj, ids)
        # Slot 0 fully hidden under slot 1.
        assert not bool(seg.valid[0])
        assert int(seg.number) == 1
