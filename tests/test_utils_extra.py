"""Tests for learned segmentation, vis/export utilities, profiling."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smg_tpu.perception import learned
from smg_tpu.physics import scene as sc
from smg_tpu.render import ortho
from smg_tpu.utils import profiling, vis


class TestLearnedSegmentation:
    def test_init_and_predict_shapes(self):
        cfg = learned.SegmenterConfig(width=8, depth=2)
        model, params = learned.init_segmenter(jax.random.PRNGKey(0), cfg)
        color = jnp.zeros((224, 224, 3))
        depth = jnp.zeros((224, 224))
        seg = learned.predict_segmentation(model, params, color, depth)
        assert seg.masks.shape == (12, 224, 224)
        assert int(seg.number) >= 0

    def test_learns_on_rendered_scene(self):
        """A few supervised steps against the exact id-buffer reduce loss."""
        cfg = learned.SegmenterConfig(width=8, depth=2)
        model, params = learned.init_segmenter(jax.random.PRNGKey(0), cfg)
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        scene = sc.reset_scene(jax.random.PRNGKey(1), settle_steps=60)
        depth, ids, color = ortho.render_heightmap(scene.objects)
        inputs = learned.segmenter_inputs(color, depth)[None]
        ids_b = ids[None]

        step = jax.jit(
            lambda p, o: learned.train_step_segmenter(
                model, p, o, tx, inputs, ids_b
            )
        )
        losses = []
        for _ in range(20):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


class TestVis:
    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        xyz = rng.randn(50, 3).astype(np.float32)
        rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "cloud.ply")
        vis.pcwrite(xyz, p, rgb)
        xyz2, rgb2 = vis.read_ply(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_affordance_grid(self):
        aff = np.random.RandomState(0).rand(4, 32, 32)
        imgs = np.random.RandomState(1).rand(4, 32, 32, 3)
        grid = vis.affordance_grid(aff, imgs, (1, 10, 12))
        assert grid.shape == (32, 128, 3)
        assert np.isfinite(grid).all()

    def test_color_difference(self):
        cs = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        a = np.zeros((8, 8, 3)); a[..., 0] = 255  # all red
        b = a.copy()
        assert vis.color_difference(a, b, cs) == 1.0
        b2 = np.zeros((8, 8, 3)); b2[..., 1] = 255  # all green
        assert vis.color_difference(a, b2, cs) == 0.0

    def test_overlay_masks(self):
        img = np.zeros((64, 64, 3))
        masks = np.zeros((2, 64, 64), bool)
        masks[0, 10:20, 10:20] = True
        boxes = np.array([[[10, 10], [19, 19]], [[0, 0], [0, 0]]], float)
        out = vis.overlay_masks(img, masks, boxes, np.array([True, False]))
        assert out[15, 15].sum() > 0  # tinted
        assert tuple(out[10, 15]) == (0.0, 1.0, 0.0)  # box edge


class TestProfiling:
    def test_phase_timer(self):
        t = profiling.PhaseTimer()
        x = jnp.ones((128, 128))
        with t.phase("matmul", block_on=None):
            y = x @ x
        with t.phase("matmul", block_on=y):
            y = y @ x
        s = t.summary()
        assert s["matmul"]["count"] == 2
        assert "matmul" in t.report()

    def test_annotate_and_trace(self, tmp_path):
        with profiling.trace(str(tmp_path / "tr")):
            with profiling.annotate("region"):
                jax.block_until_ready(jnp.ones(8) * 2)
        # Trace directory created with content.
        import os

        assert any(os.scandir(str(tmp_path / "tr")))
