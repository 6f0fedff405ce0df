"""Affordance model tests (tiny trunk on CPU; densenet shape-checked once)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.models import affordance as aff
from smg_tpu.models.affordance import (
    AffordanceNet,
    ModelConfig,
    STYLE_ETS,
    STYLE_GRASP,
    STYLE_SUCTION,
)

TINY = ModelConfig(method="reinforcement", trunk="tiny", input_size=224)
TINY_REACTIVE = ModelConfig(method="reactive", trunk="tiny", input_size=224)


@pytest.fixture(scope="module")
def tiny_params():
    return aff.init_params(jax.random.PRNGKey(0), TINY)


class TestAffordanceNet:
    def test_score_shapes(self, tiny_params):
        params, stats = tiny_params
        model = AffordanceNet(TINY)
        scene = jnp.ones((2, 224, 224, 3))
        masks = jnp.ones((2, 3, 224, 224, 3))
        for style in (STYLE_GRASP, STYLE_SUCTION, STYLE_ETS):
            out = model.apply(
                {"params": params, "batch_stats": stats},
                scene, masks, style, False, method=AffordanceNet.score,
            )
            assert out.shape == (2, 3, 1)
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_reactive_three_logits(self):
        params, stats = aff.init_params(jax.random.PRNGKey(1), TINY_REACTIVE)
        model = AffordanceNet(TINY_REACTIVE)
        out = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.ones((1, 224, 224, 3)), jnp.ones((1, 2, 224, 224, 3)),
            STYLE_GRASP, False, method=AffordanceNet.score,
        )
        assert out.shape == (1, 2, 3)

    def test_styles_have_distinct_params(self, tiny_params):
        params, stats = tiny_params
        model = AffordanceNet(TINY)
        scene = jnp.asarray(
            np.random.RandomState(0).rand(1, 224, 224, 3), jnp.float32
        )
        masks = scene[:, None]
        outs = [
            float(
                model.apply(
                    {"params": params, "batch_stats": stats},
                    scene, masks, s, False, method=AffordanceNet.score,
                ).ravel()[0]
            )
            for s in (STYLE_GRASP, STYLE_SUCTION, STYLE_ETS)
        ]
        assert outs[0] != outs[1]

    def test_tied_ets_head_matches_reference_quirk(self, tiny_params):
        """With tied_ets_head the ETS head params are the suction head's
        (reference models.py:144 applies suctionnet_val to gs features)."""
        params, stats = tiny_params
        model = AffordanceNet(TINY)
        bound = model.bind({"params": params, "batch_stats": stats})
        assert bound._head(STYLE_ETS) is bound.suction_head

    def test_train_mode_updates_batch_stats(self, tiny_params):
        params, stats = tiny_params
        model = AffordanceNet(TINY)
        scene = jnp.ones((1, 224, 224, 3)) * 2.0
        masks = jnp.ones((1, 1, 224, 224, 3))
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            scene, masks, STYLE_GRASP, True,
            method=AffordanceNet.score, mutable=["batch_stats"],
        )
        leaves_before = jax.tree_util.tree_leaves(stats)
        leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_before, leaves_after)
        )
        assert changed

    def test_scene_feature_sharing_matches_per_object(self, tiny_params):
        """score(M objects) == M independent single-object evaluations."""
        params, stats = tiny_params
        model = AffordanceNet(TINY)
        rng = np.random.RandomState(3)
        scene = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)
        masks = jnp.asarray(rng.rand(1, 3, 224, 224, 3), jnp.float32)
        batched = model.apply(
            {"params": params, "batch_stats": stats},
            scene, masks, STYLE_GRASP, False, method=AffordanceNet.score,
        )
        for m in range(3):
            single = model.apply(
                {"params": params, "batch_stats": stats},
                scene, masks[:, m : m + 1], STYLE_GRASP, False,
                method=AffordanceNet.score,
            )
            np.testing.assert_allclose(
                np.asarray(single[0, 0]), np.asarray(batched[0, m]),
                atol=2e-2,
            )


class TestPreprocess:
    def test_preprocess_shape_and_norm(self):
        cfg = ModelConfig(input_size=640)
        hm = jnp.full((224, 224), 0.02)
        x = aff.preprocess_depth(hm, cfg)
        assert x.shape == (640, 640, 3)
        # Center (inside the zoomed region): normalized (0.02-mean)/std = 0.
        assert abs(float(x[320, 320, 0])) < 1e-6
        # Padding ring: (0 - mean)/std.
        expected_pad = (0.0 - aff.DEPTH_MEAN) / aff.DEPTH_STD
        assert abs(float(x[0, 0, 0]) - expected_pad) < 1e-6

    def test_rotate_image_identity(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3))
        out = aff.rotate_image_nearest(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img))

    def test_rotate_image_90(self):
        img = jnp.zeros((33, 33, 1)).at[5, 16, 0].set(1.0)
        out = aff.rotate_image_nearest(img, jnp.asarray(jnp.pi / 2))
        # Rotating the sample grid by +90deg moves content; mass preserved.
        assert float(out.sum()) == 1.0
        assert float(out[5, 16, 0]) == 0.0


class TestDenseNet121:
    @pytest.mark.slow
    def test_feature_shape(self):
        """DenseNet-121 trunk: 1024-ch stride-32 features (shape parity with
        torchvision `.features`)."""
        from smg_tpu.models.densenet import DenseNetTrunk

        trunk = DenseNetTrunk()
        x = jnp.zeros((1, 224, 224, 3))
        variables = trunk.init(jax.random.PRNGKey(0), x, False)
        out = trunk.apply(variables, x, False)
        assert out.shape == (1, 7, 7, 1024)

    @pytest.mark.slow
    def test_param_count_matches_torchvision(self):
        """Trunk parameter count == torchvision densenet121.features.

        torchvision is not installed in this sandbox; the oracle is the
        published densenet121 count: 7,978,856 total minus the
        1024x1000+1000 classifier = 6,953,856 for `.features`.
        """
        from smg_tpu.models.densenet import DenseNetTrunk

        trunk = DenseNetTrunk()
        variables = trunk.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False
        )
        ours = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        assert ours == 6_953_856, ours
