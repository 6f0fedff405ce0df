"""Parity tests: Pallas dense-block kernel + fast eval trunk vs Flax/XLA.

All run the kernel in interpret mode on CPU (tests/conftest.py). The
oracle is the Flax module applied in eval mode — the exact computation
the trainer's scoring path used before the fast path existed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from smg_tpu.models import fast_trunk
from smg_tpu.models.affordance import AffordanceNet, ModelConfig
from smg_tpu.models.densenet import DenseBlock, DenseNetTrunk, Transition
from smg_tpu.ops import dense_block_pallas as dbp


def _rand_stats(tree, key):
    """Replace init BatchNorm stats with random (mean, var>0) so the
    affine fold is exercised with nontrivial values."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        r = jax.random.uniform(k, leaf.shape, jnp.float32, 0.25, 1.5)
        out.append(r)
    return jax.tree_util.tree_unflatten(treedef, out)


class _BlockPlusTransition(nn.Module):
    num_layers: int
    c_out: int

    @nn.compact
    def __call__(self, x, train=False):
        x = DenseBlock(self.num_layers, 32, 4, name="block")(x, train)
        return Transition(self.c_out, name="trans")(x, train)


def _assert_close(got, want, tol=0.05, name=""):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = max(1e-3, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < tol, f"{name}: rel err {err:.4f} (scale {scale:.3f})"


def _make_block(key, H, W, C0, L, B=2):
    kx, kp, ks = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, H, W, C0), jnp.float32)
    mod = _BlockPlusTransition(L, (C0 + 32 * L) // 2)
    variables = mod.init(kp, x)
    stats = _rand_stats(variables["batch_stats"], ks)
    ref = mod.apply(
        {"params": variables["params"], "batch_stats": stats}, x
    )
    packed = dbp.pack_dense_block(
        variables["params"]["block"], stats["block"]
    )
    ep = dbp.pack_transition(variables["params"]["trans"], stats["trans"])
    return x, packed, ep, ref, (C0 + 32 * L) // 2


def test_block_kernel_whole_image():
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(0), H=16, W=16, C0=128, L=4
    )
    geom = dbp.choose_geom(16, 16, 128, 4, "transition", c_out, x.shape[0])
    assert geom.TY == 1
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    _assert_close(out, ref, name="whole-image block")


def test_block_kernel_taps_separate():
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(1), H=8, W=8, C0=64, L=2
    )
    geom = dbp.choose_geom(8, 8, 64, 2, "transition", c_out, x.shape[0])
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom,
        taps_packed=False, interpret=True,
    )
    _assert_close(out, ref, name="separate-taps block")


def test_block_kernel_row_bands():
    """The halo path: row bands must equal the whole-image result."""
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(2), H=16, W=8, C0=64, L=2, B=1
    )
    geom = dbp.BlockGeom(
        H=16, W=8, C0=64, L=2, B_tile=1, TY=2, chunk=4,
        epilogue="transition", C_out=c_out,
    )
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    _assert_close(out, ref, name="row-band block")


def test_block_kernel_unaligned_width():
    """W not a sublane multiple: zero-pad columns + conv edge mask."""
    x, packed, ep, ref, c_out = _make_block(
        jax.random.PRNGKey(5), H=12, W=12, C0=128, L=4
    )
    geom = dbp.choose_geom(12, 12, 128, 4, "transition", c_out, x.shape[0])
    assert geom.W == 16 and geom.Wi == 12
    out = dbp.dense_block_apply(
        x.astype(jnp.bfloat16), packed, ep, geom, interpret=True
    )
    assert out.shape == ref.shape
    _assert_close(out, ref, name="unaligned-width block")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "xla", "xla_conv", "xla_pk", "xla_fl"])
def test_trunk_parity(backend):
    """Full DenseNet-121 trunk: Flax eval apply vs the fast-path forward."""
    key = jax.random.PRNGKey(3)
    kx, kp, ks = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 64, 64, 3), jnp.float32)
    trunk = DenseNetTrunk()
    variables = trunk.init(kp, x)
    stats = _rand_stats(variables["batch_stats"], ks)
    ref = trunk.apply({"params": variables["params"], "batch_stats": stats}, x)
    got = fast_trunk.trunk_features_eval(
        variables["params"], stats, x, interpret=True, backend=backend
    )
    assert got.shape == ref.shape
    _assert_close(got, ref, name=f"densenet trunk [{backend}]")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "xla", "xla_conv", "xla_pk", "xla_fl"])
def test_score_eval_parity(backend):
    """score_eval == AffordanceNet.score (eval) end to end."""
    cfg = ModelConfig(method="reinforcement", input_size=64)
    model = AffordanceNet(cfg)
    key = jax.random.PRNGKey(4)
    kx, km, kp, ks = jax.random.split(key, 4)
    variables = model.init(kp, method=AffordanceNet.init_all)
    stats = _rand_stats(variables["batch_stats"], ks)
    scene = jax.random.normal(kx, (2, 64, 64, 3), jnp.float32)
    masks = jax.random.normal(km, (2, 3, 64, 64, 3), jnp.float32)
    ref = model.apply(
        {"params": variables["params"], "batch_stats": stats},
        scene, masks, 0, False, method=AffordanceNet.score,
    )
    got = fast_trunk.score_eval(
        variables["params"], stats, scene, masks, cfg.num_out,
        interpret=True, backend=backend,
    )
    assert got.shape == ref.shape
    _assert_close(got, ref, name=f"score_eval [{backend}]")
