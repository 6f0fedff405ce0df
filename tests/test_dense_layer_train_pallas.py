"""Fused train-mode dense-layer kernels vs the jnp oracle.

The 'pk' fast_train lowering (ops/dense_layer_train_pallas.py) must
reproduce fast_trunk's jnp taps forward (_layer_taps_fwd) and the
hand-written VJP backward (_layer_vjp) — same minimal-residual scheme,
kernelized. Interpret mode on CPU; Mosaic lowering is exercised by
scripts/tpu_kernel_smoke.py on the real chip.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smg_tpu.models import fast_trunk
from smg_tpu.models.densenet import DenseNetTrunk


def _rel_l2(got, ref, floor=1e-6):
    g = np.asarray(got, np.float32).ravel()
    r = np.asarray(ref, np.float32).ravel()
    return float(np.linalg.norm(g - r) / max(np.linalg.norm(r), floor))


def _layer_params(key, C):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "norm1": {
            "scale": jax.random.uniform(k1, (C,), jnp.float32, 0.5, 1.5),
            "bias": jax.random.normal(k2, (C,)) * 0.1,
        },
        "conv1": {"kernel": jax.random.normal(k3, (1, 1, C, 128)) * 0.05},
        "norm2": {
            "scale": jax.random.uniform(k4, (128,), jnp.float32, 0.5, 1.5),
            "bias": jax.random.normal(k5, (128,)) * 0.1,
        },
        "conv2": {"kernel": jax.random.normal(k6, (3, 3, 128, 32)) * 0.05},
    }


def _segs(key, H, W, cs, dtype):
    keys = jax.random.split(key, len(cs))
    return tuple(
        jax.random.normal(k, (1, H, W, c), jnp.float32).astype(dtype)
        for k, c in zip(keys, cs)
    )


@pytest.mark.parametrize("cs", [(64,), (128, 96), (128, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
# 12 pads to 16; 7 is block 4's width at the 224 training shape — the
# unaligned case that must round-trip the kernel's pad-column masking.
@pytest.mark.parametrize("HW", [12, 7])
def test_fwd_matches_taps_forward(cs, dtype, HW):
    key = jax.random.PRNGKey(0)
    ks, kp = jax.random.split(key)
    H = W = HW
    segs = _segs(ks, H, W, cs, dtype)
    p = _layer_params(kp, sum(cs))

    ref_out, resid = fast_trunk._layer_taps_fwd(segs, p, dtype)
    _, ref_h1, rm1, rv1, rm2, rv2 = resid[0], resid[1], *resid[2:]

    out, (m1, v1, m2, v2) = fast_trunk._layer_vjp_pk(segs, p, dtype)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    assert _rel_l2(out, ref_out) < tol, _rel_l2(out, ref_out)
    assert _rel_l2(m1, rm1) < tol
    assert _rel_l2(v1, rv1) < tol
    assert _rel_l2(m2, rm2) < tol
    assert _rel_l2(v2, rv2) < tol


@pytest.mark.parametrize("cs", [(64,), (128, 96)])
@pytest.mark.parametrize("HW", [12, 7])
def test_bwd_matches_jnp_vjp(cs, HW):
    """Gradients of sum(out^2) through the pk layer == the jnp VJP layer
    (f32: both follow the identical op/rounding structure)."""
    key = jax.random.PRNGKey(1)
    ks, kp = jax.random.split(key)
    H = W = HW
    dtype = jnp.float32
    segs = _segs(ks, H, W, cs, dtype)
    p = _layer_params(kp, sum(cs))

    def loss(fn):
        def f(args):
            segs_, p_ = args
            out, _ = fn(segs_, p_, dtype)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(fast_trunk._layer_vjp))((segs, p))
    g_pk = jax.grad(loss(fast_trunk._layer_vjp_pk))((segs, p))
    flat_r, tree = jax.tree_util.tree_flatten(g_ref)
    flat_g = jax.tree_util.tree_leaves(g_pk)
    assert len(flat_r) == len(flat_g)
    for r, g in zip(flat_r, flat_g):
        assert _rel_l2(g, r) < 1e-4, (tree, _rel_l2(g, r))


def test_vmap_matches_per_scene():
    """vmap over scenes (the trainer's chunk structure) == stacked
    per-scene calls, forward and grads."""
    key = jax.random.PRNGKey(2)
    ks, kp = jax.random.split(key)
    H = W = 8
    cs = (64,)
    dtype = jnp.float32
    B = 3
    p = _layer_params(kp, sum(cs))
    xs = jax.random.normal(ks, (B, 1, H, W, cs[0]), jnp.float32)

    def one(x, p_):
        out, _ = fast_trunk._layer_vjp_pk((x,), p_, dtype)
        return out

    batched = jax.vmap(one, in_axes=(0, None))(xs, p)
    single = jnp.stack([one(xs[i], p) for i in range(B)])
    assert _rel_l2(batched, single) < 1e-6

    def loss_b(p_):
        return jnp.sum(jax.vmap(one, in_axes=(0, None))(xs, p_) ** 2)

    def loss_s(p_):
        return sum(jnp.sum(one(xs[i], p_) ** 2) for i in range(B))

    g_b = jax.tree_util.tree_leaves(jax.grad(loss_b)(p))
    g_s = jax.tree_util.tree_leaves(jax.grad(loss_s)(p))
    for b, s in zip(g_b, g_s):
        assert _rel_l2(b, s) < 1e-5


def test_score_train_pk_full_depth_smoke():
    """conv2='pk' through a small full trunk under remat + vmap (the
    trainer's structure): finite outputs, grads match the taps path."""
    key = jax.random.PRNGKey(3)
    kx, kp = jax.random.split(key)
    x = jax.random.uniform(kx, (2, 1, 64, 64, 3), jnp.float32)
    trunkmod = DenseNetTrunk(block_config=(2, 2, 2, 2), dtype=jnp.float32)
    tv = trunkmod.init(kp, x[0])
    tp, ts = tv["params"], tv["batch_stats"]

    def loss(conv2):
        def f(tp_):
            @jax.checkpoint
            def one(xi):
                feat, _ = fast_trunk.trunk_features_train(
                    tp_, ts, xi, jnp.float32, conv2
                )
                return jnp.sum(feat.astype(jnp.float32) ** 2)
            return jnp.sum(jax.vmap(one)(x))
        return f

    v_pk, g_pk = jax.value_and_grad(loss("pk"))(tp)
    v_tp, g_tp = jax.value_and_grad(loss("taps"))(tp)
    assert np.isfinite(float(v_pk))
    assert _rel_l2(v_pk, v_tp) < 1e-4
    # Chunked-sum vs single-op reduction order diverges with depth
    # (train-mode BN amplifies rounding; see test_fast_trunk's depth
    # note) — 2e-3 is still well inside the 5e-3 the main parity test
    # accepts against the Flax oracle. Near-zero leaves use the same
    # global scale floor as that test (relative error on rounding noise
    # is meaningless there).
    leaves_pk = jax.tree_util.tree_leaves(g_pk)
    leaves_tp = jax.tree_util.tree_leaves(g_tp)
    gmax = max(
        float(np.linalg.norm(np.asarray(v, np.float32))) for v in leaves_tp
    )
    for a, b in zip(leaves_pk, leaves_tp):
        r = np.asarray(b, np.float32).ravel()
        g = np.asarray(a, np.float32).ravel()
        err = float(
            np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-3 * gmax)
        )
        assert err < 2e-3, err
