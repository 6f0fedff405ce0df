"""Parity tests for the fused BN->ReLU->3x3 conv2 Pallas kernel.

Oracle: the XLA conv the fast trunk's 'conv' variant uses — itself
parity-tested against the Flax eval module (test_fast_trunk.py). All
kernel runs use interpret mode (CPU, tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.ops import conv2_pallas as c2p


def _case(key, B, H, W):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h1 = jax.random.normal(k1, (B, H, W, 128), jnp.float32)
    a = jax.random.uniform(k2, (128,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(k3, (128,))
    w = jax.random.normal(k4, (3, 3, 128, 32), jnp.float32) * 0.05
    h2 = jnp.maximum(h1 * a + b, 0).astype(jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        h2, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return h1, a, b, w, ref


def _check(got, ref, tol=0.02):
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    err = float(np.abs(r - g).max() / max(np.abs(r).max(), 1e-3))
    assert err < tol, f"rel err {err}"


def test_single_band():
    h1, a, b, w, ref = _case(jax.random.PRNGKey(0), 2, 16, 16)
    got = c2p.conv2_bn_relu(
        h1.astype(jnp.bfloat16), a, b, c2p.pack_w2(w), interpret=True
    )
    _check(got, ref)


@pytest.mark.parametrize("ty", [2, 4])
def test_row_bands_halo(ty):
    """Band halos (the rows each band borrows from its neighbors) must
    reproduce the undivided conv exactly, including image-edge zeros."""
    h1, a, b, w, ref = _case(jax.random.PRNGKey(1), 1, 16, 24)
    got = c2p.conv2_bn_relu(
        h1.astype(jnp.bfloat16), a, b, c2p.pack_w2(w),
        interpret=True, force_ty=ty,
    )
    _check(got, ref)


def test_supported_gate():
    assert c2p.supported(56, 56)        # 224-input block 1
    assert c2p.supported(160, 160)      # 640-input block 1
    assert c2p.supported(20, 20)        # 640-input block 4: W zero-padded


def test_unaligned_width():
    """W = 20 (640-input block 4) pads to 24 with masked h2 columns."""
    h1, a, b, w, ref = _case(jax.random.PRNGKey(2), 2, 20, 20)
    got = c2p.conv2_bn_relu(
        h1.astype(jnp.bfloat16), a, b, c2p.pack_w2(w), interpret=True
    )
    assert got.shape == ref.shape
    _check(got, ref)


def test_unaligned_width_banded():
    h1, a, b, w, ref = _case(jax.random.PRNGKey(4), 1, 20, 20)
    got = c2p.conv2_bn_relu(
        h1.astype(jnp.bfloat16), a, b, c2p.pack_w2(w),
        interpret=True, force_ty=2,
    )
    _check(got, ref)


@pytest.mark.parametrize("G,H,W,C_out,ty", [
    (2, 16, 16, 128, 1),    # transition1 shape family
    (4, 8, 8, 256, 1),      # transition2
    (2, 8, 20, 128, 1),     # unaligned width (pad + mask)
    (2, 16, 16, 128, 2),    # banded rows
])
def test_transition_kernel(G, H, W, C_out, ty):
    """Fused BN->ReLU->avgpool2->1x1 == the composed XLA ops."""
    from smg_tpu.ops import transition_pallas as trp

    key = jax.random.PRNGKey(G * 100 + H)
    ks = jax.random.split(key, G + 3)
    segs = tuple(
        jax.random.normal(ks[g], (2, H, W, 128), jnp.bfloat16)
        for g in range(G)
    )
    C = 128 * G
    a = jax.random.uniform(ks[G], (C,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(ks[G + 1], (C,))
    wt = jax.random.normal(ks[G + 2], (C, C_out), jnp.float32) * 0.05

    full = jnp.concatenate(segs, axis=-1).astype(jnp.float32)
    h = jnp.maximum(full * a + b, 0.0)
    pooled = h.reshape(2, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
    ref = jnp.dot(
        pooled.astype(jnp.bfloat16).reshape(-1, C), wt.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(2, H // 2, W // 2, C_out)

    got = trp.transition(
        segs, a, b, wt.astype(jnp.bfloat16), interpret=True, force_ty=ty
    )
    _check(got, ref, tol=0.03)


@pytest.mark.parametrize("ty", [1, 2, 4])
def test_stem_quad_pool_kernel(ty):
    """Quad-packed conv0 + fused BN->ReLU->maxpool == the stride-2 conv
    followed by the composed XLA ops."""
    from smg_tpu.ops import stem_pool_pallas as spp

    key = jax.random.PRNGKey(7 + ty)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (2, 64, 32, 1), jnp.bfloat16)
    kg = jax.random.normal(k2, (7, 7, 1, 64), jnp.bfloat16) * 0.1
    a = jax.random.uniform(k3, (64,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(k4, (64,))

    y = jax.lax.conv_general_dilated(
        x, kg, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0).astype(jnp.bfloat16)
    ref = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    yq = spp.quad_conv0(x, kg)
    # Quad lane packing reproduces the stride-2 conv exactly.
    B, H, W, _ = yq.shape
    for pr in range(2):
        for pc in range(2):
            q = 2 * pr + pc
            np.testing.assert_allclose(
                np.asarray(yq[..., 64 * q : 64 * (q + 1)], np.float32),
                np.asarray(y[:, pr::2, pc::2], np.float32),
                rtol=0.05, atol=0.05,
            )
    got = spp.bn_relu_maxpool(yq, a, b, interpret=True, force_ty=ty)
    assert got.shape == ref.shape
    _check(got, ref)


@pytest.mark.parametrize("pend_n,has_pend,ty", [
    (0, False, 1),      # fresh group: lanes 32: stay zero
    (32, True, 1),      # mid-group landing
    (96, True, 2),      # group completion, banded
])
def test_merge_kernel(pend_n, has_pend, ty):
    """conv2_bn_relu_merge == conv output placed at [pend_n, pend_n+32)
    with the other lanes carried from the pending buffer."""
    h1, a, b, w, ref = _case(jax.random.PRNGKey(11 + pend_n), 2, 16, 16)
    pend = None
    want = jnp.zeros(ref.shape[:3] + (128,), jnp.float32)
    if has_pend:
        pend = jax.random.normal(
            jax.random.PRNGKey(5), ref.shape[:3] + (128,), jnp.bfloat16
        )
        pend = pend.at[..., pend_n:].set(0)
        want = pend.astype(jnp.float32)
    want = want.at[..., pend_n : pend_n + 32].set(
        ref.astype(jnp.float32)
    )
    got = c2p.conv2_bn_relu_merge(
        h1.astype(jnp.bfloat16), pend, a, b, c2p.pack_w2(w), pend_n,
        interpret=True, force_ty=ty,
    )
    assert got.shape == want.shape
    _check(got, want)
