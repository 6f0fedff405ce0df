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
    assert not c2p.supported(20, 20)    # unaligned W: XLA fallback
