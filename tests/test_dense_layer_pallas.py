"""Parity tests for the fully-fused dense-layer Pallas kernel.

Oracle: the composed XLA ops of the grouped-prefix fast trunk
(models/fast_trunk.py), themselves parity-tested against the Flax eval
module. All kernel runs use interpret mode (CPU, tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smg_tpu.ops import conv2_pallas as c2p
from smg_tpu.ops import dense_layer_pallas as dlp


def _check(got, ref, tol=0.03):
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    err = float(np.abs(r - g).max() / max(np.abs(r).max(), 1e-3))
    assert err < tol, f"rel err {err}"


def _layer_case(key, B, H, W, G, pend_n):
    """Random prefix groups + layer operands, plus the XLA oracle."""
    C = 128 * (G - 1) + (pend_n if pend_n else 128)
    ks = jax.random.split(key, G + 6)
    pieces = []
    for g in range(G):
        x = jax.random.normal(ks[g], (B, H, W, 128), jnp.bfloat16)
        if pend_n and g == G - 1:
            x = x.at[..., pend_n:].set(0)
        pieces.append(x)
    a1 = jax.random.uniform(ks[G], (C,), jnp.float32, 0.5, 1.5)
    b1 = jax.random.normal(ks[G + 1], (C,))
    w1 = jax.random.normal(ks[G + 2], (C, 128), jnp.float32) * 0.05
    a2 = jax.random.uniform(ks[G + 3], (128,), jnp.float32, 0.5, 1.5)
    b2 = jax.random.normal(ks[G + 4], (128,))
    w2 = jax.random.normal(ks[G + 5], (3, 3, 128, 32), jnp.float32) * 0.05

    full = jnp.concatenate(pieces, axis=-1)[..., :C].astype(jnp.float32)
    h = jnp.maximum(full * a1 + b1, 0.0).astype(jnp.bfloat16)
    h1 = jnp.dot(
        h.reshape(-1, C), w1.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(B, H, W, 128)
    h2 = jnp.maximum(h1 * a2 + b2, 0.0).astype(jnp.bfloat16)
    new = jax.lax.conv_general_dilated(
        h2, w2.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = jnp.zeros((B, H, W, 128), jnp.float32)
    if pend_n:
        want = pieces[-1].astype(jnp.float32)
    want = want.at[..., pend_n : pend_n + 32].set(new.astype(jnp.float32))

    padded = G * 128 - C
    if padded:
        a1 = jnp.pad(a1, (0, padded))
        b1 = jnp.pad(b1, (0, padded))
        w1 = jnp.pad(w1, ((0, padded), (0, 0)))
    ops = (a1, b1, w1.astype(jnp.bfloat16), a2, b2, c2p.pack_w2(w2))
    return pieces, ops, want


@pytest.mark.parametrize("G,pend_n,ty", [
    (1, 0, 1),       # fresh group from one complete group
    (2, 64, 1),      # stem-tail landing (block-1 entry)
    (3, 96, 1),      # group completion
    (4, 32, 2),      # banded rows, deep prefix
])
def test_dense_layer_fused(G, pend_n, ty):
    pieces, ops, want = _layer_case(
        jax.random.PRNGKey(G * 10 + pend_n), 2, 8, 16, G, pend_n
    )
    got = dlp.dense_layer_fused(
        tuple(pieces), *ops, pend_n=pend_n, Wi=16,
        interpret=True, force_ty=ty,
    )
    _check(got, want)


@pytest.mark.parametrize("place,chunk", [("roll", None), ("dot", 4)])
def test_dense_layer_fused_variants(place, chunk):
    """The measured kernel knobs (placement scheme, row chunk) are
    bit-compatible with the default configuration."""
    G, pend_n, ty = 3, 96, 1
    pieces, ops, want = _layer_case(
        jax.random.PRNGKey(G * 10 + pend_n), 2, 8, 16, G, pend_n
    )
    got = dlp.dense_layer_fused(
        tuple(pieces), *ops, pend_n=pend_n, Wi=16,
        interpret=True, force_ty=ty, place=place, chunk=chunk,
    )
    _check(got, want)


def test_dense_layer_fused_unaligned_width():
    """Pad columns must behave as conv zero padding (Wi < W)."""
    B, H, Wi, W = 1, 8, 12, 16
    pieces, ops, want = _layer_case(jax.random.PRNGKey(5), B, H, W, 2, 32)
    # Zero the pad columns of the prefix (block wrapper invariant) and
    # rebuild the oracle on the valid region only.
    pieces = [p.at[:, :, Wi:].set(0) for p in pieces]
    pieces_v = [p[:, :, :Wi] for p in pieces]
    # Oracle computed directly on the valid region.
    C = 128 + 32
    a1, b1, w1, a2, b2, w2p = ops
    full = jnp.concatenate(pieces_v, axis=-1)[..., :C].astype(jnp.float32)
    h = jnp.maximum(full * a1[:C] + b1[:C], 0.0).astype(jnp.bfloat16)
    h1 = jnp.dot(
        h.reshape(-1, C), w1[:C], preferred_element_type=jnp.float32
    ).reshape(B, H, Wi, 128)
    h2 = jnp.maximum(h1 * a2 + b2, 0.0).astype(jnp.bfloat16)
    w2 = (
        w2p.reshape(128, 9, 32).transpose(1, 0, 2)
        .reshape(3, 3, 128, 32)
    )
    new = jax.lax.conv_general_dilated(
        h2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = pieces_v[-1].astype(jnp.float32)
    want = want.at[..., 32:64].set(new.astype(jnp.float32))
    got = dlp.dense_layer_fused(
        tuple(pieces), *ops, pend_n=32, Wi=Wi, interpret=True, force_ty=1,
    )
    assert got.shape == (B, H, W, 128)
    # Valid region only: conv taps write neighbor spill into the pad
    # columns, which the next layer's h2 colmask (and the block-exit
    # slice) ignores.
    _check(got[:, :, :Wi], want)


def test_dense_block_fused_vs_xla_segs():
    """A whole small dense block through the fused kernel == the
    grouped-prefix XLA path, from a 64-channel stem tail."""
    from smg_tpu.models import fast_trunk

    key = jax.random.PRNGKey(9)
    B, H, W, L = 1, 8, 16, 6   # 64 + 6*32 = 256: ends 128-aligned (block 1)
    stem = jax.random.normal(key, (B, H, W, 64), jnp.bfloat16)
    bp, bs = {}, {}
    C = 64
    for i in range(L):
        ks = jax.random.split(jax.random.PRNGKey(100 + i), 6)
        n = f"denselayer{i + 1}"
        bp[n] = {
            "norm1": {
                "scale": jax.random.uniform(ks[0], (C,), jnp.float32, 0.5, 1.5),
                "bias": jax.random.normal(ks[1], (C,)) * 0.1,
            },
            "conv1": {"kernel": jax.random.normal(
                ks[2], (1, 1, C, 128), jnp.float32) * 0.05},
            "norm2": {
                "scale": jax.random.uniform(ks[3], (128,), jnp.float32, 0.5, 1.5),
                "bias": jax.random.normal(ks[4], (128,)) * 0.1,
            },
            "conv2": {"kernel": jax.random.normal(
                ks[5], (3, 3, 128, 32), jnp.float32) * 0.05},
        }
        bs[n] = {
            "norm1": {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))},
            "norm2": {"mean": jnp.zeros((128,)), "var": jnp.ones((128,))},
        }
        C += 32
    names = [f"denselayer{i + 1}" for i in range(L)]
    ref_segs = fast_trunk._dense_block_xla_segs(
        bp, bs, [stem], "conv", interpret=True
    )
    got_segs = dlp.dense_block_fused(bp, bs, [stem], names, interpret=True)
    assert len(got_segs) == len(ref_segs) == 2
    _check(
        jnp.concatenate(got_segs, -1), jnp.concatenate(ref_segs, -1)
    )


@pytest.mark.parametrize("Gc,pend_n,ty", [
    (1, 0, 2),       # K = 4, banded: the K-row halo pyramid
    (2, 64, 4),      # K = 2, deeper prefix, more bands
])
def test_dense_layers_fused_multi_banded(Gc, pend_n, ty):
    """Banded K-layer fusion == the TY = 1 run (halo pyramid exactness,
    including image-edge zero padding)."""
    K = (128 - pend_n) // 32
    B, H, W = 1, 16, 16
    G = Gc + (1 if pend_n else 0)
    ks = jax.random.split(jax.random.PRNGKey(77 + Gc), G)
    pieces = []
    for g in range(G):
        x = jax.random.normal(ks[g], (B, H, W, 128), jnp.bfloat16)
        if pend_n and g == G - 1:
            x = x.at[..., pend_n:].set(0)
        pieces.append(x)
    CT = (Gc + 1) * 128
    km = jax.random.split(jax.random.PRNGKey(88), 6)
    a1 = jax.random.uniform(km[0], (K, CT), jnp.float32, 0.5, 1.5)
    b1 = jax.random.normal(km[1], (K, CT)) * 0.1
    w1 = jax.random.normal(km[2], (K, CT, 128), jnp.float32) * 0.05
    a2 = jax.random.uniform(km[3], (K, 128), jnp.float32, 0.5, 1.5)
    b2 = jax.random.normal(km[4], (K, 128)) * 0.1
    w2 = jax.random.normal(km[5], (K, 128, 288), jnp.float32) * 0.05
    # Zero the validity padding so TY = 1 and banded agree exactly.
    C0 = 128 * Gc + pend_n
    for l in range(K):
        Cl = C0 + 32 * l
        a1 = a1.at[l, Cl:].set(0)
        b1 = b1.at[l, Cl:].set(0)
        w1 = w1.at[l, Cl:].set(0)
    ops = (a1, b1, w1.astype(jnp.bfloat16), a2, b2,
           w2.astype(jnp.bfloat16))
    want = dlp.dense_layers_fused(
        tuple(pieces), *ops, pend_n=pend_n, Wi=W, interpret=True, force_ty=1,
    )
    got = dlp.dense_layers_fused(
        tuple(pieces), *ops, pend_n=pend_n, Wi=W, interpret=True,
        force_ty=ty,
    )
    _check(got, want, tol=0.02)
    # Variant knobs agree with the default configuration too.
    got_roll = dlp.dense_layers_fused(
        tuple(pieces), *ops, pend_n=pend_n, Wi=W, interpret=True,
        force_ty=ty, place="roll", chunk=4,
    )
    _check(got_roll, want, tol=0.02)


@pytest.mark.parametrize("Gc,pend_n", [(1, 0), (2, 64), (1, 96)])
def test_dense_layers_fused_multi(Gc, pend_n):
    """K group-completing layers in one kernel == K sequential
    single-layer kernel calls."""
    K = (128 - pend_n) // 32
    B, H, W = 1, 8, 16
    G = Gc + (1 if pend_n else 0)
    key = jax.random.PRNGKey(3 * Gc + pend_n)
    ks = jax.random.split(key, G)
    pieces = []
    for g in range(G):
        x = jax.random.normal(ks[g], (B, H, W, 128), jnp.bfloat16)
        if pend_n and g == G - 1:
            x = x.at[..., pend_n:].set(0)
        pieces.append(x)

    # Per-layer raw operands.
    layers = []
    C = 128 * Gc + pend_n
    for l in range(K):
        kl = jax.random.split(jax.random.PRNGKey(50 + l), 6)
        layers.append({
            "norm1": {
                "scale": jax.random.uniform(kl[0], (C,), jnp.float32, 0.5, 1.5),
                "bias": jax.random.normal(kl[1], (C,)) * 0.1,
            },
            "conv1": {"kernel": jax.random.normal(
                kl[2], (1, 1, C, 128), jnp.float32) * 0.05},
            "norm2": {
                "scale": jax.random.uniform(kl[3], (128,), jnp.float32, 0.5, 1.5),
                "bias": jax.random.normal(kl[4], (128,)) * 0.1,
            },
            "conv2": {"kernel": jax.random.normal(
                kl[5], (3, 3, 128, 32), jnp.float32) * 0.05},
        })
        C += 32
    stats = [
        {
            "norm1": {"mean": jnp.zeros((128 * Gc + pend_n + 32 * l,)),
                      "var": jnp.ones((128 * Gc + pend_n + 32 * l,))},
            "norm2": {"mean": jnp.zeros((128,)), "var": jnp.ones((128,))},
        }
        for l in range(K)
    ]

    # Oracle: sequential single-layer fused calls.
    segs = list(pieces)
    pn = pend_n
    for l in range(K):
        Gl = len(segs)
        Cv = 128 * (Gl - 1) + (pn if pn else 128)
        ops = dlp.pack_layer(layers[l], stats[l], Cv, Gl)
        out = dlp.dense_layer_fused(
            tuple(segs), *ops, pend_n=pn, Wi=W, interpret=True, force_ty=1,
        )
        if pn:
            segs[-1] = out
        else:
            segs.append(out)
        pn = (pn + 32) % 128
    want = segs[-1]

    bp = {f"denselayer{l + 1}": layers[l] for l in range(K)}
    bs = {f"denselayer{l + 1}": stats[l] for l in range(K)}
    mops = dlp.pack_layers(
        bp, bs, [f"denselayer{l + 1}" for l in range(K)],
        128 * Gc + pend_n, (Gc + 1) * 128,
    )
    got = dlp.dense_layers_fused(
        tuple(pieces), *mops, pend_n=pend_n, Wi=W, interpret=True,
    )
    _check(got, want, tol=0.02)


def test_supported_shapes():
    # 224-input blocks (G_max at the last layer of each block)
    assert dlp.supported(56, 56, 2)
    assert dlp.supported(28, 28, 4)
    assert dlp.supported(14, 14, 8)
    assert dlp.supported(7, 7, 8)
    # 640-input blocks
    assert dlp.supported(160, 160, 2)
    assert dlp.supported(80, 80, 4)
    assert dlp.supported(40, 40, 8)
    assert dlp.supported(20, 20, 8)
