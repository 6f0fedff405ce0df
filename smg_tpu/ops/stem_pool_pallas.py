"""Fused DenseNet stem tail: quad-packed conv0 + BN -> ReLU -> maxpool.

The stem (fast_trunk._stem; torchvision densenet.py:100-110) is
conv0 (7x7 s2) -> BN -> ReLU -> maxpool 3x3 s2. Lowered separately on
TPU the conv's (B, S/2, S/2, 64) output pads to 128 lanes (2x HBM
traffic) and round-trips through HBM twice more for the BN+ReLU and the
windowed max (~2+ ms/call at the 640 parity shape).

Here conv0 runs with its four output phases packed on the channel axis:
`quad_kernel` rewrites the (7, 7, 1, 64) tap tensor as (9, 9, 1, 256)
at stride 4, so XLA emits (B, S/4, S/4, 256) — full 128-lane tiles —
where lanes [64*(2pr+pc), ...) hold conv output row 2I+pr, col 2J+pc.
The Pallas kernel then applies the BN affine (tiled 4x), ReLU, and the
3x3 s2 max using only lane slices, an axis-1 concat shift (untiled
dim), and a sublane roll — no lane-growing reshapes, which Mosaic
rejects. ReLU makes values >= 0, so masked pad positions use 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64  # stem channels (densenet121 num_init_features)
QC = 4 * C


def quad_kernel(kg: jax.Array) -> jax.Array:
    """(7, 7, 1, 64) conv0 taps -> (9, 9, 1, 256) quad-phase taps.

    Use with stride (4, 4), padding ((3, 5), (3, 5)): output (I, J)
    lane block 2pr + pc equals the stride-2 conv's output at
    (2I + pr, 2J + pc)."""
    kq = jnp.zeros((9, 9, 1, QC), kg.dtype)
    for pr in range(2):
        for pc in range(2):
            q = 2 * pr + pc
            kq = kq.at[
                2 * pr : 2 * pr + 7, 2 * pc : 2 * pc + 7, :,
                C * q : C * (q + 1),
            ].set(kg)
    return kq


def quad_conv0(x1: jax.Array, kg: jax.Array) -> jax.Array:
    """x1 (B, S, S, 1) -> quad-packed conv0 output (B, S/4, S/4, 256)."""
    return jax.lax.conv_general_dilated(
        x1, quad_kernel(kg), window_strides=(4, 4),
        padding=[(3, 5), (3, 5)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _kernel(y_ref, halo_ref, a_ref, b_ref, out_ref,
            *, Ht: int, W: int, TY: int):
    ty = pl.program_id(1)
    a = a_ref[:].reshape(1, 1, 1, QC)
    b = b_ref[:].reshape(1, 1, 1, QC)

    def h(x):
        return jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)

    y = h(y_ref[:])                                 # (1, Ht, W, 256)
    q00, q01 = y[..., :C], y[..., C : 2 * C]        # rows 2i: col 2j/2j+1
    q10, q11 = y[..., 2 * C : 3 * C], y[..., 3 * C :]

    m_cur = jnp.maximum(jnp.maximum(q00, q01), jnp.maximum(q10, q11))
    # Row 2i-1 terms: the previous quad row's odd-row phases.
    mrow = jnp.maximum(q10, q11)                    # max over cols 2j, 2j+1
    top = (
        jnp.where(
            ty > 0,
            jnp.maximum(
                h(halo_ref[:, 0])[..., 2 * C : 3 * C],
                h(halo_ref[:, 0])[..., 3 * C :],
            ),
            0.0,
        )
        if TY > 1
        else jnp.zeros((1, 1, W, C), jnp.float32)
    )
    m_up = jnp.concatenate([top, mrow[:, : Ht - 1]], axis=1)
    # Col 2j-1 terms: the previous quad col's odd-col phases (rows 2i,
    # 2i+1 and, for the corner, row 2i-1).
    modd = jnp.maximum(q01, q11)
    top_o = (
        jnp.where(ty > 0, h(halo_ref[:, 0])[..., 3 * C :], 0.0)
        if TY > 1
        else jnp.zeros((1, 1, W, C), jnp.float32)
    )
    modd = jnp.maximum(
        modd, jnp.concatenate([top_o, q11[:, : Ht - 1]], axis=1)
    )
    m_left = pltpu.roll(modd, shift=1, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
    m_left = jnp.where(col >= 1, m_left, 0.0)

    out = jnp.maximum(jnp.maximum(m_cur, m_up), m_left)
    out_ref[:] = out.astype(jnp.bfloat16)


def _pick_ty(H: int, W: int) -> int | None:
    # In band (Ht x W x 256 bf16, double-buffered) + f32 temps + out.
    for ty in (1, 2, 4, 8, 16):
        if H % ty:
            continue
        if (H // ty) * W * QC * (2 * 2 + 5) <= 10_000_000:
            return ty
    return None


def supported(H: int, W: int) -> bool:
    """H, W: pooled output extents (= quad-conv output extents)."""
    return W % 8 == 0 and _pick_ty(H, W) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "force_ty"))
def bn_relu_maxpool(
    yq: jax.Array,      # (B, H, W, 256) quad-packed conv0 output (pre-BN)
    a: jax.Array,       # (64,) f32 eval-BN scale
    b: jax.Array,       # (64,) f32 eval-BN shift
    *, interpret: bool = False, force_ty: int | None = None,
) -> jax.Array:
    B, H, W, _ = yq.shape
    TY = force_ty or _pick_ty(H, W)
    Ht = H // TY
    a4 = jnp.tile(a.astype(jnp.float32), 4)
    b4 = jnp.tile(b.astype(jnp.float32), 4)
    yb = yq.astype(jnp.bfloat16)
    if TY == 1:
        halo = jnp.zeros((B, 1, 1, W, QC), jnp.bfloat16)
    else:
        # Quad row above each band (zeros for the first band).
        r = yb.reshape(B, TY, Ht, W, QC)
        zr = jnp.zeros((B, 1, W, QC), jnp.bfloat16)
        tops = jnp.concatenate([zr, r[:, : TY - 1, Ht - 1]], axis=1)
        halo = tops[:, :, None]                     # (B, TY, 1, W, 256)
    kern = functools.partial(_kernel, Ht=Ht, W=W, TY=TY)
    return pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=[
            pl.BlockSpec(
                (1, Ht, W, QC), lambda s, t: (s, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, W, QC), lambda s, t: (s, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Ht, W, C), lambda s, t: (s, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        interpret=interpret,
    )(yb, halo, a4, b4)
