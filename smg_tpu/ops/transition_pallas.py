"""Fused DenseNet transition Pallas kernel: BN -> ReLU -> avgpool2 -> 1x1.

The XLA lowering of the transition (fast_trunk._transition_xla) spends
~2.2 ms/call at the 640 parity shape in standalone reduce_sum (the 2x2
mean materializes an f32 intermediate per segment) plus the dot's
re-read of the pooled tensor. This kernel reads each 128-channel
prefix segment once, does the BN affine + ReLU + pool in VMEM via
pair-merging reshapes (layout-pure views), and accumulates the 1x1
contraction across segments in f32 — HBM sees each input byte once and
the C_out output once.

Reference semantics: torchvision _Transition (densenet.py:113-121;
reference code/models.py uses .features wholesale); the pool commutes
before the linear 1x1 exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(*refs, G: int, Ht: int, W: int, Wi: int, C_out: int):
    segs = refs[:G]
    a_ref, b_ref, wt_ref = refs[G : G + 3]
    out_ref = refs[G + 3]
    colmask = (
        None if Wi == W
        else jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2) < Wi
    )
    acc = jnp.zeros(((Ht // 2) * (W // 2), C_out), jnp.float32)
    for g in range(G):
        a = a_ref[:, g * LANE : (g + 1) * LANE].reshape(1, 1, 1, LANE)
        b = b_ref[:, g * LANE : (g + 1) * LANE].reshape(1, 1, 1, LANE)
        h = jnp.maximum(segs[g][:].astype(jnp.float32) * a + b, 0.0)
        if colmask is not None:
            # Zero-padded width: BN shifts the pad zeros to relu(b).
            h = jnp.where(colmask, h, 0.0)
        # 2x2 mean via pair-merging reshapes (no windowed reduce).
        h = h.reshape(1, Ht // 2, 2 * W, LANE)
        rows = h[:, :, :W, :] + h[:, :, W:, :]
        rows = rows.reshape(1, Ht // 2, W // 2, 2 * LANE)
        pooled = ((rows[..., :LANE] + rows[..., LANE:]) * 0.25).astype(
            jnp.bfloat16
        )
        acc = acc + jnp.dot(
            pooled.reshape((Ht // 2) * (W // 2), LANE),
            wt_ref[g * LANE : (g + 1) * LANE, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(jnp.bfloat16).reshape(
        1, Ht // 2, W // 2, C_out
    )


def _pick_ty(G: int, H: int, W: int, C_out: int) -> int | None:
    """Largest band count keeping the in+out+temp footprint under ~8 MB."""
    for ty in (1, 2, 4, 8):
        if H % ty or (H // ty) % 2:
            continue
        ht = H // ty
        est = (
            2 * (G * ht * W * 256 + (ht // 2) * (W // 2) * C_out * 2)
            + ht * W * 512
            + (ht // 2) * (W // 2) * C_out * 4
        )
        if est <= 8_000_000:
            return ty
    return None


def supported(G: int, H: int, W: int, C_out: int) -> bool:
    return (
        H % 2 == 0 and W % 2 == 0
        and _pick_ty(G, H, -(-W // 8) * 8, C_out) is not None
    )


@functools.partial(jax.jit, static_argnames=("interpret", "force_ty"))
def transition(
    segs: tuple,        # G tensors (B, H, W, 128) bf16
    a: jax.Array,       # (C,) f32 eval-BN scale, C = 128 G
    b: jax.Array,       # (C,) f32 eval-BN shift
    wt: jax.Array,      # (C, C_out) bf16 1x1 weight
    *, interpret: bool = False, force_ty: int | None = None,
) -> jax.Array:
    G = len(segs)
    B, H, Wi, _ = segs[0].shape
    W = -(-Wi // 8) * 8
    C_out = wt.shape[1]
    TY = force_ty or _pick_ty(G, H, W, C_out)
    Ht = H // TY
    if W != Wi:
        segs = tuple(
            jnp.pad(s, ((0, 0), (0, 0), (0, W - Wi), (0, 0))) for s in segs
        )
    kern = functools.partial(
        _kernel, G=G, Ht=Ht, W=W, Wi=Wi, C_out=C_out
    )
    seg_spec = pl.BlockSpec(
        (1, Ht, W, LANE), lambda s, t: (s, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=[seg_spec] * G
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(
            (1, Ht // 2, W // 2, C_out), lambda s, t: (s, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, H // 2, W // 2, C_out), jnp.bfloat16
        ),
        interpret=interpret,
    )(
        *[s.astype(jnp.bfloat16) for s in segs],
        a.astype(jnp.float32).reshape(1, -1),
        b.astype(jnp.float32).reshape(1, -1),
        wt.astype(jnp.bfloat16),
    )
    return out if W == Wi else out[:, :, : Wi // 2]
