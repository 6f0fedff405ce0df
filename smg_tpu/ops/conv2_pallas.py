"""Fused BN->ReLU->3x3(128->32) Pallas kernel (the DenseNet conv2).

The dense layer's second half (norm2 -> relu -> conv2, reference
code/models.py DenseLayer via torchvision; smg_tpu/models/densenet.py)
is the MFU sink of the XLA eval trunk: a 3x3 conv emitting growth=32
channels fills 32/128 MXU lanes and XLA runs it at ~12% MFU (profiled
at the 640 parity shape, scripts/profile_trunk.py).

This kernel takes the 1x1 bottleneck output h1 (pre-BN, bf16) and
computes conv3x3(relu(h1 * a + b), w2) with the nine taps packed on the
matmul N axis — one (rows, 128) @ (128, 288) MXU call per row chunk —
followed by nine shifted slice-accumulations in VMEM, so HBM sees h1
once (bf16) and the 32-channel output once. The BN affine and ReLU run
on the VPU between the load and the matmul.

Halo handling: the grid tiles rows into TY bands per stream; the two
boundary rows each band needs from its neighbors ride in a tiny
(B, TY, 2, W, 128) side input gathered by the wrapper (overlapping
block reads are inexpressible in BlockSpecs, and neighbor-index specs
would triple the per-cell input DMA). Image-edge halos are zeroed
in h2-space, reproducing the conv's zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
GROWTH = 32
N_TAPS = 9


def _col_shift(sl: jax.Array, dx: int, W: int) -> jax.Array:
    """Tap column shift: out col x takes input col x + dx - 1 (zero edges).

    pltpu.roll + edge mask: Mosaic lowers pad/concat on the sublane (W)
    dim poorly, but circular sublane rolls are native. f32: the rotate
    handles 32-bit data only.
    """
    if dx == 1:
        return sl.astype(jnp.float32)
    rolled = pltpu.roll(
        sl.astype(jnp.float32), shift=1 if dx == 0 else W - 1, axis=2
    )
    col = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 2)
    mask = (col >= 1) if dx == 0 else (col < W - 1)
    return jnp.where(mask, rolled, 0.0)


def _kernel(cur_ref, halo_ref, a_ref, b_ref, w2_ref, *rest,
            Ht: int, W: int, TY: int, chunk: int, Wi: int,
            merge_off: int | None = None, has_pend: bool = False):
    # rest = ([pend_ref,] out_ref): with merge_off set, the layer's 32
    # output channels land at lanes [merge_off, merge_off + 32) of a
    # 128-lane group buffer (untouched lanes copied from pend_ref, or
    # zero), replacing the XLA-side pending concat (4.3 ms/call
    # profiled at 640).
    pend_ref = rest[0] if has_pend else None
    out_ref = rest[-1]
    ty = pl.program_id(1)
    a = a_ref[:].reshape(1, 1, 1, LANE)
    b = b_ref[:].reshape(1, 1, 1, LANE)
    w2 = w2_ref[:]
    colmask = (
        None if Wi == W
        else jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2) < Wi
    )

    def h2_rows(x):
        h = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(
            jnp.bfloat16
        )
        # Width-padded images: h2 in the pad columns must be zero (the
        # raw zeros turn into relu(b) != 0 under the BN affine).
        return h if colmask is None else jnp.where(colmask, h, 0)

    zrow = jnp.zeros((1, 1, W, LANE), jnp.bfloat16)
    # Halo rows ride in a tiny side input (2 rows per band, gathered by
    # the wrapper) instead of neighbor-block specs, which would triple
    # the per-cell input DMA. The wrapper zero-fills the image-edge
    # halos, but BN shifts zero inputs to relu(b) != 0 — conv padding
    # must see h2 = 0 there, hence the ty-edge masks.
    top = zrow if TY == 1 else jnp.where(
        ty > 0, h2_rows(halo_ref[:, 0, 0:1, :, :]), 0
    )
    bot = zrow if TY == 1 else jnp.where(
        ty < TY - 1, h2_rows(halo_ref[:, 0, 1:2, :, :]), 0
    )

    for r0 in range(0, Ht, chunk):
        r1 = min(r0 + chunk, Ht)
        cr = r1 - r0
        if 0 < r0 and r1 < Ht:
            # Interior chunk: one contiguous BN+ReLU over rows
            # [r0-1, r1+1) — no pieces, no sublane concat.
            h2f = h2_rows(cur_ref[:, r0 - 1 : r1 + 1, :, :])
        else:
            pieces = [
                top if r0 == 0 else h2_rows(cur_ref[:, r0 - 1 : r0, :, :]),
                h2_rows(cur_ref[:, r0:r1, :, :]),
                bot if r1 == Ht else h2_rows(cur_ref[:, r1 : r1 + 1, :, :]),
            ]
            h2f = jnp.concatenate(pieces, axis=1)  # (1, cr + 2, W, 128)
        part = jnp.dot(
            h2f.reshape((cr + 2) * W, LANE), w2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(1, cr + 2, W, N_TAPS * GROWTH)
        acc = jnp.zeros((1, cr, W, GROWTH), jnp.float32)
        for tap in range(N_TAPS):
            dy, dx = divmod(tap, 3)
            sl = part[:, dy : dy + cr, :, GROWTH * tap : GROWTH * (tap + 1)]
            acc = acc + _col_shift(sl, dx, W)
        if merge_off is None:
            out_ref[:, r0:r1, :, :] = acc.astype(jnp.bfloat16)
            continue
        # Place the 32 channels at the group offset with a one-hot
        # selection matmul (no lane relayout), then fill the other
        # lanes from the pending buffer (zeros when starting a group).
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 0)
            + merge_off
        ).astype(jnp.bfloat16)
        placed = jnp.dot(
            acc.astype(jnp.bfloat16).reshape(cr * W, GROWTH), sel,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(1, cr, W, LANE)
        if has_pend:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANE), 3)
            keep = (lane < merge_off) | (lane >= merge_off + GROWTH)
            placed = jnp.where(keep, pend_ref[:, r0:r1, :, :], placed)
        out_ref[:, r0:r1, :, :] = placed


def pack_w2(kernel: jax.Array) -> jax.Array:
    """(3, 3, 128, 32) conv kernel -> (128, 288), tap t = 3*dy + dx at
    columns [32t, 32t + 32)."""
    return (
        kernel.transpose(2, 0, 1, 3)
        .reshape(LANE, N_TAPS * GROWTH)
        .astype(jnp.bfloat16)
    )


def supported(H: int, W: int) -> bool:
    """Shapes the kernel handles (unaligned W is zero-padded + masked)."""
    return _pick_ty(H, -(-W // 8) * 8) is not None


def _pick_ty(H: int, W: int) -> int | None:
    # Per-cell VMEM: 3 input blocks + out, double-buffered by the
    # pipeline, plus ~5 MB of chunk temps (the f32 tap matmul output
    # dominates); keep the block share under ~5.5 MB of the 16 MB.
    for ty in (1, 2, 4, 8, 16):
        if H % ty:
            continue
        if (H // ty) * W * 832 * 2 <= 5_750_000:
            return ty
    return None


def _build_halo(h1b: jax.Array, B: int, TY: int, Ht: int,
                W: int) -> jax.Array:
    """(B, TY, 2, W, 128): raw h1 rows above/below each band (zeros at
    image edges). Static slices of the band-reshaped view (strided
    indexing would lower to gather, ~1.5 ms/call profiled at 640)."""
    if TY == 1:
        return jnp.zeros((B, 1, 2, W, LANE), jnp.bfloat16)
    r = h1b.reshape(B, TY, Ht, W, LANE)
    zr = jnp.zeros((B, 1, W, LANE), jnp.bfloat16)
    tops = jnp.concatenate([zr, r[:, : TY - 1, Ht - 1]], axis=1)
    bots = jnp.concatenate([r[:, 1:, 0], zr], axis=1)
    return jnp.stack([tops, bots], axis=2)


def merge_supported(H: int, W: int) -> bool:
    return W % 8 == 0 and _pick_ty_merge(H, W) is not None


def _pick_ty_merge(H: int, W: int) -> int | None:
    # The merge variant's blocks are 3x bigger (in + pend + out at 128
    # lanes each); keep 2x their sum + ~3.5 MB of chunk temps inside
    # the 16 MB VMEM.
    for ty in (1, 2, 4, 8, 16, 32):
        if H % ty:
            continue
        if (H // ty) * W * 1536 <= 8_000_000:
            return ty
    return None


@functools.partial(
    jax.jit, static_argnames=("pend_n", "interpret", "force_ty")
)
def conv2_bn_relu_merge(
    h1: jax.Array,           # (B, H, W, 128) bf16 pre-BN bottleneck output
    pend: jax.Array | None,  # (B, H, W, 128) group buffer, lanes
                             # [0, pend_n) valid, zeros beyond; None
                             # starts a fresh group at lane 0
    a: jax.Array,            # (128,) f32 eval-BN scale
    b: jax.Array,            # (128,) f32 eval-BN shift
    w2p: jax.Array,          # (128, 288) packed conv2 weights
    pend_n: int,
    *, interpret: bool = False, force_ty: int | None = None,
) -> jax.Array:
    """conv2_bn_relu that lands its 32 channels at lanes
    [pend_n, pend_n + 32) of the 128-lane group buffer in one pass —
    the XLA-side pending concat never materializes."""
    B, H, W, _ = h1.shape
    if W % 8:
        raise ValueError("merge variant needs sublane-aligned width")
    TY = force_ty or _pick_ty_merge(H, W)
    Ht = H // TY
    kern = functools.partial(
        _kernel, Ht=Ht, W=W, TY=TY, chunk=min(8, Ht), Wi=W,
        merge_off=pend_n, has_pend=pend is not None,
    )
    h1b = h1.astype(jnp.bfloat16)
    halo = _build_halo(h1b, B, TY, Ht, W)
    band_spec = pl.BlockSpec(
        (1, Ht, W, LANE), lambda s, t: (s, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    ins = [h1b, halo, a.astype(jnp.float32), b.astype(jnp.float32), w2p]
    in_specs = [
        band_spec,
        pl.BlockSpec(
            (1, 1, 2, W, LANE), lambda s, t: (s, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if pend is not None:
        ins.append(pend.astype(jnp.bfloat16))
        in_specs.append(band_spec)
    return pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=in_specs,
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, LANE), jnp.bfloat16),
        interpret=interpret,
    )(*ins)


@functools.partial(
    jax.jit, static_argnames=("interpret", "force_ty", "force_chunk")
)
def conv2_bn_relu(
    h1: jax.Array,      # (B, H, W, 128) bf16 (pre-BN bottleneck output)
    a: jax.Array,       # (128,) f32 eval-BN scale
    b: jax.Array,       # (128,) f32 eval-BN shift
    w2p: jax.Array,     # (128, 288) packed conv2 weights
    *, interpret: bool = False, force_ty: int | None = None,
    force_chunk: int | None = None,
) -> jax.Array:
    B, H, Wi, _ = h1.shape
    W = -(-Wi // 8) * 8  # sublane-aligned working width (zero columns)
    TY = force_ty or _pick_ty(H, W)
    Ht = H // TY
    kern = functools.partial(
        _kernel, Ht=Ht, W=W, TY=TY, chunk=min(force_chunk or 8, Ht), Wi=Wi
    )
    h1b = h1.astype(jnp.bfloat16)
    if W != Wi:
        h1b = jnp.pad(h1b, ((0, 0), (0, 0), (0, W - Wi), (0, 0)))
    halo = _build_halo(h1b, B, TY, Ht, W)
    out = pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=[
            pl.BlockSpec(
                (1, Ht, W, LANE), lambda s, t: (s, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2, W, LANE), lambda s, t: (s, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Ht, W, GROWTH), lambda s, t: (s, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, GROWTH), jnp.bfloat16),
        interpret=interpret,
    )(h1b, halo, a.astype(jnp.float32), b.astype(jnp.float32), w2p)
    return out if W == Wi else out[:, :, :Wi]
