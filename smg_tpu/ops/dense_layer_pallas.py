"""Fully-fused DenseNet dense layer: BN->ReLU->1x1(128) over the grouped
prefix, then BN->ReLU->3x3(32) merged into the pending group buffer — one
Pallas kernel per layer.

The torchvision dense layer (reference code/models.py DenseLayer;
smg_tpu/models/densenet.py) is norm1->relu->conv1(1x1,128)->norm2->relu->
conv2(3x3,32). The grouped-prefix fast trunk (models/fast_trunk.py) ran
the bottleneck as XLA dots (profiled 7.3 ms/call at the 640 parity
shape) and handed the 128-channel h1 to the conv2 Pallas kernel through
HBM (plus ~1 ms of f32->bf16 conversion). This kernel computes h1 in a
VMEM scratch band and consumes it in place: per trunk call HBM sees the
prefix groups once (bf16), and the 128-lane output group buffer once —
h1 never materializes.

Structure per grid cell (one stream x one row band):
1. bottleneck: for each 128-channel prefix group g, h_g = relu(x_g *
   a1_g + b1_g) (VPU), h1 += h_g @ w1_g (MXU, f32 accumulation); the
   band's h1 rows plus one halo row above/below land in a bf16 scratch.
2. conv2: the conv2_pallas packed-taps scheme on the scratch — one
   (rows, 128) @ (128, 288) MXU call per row chunk, nine shifted
   slice-accumulations, and the 32 output channels placed at lanes
   [pend_n, pend_n + 32) of the group buffer (one-hot selection matmul,
   untouched lanes carried from the pending piece).

Validity padding: the pending prefix tail's invalid lanes hold zeros and
the wrapper zero-pads their BN affine and w1 rows, so they contribute
relu(0*0+0) = 0 through zero weights — exact. Width padding (e.g. the
20-wide 640-input block 4, or 224's 28/14/7-wide blocks) zeroes h2 in
the pad columns, reproducing the conv's zero padding; group buffers stay
width-padded for the whole block and are sliced back at block exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smg_tpu.ops.conv2_pallas import _col_shift, pack_w2  # noqa: F401

LANE = 128
GROWTH = 32
N_TAPS = 9


def _place(acc: jax.Array, off: int, place: str) -> jax.Array:
    """Land a (1, cr, W, 32) f32 tap accumulation at lanes
    [off, off + 32) of a 128-lane vector (zeros elsewhere).

    'dot': one-hot selection matmul — an executed (M, 128) @ (128, 128)
    MXU pass per chunk (K = 32 pads to the full tile).
    'roll': bf16 lane-pad + static circular lane shift — pure VPU,
    freeing the MXU for the conv2/bottleneck dots.
    """
    cr, W = acc.shape[1], acc.shape[2]
    if place == "roll":
        padded = jnp.pad(
            acc.astype(jnp.bfloat16),
            ((0, 0), (0, 0), (0, 0), (0, LANE - GROWTH)),
        )
        return padded if off == 0 else pltpu.roll(padded, shift=off, axis=3)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 0) + off
    ).astype(jnp.bfloat16)
    return jnp.dot(
        acc.astype(jnp.bfloat16).reshape(cr * W, GROWTH), sel,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(1, cr, W, LANE)


def _kernel(*refs, G: int, Ht: int, W: int, TY: int, chunk: int, Wi: int,
            merge_off: int, has_pend: bool, place: str):
    g_refs = refs[:G]
    halo_ref, a1_ref, b1_ref, w1_ref, a2_ref, b2_ref, w2_ref = refs[G : G + 7]
    out_ref = refs[G + 7]
    h1s = refs[G + 8]                      # (1, Ht + 2, W, 128) bf16 scratch
    ty = pl.program_id(1)

    # -- bottleneck: h1 band (+ halo rows) into scratch ---------------------
    def h1_rows(rows):                     # rows[g]: (1, r, W, 128)
        acc = None
        for g in range(G):
            a = a1_ref[g * LANE : (g + 1) * LANE].reshape(1, 1, 1, LANE)
            b = b1_ref[g * LANE : (g + 1) * LANE].reshape(1, 1, 1, LANE)
            h = jnp.maximum(
                rows[g].astype(jnp.float32) * a + b, 0.0
            ).astype(jnp.bfloat16)
            t = jnp.dot(
                h.reshape(-1, LANE), w1_ref[g * LANE : (g + 1) * LANE, :],
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
        r = rows[0].shape[1]
        return acc.astype(jnp.bfloat16).reshape(1, r, W, LANE)

    for r0 in range(0, Ht, chunk):
        r1 = min(r0 + chunk, Ht)
        h1s[:, r0 + 1 : r1 + 1] = h1_rows(
            [g[:, r0:r1] for g in g_refs]
        )
    # Halo h1 rows: garbage at image edges (the wrapper zero-fills the
    # raw halo, but BN maps 0 to relu(b1) != 0) — masked to h2 = 0 below.
    h1s[:, 0:1] = h1_rows(
        [halo_ref[:, 0, 0:1, :, g * LANE : (g + 1) * LANE] for g in range(G)]
    )
    h1s[:, Ht + 1 : Ht + 2] = h1_rows(
        [halo_ref[:, 0, 1:2, :, g * LANE : (g + 1) * LANE] for g in range(G)]
    )

    # -- conv2 + merge (conv2_pallas scheme, reading the scratch) ----------
    a2 = a2_ref[:].reshape(1, 1, 1, LANE)
    b2 = b2_ref[:].reshape(1, 1, 1, LANE)
    w2 = w2_ref[:]
    colmask = (
        None if Wi == W
        else jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2) < Wi
    )

    def h2_rows(x):
        h = jnp.maximum(x.astype(jnp.float32) * a2 + b2, 0.0).astype(
            jnp.bfloat16
        )
        return h if colmask is None else jnp.where(colmask, h, 0)

    zrow = jnp.zeros((1, 1, W, LANE), jnp.bfloat16)
    top = jnp.where(ty > 0, h2_rows(h1s[:, 0:1]), 0) if TY > 1 else zrow
    bot = (
        jnp.where(ty < TY - 1, h2_rows(h1s[:, Ht + 1 : Ht + 2]), 0)
        if TY > 1 else zrow
    )

    for r0 in range(0, Ht, chunk):
        r1 = min(r0 + chunk, Ht)
        cr = r1 - r0
        if r0 == 0 and r1 == Ht:
            h2f = jnp.concatenate([top, h2_rows(h1s[:, 1 : Ht + 1]), bot], 1)
        elif r0 == 0:
            h2f = jnp.concatenate([top, h2_rows(h1s[:, 1 : r1 + 2])], 1)
        elif r1 == Ht:
            h2f = jnp.concatenate([h2_rows(h1s[:, r0 : Ht + 1]), bot], 1)
        else:
            h2f = h2_rows(h1s[:, r0 : r1 + 2])
        part = jnp.dot(
            h2f.reshape((cr + 2) * W, LANE), w2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(1, cr + 2, W, N_TAPS * GROWTH)
        acc = jnp.zeros((1, cr, W, GROWTH), jnp.float32)
        for tap in range(N_TAPS):
            dy, dx = divmod(tap, 3)
            sl = part[:, dy : dy + cr, :, GROWTH * tap : GROWTH * (tap + 1)]
            acc = acc + _col_shift(sl, dx, W)
        placed = _place(acc, merge_off, place)
        if has_pend:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANE), 3)
            keep = (lane < merge_off) | (lane >= merge_off + GROWTH)
            placed = jnp.where(keep, g_refs[G - 1][:, r0:r1, :, :], placed)
        out_ref[:, r0:r1, :, :] = placed


def _kernel_multi(*refs, Gc: int, K: int, Ht: int, W: int, TY: int,
                  H_img: int, chunk: int, Wi: int, pend_n: int,
                  has_pend: bool, place: str):
    """K consecutive dense layers in one pass: the prefix groups are read
    from HBM once for all K layers; the group being built lives in a VMEM
    scratch and is written back once. Each call completes exactly one
    128-lane group (K = (128 - pend_n) / 32).

    Banding (TY > 1): layer l's output is needed on band +- (K-1-l) rows
    and its h1 on band +- (K-l), so the halo side input carries K raw
    prefix rows per side and both scratches span Ht + 2K rows (the halo
    pyramid). Out-of-image rows compute garbage h1 that every consumer
    masks to h2 = 0 (the conv's zero padding); out_ref takes only the
    central Ht rows.
    """
    pad = K if TY > 1 else 0
    S = Ht + 2 * pad
    G_in = Gc + (1 if has_pend else 0)
    g_refs = refs[:G_in]
    halo_ref = refs[G_in]        # (1, 1, 2*pad, W, G_in*128) (pad=0: unused)
    a1_ref, b1_ref, w1_ref, a2_ref, b2_ref, w2_ref = refs[G_in + 1:-3]
    out_ref = refs[-3]
    h1s = refs[-2]                           # (1, S, W, 128) bf16
    newg = refs[-1]                          # (1, S, W, 128) bf16
    ty = pl.program_id(1)

    def group_rows(g, i0, i1):
        """Scratch rows [i0, i1) of prefix group g: above-halo | band |
        below-halo pieces (scratch row i = band row i - pad)."""
        pieces = []
        if i0 < pad:
            pieces.append(
                halo_ref[:, 0, i0 : min(i1, pad), :,
                         g * LANE : (g + 1) * LANE]
            )
        b0, b1_ = max(i0, pad), min(i1, pad + Ht)
        if b0 < b1_:
            pieces.append(g_refs[g][:, b0 - pad : b1_ - pad])
        if i1 > pad + Ht:
            pieces.append(
                halo_ref[:, 0, pad + max(i0, pad + Ht) - (pad + Ht)
                         : pad + i1 - (pad + Ht), :,
                         g * LANE : (g + 1) * LANE]
            )
        return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 1)

    if has_pend:
        if pad:
            newg[:, 0:pad] = group_rows(Gc, 0, pad)
            newg[:, pad + Ht : S] = group_rows(Gc, pad + Ht, S)
        newg[:, pad : pad + Ht] = g_refs[Gc][:]
    else:
        newg[:] = jnp.zeros((1, S, W, LANE), jnp.bfloat16)

    colmask = (
        None if Wi == W
        else jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2) < Wi
    )

    for l in range(K):
        # -- bottleneck: h1 = sum_g relu(bn(x_g)) @ w1_g, newg last ----
        e = K - l if pad else 0             # h1 extent beyond the band
        lo, hi = pad - e, pad + Ht + e      # h1s rows to fill
        for r0 in range(lo, hi, chunk):
            r1 = min(r0 + chunk, hi)
            acc = None
            for g in range(Gc + 1):
                x = (
                    newg[:, r0:r1] if g == Gc
                    else group_rows(g, r0, r1)
                )
                a = a1_ref[l, g * LANE : (g + 1) * LANE].reshape(
                    1, 1, 1, LANE
                )
                b = b1_ref[l, g * LANE : (g + 1) * LANE].reshape(
                    1, 1, 1, LANE
                )
                h = jnp.maximum(
                    x.astype(jnp.float32) * a + b, 0.0
                ).astype(jnp.bfloat16)
                t = jnp.dot(
                    h.reshape(-1, LANE),
                    w1_ref[l, g * LANE : (g + 1) * LANE, :],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
            h1s[:, r0:r1] = acc.astype(jnp.bfloat16).reshape(
                1, r1 - r0, W, LANE
            )

        # -- conv2 + merge into newg at lanes [off, off + 32) ----------
        off = pend_n + GROWTH * l
        a2 = a2_ref[l].reshape(1, 1, 1, LANE)
        b2 = b2_ref[l].reshape(1, 1, 1, LANE)
        w2 = w2_ref[l]

        def h2_rows(x, r0, a2=a2, b2=b2):
            h = jnp.maximum(x.astype(jnp.float32) * a2 + b2, 0.0).astype(
                jnp.bfloat16
            )
            if colmask is not None:
                h = jnp.where(colmask, h, 0)
            # Image rows: scratch row r -> image row ty*Ht + r - pad.
            img = (
                jax.lax.broadcasted_iota(jnp.int32, x.shape[:3] + (1,), 1)
                + r0 + ty * Ht - pad
            )
            return jnp.where((img >= 0) & (img < H_img), h, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANE), 3)
        keep = (lane < off) | (lane >= off + GROWTH)
        eo = K - 1 - l if pad else 0        # output extent beyond the band
        olo, ohi = pad - eo, pad + Ht + eo
        for r0 in range(olo, ohi, chunk):
            r1 = min(r0 + chunk, ohi)
            cr = r1 - r0
            if r0 - 1 >= 0 and r1 + 1 <= S:
                h2f = h2_rows(h1s[:, r0 - 1 : r1 + 1], r0 - 1)
            else:
                # TY == 1 image edges: the conv's zero padding.
                zrow = jnp.zeros((1, 1, W, LANE), jnp.bfloat16)
                h2f = jnp.concatenate([
                    zrow if r0 == 0 else h2_rows(h1s[:, r0 - 1 : r0], r0 - 1),
                    h2_rows(h1s[:, r0:r1], r0),
                    zrow if r1 == S else h2_rows(h1s[:, r1 : r1 + 1], r1),
                ], axis=1)
            part = jnp.dot(
                h2f.reshape((cr + 2) * W, LANE), w2,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).reshape(1, cr + 2, W, N_TAPS * GROWTH)
            acc = jnp.zeros((1, cr, W, GROWTH), jnp.float32)
            for tap in range(N_TAPS):
                dy, dx = divmod(tap, 3)
                sl = part[
                    :, dy : dy + cr, :, GROWTH * tap : GROWTH * (tap + 1)
                ]
                acc = acc + _col_shift(sl, dx, W)
            placed = _place(acc, off, place)
            newg[:, r0:r1] = jnp.where(keep, newg[:, r0:r1], placed)
    out_ref[:] = newg[:, pad : pad + Ht]


def _pick_ty_multi(H: int, W: int, Gc: int, K: int) -> int | None:
    """Band fit: Gc (+pend) double-buffered input bands, the out block,
    two (Ht + 2K)-row scratches, stacked weights and chunk temps."""
    for ty in (1, 2, 4, 8, 16, 32):
        if H % ty:
            continue
        ht = H // ty
        pad = K if ty > 1 else 0
        if (
            2 * (Gc + 2) * ht * W * 256
            + 2 * (ht + 2 * pad) * W * 256
            <= 9_500_000
        ):
            return ty
    return None


def _pick_ty(H: int, W: int, G: int) -> int | None:
    """Largest band that fits VMEM: G + 1 double-buffered 128-lane band
    blocks plus the (Ht + 2)-row h1 scratch and ~3 MB of chunk temps."""
    for ty in (1, 2, 4, 8, 16, 32):
        if H % ty:
            continue
        ht = H // ty
        if 2 * (G + 1) * ht * W * 256 + (ht + 2) * W * 256 <= 10_500_000:
            return ty
    return None


def supported(H: int, W: int, G_max: int) -> bool:
    return _pick_ty(H, -(-W // 8) * 8, G_max) is not None


def _build_halo(pieces: list, B: int, TY: int, Ht: int, W: int) -> jax.Array:
    """(B, TY, 2, W, G*128): raw prefix rows above/below each band,
    zero at image edges (conv2_pallas._build_halo, per group)."""
    G = len(pieces)
    if TY == 1:
        return jnp.zeros((B, 1, 2, W, G * LANE), jnp.bfloat16)
    zr = jnp.zeros((B, 1, W, LANE), jnp.bfloat16)
    cols = []
    for g in pieces:
        r = g.reshape(B, TY, Ht, W, LANE)
        tops = jnp.concatenate([zr, r[:, : TY - 1, Ht - 1]], axis=1)
        bots = jnp.concatenate([r[:, 1:, 0], zr], axis=1)
        cols.append(jnp.stack([tops, bots], axis=2))
    return jnp.concatenate(cols, axis=-1)


import os

# Measured knobs (overridable per call): output placement scheme and the
# row-chunk size of the in-kernel loops. Env defaults let the bench
# matrix sweep them without code edits.
DEFAULT_PLACE = os.environ.get("SMG_FL_PLACE", "dot")
DEFAULT_CHUNK = int(os.environ.get("SMG_FL_CHUNK", "8"))


@functools.partial(
    jax.jit,
    static_argnames=("pend_n", "Wi", "interpret", "force_ty", "place",
                     "chunk"),
)
def dense_layer_fused(
    pieces: tuple,        # G x (B, H, W, 128) bf16; last = pending buffer
                          # (lanes [pend_n, 128) zero) when pend_n > 0
    a1: jax.Array,        # (G*128,) f32 norm1 affine, validity-padded
    b1: jax.Array,        # (G*128,) f32
    w1: jax.Array,        # (G*128, 128) bf16 conv1 weights, validity-padded
    a2: jax.Array,        # (128,) f32 norm2 affine
    b2: jax.Array,        # (128,) f32
    w2p: jax.Array,       # (128, 288) packed conv2 weights (pack_w2)
    pend_n: int,          # valid lanes of the pending piece (0: fresh group)
    Wi: int,              # valid width (W - Wi pad columns are masked)
    *, interpret: bool = False, force_ty: int | None = None,
    place: str | None = None, chunk: int | None = None,
) -> jax.Array:
    """One dense layer over the grouped prefix; returns the (B, H, W, 128)
    group buffer with this layer's 32 channels at lanes
    [pend_n, pend_n + 32)."""
    G = len(pieces)
    B, H, W, _ = pieces[0].shape
    if W % 8:
        raise ValueError("width must be sublane-aligned (pad at block entry)")
    TY = force_ty or _pick_ty(H, W, G)
    Ht = H // TY
    pieces = tuple(x.astype(jnp.bfloat16) for x in pieces)
    halo = _build_halo(list(pieces), B, TY, Ht, W)
    kern = functools.partial(
        _kernel, G=G, Ht=Ht, W=W, TY=TY,
        chunk=min(chunk or DEFAULT_CHUNK, Ht), Wi=Wi,
        merge_off=pend_n, has_pend=pend_n > 0,
        place=place or DEFAULT_PLACE,
    )
    band_spec = pl.BlockSpec(
        (1, Ht, W, LANE), lambda s, t: (s, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=[band_spec] * G + [
            pl.BlockSpec(
                (1, 1, 2, W, G * LANE), lambda s, t: (s, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full, full, full, full, full, full,
        ],
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, LANE), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, Ht + 2, W, LANE), jnp.bfloat16)],
        interpret=interpret,
    )(
        *pieces, halo,
        a1.astype(jnp.float32), b1.astype(jnp.float32),
        w1.astype(jnp.bfloat16),
        a2.astype(jnp.float32), b2.astype(jnp.float32),
        w2p.astype(jnp.bfloat16),
    )


def _build_halo_k(pieces: list, B: int, TY: int, Ht: int, W: int,
                  pad: int) -> jax.Array:
    """(B, TY, 2*pad, W, G*128): pad raw prefix rows above and below each
    band (zeros past the image edges)."""
    G = len(pieces)
    if TY == 1:
        return jnp.zeros((B, 1, 2, W, G * LANE), jnp.bfloat16)
    zr = jnp.zeros((B, 1, pad, W, LANE), jnp.bfloat16)
    cols = []
    for g in pieces:
        r = g.reshape(B, TY, Ht, W, LANE)
        tops = jnp.concatenate([zr, r[:, : TY - 1, Ht - pad :]], axis=1)
        bots = jnp.concatenate([r[:, 1:, :pad], zr], axis=1)
        cols.append(jnp.concatenate([tops, bots], axis=2))
    return jnp.concatenate(cols, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("pend_n", "Wi", "interpret", "force_ty", "place",
                     "chunk"),
)
def dense_layers_fused(
    pieces: tuple,        # Gc complete groups [+ pend when pend_n > 0]
    a1: jax.Array,        # (K, CT) f32, CT = (Gc + 1) * 128, validity-padded
    b1: jax.Array,        # (K, CT) f32
    w1: jax.Array,        # (K, CT, 128) bf16
    a2: jax.Array,        # (K, 128) f32
    b2: jax.Array,        # (K, 128) f32
    w2p: jax.Array,       # (K, 128, 288) packed conv2 weights
    pend_n: int,
    Wi: int,
    *, interpret: bool = False, force_ty: int | None = None,
    place: str | None = None, chunk: int | None = None,
) -> jax.Array:
    """K = (128 - pend_n)/32 consecutive dense layers in one kernel call;
    returns the completed (B, H, W, 128) group."""
    K = int(a1.shape[0])
    B, H, W, _ = pieces[0].shape
    if W % 8:
        raise ValueError("width must be sublane-aligned (pad at block entry)")
    has_pend = pend_n > 0
    Gc = len(pieces) - (1 if has_pend else 0)
    assert pend_n + K * GROWTH == LANE, "call must complete one group"
    pieces = tuple(x.astype(jnp.bfloat16) for x in pieces)
    TY = force_ty or _pick_ty_multi(H, W, Gc, K)
    Ht = H // TY
    pad = K if TY > 1 else 0
    halo = _build_halo_k(list(pieces), B, TY, Ht, W, max(pad, 1))
    kern = functools.partial(
        _kernel_multi, Gc=Gc, K=K, Ht=Ht, W=W, TY=TY, H_img=H,
        chunk=min(chunk or DEFAULT_CHUNK, Ht), Wi=Wi, pend_n=pend_n,
        has_pend=has_pend, place=place or DEFAULT_PLACE,
    )
    band_spec = pl.BlockSpec(
        (1, Ht, W, LANE), lambda s, t: (s, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo_rows = halo.shape[2]
    halo_spec = pl.BlockSpec(
        (1, 1, halo_rows, W, len(pieces) * LANE),
        lambda s, t: (s, t, 0, 0, 0), memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    S = Ht + 2 * pad
    return pl.pallas_call(
        kern,
        grid=(B, TY),
        in_specs=[band_spec] * len(pieces) + [halo_spec] + [full] * 6,
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, LANE), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((1, S, W, LANE), jnp.bfloat16),
            pltpu.VMEM((1, S, W, LANE), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        *pieces, halo,
        a1.astype(jnp.float32), b1.astype(jnp.float32),
        w1.astype(jnp.bfloat16),
        a2.astype(jnp.float32), b2.astype(jnp.float32),
        w2p.astype(jnp.bfloat16),
    )


def pack_layers(bp: dict, bs: dict, names: list, C0: int, CT: int):
    """Stack K layers' operands, validity-padded to CT channels.

    C0: valid prefix channels before the first of these layers."""
    a1s, b1s, w1s, a2s, b2s, w2s = [], [], [], [], [], []
    C = C0
    for n in names:
        a1, b1, w1, a2, b2, w2p = pack_layer(bp[n], bs[n], C, CT // LANE)
        a1s.append(a1)
        b1s.append(b1)
        w1s.append(w1)
        a2s.append(a2)
        b2s.append(b2)
        w2s.append(w2p)
        C += GROWTH
    return (
        jnp.stack(a1s), jnp.stack(b1s), jnp.stack(w1s),
        jnp.stack(a2s), jnp.stack(b2s), jnp.stack(w2s),
    )


def pack_layer(p: dict, s: dict, C_valid: int, G: int):
    """Flax DenseLayer params/stats -> validity-padded kernel operands."""
    from smg_tpu.ops.dense_block_pallas import _bn_affine

    a1, b1 = _bn_affine(p["norm1"], s["norm1"])
    w1 = p["conv1"]["kernel"].reshape(C_valid, LANE)
    padn = G * LANE - C_valid
    if padn:
        a1 = jnp.pad(a1, (0, padn))
        b1 = jnp.pad(b1, (0, padn))
        w1 = jnp.pad(w1, ((0, padn), (0, 0)))
    a2, b2 = _bn_affine(p["norm2"], s["norm2"])
    return a1, b1, w1.astype(jnp.bfloat16), a2, b2, pack_w2(
        p["conv2"]["kernel"]
    )


def dense_block_fused(bp: dict, bs: dict, segs: list, names: list,
                      *, interpret: bool = False,
                      place: str | None = None,
                      chunk: int | None = None) -> list:
    """Run a whole dense block through the fused layer kernel.

    segs: completed 128-channel groups plus an optional partial tail
    (e.g. the 64-channel stem). Returns completed groups (block channel
    counts always end 128-aligned). Width is padded once at entry and
    sliced back at exit.
    """
    B, H, Wi = segs[0].shape[:3]
    W = -(-Wi // 8) * 8
    segs = [
        jnp.pad(x, ((0, 0), (0, 0), (0, W - Wi), (0, 0))) if W != Wi else x
        for x in segs
    ]
    pend_n = segs[-1].shape[-1] % LANE
    if pend_n:
        tail = segs.pop()
        segs.append(jnp.pad(tail, ((0, 0),) * 3 + ((0, LANE - pend_n),)))
    i = 0
    while i < len(names):
        G = len(segs)
        Gc = G - (1 if pend_n else 0)
        K = (LANE - pend_n) // GROWTH
        if i + K <= len(names) and _pick_ty_multi(H, W, Gc, K) is not None:
            # Group-completing stride: K layers, prefix read once.
            C0 = LANE * Gc + pend_n
            ops = pack_layers(bp, bs, names[i : i + K], C0, (Gc + 1) * LANE)
            out = dense_layers_fused(
                tuple(segs), *ops, pend_n=pend_n, Wi=Wi, interpret=interpret,
                place=place, chunk=chunk,
            )
            if pend_n:
                segs[-1] = out
            else:
                segs.append(out)
            pend_n = 0
            i += K
            continue
        n = names[i]
        C_valid = LANE * Gc + pend_n if pend_n else LANE * G
        ops = pack_layer(bp[n], bs[n], C_valid, G)
        out = dense_layer_fused(
            tuple(segs), *ops, pend_n=pend_n, Wi=Wi, interpret=interpret,
            place=place, chunk=chunk,
        )
        if pend_n:
            segs[-1] = out
        else:
            segs.append(out)
        pend_n = (pend_n + GROWTH) % LANE
        i += 1
    assert pend_n == 0, "block channel count must end GROUP-aligned"
    if W != Wi:
        segs = [x[:, :, :Wi] for x in segs]
    return segs
