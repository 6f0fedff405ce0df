"""Fused DenseNet dense-block Pallas kernel (eval mode).

The affordance trunks are torchvision-parity DenseNet-121s
(smg_tpu/models/densenet.py; reference code/models.py:22-24). XLA's
lowering of them reaches ~8.5% MFU on a v5e (BENCH_r02): every dense
layer's 3x3 conv emits only growth_rate=32 channels (32/128 MXU lanes)
and every layer round-trips the growing concat prefix through HBM.

This kernel runs ONE WHOLE DENSE BLOCK per grid cell with the block's
feature buffer resident in VMEM:

- the concat prefix is never re-materialized: each layer reads the first
  channels of the feature buffer and writes its 32-channel append in
  place (the reference's torch.cat chain, models.py DenseLayer);
- BN -> ReLU -> 1x1(128) -> BN -> ReLU run fused on the VPU between the
  two matmuls (eval-mode BatchNorm is a per-channel affine);
- the 3x3(32) conv is one (P, 128) @ (128, 9*32) matmul — the nine taps
  packed on the N axis (75% MXU N-occupancy vs 25% for N=32) — followed
  by nine shifted slice-accumulations;
- the downstream transition (BN -> ReLU -> 1x1 -> avgpool2, with the
  pool commuted before the 1x1: exact for a linear conv) or the final
  norm5 affine is fused as an epilogue, so HBM sees only the block input
  and the (usually 8x smaller) epilogue output.

Images too large for a resident buffer (block 1 at 640 input: 160x160)
are split into row bands with an L-row halo; every layer computes all
band rows (wrong rows contaminate one extra edge row per layer, all
inside the discarded halo) and an image-boundary row mask reproduces the
conv zero-padding semantics across layers.

Mosaic layout rules shape the implementation: REF slices on the tiled
(sublane, lane) dims must be tile-aligned, so channel reads round up to
128 with zero-extended weights, the 32-channel append is a read-modify-
write of its aligned 128-group (inserted via a selection-matrix matmul,
not a lane relayout), and all row/column shifts happen on values, where
Mosaic can insert relayouts.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
GROWTH = 32
BOTTLENECK = 128  # bn_size * growth_rate
N_TAPS = 9
BN_EPS = 1e-5

# Perf-bisection probes (WRONG MATH — benchmarking only):
#   noshift: tap column shifts skipped; notaps: one tap, no shifts/adds;
#   nosel: append write skipped (layers read zero appends);
#   noh1: layer input pinned to the first 128 feature channels (probes
#   the growing-prefix read); nomm1: first matmul replaced by a slice.
_PROBE = os.environ.get("SMG_DBP_PROBE", "")


def _ceil128(c: int) -> int:
    return -(-c // LANE) * LANE


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockGeom:
    """Static launch geometry for one dense block at one input shape."""

    H: int              # image rows into the block
    W: int              # working cols (sublane-aligned; >= Wi, zero pad)
    C0: int             # input channels
    L: int              # dense layers
    B_tile: int         # streams per grid cell
    TY: int             # row bands per image (1 = whole image resident)
    chunk: int          # rows per inner compute chunk
    epilogue: str       # 'transition' | 'final_bn'
    C_out: int          # epilogue output channels
    Wi: int = 0         # true image cols (0 = W); cols [Wi, W) are pad

    @property
    def Cf(self) -> int:
        return self.C0 + GROWTH * self.L

    @property
    def C0p(self) -> int:
        """Input channels padded to the lane tile (zero-filled)."""
        return _ceil128(self.C0)

    @property
    def Ht(self) -> int:
        return self.H // self.TY

    @property
    def halo(self) -> int:
        return self.L if self.TY > 1 else 0

    @property
    def Rt(self) -> int:
        """Feature-buffer rows per band (tile rows + 2 * halo)."""
        return self.Ht + 2 * self.halo

    @property
    def out_hw(self) -> tuple[int, int]:
        if self.epilogue == "transition":
            return self.Ht // 2, self.W // 2
        return self.Ht, self.W


def choose_geom(H: int, W: int, C0: int, L: int, epilogue: str,
                C_out: int, B: int) -> BlockGeom:
    """Pick (B_tile, TY, chunk) so the feature buffer fits VMEM (~16 MB)."""
    Wi = W
    W = -(-W // 8) * 8  # sublane-aligned working width (zero columns)
    Cf = C0 + GROWTH * L
    bytes_per_stream = H * W * Cf * 2
    # Feature-buffer share of the 16 MB VMEM; weights, chunk temps and
    # the double-buffered out block take the rest (Mosaic keeps several
    # chunk temps live at once, so the margin is generous).
    budget = 4 * 2**20
    if bytes_per_stream > budget:
        # Row bands with an L-row halo (block 1 at 640 input).
        TY = 2
        while (H // TY + 2 * L) * W * Cf * 2 > budget:
            TY *= 2
        B_tile = 1
    else:
        TY = 1
        B_tile = max(1, min(B, budget // bytes_per_stream, 8))
    Rt = H // TY + 2 * (L if TY > 1 else 0)
    chunk = 8 if W >= 16 else Rt
    return BlockGeom(H, W, C0, L, B_tile, TY, chunk, epilogue, C_out, Wi)


# ---------------------------------------------------------------------------
# Weight packing (Flax param/stat subtrees -> kernel operands)
# ---------------------------------------------------------------------------


def _bn_affine(norm_params, norm_stats):
    """Eval-mode BatchNorm as y = x * a + b (f32)."""
    a = norm_params["scale"] * jax.lax.rsqrt(norm_stats["var"] + BN_EPS)
    b = norm_params["bias"] - norm_stats["mean"] * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def pack_dense_block(block_params: dict, block_stats: dict) -> dict:
    """Pack a Flax DenseBlock subtree (models/densenet.py DenseBlock).

    Layer l's 1x1 weights/affine are zero-padded to Cp_l = ceil128(C_l)
    rows so the kernel can read the feature prefix at lane-tile
    granularity (padded channels are zeroed in the feature buffer, so
    they contribute exactly nothing). Shapes:
      w1  (sum_l Cp_l, 128) bf16
      a1, b1  (L, 1, Cp_max) f32
      w2  (L, 128, 288) bf16 -- tap t = 3*dy + dx at columns [32t, 32t+32)
      a2, b2  (L, 1, 128) f32
    """
    names = sorted(block_params, key=lambda n: int(n.removeprefix("denselayer")))
    L = len(names)
    Cmax = block_params[names[-1]]["conv1"]["kernel"].shape[2]
    Cpm = _ceil128(Cmax)
    w1s, w2s, a2s, b2s = [], [], [], []
    a1 = jnp.zeros((L, 1, Cpm), jnp.float32)
    b1 = jnp.zeros((L, 1, Cpm), jnp.float32)
    for i, n in enumerate(names):
        p, s = block_params[n], block_stats[n]
        C = p["conv1"]["kernel"].shape[2]
        Cp = _ceil128(C)
        la, lb = _bn_affine(p["norm1"], s["norm1"])
        a1 = a1.at[i, 0, :C].set(la)
        b1 = b1.at[i, 0, :C].set(lb)
        w1s.append(
            jnp.pad(
                p["conv1"]["kernel"].reshape(C, BOTTLENECK),
                ((0, Cp - C), (0, 0)),
            )
        )
        la2, lb2 = _bn_affine(p["norm2"], s["norm2"])
        a2s.append(la2)
        b2s.append(lb2)
        # (3, 3, 128, 32) -> (128, 3, 3, 32) -> (128, 288)
        w2s.append(
            p["conv2"]["kernel"].transpose(2, 0, 1, 3)
            .reshape(BOTTLENECK, N_TAPS * GROWTH)
        )
    return {
        "w1": jnp.concatenate(w1s, axis=0).astype(jnp.bfloat16),
        "a1": a1,
        "b1": b1,
        "w2": jnp.stack(w2s).astype(jnp.bfloat16),
        "a2": jnp.stack(a2s)[:, None, :],
        "b2": jnp.stack(b2s)[:, None, :],
    }


def pack_transition(tr_params: dict, tr_stats: dict) -> dict:
    """{'norm','conv'} transition subtree -> {wt (Cf, Co) bf16, at/bt (1, Cf)}."""
    a, b = _bn_affine(tr_params["norm"], tr_stats["norm"])
    k = tr_params["conv"]["kernel"]
    return {
        "wt": k.reshape(k.shape[2], k.shape[3]).astype(jnp.bfloat16),
        "at": a[None, :],
        "bt": b[None, :],
    }


def pack_final_bn(norm_params: dict, norm_stats: dict) -> dict:
    a, b = _bn_affine(norm_params, norm_stats)
    return {
        "wt": jnp.zeros((8, LANE), jnp.bfloat16),  # unused slot
        "at": a[None, :],
        "bt": b[None, :],
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _block_kernel(
    x_hbm, w1_ref, a1_ref, b1_ref, w2_ref, a2_ref, b2_ref,
    wt_ref, at_ref, bt_ref,
    out_ref, xin_ref, feat_ref, sem,
    *, g: BlockGeom, taps_packed: bool, probe: str = "",
):
    bi = pl.program_id(0)
    ty = pl.program_id(1)
    Bt, Rt, W, Cf = g.B_tile, g.Rt, g.W, g.Cf
    h = g.halo

    # --- load the band (halo rows come from the caller's zero row-pad) ---
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi * Bt, Bt), pl.ds(ty * g.Ht, Rt), :, :],
        xin_ref, sem,
    )
    cp.start()
    cp.wait()
    feat_ref[:, :, :, : g.C0p] = xin_ref[:]
    # Zero the append region: layers read the prefix at lane-tile
    # granularity, and 0 * 0-weight must stay 0 (not NaN from garbage).
    if Cf > g.C0p:
        feat_ref[:, :, :, g.C0p :] = jnp.zeros(
            (Bt, Rt, W, Cf - g.C0p), jnp.bfloat16
        )

    Wi = g.Wi or g.W
    need_mask = g.TY > 1 or Wi < W

    def edge_mask(n: int, a: int):
        """(1, n, W, 1) bool: band rows [a, a+n) x cols inside the image.

        Reproduces conv zero-padding: h2 beyond the image must be zero
        (features there are zeros, but BN bias makes h2 nonzero)."""
        ok = None
        if g.TY > 1:
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, n, W, 1), 1)
            abs_row = rows + (ty * g.Ht - h + a)
            ok = (abs_row >= 0) & (abs_row < g.H)
        if Wi < W:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, n, W, 1), 2)
            okc = cols < Wi
            ok = okc if ok is None else ok & okc
        return ok

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANE), 3)

    # --- dense layers ---
    off = 0
    for l in range(g.L):
        C = g.C0 + GROWTH * l
        Cp = _ceil128(C)
        w1 = w1_ref[off : off + Cp, :]
        a1 = a1_ref[l].reshape(1, 1, 1, Cp) if Cp == a1_ref.shape[2] \
            else a1_ref[l][:, :Cp].reshape(1, 1, 1, Cp)
        b1 = b1_ref[l][:, :Cp].reshape(1, 1, 1, Cp)
        a2 = a2_ref[l]
        b2 = b2_ref[l]
        w2 = w2_ref[l]

        for r0 in range(0, Rt, g.chunk):
            r1 = min(r0 + g.chunk, Rt)
            cr = r1 - r0
            # h2 over band rows [r0-1, r1+1), zero rows beyond the band.
            a_, b_ = max(r0 - 1, 0), min(r1 + 1, Rt)
            n = b_ - a_
            if probe == "noh1":
                xs = feat_ref[:, a_:b_, :, :LANE]
                Cp_eff = LANE
            else:
                xs = feat_ref[:, a_:b_, :, :Cp]
                Cp_eff = Cp
            h1 = jnp.maximum(
                xs.astype(jnp.float32) * a1[..., :Cp_eff] + b1[..., :Cp_eff],
                0.0,
            ).astype(jnp.bfloat16)
            t = jnp.dot(
                h1.reshape(Bt * n * W, Cp_eff), w1[:Cp_eff, :],
                preferred_element_type=jnp.float32,
            )
            h2 = jnp.maximum(
                t * a2.reshape(1, LANE) + b2.reshape(1, LANE), 0.0
            ).astype(jnp.bfloat16).reshape(Bt, n, W, LANE)
            if need_mask:
                h2 = jnp.where(edge_mask(n, a_), h2, 0)
            zrow = jnp.zeros((Bt, 1, W, LANE), jnp.bfloat16)
            pieces = []
            if a_ == r0:           # top edge: image row r0-1 is zero pad
                pieces.append(zrow)
            pieces.append(h2)
            if b_ == r1:           # bottom edge
                pieces.append(zrow)
            h2f = jnp.concatenate(pieces, axis=1)  # (Bt, cr+2, W, 128)

            if taps_packed:
                # bf16 partials: the f32 (..., 288->384-lane) tensor plus
                # its nine (..., 32->128-lane) tap slices blow the VMEM
                # stack; the 9-way sum still accumulates in f32.
                part = jnp.dot(
                    h2f.reshape(Bt * (cr + 2) * W, LANE), w2,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16).reshape(Bt, cr + 2, W, N_TAPS * GROWTH)
                acc = jnp.zeros((Bt, cr, W, GROWTH), jnp.float32)
                taps = [4] if probe == "notaps" else range(N_TAPS)
                for tap in taps:
                    dy, dx = divmod(tap, 3)
                    sl = part[
                        :, dy : dy + cr, :,
                        GROWTH * tap : GROWTH * (tap + 1),
                    ]
                    acc = acc + _col_shift(sl, dx, W, probe)
            else:
                acc = jnp.zeros((Bt, cr, W, GROWTH), jnp.float32)
                w2v = w2_ref[l][:]
                for tap in range(N_TAPS):
                    dy, dx = divmod(tap, 3)
                    sh = h2f[:, dy : dy + cr, :, :]
                    pt = jnp.dot(
                        sh.reshape(Bt * cr * W, LANE),
                        w2v[:, GROWTH * tap : GROWTH * (tap + 1)],
                        preferred_element_type=jnp.float32,
                    ).reshape(Bt, cr, W, GROWTH)
                    acc = acc + _col_shift(pt, dx, W, probe)

            if probe == "nosel":
                continue
            # Append via RMW of the aligned 128-group: place the 32
            # columns with a selection-matrix matmul (no lane relayout).
            g0 = (C // LANE) * LANE
            o = C - g0
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 1)
                == jax.lax.broadcasted_iota(jnp.int32, (GROWTH, LANE), 0) + o
            ).astype(jnp.bfloat16)
            placed = jnp.dot(
                acc.astype(jnp.bfloat16).reshape(Bt * cr * W, GROWTH), sel,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).reshape(Bt, cr, W, LANE)
            old = feat_ref[:, r0:r1, :, g0 : g0 + LANE]
            keep = (lane_iota < o) | (lane_iota >= o + GROWTH)
            feat_ref[:, r0:r1, :, g0 : g0 + LANE] = jnp.where(
                keep, old, placed
            )
        off += Cp

    # --- epilogue over the band's center rows [h, h + Ht) ---
    at = at_ref[:].reshape(1, 1, 1, Cf)
    bt = bt_ref[:].reshape(1, 1, 1, Cf)
    if g.epilogue == "transition":
        ech = max(2, (g.chunk // 2) * 2)
        for r0 in range(h, h + g.Ht, ech):
            r1 = min(r0 + ech, h + g.Ht)
            n = r1 - r0
            hs = jnp.maximum(
                feat_ref[:, r0:r1, :, :].astype(jnp.float32) * at + bt, 0.0
            ).astype(jnp.bfloat16)
            # 2x2 avg pool via pair-merging reshapes (layout-pure views).
            hs = hs.reshape(Bt, n // 2, 2 * W, Cf)
            rows = hs[:, :, :W, :] + hs[:, :, W:, :]
            rows = rows.reshape(Bt, n // 2, W // 2, 2 * Cf)
            pooled = (rows[..., :Cf] + rows[..., Cf:]) * 0.25
            o = jnp.dot(
                pooled.astype(jnp.bfloat16).reshape(
                    Bt * (n // 2) * (W // 2), Cf
                ),
                wt_ref[:], preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            out_ref[:, (r0 - h) // 2 : (r1 - h) // 2, :, :] = o.reshape(
                Bt, n // 2, W // 2, g.C_out
            )
    else:  # final_bn: norm5 affine, no relu (densenet.py:124-127)
        for r0 in range(h, h + g.Ht, g.chunk):
            r1 = min(r0 + g.chunk, h + g.Ht)
            y = feat_ref[:, r0:r1, :, :].astype(jnp.float32) * at + bt
            out_ref[:, r0 - h : r1 - h, :, :] = y.astype(jnp.bfloat16)


def _col_shift(sl: jax.Array, dx: int, W: int, probe: str = "") -> jax.Array:
    """Tap column shift: out col x takes input col x + dx - 1 (zero edges).

    pltpu.roll + edge mask: Mosaic lowers pad/concat on the sublane (W)
    dim poorly, but circular lane/sublane rolls are native.
    """
    if dx == 1 or probe == "noshift":
        return sl
    # tpu.dynamic_rotate handles 32-bit data only.
    rolled = pltpu.roll(
        sl.astype(jnp.float32), shift=1 if dx == 0 else W - 1, axis=2
    )
    col = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 2)
    mask = (col >= 1) if dx == 0 else (col < W - 1)
    return jnp.where(mask, rolled, 0.0)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def dense_block_apply(
    x: jax.Array,           # (B, H, W, C0) bf16
    packed: dict,           # pack_dense_block output
    epilogue_packed: dict,  # pack_transition / pack_final_bn output
    geom: BlockGeom,
    *, taps_packed: bool = True, interpret: bool = False,
    probe: str = "",
) -> jax.Array:
    """Run one dense block + fused epilogue. Returns (B, Ho, Wo, C_out)."""
    g = geom
    if g.Cf % LANE:
        raise ValueError(
            f"block output channels must be lane-aligned, got Cf={g.Cf}"
        )
    B = x.shape[0]
    Bp = -(-B // g.B_tile) * g.B_tile
    Wi = g.Wi or g.W
    pad_b, pad_w, pad_c = Bp - B, g.W - x.shape[2], g.C0p - g.C0
    if pad_b or pad_w or pad_c:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, pad_w), (0, pad_c)))
    if g.halo:
        x = jnp.pad(x, ((0, 0), (g.halo, g.halo), (0, 0), (0, 0)))
    x = x.astype(jnp.bfloat16)

    Hto, Wo = g.out_hw
    grid = (Bp // g.B_tile, g.TY)
    kern = functools.partial(_block_kernel, g=g, taps_packed=taps_packed,
                         probe=probe or _PROBE)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]  # x (manual band DMA;
        # pinned to HBM: an ANY spec lets the compiler promote x to VMEM,
        # where the band slice hits sublane-tiling alignment limits)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(
            (g.B_tile, Hto, Wo, g.C_out),
            lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Bp, g.TY * Hto, Wo, g.C_out), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((g.B_tile, g.Rt, g.W, g.C0p), jnp.bfloat16),  # xin
            pltpu.VMEM((g.B_tile, g.Rt, g.W, g.Cf), jnp.bfloat16),   # feat
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        x, packed["w1"], packed["a1"], packed["b1"], packed["w2"],
        packed["a2"], packed["b2"], epilogue_packed["wt"],
        epilogue_packed["at"], epilogue_packed["bt"],
    )
    wo = Wi // 2 if g.epilogue == "transition" else Wi
    return out[:B, :, :wo]
