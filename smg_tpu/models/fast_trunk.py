"""Fast eval-mode affordance forward: Pallas dense blocks + XLA stem/head.

A pure-function re-implementation of `AffordanceNet.score`'s eval branch
(models/affordance.py:132-165) that reads the Flax param/batch_stats
pytrees directly, so the trainer can swap it in for scoring and DQN
target evaluation without touching the module structure or checkpoints.
Train mode (the update's gradient pass) has its own grouped-prefix
forward with batch-BN semantics (`score_train`, plain differentiable
jnp) — see the "Train mode" section below.

Parity notes (all tolerance-tested against `model.apply` in
tests/test_fast_trunk.py):
- dense blocks + transitions + norm5 run through the fused Pallas block
  kernel (ops/dense_block_pallas.py);
- the stem conv collapses its RGB taps to one gray tap: the trunk input
  is a triplicated depth map (affordance.preprocess_depth), so
  conv(x, W) == conv(x[..., :1], W.sum(in_axis)) exactly (up to bf16
  rounding of the summed taps);
- eval-mode BatchNorm folds to a per-channel f32 affine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smg_tpu.ops import dense_block_pallas as dbp

BLOCK_CONFIG = (6, 12, 24, 16)


def _bn(norm_p, norm_s):
    return dbp._bn_affine(norm_p, norm_s)


def _stem(tp: dict, ts: dict, x: jax.Array, conv2: str = "taps",
          interpret: bool = False) -> jax.Array:
    """conv0 (7x7 s2) -> norm0 -> relu -> maxpool 3x3 s2 (densenet.py:100-110)."""
    k0 = tp["conv0"]["kernel"]                       # (7, 7, 3, 64)
    kg = k0.sum(axis=2, keepdims=True).astype(jnp.bfloat16)
    a0, b0 = _bn(tp["norm0"], ts["norm0"])
    if conv2 in ("pk", "fl"):
        from smg_tpu.ops import stem_pool_pallas as spp

        H, W = x.shape[1] // 4, x.shape[2] // 4
        if x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0 \
                and spp.supported(H, W):
            yq = spp.quad_conv0(x[..., :1].astype(jnp.bfloat16), kg)
            return spp.bn_relu_maxpool(yq, a0, b0, interpret=interpret)
    y = jax.lax.conv_general_dilated(
        x[..., :1].astype(jnp.bfloat16), kg,
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y.astype(jnp.float32) * a0 + b0, 0.0).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(jnp.bfloat16)


def _bn_relu_slice(seg: jax.Array, a: jax.Array, b: jax.Array,
                   off: int) -> jax.Array:
    c = seg.shape[-1]
    return jnp.maximum(
        seg.astype(jnp.float32) * a[off : off + c] + b[off : off + c], 0.0
    ).astype(jnp.bfloat16)


def _dense_layer_xla(p: dict, s: dict, segs: list, conv2: str,
                     interpret: bool = False) -> jax.Array:
    """One dense layer over the segmented prefix: grouped matmuls.

    The torchvision dense layer (densenet.py DenseLayer; reference
    models.py) is BN->ReLU->1x1(128)->BN->ReLU->3x3(32). The concat
    prefix never materializes: conv1 runs as one K<=128 matmul per
    stored segment, accumulated in f32 (the same f32 accumulation a
    single K=C dot performs internally). The 3x3 either stays an XLA
    conv (conv2='conv') or packs its nine taps on the matmul N axis
    (128 -> 288 lanes) with the spatial gather as nine pad-slice adds
    (conv2='taps'). Algebraically identical, different rounding.
    """
    B, H, W = segs[0].shape[:3]
    a1, b1 = _bn(p["norm1"], s["norm1"])
    C = a1.shape[-1]
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK).astype(jnp.bfloat16)
    h1 = None
    off = 0
    multi = len(segs) > 1
    for seg in segs:
        c = seg.shape[-1]
        h = _bn_relu_slice(seg, a1, b1, off)
        # Partials round to bf16 (halving the per-group dot-output
        # traffic); each dot still accumulates its K=128 products in f32
        # on the MXU, and the cross-group sum below runs in f32.
        t = jnp.dot(
            h.reshape(-1, c), w1[off : off + c],
            preferred_element_type=jnp.bfloat16 if multi else jnp.float32,
        )
        h1 = (
            t.astype(jnp.float32) if h1 is None
            else h1 + t.astype(jnp.float32)
        )
        off += c
    a2, b2 = _bn(p["norm2"], s["norm2"])
    if conv2 == "pk":
        from smg_tpu.ops import conv2_pallas as c2p

        if c2p.supported(H, W):
            return c2p.conv2_bn_relu(
                h1.astype(jnp.bfloat16).reshape(B, H, W, dbp.BOTTLENECK),
                a2, b2, c2p.pack_w2(p["conv2"]["kernel"]),
                interpret=interpret,
            )
        conv2 = "conv"  # small/unaligned shapes: XLA's 3x3 is fine there
    h2 = jnp.maximum(h1 * a2 + b2, 0.0).astype(jnp.bfloat16)
    if conv2 == "conv":
        return jax.lax.conv_general_dilated(
            h2.reshape(B, H, W, dbp.BOTTLENECK),
            p["conv2"]["kernel"].astype(jnp.bfloat16),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if conv2 == "s2d":
        # Space-to-depth on the output: compute 4 horizontally adjacent
        # pixels' 32 channels as one 128-lane conv position. The (3, 6)
        # kernel K'[dy, dx', :, 32p + co] = w2[dy, dx' - p, :, co]
        # (zero outside dx' - p in [0, 3)) at stride (1, 4), pad (1, 1),
        # reproduces out[h, 4g + p] = conv3x3(h2)[h, 4g + p] exactly:
        # 2x the MACs, but full MXU N-occupancy instead of 32/128.
        w = p["conv2"]["kernel"].astype(jnp.bfloat16)   # (3, 3, 128, 32)
        kp = jnp.zeros((3, 6, dbp.BOTTLENECK, 4 * dbp.GROWTH), jnp.bfloat16)
        for ph in range(4):
            kp = kp.at[:, ph : ph + 3, :,
                       dbp.GROWTH * ph : dbp.GROWTH * (ph + 1)].set(w)
        out = jax.lax.conv_general_dilated(
            h2.reshape(B, H, W, dbp.BOTTLENECK), kp,
            window_strides=(1, 4), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(B, H, W, dbp.GROWTH)
    # (3, 3, 128, 32) -> (128, 9*32): tap t = 3*dy + dx at cols [32t, 32t+32)
    w2 = (
        p["conv2"]["kernel"].transpose(2, 0, 1, 3)
        .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
        .astype(jnp.bfloat16)
    )
    part = jnp.dot(
        h2, w2, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).reshape(B, H, W, dbp.N_TAPS, dbp.GROWTH)
    partp = jnp.pad(part, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((B, H, W, dbp.GROWTH), jnp.float32)
    for tap in range(dbp.N_TAPS):
        dy, dx = divmod(tap, 3)
        acc = acc + partp[:, dy : dy + H, dx : dx + W, tap, :].astype(
            jnp.float32
        )
    return acc.astype(jnp.bfloat16)


GROUP = 128  # MXU contraction width: completed segments are regrouped to this


def _dense_bottleneck(p: dict, s: dict, pieces: list, pend_n: int):
    """BN -> ReLU -> 1x1(128) over the grouped prefix: one K<=128 dot
    per 128-channel group, f32-accumulated. The last piece may be a
    zero-padded group buffer with `pend_n` valid lanes (pend_n = 0:
    fully valid): its BN affine and w1 rows are zero-padded, so the
    invalid lanes pass relu(0*0+0) = 0 through zero weights — exact."""
    a1, b1 = _bn(p["norm1"], s["norm1"])
    C = a1.shape[-1]
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK).astype(jnp.bfloat16)
    h1 = None
    off = 0
    multi = len(pieces) > 1
    for i, seg in enumerate(pieces):
        c = seg.shape[-1]
        valid = pend_n if (pend_n and i == len(pieces) - 1) else c
        a = a1[off : off + valid]
        b = b1[off : off + valid]
        w = w1[off : off + valid]
        if valid < c:
            a = jnp.pad(a, (0, c - valid))
            b = jnp.pad(b, (0, c - valid))
            w = jnp.pad(w, ((0, c - valid), (0, 0)))
        h = jnp.maximum(
            seg.astype(jnp.float32) * a + b, 0.0
        ).astype(jnp.bfloat16)
        # bf16 partials halve the per-group dot-output traffic; each
        # dot still accumulates its K=128 products in f32 on the MXU,
        # and the cross-group sum below runs in f32.
        t = jnp.dot(
            h.reshape(-1, c), w,
            preferred_element_type=jnp.bfloat16 if multi else jnp.float32,
        )
        h1 = (
            t.astype(jnp.float32) if h1 is None
            else h1 + t.astype(jnp.float32)
        )
        off += valid
    return h1


def _dense_block_pk_merge(bp: dict, bs: dict, segs: list, names: list,
                          interpret: bool) -> list:
    """Dense block via the merge conv2 kernel: each layer's 32 channels
    land directly in the 128-lane pending group buffer in-kernel, so the
    pending concat never materializes in XLA (4.3 ms/call at 640)."""
    from smg_tpu.ops import conv2_pallas as c2p

    segs = list(segs)
    B, H, W = segs[0].shape[:3]
    pend_n = segs[-1].shape[-1] % GROUP
    if pend_n:
        tail = segs.pop()
        pend = jnp.pad(tail, ((0, 0),) * 3 + ((0, GROUP - pend_n),))
    else:
        pend = None
    for n in names:
        p, s = bp[n], bs[n]
        pieces = segs + ([pend] if pend is not None else [])
        h1 = _dense_bottleneck(p, s, pieces, pend_n)
        a2, b2 = _bn(p["norm2"], s["norm2"])
        out = c2p.conv2_bn_relu_merge(
            h1.astype(jnp.bfloat16).reshape(B, H, W, dbp.BOTTLENECK),
            pend, a2, b2, c2p.pack_w2(p["conv2"]["kernel"]), pend_n,
            interpret=interpret,
        )
        pend_n += dbp.GROWTH
        if pend_n == GROUP:
            segs.append(out)
            pend, pend_n = None, 0
        else:
            pend = out
    assert pend is None, "block channel count must end GROUP-aligned"
    return segs


def _dense_block_xla_segs(bp: dict, bs: dict, segs: list, conv2: str,
                          interpret: bool = False) -> list:
    """Run a dense block over a segmented feature prefix; returns segments.

    The prefix is kept as a list of completed GROUP-channel tensors plus
    a <=96-channel pending tail; each layer's 32-channel output folds
    into the tail with one small concat, so total concat-copy traffic is
    O(C_final) for the whole block instead of the O(L * C) a rolling
    full-prefix concat costs — the profiled XLA eval trunk spent 43% of
    device time in concatenate.
    """
    names = sorted(bp, key=lambda n: int(n.removeprefix("denselayer")))
    if conv2 == "fl":
        from smg_tpu.ops import dense_layer_pallas as dlp

        H, W = segs[0].shape[1:3]
        C_max = sum(s.shape[-1] for s in segs) + dbp.GROWTH * (len(names) - 1)
        if dlp.supported(H, W, -(-C_max // GROUP)):
            return dlp.dense_block_fused(
                bp, bs, list(segs), names, interpret=interpret
            )
        conv2 = "pk"
    if conv2 == "pk":
        from smg_tpu.ops import conv2_pallas as c2p

        H, W = segs[0].shape[1:3]
        if c2p.merge_supported(H, W):
            return _dense_block_pk_merge(bp, bs, segs, names, interpret)
    segs = list(segs)
    pend_c = segs[-1].shape[-1] % GROUP
    for n in names:
        new = _dense_layer_xla(bp[n], bs[n], segs, conv2, interpret)
        if pend_c == 0:
            segs.append(new)
        else:
            segs[-1] = jnp.concatenate([segs[-1], new], axis=-1)
        pend_c = (pend_c + dbp.GROWTH) % GROUP
    return segs


def _transition_xla(tp: dict, ts: dict, segs: list, conv2: str = "taps",
                    interpret: bool = False) -> list:
    """BN -> ReLU -> avgpool2 -> 1x1, per segment with f32 accumulation
    (pool commuted before the linear 1x1: exact, and it quarters the
    matmul rows). On the pk backend the whole transition runs as one
    fused Pallas kernel (ops/transition_pallas.py) when the shape
    allows."""
    a, b = _bn(tp["norm"], ts["norm"])
    C = a.shape[-1]
    k = tp["conv"]["kernel"]
    kf = k.reshape(C, k.shape[3]).astype(jnp.bfloat16)
    if (
        conv2 in ("pk", "fl")
        and all(s.shape[-1] == GROUP for s in segs)
    ):
        from smg_tpu.ops import transition_pallas as trp

        B, H, W = segs[0].shape[:3]
        if trp.supported(len(segs), H, W, k.shape[3]):
            out = trp.transition(
                tuple(segs), a, b, kf, interpret=interpret
            )
            return [
                out[..., o : o + GROUP]
                for o in range(0, k.shape[3], GROUP)
            ]
    out = None
    off = 0
    for seg in segs:
        c = seg.shape[-1]
        h = _bn_relu_slice(seg, a, b, off)
        B, H, W = h.shape[:3]
        # dtype=f32 keeps the 2x2 mean's accumulation exact without
        # materializing an f32 copy of the block output first.
        h = jnp.mean(
            h.reshape(B, H // 2, 2, W // 2, 2, c), axis=(2, 4),
            dtype=jnp.float32,
        ).astype(jnp.bfloat16)
        t = jnp.dot(
            h.reshape(-1, c), kf[off : off + c],
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
        off += c
    out = out.astype(jnp.bfloat16).reshape(B, H // 2, W // 2, k.shape[3])
    return [out[..., o : o + GROUP] for o in range(0, k.shape[3], GROUP)]


def default_backend() -> str:
    """Trace-time choice: fully-fused dense layers on TPU, XLA elsewhere.

    Measured at the 640/17 parity shape on one v5e (logs/tpu_queue_r3):
    xla_fl 20.6 ms vs xla_pk 27.1 ms vs Flax apply 47.2 ms; at 224/65
    xla_fl 12.0 ms vs xla_pk 13.4 ms vs 22.3 ms.
    """
    return "xla_fl" if jax.default_backend() == "tpu" else "xla_conv"


def trunk_features_eval(
    tp: dict, ts: dict, x: jax.Array,
    *, interpret: bool = False, taps_packed: bool = True,
    backend: str | None = None,
) -> jax.Array:
    """DenseNet-121 `.features` eval forward: (B, S, S, 3) -> (B, S/32, S/32, 1024).

    tp/ts: one trunk's params/batch_stats subtree (densenet.DenseNetTrunk).
    backend None resolves via `default_backend()`: 'xla_pk' (fastest
    measured on TPU) = grouped-prefix blocks with the fused
    BN->ReLU->3x3 Pallas conv2 (ops/conv2_pallas.py, XLA-conv fallback
    on unaligned shapes); 'xla_fl': whole dense layers fused in one
    Pallas kernel each (ops/dense_layer_pallas.py — bottleneck dots in
    VMEM, h1 never touches HBM); 'xla_conv': XLA 3x3 for conv2; 'xla':
    packed-taps matmul lowering of conv2 (works on any backend);
    'xla_s2d': space-to-depth packed conv2; 'pallas': the fused
    dense-block kernel (TPU only).
    """
    if backend is None:
        backend = default_backend()
    conv2 = {"xla_conv": "conv", "xla_s2d": "s2d",
             "xla_pk": "pk", "xla_fl": "fl"}.get(backend, "taps")
    y = _stem(tp, ts, x, conv2, interpret)
    if backend.startswith("xla"):
        segs = [y]
        for i in range(len(BLOCK_CONFIG)):
            segs = _dense_block_xla_segs(
                tp[f"denseblock{i+1}"], ts[f"denseblock{i+1}"], segs, conv2,
                interpret,
            )
            if i < len(BLOCK_CONFIG) - 1:
                segs = _transition_xla(
                    tp[f"transition{i+1}"], ts[f"transition{i+1}"], segs,
                    conv2, interpret,
                )
        a, b = _bn(tp["norm5"], ts["norm5"])
        off, outs = 0, []
        for seg in segs:
            c = seg.shape[-1]
            outs.append(
                (seg.astype(jnp.float32) * a[off : off + c]
                 + b[off : off + c]).astype(jnp.bfloat16)
            )
            off += c
        return jnp.concatenate(outs, axis=-1)
    num_features = 64
    for i, L in enumerate(BLOCK_CONFIG):
        bname = f"denseblock{i + 1}"
        packed = dbp.pack_dense_block(tp[bname], ts[bname])
        last = i == len(BLOCK_CONFIG) - 1
        Cf = num_features + 32 * L
        if last:
            ep = dbp.pack_final_bn(tp["norm5"], ts["norm5"])
            C_out, epilogue = Cf, "final_bn"
        else:
            tname = f"transition{i + 1}"
            ep = dbp.pack_transition(tp[tname], ts[tname])
            C_out, epilogue = Cf // 2, "transition"
        B, H, W = y.shape[:3]
        geom = dbp.choose_geom(H, W, num_features, L, epilogue, C_out, B)
        y = dbp.dense_block_apply(
            y, packed, ep, geom, taps_packed=taps_packed, interpret=interpret
        )
        num_features = C_out
    return y


# ---------------------------------------------------------------------------
# Train mode: grouped-prefix forward with batch BatchNorm (differentiable)
# ---------------------------------------------------------------------------
#
# The update's gradient pass ran the Flax module, whose rolling concats
# dominate device time exactly like the eval trunk's did (43% profiled)
# — and autodiff doubles them (concat backward = slices). This is the
# same no-concat restructure as the eval path, but BN computes batch
# statistics (flax.linen.BatchNorm semantics: f32 stats over (N, H, W),
# biased variance, running average ra = m*ra + (1-m)*stat, m = 0.9 =
# the torch-parity speed) and
# everything stays plain differentiable jnp. Parity + grad equivalence:
# tests/test_fast_trunk.py::test_score_train_*.

from smg_tpu.models.densenet import BN_MOMENTUM  # noqa: E402 (0.9 = torch 0.1)

BN_EPS = 1e-5


def _bn_train(xs: list, np_: dict, ns: dict):
    """Batch-BN affine over a segmented tensor: per-channel f32 stats
    from the segments (channels are disjoint, so per-segment moments are
    exact). Returns (a, b, new_running_stats)."""
    a, b, new, _, _ = _bn_train_full(xs, np_, ns)
    return a, b, new


def _bn_relu_slice_dt(seg, a, b, off, dtype):
    c = seg.shape[-1]
    return jnp.maximum(
        seg.astype(jnp.float32) * a[off : off + c] + b[off : off + c], 0.0
    ).astype(dtype)


def _dense_layer_train(p: dict, s: dict, segs: list, dtype=jnp.bfloat16,
                       conv2: str = "conv"):
    """One dense layer, batch-BN: returns (new_32ch, new_stats).

    conv2 'taps' packs the nine 3x3 taps on the matmul N axis (128 ->
    288 lanes, full MXU occupancy vs the 32-channel conv's 32/128) with
    the spatial gather as nine pad-slice adds — the differentiable
    matmul form of the eval path's packed-taps lowering. conv2 'vjp'
    runs the taps forward under the hand-written custom VJP (minimal
    residuals, hand-transposed matmuls — see the fast_train section);
    conv2 'pk' runs BOTH directions as fused per-scene Pallas kernels
    (ops/dense_layer_train_pallas.py), falling back to 'vjp' where the
    per-scene tensors exceed VMEM."""
    if conv2 == "pk":
        return _dense_layer_train_pk(p, s, segs, dtype)
    if conv2 == "vjp":
        return _dense_layer_train_vjp(p, s, segs, dtype)
    B, H, W = segs[0].shape[:3]
    a1, b1, n1 = _bn_train(segs, p["norm1"], s["norm1"])
    C = a1.shape[-1]
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK).astype(dtype)
    h1 = None
    off = 0
    for seg in segs:
        c = seg.shape[-1]
        h = _bn_relu_slice_dt(seg, a1, b1, off, dtype)
        t = jnp.dot(
            h.reshape(-1, c), w1[off : off + c],
            preferred_element_type=jnp.float32,
        )
        h1 = t if h1 is None else h1 + t
        off += c
    h1 = h1.reshape(B, H, W, dbp.BOTTLENECK)
    a2, b2, n2 = _bn_train([h1], p["norm2"], s["norm2"])
    h2 = jnp.maximum(h1 * a2 + b2, 0.0).astype(dtype)
    if conv2 == "taps":
        w2 = (
            p["conv2"]["kernel"].transpose(2, 0, 1, 3)
            .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
            .astype(dtype)
        )
        part = jnp.dot(
            h2, w2, preferred_element_type=jnp.float32
        ).astype(dtype).reshape(B, H, W, dbp.N_TAPS, dbp.GROWTH)
        partp = jnp.pad(part, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        acc = jnp.zeros((B, H, W, dbp.GROWTH), jnp.float32)
        for tap in range(dbp.N_TAPS):
            dy, dx = divmod(tap, 3)
            acc = acc + partp[
                :, dy : dy + H, dx : dx + W, tap, :
            ].astype(jnp.float32)
        return acc.astype(dtype), {"norm1": n1, "norm2": n2}
    new = jax.lax.conv_general_dilated(
        h2, p["conv2"]["kernel"].astype(dtype),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return new, {"norm1": n1, "norm2": n2}


# ---------------------------------------------------------------------------
# Hand-written VJP dense layer (fast_train)
# ---------------------------------------------------------------------------
#
# Autodiff of the train-mode dense layer saves every post-relu prefix
# activation y1_g (an (H*W, C_prefix) tensor PER LAYER — O(L^2 * growth)
# residual traffic across a block) plus h1/y2 for the conv backwards.
# This custom_vjp saves only h1 (one (H*W, 128) tensor per layer) and
# the tiny BN statistics; the backward recomputes y1/y2 elementwise from
# the layer inputs (which JAX already keeps as the VJP's primal inputs)
# and runs the matmul transposes by hand:
#   dy2   = dpart @ w2p^T        (one (HW, 288) x (288, 128) MXU call)
#   dw2p  = y2^T @ dpart         (one (128, HW) x (HW, 288) MXU call)
#   dw1_g = y1_g^T @ dh1, dx_g = relu'/BN1-bwd(dh1 @ w1_g^T)  per group
# BN-train backward is the standard biased-variance form
#   dx = a * (du - mean(du) - xhat * mean(du * xhat)).
# Numerics match _dense_layer_train(conv2='taps') exactly in the forward
# (same ops, same dtypes); grads are oracle-tested in
# tests/test_fast_trunk.py::test_score_train_parity_and_grads[vjp].

import functools as _functools


def _bn_xhat(x, mean, var):
    return (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + BN_EPS)


def _bn_bwd(du, xhat, scale, var, axes):
    """Standard train-mode BatchNorm backward (biased variance).

    du: cotangent of the BN output (pre-relu); returns (dx, dscale,
    dbias). axes: the normalization axes (all but channels)."""
    du = du.astype(jnp.float32)
    a = scale * jax.lax.rsqrt(var + BN_EPS)
    mu_du = du.mean(axis=axes, keepdims=True)
    mu_duh = (du * xhat).mean(axis=axes, keepdims=True)
    dx = a * (du - mu_du - xhat * mu_duh)
    dscale = (du * xhat).sum(axis=axes)
    dbias = du.sum(axis=axes)
    return dx, dscale, dbias


def _layer_taps_fwd(segs, p, dtype):
    """_dense_layer_train(conv2='taps') forward, returning residuals.

    segs: tuple of (B, H, W, c_g). Returns (out32, new_stats, resid)."""
    B, H, W = segs[0].shape[:3]
    a1, b1, n1, mean1, var1 = _bn_train_full(segs, p["norm1"], None)
    C = a1.shape[-1]
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK).astype(dtype)
    h1 = None
    off = 0
    for seg in segs:
        c = seg.shape[-1]
        h = _bn_relu_slice_dt(seg, a1, b1, off, dtype)
        t = jnp.dot(
            h.reshape(-1, c), w1[off : off + c],
            preferred_element_type=jnp.float32,
        )
        h1 = t if h1 is None else h1 + t
        off += c
    h1 = h1.reshape(B, H, W, dbp.BOTTLENECK)
    a2, b2, n2, mean2, var2 = _bn_train_full([h1], p["norm2"], None)
    h2 = jnp.maximum(h1 * a2 + b2, 0.0).astype(dtype)
    w2 = (
        p["conv2"]["kernel"].transpose(2, 0, 1, 3)
        .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
        .astype(dtype)
    )
    part = jnp.dot(
        h2, w2, preferred_element_type=jnp.float32
    ).astype(dtype).reshape(B, H, W, dbp.N_TAPS, dbp.GROWTH)
    partp = jnp.pad(part, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((B, H, W, dbp.GROWTH), jnp.float32)
    for tap in range(dbp.N_TAPS):
        dy, dx = divmod(tap, 3)
        acc = acc + partp[:, dy : dy + H, dx : dx + W, tap, :].astype(
            jnp.float32
        )
    out = acc.astype(dtype)
    resid = (segs, h1.astype(dtype), mean1, var1, mean2, var2)
    return out, resid


def _bn_train_full(xs, np_, ns):
    """_bn_train + the raw (mean, var) needed by the backward. ns=None
    skips the running-average update (stats returned as None)."""
    means, var2 = [], []
    for seg in xs:
        x = seg.astype(jnp.float32)
        means.append(x.mean(axis=tuple(range(x.ndim - 1))))
        var2.append((x * x).mean(axis=tuple(range(x.ndim - 1))))
    mean = jnp.concatenate(means) if len(xs) > 1 else means[0]
    m2 = jnp.concatenate(var2) if len(xs) > 1 else var2[0]
    var = m2 - mean * mean
    a = np_["scale"] * jax.lax.rsqrt(var + BN_EPS)
    b = np_["bias"] - mean * a
    new = None if ns is None else {
        "mean": BN_MOMENTUM * ns["mean"] + (1 - BN_MOMENTUM) * mean,
        "var": BN_MOMENTUM * ns["var"] + (1 - BN_MOMENTUM) * var,
    }
    return a, b, new, mean, var


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _layer_vjp(segs, p, dtype):
    """Returns (out32, (mean1, var1, mean2, var2)). The batch moments are
    auxiliary primal outputs (their cotangent is discarded: running
    averages are state, not differentiated outputs)."""
    out, resid = _layer_taps_fwd(segs, p, dtype)
    return out, resid[2:]


def _layer_vjp_fwd(segs, p, dtype):
    out, resid = _layer_taps_fwd(segs, p, dtype)
    return (out, resid[2:]), (resid, p)


def _layer_vjp_bwd(dtype, carry, cot):
    dout, _ = cot  # moment cotangents discarded (state, not output)
    (segs, h1, mean1, var1, mean2, var2), p = carry
    B, H, W = segs[0].shape[:3]
    HW = B * H * W
    scale1 = p["norm1"]["scale"]
    scale2 = p["norm2"]["scale"]
    C = scale1.shape[-1]
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK).astype(dtype)
    w2 = (
        p["conv2"]["kernel"].transpose(2, 0, 1, 3)
        .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
        .astype(dtype)
    )

    # conv2 taps backward: dpart[., tap] = dout shifted by (1-dy, 1-dx).
    doutp = jnp.pad(
        dout.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    dpart = jnp.stack(
        [
            doutp[:, 2 - dy : 2 - dy + H, 2 - dx : 2 - dx + W, :]
            for dy, dx in (divmod(t, 3) for t in range(dbp.N_TAPS))
        ],
        axis=3,
    ).reshape(HW, dbp.N_TAPS * dbp.GROWTH)

    # Recompute y2 elementwise from the saved h1.
    a2 = scale2 * jax.lax.rsqrt(var2 + BN_EPS)
    b2 = p["norm2"]["bias"] - mean2 * a2
    h1f = h1.astype(jnp.float32)
    u2 = h1f * a2 + b2
    y2 = jnp.maximum(u2, 0.0).astype(dtype).reshape(HW, dbp.BOTTLENECK)

    dy2 = jnp.dot(dpart, w2.T, preferred_element_type=jnp.float32)
    dw2 = jnp.dot(y2.T, dpart, preferred_element_type=jnp.float32)
    dw2 = (
        dw2.reshape(dbp.BOTTLENECK, dbp.N_TAPS, dbp.GROWTH)
        .transpose(1, 0, 2)
        .reshape(3, 3, dbp.BOTTLENECK, dbp.GROWTH)
    )

    du2 = jnp.where(u2 > 0, dy2.reshape(u2.shape), 0.0)
    xhat2 = _bn_xhat(h1f, mean2, var2)
    axes2 = tuple(range(h1f.ndim - 1))
    dh1, dscale2, dbias2 = _bn_bwd(du2, xhat2, scale2, var2, axes2)
    dh1 = dh1.astype(dtype).reshape(HW, dbp.BOTTLENECK)

    a1 = scale1 * jax.lax.rsqrt(var1 + BN_EPS)
    b1 = p["norm1"]["bias"] - mean1 * a1
    dsegs, dw1s, dscale1s, dbias1s = [], [], [], []
    off = 0
    for seg in segs:
        c = seg.shape[-1]
        segf = seg.astype(jnp.float32)
        u1 = segf * a1[off : off + c] + b1[off : off + c]
        y1 = jnp.maximum(u1, 0.0).astype(dtype).reshape(HW, c)
        dw1s.append(jnp.dot(y1.T, dh1, preferred_element_type=jnp.float32))
        dy1 = jnp.dot(
            dh1, w1[off : off + c].T, preferred_element_type=jnp.float32
        ).reshape(u1.shape)
        du1 = jnp.where(u1 > 0, dy1, 0.0)
        xhat1 = _bn_xhat(segf, mean1[off : off + c], var1[off : off + c])
        axes1 = tuple(range(segf.ndim - 1))
        dx, dsc, dbi = _bn_bwd(
            du1, xhat1, scale1[off : off + c], var1[off : off + c], axes1
        )
        dsegs.append(dx.astype(seg.dtype))
        dscale1s.append(dsc)
        dbias1s.append(dbi)
        off += c

    dp = {
        "norm1": {"scale": jnp.concatenate(dscale1s) if len(segs) > 1
                  else dscale1s[0],
                  "bias": jnp.concatenate(dbias1s) if len(segs) > 1
                  else dbias1s[0]},
        "conv1": {"kernel": jnp.concatenate(dw1s, axis=0).reshape(
            p["conv1"]["kernel"].shape
        )},
        "norm2": {"scale": dscale2, "bias": dbias2},
        "conv2": {"kernel": dw2.astype(p["conv2"]["kernel"].dtype)},
    }
    return tuple(dsegs), dp


_layer_vjp.defvjp(_layer_vjp_fwd, _layer_vjp_bwd)


def _dense_layer_train_vjp(p: dict, s: dict, segs: list, dtype):
    """conv2='vjp': the taps forward under the hand-written VJP; the
    running-average update is plain arithmetic on the returned moments
    (stop_gradient'd — state, not a differentiated output)."""
    out, (mean1, var1, mean2, var2) = _layer_vjp(tuple(segs), p, dtype)
    ra = lambda ns, mean, var: {
        "mean": BN_MOMENTUM * ns["mean"]
        + (1 - BN_MOMENTUM) * jax.lax.stop_gradient(mean),
        "var": BN_MOMENTUM * ns["var"]
        + (1 - BN_MOMENTUM) * jax.lax.stop_gradient(var),
    }
    return out, {"norm1": ra(s["norm1"], mean1, var1),
                 "norm2": ra(s["norm2"], mean2, var2)}


# ---------------------------------------------------------------------------
# Pallas-kernel dense layer (fast_train conv2='pk')
# ---------------------------------------------------------------------------
#
# The jnp VJP above saved residual traffic but paid for its elementwise
# y1/y2/xhat recomputes in HBM round-trips (411.8 vs autodiff-conv's
# 204.2 ms at batch 32, round-4 AOT matrix). The 'pk' mode runs the same
# minimal-residual scheme with the whole per-scene layer fused in VMEM:
# forward and backward are one Pallas kernel each
# (ops/dense_layer_train_pallas.py), vmap over the scene chunk lifts
# them onto the Pallas grid. Numerics: identical op/rounding structure,
# except h1 is rounded to the compute dtype once at the residual point
# (the kernel's stats/conv2 then read the rounded h1 — in bf16 this is
# a sub-rounding-error divergence from the jnp forward, and makes the
# forward and backward MORE consistent with each other).


def _pk_interpret() -> bool:
    return jax.default_backend() != "tpu"


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _layer_vjp_pk(segs, p, dtype):
    out, _h1, m1, v1, m2, v2 = _pk_fwd_call(segs, p, dtype)
    return out, (m1, v1, m2, v2)


def _pk_fwd_call(segs, p, dtype):
    from smg_tpu.ops import dense_layer_train_pallas as dtp

    C = sum(s.shape[-1] for s in segs)
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK)
    w2p = (
        p["conv2"]["kernel"].transpose(2, 0, 1, 3)
        .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
    )
    return dtp.layer_train_fwd(
        tuple(s.astype(dtype) for s in segs), w1,
        p["norm1"]["scale"], p["norm1"]["bias"], w2p,
        p["norm2"]["scale"], p["norm2"]["bias"],
        interpret=_pk_interpret(),
    )


def _layer_vjp_pk_fwd(segs, p, dtype):
    out, h1, m1, v1, m2, v2 = _pk_fwd_call(segs, p, dtype)
    return (out, (m1, v1, m2, v2)), ((segs, h1, m1, v1, m2, v2), p)


def _layer_vjp_pk_bwd(dtype, carry, cot):
    from smg_tpu.ops import dense_layer_train_pallas as dtp

    dout, _ = cot  # moment cotangents discarded (state, not output)
    (segs, h1, m1, v1, m2, v2), p = carry
    C = sum(s.shape[-1] for s in segs)
    w1 = p["conv1"]["kernel"].reshape(C, dbp.BOTTLENECK)
    w2p = (
        p["conv2"]["kernel"].transpose(2, 0, 1, 3)
        .reshape(dbp.BOTTLENECK, dbp.N_TAPS * dbp.GROWTH)
    )
    dsegs, dw1, dw2p, ds1, db1, ds2, db2 = dtp.layer_train_bwd(
        tuple(s.astype(dtype) for s in segs), dout, h1, w1, w2p,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        m1, v1, m2, v2, interpret=_pk_interpret(),
    )
    dw2 = (
        dw2p.reshape(dbp.BOTTLENECK, dbp.N_TAPS, dbp.GROWTH)
        .transpose(1, 0, 2)
        .reshape(3, 3, dbp.BOTTLENECK, dbp.GROWTH)
    )
    dp = {
        "norm1": {"scale": ds1, "bias": db1},
        "conv1": {"kernel": dw1.reshape(p["conv1"]["kernel"].shape)},
        "norm2": {"scale": ds2, "bias": db2},
        "conv2": {"kernel": dw2.astype(p["conv2"]["kernel"].dtype)},
    }
    return tuple(d.astype(s.dtype) for d, s in zip(dsegs, segs)), dp


_layer_vjp_pk.defvjp(_layer_vjp_pk_fwd, _layer_vjp_pk_bwd)


def _dense_layer_train_pk(p: dict, s: dict, segs: list, dtype):
    """conv2='pk': the fused Pallas kernels under the custom VJP; the
    running-average update is plain arithmetic on the returned moments."""
    from smg_tpu.ops import dense_layer_train_pallas as dtp

    B, H, W = segs[0].shape[:3]
    C = sum(x.shape[-1] for x in segs)
    if not dtp.supported(B, H, W, C):
        # Over-VMEM shapes (block 1's 56x56 maps at 224): XLA autodiff of
        # the conv form — the best measured non-Pallas mode (204.2 ms
        # whole-trunk vs the jnp VJP's 411.8, r4 AOT matrix) — NOT the
        # vjp path, whose elementwise HBM recomputes are worst exactly
        # on the largest feature maps.
        return _dense_layer_train(p, s, segs, dtype, "conv")
    out, (mean1, var1, mean2, var2) = _layer_vjp_pk(tuple(segs), p, dtype)
    ra = lambda ns, mean, var: {
        "mean": BN_MOMENTUM * ns["mean"]
        + (1 - BN_MOMENTUM) * jax.lax.stop_gradient(mean),
        "var": BN_MOMENTUM * ns["var"]
        + (1 - BN_MOMENTUM) * jax.lax.stop_gradient(var),
    }
    return out, {"norm1": ra(s["norm1"], mean1, var1),
                 "norm2": ra(s["norm2"], mean2, var2)}


def trunk_features_train(tp: dict, ts: dict, x: jax.Array,
                         dtype=jnp.bfloat16, conv2: str = "conv"):
    """DenseNet-121 `.features` train-mode forward (batch BN), grouped
    prefix: (B, S, S, 3) -> ((B, S/32, S/32, 1024), new_batch_stats)."""
    new_ts: dict = {}
    k0 = tp["conv0"]["kernel"]
    kg = k0.sum(axis=2, keepdims=True).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x[..., :1].astype(dtype), kg,
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a0, b0, new_ts["norm0"] = _bn_train([y], tp["norm0"], ts["norm0"])
    y = jnp.maximum(
        y.astype(jnp.float32) * a0 + b0, 0.0
    ).astype(dtype)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(dtype)
    segs = [y]
    for i in range(len(BLOCK_CONFIG)):
        bname = f"denseblock{i + 1}"
        bp, bs = tp[bname], ts[bname]
        names = sorted(bp, key=lambda n: int(n.removeprefix("denselayer")))
        bstats: dict = {}
        pend_c = segs[-1].shape[-1] % GROUP
        for n in names:
            new, bstats[n] = _dense_layer_train(
                bp[n], bs[n], segs, dtype, conv2
            )
            new = new.astype(dtype)
            if pend_c == 0:
                segs.append(new)
            else:
                segs[-1] = jnp.concatenate([segs[-1], new], axis=-1)
            pend_c = (pend_c + dbp.GROWTH) % GROUP
        new_ts[bname] = bstats
        if i < len(BLOCK_CONFIG) - 1:
            tname = f"transition{i + 1}"
            av, bv, nstat = _bn_train(
                segs, tp[tname]["norm"], ts[tname]["norm"]
            )
            new_ts[tname] = {"norm": nstat}
            C = av.shape[-1]
            k = tp[tname]["conv"]["kernel"]
            kf = k.reshape(C, k.shape[3]).astype(dtype)
            out = None
            off = 0
            for seg in segs:
                c = seg.shape[-1]
                h = _bn_relu_slice_dt(seg, av, bv, off, dtype)
                B, H, W = h.shape[:3]
                h = jnp.mean(
                    h.reshape(B, H // 2, 2, W // 2, 2, c), axis=(2, 4),
                    dtype=jnp.float32,
                ).astype(dtype)
                t = jnp.dot(
                    h.reshape(-1, c), kf[off : off + c],
                    preferred_element_type=jnp.float32,
                )
                out = t if out is None else out + t
                off += c
            out = out.astype(dtype).reshape(
                B, H // 2, W // 2, k.shape[3]
            )
            segs = [
                out[..., o : o + GROUP] for o in range(0, k.shape[3], GROUP)
            ]
    a5, b5, new_ts["norm5"] = _bn_train(segs, tp["norm5"], ts["norm5"])
    off, outs = 0, []
    for seg in segs:
        c = seg.shape[-1]
        outs.append(
            (seg.astype(jnp.float32) * a5[off : off + c]
             + b5[off : off + c]).astype(dtype)
        )
        off += c
    return jnp.concatenate(outs, axis=-1), new_ts


def head_train(hp: dict, hs: dict, x: jax.Array, num_out: int,
               dtype=jnp.bfloat16):
    """AffordanceHead train-mode forward: returns (out, new_stats)."""
    a0, b0, n0 = _bn_train([x], hp["norm0"], hs["norm0"])
    h = jnp.maximum(x.astype(jnp.float32) * a0 + b0, 0.0).astype(dtype)
    k0 = hp["conv0"]["kernel"]
    h = jnp.dot(
        h.reshape(-1, k0.shape[2]),
        k0.reshape(k0.shape[2], 64).astype(dtype),
        preferred_element_type=jnp.float32,
    ).reshape(x.shape[:3] + (64,))
    a1, b1, n1 = _bn_train([h], hp["norm1"], hs["norm1"])
    h = jnp.maximum(h * a1 + b1, 0.0).astype(dtype)
    k1 = hp["conv1"]["kernel"]
    B = x.shape[0]
    out = jnp.dot(
        h.reshape(B, -1), k1.reshape(-1, num_out).astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.float32), {"norm0": n0, "norm1": n1}


def score_train(
    params: dict, stats: dict, scene_img: jax.Array, mask_imgs: jax.Array,
    num_out: int,
    *, trunk_key: str = "grasp_trunk", head_key: str = "grasp_head",
    dtype=jnp.bfloat16, conv2: str = "conv",
):
    """Train-mode AffordanceNet.score (affordance.py:141-149): two
    separate trunk passes (the reference's per-stream BN statistics),
    head on the 2048-channel concat. Returns (scores (B, M, num_out),
    {"grasp_trunk": new_stats, "grasp_head": new_stats}) — the same
    contract as model.apply(..., mutable=['batch_stats']).

    The scene pass's running-average update feeds the mask pass's, so
    the returned stats match Flax's sequential-call semantics.
    """
    B, M = mask_imgs.shape[0], mask_imgs.shape[1]
    mask_flat = mask_imgs.reshape((B * M,) + mask_imgs.shape[2:])
    tp, ts = params[trunk_key], stats[trunk_key]
    scene_feat, ts1 = trunk_features_train(tp, ts, scene_img, dtype, conv2)
    mask_feat, ts2 = trunk_features_train(tp, ts1, mask_flat, dtype, conv2)
    h, w, c = scene_feat.shape[1:]
    scene_rep = jnp.broadcast_to(
        scene_feat[:, None], (B, M, h, w, c)
    ).reshape(B * M, h, w, c)
    both = jnp.concatenate(
        [scene_rep, mask_feat.astype(scene_rep.dtype)], axis=-1
    )
    out, hs_new = head_train(
        params[head_key], stats[head_key], both, num_out, dtype
    )
    return out.reshape(B, M, num_out), {
        trunk_key: ts2, head_key: hs_new
    }


def head_eval(hp: dict, hs: dict, x: jax.Array, num_out: int) -> jax.Array:
    """AffordanceHead eval forward (affordance.py:70-99): (B, h, w, 2048) -> (B, num_out)."""
    a0, b0 = _bn(hp["norm0"], hs["norm0"])
    h = jnp.maximum(x.astype(jnp.float32) * a0 + b0, 0.0).astype(jnp.bfloat16)
    k0 = hp["conv0"]["kernel"]                        # (1, 1, 2048, 64)
    h = jnp.dot(
        h.reshape(-1, k0.shape[2]), k0.reshape(k0.shape[2], 64).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    a1, b1 = _bn(hp["norm1"], hs["norm1"])
    h = jnp.maximum(h * a1 + b1, 0.0).astype(jnp.bfloat16)
    k1 = hp["conv1"]["kernel"]                        # (fh, fw, 64, num_out)
    B = x.shape[0]
    out = jnp.dot(
        h.reshape(B, -1), k1.reshape(-1, num_out).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.float32)


def score_eval(
    params: dict, stats: dict, scene_img: jax.Array, mask_imgs: jax.Array,
    num_out: int,
    *, trunk_key: str = "grasp_trunk", head_key: str = "grasp_head",
    interpret: bool = False, backend: str | None = None,
) -> jax.Array:
    """Eval-mode AffordanceNet.score (affordance.py:132-165): one merged
    trunk call over the scene + masked streams, scene features broadcast
    across the M object slots, head on the 2048-channel concat.

    Returns (B, M, num_out) float32.
    """
    B, M = mask_imgs.shape[0], mask_imgs.shape[1]
    mask_flat = mask_imgs.reshape((B * M,) + mask_imgs.shape[2:])
    feats = trunk_features_eval(
        params[trunk_key], stats[trunk_key],
        jnp.concatenate([scene_img, mask_flat], axis=0),
        interpret=interpret, backend=backend,
    )
    scene_feat, mask_feat = feats[:B], feats[B:]
    h, w, c = scene_feat.shape[1:]
    scene_rep = jnp.broadcast_to(
        scene_feat[:, None], (B, M, h, w, c)
    ).reshape(B * M, h, w, c)
    both = jnp.concatenate(
        [scene_rep, mask_feat.astype(scene_rep.dtype)], axis=-1
    )
    out = head_eval(params[head_key], stats[head_key], both, num_out)
    return out.reshape(B, M, num_out)
