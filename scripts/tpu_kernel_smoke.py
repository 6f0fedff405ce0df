"""Compile + run every new Pallas kernel at its production shapes.

Interpret-mode tests cannot catch Mosaic lowering/layout failures; this
is the first thing to run on a live chip after kernel work. Prints one
line per case with wall time; raises on the first numerical blow-up
(NaN/inf) but keeps going past per-case compile errors.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.ops import conv2_pallas as c2p
from smg_tpu.ops import dense_layer_pallas as dlp


def run(name, fn):
    t0 = time.time()
    try:
        out = jax.block_until_ready(fn())
        ok = bool(jnp.isfinite(out.astype(jnp.float32)).all())
        print(f"{name:<44} ok={ok}  {time.time() - t0:6.1f}s "
              f"out={tuple(out.shape)}")
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"{name:<44} FAILED after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:200]}")
        traceback.print_exc(limit=3)


def main() -> None:
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    B = 18  # 640-parity stream count (1 scene + 17 masks)

    # Single-layer fused kernel at each 640 block shape (banded on 1-2).
    for H, W, G, pend in ((160, 160, 2, 64), (80, 80, 4, 0),
                          (40, 40, 8, 96), (20, 24, 8, 32)):
        ks = jax.random.split(key, G + 1)
        pieces = tuple(
            jax.random.normal(ks[g], (B, H, W, 128), jnp.bfloat16)
            for g in range(G)
        )
        C = 128 * (G - 1) + (pend if pend else 128)
        a1 = jnp.ones((G * 128,))
        b1 = jnp.zeros((G * 128,))
        w1 = jnp.full((G * 128, 128), 0.01, jnp.bfloat16)
        a2 = jnp.ones((128,))
        b2 = jnp.zeros((128,))
        w2 = jnp.full((128, 288), 0.01, jnp.bfloat16)
        run(
            f"dense_layer_fused {H}x{W} G={G} pend={pend}",
            lambda p=pieces, a=a1, b=b1, w=w1, a2=a2, b2=b2, w2=w2,
            pn=pend, wi=W: dlp.dense_layer_fused(
                p, a, b, w, a2, b2, w2, pend_n=pn, Wi=wi
            ),
        )

    # Multi-layer (K = 4) at the shapes the block wrapper K-fuses.
    for H, W, Gc in ((160, 160, 1), (80, 80, 3), (40, 40, 7), (20, 24, 7)):
        ks = jax.random.split(jax.random.PRNGKey(H), Gc)
        pieces = tuple(
            jax.random.normal(ks[g], (B, H, W, 128), jnp.bfloat16)
            for g in range(Gc)
        )
        CT = (Gc + 1) * 128
        ops = (
            jnp.ones((4, CT)), jnp.zeros((4, CT)),
            jnp.full((4, CT, 128), 0.01, jnp.bfloat16),
            jnp.ones((4, 128)), jnp.zeros((4, 128)),
            jnp.full((4, 128, 288), 0.01, jnp.bfloat16),
        )
        run(
            f"dense_layers_fused K=4 {H}x{W} Gc={Gc} "
            f"(ty={dlp._pick_ty_multi(H, W, Gc, 4)})",
            lambda p=pieces, o=ops, wi=W: dlp.dense_layers_fused(
                p, *o, pend_n=0, Wi=wi
            ),
        )

    # 224 shapes (the training hot path).
    for H, W, Gc in ((56, 56, 1), (28, 32, 3), (14, 16, 7), (7, 8, 7)):
        ks = jax.random.split(jax.random.PRNGKey(W), Gc)
        pieces = tuple(
            jax.random.normal(ks[g], (66, H, W, 128), jnp.bfloat16)
            for g in range(Gc)
        )
        CT = (Gc + 1) * 128
        ops = (
            jnp.ones((4, CT)), jnp.zeros((4, CT)),
            jnp.full((4, CT, 128), 0.01, jnp.bfloat16),
            jnp.ones((4, 128)), jnp.zeros((4, 128)),
            jnp.full((4, 128, 288), 0.01, jnp.bfloat16),
        )
        wi = {32: 28, 16: 14, 8: 7}.get(W, W)
        run(
            f"dense_layers_fused K=4 {H}x{W} Gc={Gc} b66",
            lambda p=pieces, o=ops, wi=wi: dlp.dense_layers_fused(
                p, *o, pend_n=0, Wi=wi
            ),
        )

    # Round-2 kernels still on the default path (merge conv2).
    h1 = jax.random.normal(key, (B, 160, 160, 128), jnp.bfloat16)
    run(
        "conv2_bn_relu_merge 160x160",
        lambda: c2p.conv2_bn_relu_merge(
            h1, None, jnp.ones((128,)), jnp.zeros((128,)),
            jnp.full((128, 288), 0.01, jnp.bfloat16), 0,
        ),
    )


if __name__ == "__main__":
    main()
