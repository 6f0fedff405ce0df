"""Compile + run the train-mode dense-layer kernels on the real chip.

Interpret tests cannot catch Mosaic lowering failures; run this before
benching fast_train conv2='pk'. Exercises layer_train_fwd/bwd directly
at each 224-training block shape (per-scene B=1, the trainer's vmap
unit), then one vmapped grad call (the trainer's chunk structure).
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

from smg_tpu.models import fast_trunk
from smg_tpu.ops import dense_layer_train_pallas as dtp


def run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        for leaf in leaves[:3]:
            float(jnp.asarray(leaf).ravel()[0])  # forced readback
        ok = all(
            bool(jnp.isfinite(x.astype(jnp.float32)).all()) for x in leaves
        )
        print(f"{name:<40} ok={ok}  {time.time() - t0:6.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"{name:<40} FAILED after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        traceback.print_exc(limit=3)


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    # (H, W, cs): the 224-training block shapes (56/28/14/7) at
    # representative prefix widths, per-scene B=1.
    cases = [
        (56, 56, (64,)),             # block1 entry
        (56, 56, (128, 96)),         # block1 deepest prefix
        (28, 28, (128, 128, 64)),    # block2 mid
        (14, 14, (128,) * 7 + (96,)),  # block3 deep prefix
        (7, 7, (128,) * 8),          # block4 deepest
    ]
    for H, W, cs in cases:
        C = sum(cs)
        ks = jax.random.split(key, len(cs) + 2)
        segs = tuple(
            jax.random.normal(ks[i], (1, H, W, c), jnp.float32).astype(
                jnp.bfloat16
            )
            for i, c in enumerate(cs)
        )
        w1 = jnp.full((C, 128), 0.01, jnp.bfloat16)
        s1 = jnp.ones((C,))
        b1 = jnp.zeros((C,))
        w2p = jnp.full((128, 288), 0.01, jnp.bfloat16)
        s2 = jnp.ones((128,))
        b2 = jnp.zeros((128,))
        name = f"fwd {H}x{W} C={C}"
        run(name, lambda: dtp.layer_train_fwd(
            segs, w1, s1, b1, w2p, s2, b2
        ))

        def bwd_case(segs=segs, w1=w1, s1=s1, b1=b1, w2p=w2p, s2=s2, b2=b2,
                     H=H, W=W):
            # fwd inside the protected call: a fwd lowering failure must
            # not kill the remaining cases (it did on 2026-08-20).
            _, h1, m1, v1, m2, v2 = dtp.layer_train_fwd(
                segs, w1, s1, b1, w2p, s2, b2
            )
            dout = jnp.ones((1, H, W, 32), jnp.bfloat16)
            return dtp.layer_train_bwd(
                segs, dout, h1, w1, w2p, s1, b1, s2, b2, m1, v1, m2, v2
            )

        run(f"bwd {H}x{W} C={C}", bwd_case)

    # The trainer's structure: vmap over a scene chunk of grad-carrying
    # per-scene layers (custom VJP -> both kernels inside one program).
    # Two shapes: a mid-block one, and block3's deep prefix — the
    # lane-unaligned C=992 whose vmapped per-scene moment vectors broke
    # Mosaic's block rules on 2026-08-20 (update_modes pk crash).
    for H, cs in ((28, (128, 128, 64)), (14, (128,) * 7 + (96,))):
        W = H
        C = sum(cs)
        kp, kx = jax.random.split(key)
        p = {
            "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
            "conv1": {"kernel": jax.random.normal(kp, (1, 1, C, 128)) * 0.05},
            "norm2": {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))},
            "conv2": {"kernel": jax.random.normal(kx, (3, 3, 128, 32)) * 0.05},
        }
        xs = tuple(
            jax.random.normal(
                jax.random.fold_in(kx, i), (8, 1, H, W, c), jnp.float32
            ).astype(jnp.bfloat16)
            for i, c in enumerate(cs)
        )

        def loss(p_, xs=xs):
            def one(*segs1):
                out, _ = fast_trunk._layer_vjp_pk(segs1, p_, jnp.bfloat16)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jnp.sum(jax.vmap(one)(*xs))

        run(f"vmap(8) grad {H}x{W} C={C}",
            lambda loss=loss: jax.jit(jax.grad(loss))(p))


if __name__ == "__main__":
    main()
