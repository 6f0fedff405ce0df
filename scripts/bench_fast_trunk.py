"""Microbench: Flax/XLA eval trunk vs the Pallas fast path on the TPU.

Usage: python scripts/bench_fast_trunk.py [input_size] [streams]

Times AffordanceNet.score (eval) both ways on identical inputs; FLOPs
come from the XLA path's compiled cost analysis (the math is identical,
so one count serves both MFU numbers). Also checks output parity.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.models import affordance as aff
from smg_tpu.models import fast_trunk
from smg_tpu.models.affordance import AffordanceNet, ModelConfig

PEAK = 197e12  # v5e bf16


def timeit(fn, *args, n=5, warmup=2):
    from smg_tpu.utils import profiling

    for _ in range(warmup):
        out = fn(*args)
    profiling.readback(out)  # block_until_ready returns early on axon
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    profiling.readback(out)
    return (time.perf_counter() - t0) / n, out


def bench_blocks(size: int, streams: int, chunk_ovr: int = 0,
                 btile_ovr: int = 0, only: int = 0):
    """Time each dense-block kernel separately on synthetic inputs."""
    import dataclasses

    import numpy as np
    from flax import linen as nn
    from smg_tpu.models.densenet import DenseNetTrunk
    from smg_tpu.ops import dense_block_pallas as dbp

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    trunk = DenseNetTrunk()
    variables = trunk.init(key, x0)
    tp, ts = variables["params"], variables["batch_stats"]

    B = streams
    H0 = size // 4
    num_features = 64
    y = jax.random.normal(key, (B, H0, H0, 64), jnp.bfloat16)
    for i, L in enumerate((6, 12, 24, 16)):
        bname = f"denseblock{i + 1}"
        packed = dbp.pack_dense_block(tp[bname], ts[bname])
        last = i == 3
        Cf = num_features + 32 * L
        if last:
            ep = dbp.pack_final_bn(tp["norm5"], ts["norm5"])
            C_out, epi = Cf, "final_bn"
        else:
            ep = dbp.pack_transition(
                tp[f"transition{i + 1}"], ts[f"transition{i + 1}"]
            )
            C_out, epi = Cf // 2, "transition"
        Bh, Hh, Wh = y.shape[:3]
        geom = dbp.choose_geom(Hh, Wh, num_features, L, epi, C_out, Bh)
        if chunk_ovr:
            geom = dataclasses.replace(geom, chunk=min(chunk_ovr, geom.Rt))
        if btile_ovr:
            geom = dataclasses.replace(geom, B_tile=btile_ovr)
        fn = jax.jit(lambda yy, p=packed, e=ep, g=geom:
                     dbp.dense_block_apply(yy, p, e, g))
        dt, out = timeit(fn, y)
        # FLOPs: per layer P*(C*128 + 9*128*32)*2 + transition
        P = Hh * Wh * Bh
        fl = sum(
            P * ((num_features + 32 * l) * 128 + 9 * 128 * 32) * 2
            for l in range(L)
        )
        if not last:
            fl += (P // 4) * Cf * C_out * 2  # transition 1x1 post-pool
        print(f"block{i+1}: geom(B_tile={geom.B_tile} TY={geom.TY} "
              f"chunk={geom.chunk}) {dt*1e3:7.2f} ms "
              f"{fl/dt/1e12:6.1f} TFLOP/s  MFU {fl/dt/PEAK*100:5.1f}%")
        y = out
        num_features = C_out
        if only and i + 1 >= only:
            break


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "blocks":
        extra = [int(a) for a in sys.argv[4:]]
        bench_blocks(int(sys.argv[2]), int(sys.argv[3]), *extra)
        return
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 224
    streams = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg = ModelConfig(method="reinforcement", trunk="densenet121",
                      input_size=size)
    params, stats = aff.init_params(jax.random.PRNGKey(0), cfg)
    model = AffordanceNet(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    scene = jax.random.normal(k1, (1, size, size, 3), jnp.float32)
    masks = jax.random.normal(k2, (1, streams, size, size, 3), jnp.float32)

    def slow(sc, mk):
        return model.apply(
            {"params": params, "batch_stats": stats},
            sc, mk, 0, False, method=AffordanceNet.score,
        )

    def fast(sc, mk):
        return fast_trunk.score_eval(
            params, stats, sc[0:1], mk, cfg.num_out,
            trunk_key="grasp_trunk", head_key="grasp_head",
            backend=os.environ.get(
                "SMG_FAST_BACKEND", fast_trunk.default_backend()
            ),
        )

    jslow = jax.jit(slow)
    comp = jslow.lower(scene, masks).compile()
    cost = comp.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    print(f"flops/call: {flops/1e9:.1f} GF")

    t0 = time.perf_counter()
    jfast = jax.jit(fast)
    out_f = jax.block_until_ready(jfast(scene, masks))
    print(f"fast compile+1st: {time.perf_counter()-t0:.1f}s")

    dt_s, out_s = timeit(jslow, scene, masks)
    dt_f, out_f = timeit(jfast, scene, masks)

    a, b = np.asarray(out_s, np.float32), np.asarray(out_f, np.float32)
    scale = max(1e-3, float(np.abs(a).max()))
    print(f"parity rel err: {float(np.abs(a-b).max())/scale:.4f} "
          f"(scale {scale:.2f})")
    for name, dt in (("xla ", dt_s), ("fast", dt_f)):
        print(f"{name}: {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s  "
              f"MFU {flops/dt/PEAK*100:5.1f}%")
    print(f"speedup: {dt_s/dt_f:.2f}x")


if __name__ == "__main__":
    main()
