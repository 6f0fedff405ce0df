"""Update-step bench matrix: fast_train off/on x conv2 conv/taps.

Times the remat'd batch-32 train-mode update (fwd + bwd + Adam) for the
Flax path vs the grouped-prefix train forward, so the fast_train default
can be flipped on evidence. One JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train.trainer import Experience, TrainConfig, Trainer


def bench(fast_train: str, conv2: str, batch: int = 32,
          scene_chunk: int | None = None):
    cfg = TrainConfig(
        model=ModelConfig(method="reinforcement", trunk="densenet121",
                          input_size=224),
        method="reinforcement",
        scene_chunk=scene_chunk or min(batch, 8),
        fast_train=fast_train,
        fast_train_conv2=conv2,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    exp = Experience(
        scene_depth=jax.random.uniform(k1, (batch, 224, 224)) * 0.1,
        exec_mask=jax.random.uniform(k2, (batch, 224, 224)) > 0.7,
        style=jax.random.randint(k3, (batch,), 0, 3),
        valid=jnp.ones((batch,), bool),
    )
    labels = jnp.zeros((batch,), jnp.float32)
    from smg_tpu.utils import profiling

    step = jax.jit(lambda s: trainer.update(s, exp, labels))
    t0 = time.time()
    # AOT-compile and execute the compiled object directly: dispatching
    # through the jit wrapper re-flattens the ~2000-leaf state pytree on
    # the host every call, which is load-sensitive and inflated earlier
    # matrix numbers by 60-180 ms vs bench.py's AOT timings.
    compiled = step.lower(state).compile()
    state2, _ = compiled(state)
    profiling.readback(state2)
    compile_s = time.time() - t0
    # Subtract the readback's own device->host cost (2 ms healthy,
    # ~1.5 s on a degraded tunnel) so it is not billed to the update.
    rbs = []
    for _ in range(3):
        t0 = time.perf_counter()
        profiling.readback(state2)
        rbs.append(time.perf_counter() - t0)
    rb = sorted(rbs)[1]
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state2, loss = compiled(state2)
    # readback, not block_until_ready: blocking (even full trees) can
    # return early on this platform (utils/profiling.readback) -- the
    # round-3 197.9/222.8 ms numbers this script produced blocked on
    # `loss` alone and are suspect for exactly that reason.
    profiling.readback((state2, loss))
    dt = max(time.perf_counter() - t0 - rb, 1e-9) / n
    print(json.dumps({
        "fast_train": fast_train, "conv2": conv2, "batch": batch,
        "scene_chunk": cfg.scene_chunk,
        "update_ms": round(dt * 1e3, 1), "compile_s": round(compile_s, 1),
        "loss": float(loss),
    }), flush=True)


def main() -> None:
    """Modes from argv: fast_train:conv2[:chunk] triples, or the default
    matrix. E.g.  bench_update_modes.py off:conv:16 on:vjp:8 on:vjp:32"""
    print("backend:", jax.default_backend())
    args = sys.argv[1:]
    if args:
        for spec in args:
            parts = spec.split(":")
            ft, c2 = parts[0], parts[1]
            chunk = int(parts[2]) if len(parts) > 2 else None
            try:
                bench(ft, c2, scene_chunk=chunk)
            except Exception as e:  # one broken mode must not eat the rest
                print(json.dumps({
                    "fast_train": ft, "conv2": c2,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)
        return
    bench("off", "conv")
    bench("on", "conv")
    bench("on", "taps")
    bench("on", "vjp")
    bench("on", "pk")


if __name__ == "__main__":
    main()
