"""Train-step throughput vs batch size on the real chip.

Usage: python scripts/bench_batch_sweep.py [batch ...]   (default 32 128 256)

Measures the full training-loop step (sense -> score -> arbitrate ->
delayed label -> update -> execute; train/loop.py train_step) at
DenseNet-121 @224 for each batch size, printing scenes/s and the step
time. The BASELINE.md north star is >=1024 parallel scenes/chip: the
physics bench already runs 1024; this sweep measures how far the full
learning loop scales toward it (VERDICT round 2, missing #5).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import TrainConfig, Trainer
from smg_tpu.utils import profiling


def bench(batch_size: int, n_calls: int = 5):
    import jax.numpy as jnp

    cfg = LoopConfig(
        env=EnvConfig(is_pe=True, is_oo=True, method="reinforcement"),
        batch_size=batch_size,
    )
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="densenet121",
                              input_size=224),
            method="reinforcement", scene_chunk=min(batch_size, 8),
        )
    )
    t0 = time.perf_counter()
    state = init_loop(jax.random.PRNGKey(0), trainer, cfg)
    # AOT-execute, matching the production loop (cli/main). No donation:
    # donated buffers poison execution on this TPU platform (see
    # cli/main.py for the bisect).
    step = jax.jit(
        functools.partial(train_step, trainer, cfg)
    ).lower(state).compile()
    import numpy as np

    p0 = np.asarray(state.trainer.params["grasp_trunk"]["conv0"]["kernel"])
    state, m = step(state)
    state, m = step(state)
    profiling.readback((state, m))
    compile_s = time.perf_counter() - t0
    # The tunnel's device->host latency varies (2 ms healthy, ~1.5 s
    # degraded); subtract the readback's own cost so it does not bill
    # its transfer time to the step (median of 3).
    rbs = []
    for _ in range(3):
        t0 = time.perf_counter()
        profiling.readback((state, m))
        rbs.append(time.perf_counter() - t0)
    rb = sorted(rbs)[1]
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step(state)
    # readback, NOT block_until_ready: even blocking the full output
    # tree returns early on this platform (bench.py's physics leg
    # "measured" 400x reality that way; utils/profiling.readback).
    profiling.readback((state, m))
    dt = max(time.perf_counter() - t0 - rb, 1e-9) / n_calls
    # Liveness cross-check: the update really moved the online params.
    pd = float(jnp.abs(
        state.trainer.params["grasp_trunk"]["conv0"]["kernel"] - p0
    ).max())
    print(f"  [check] loss={float(m.loss):.4f} param_delta={pd:.2e} "
          f"iteration={int(state.trainer.iteration)}")
    return batch_size / dt, dt, compile_s


def main():
    batches = [int(a) for a in sys.argv[1:]] or [32, 128, 256]
    for b in batches:
        try:
            sps, dt, comp = bench(b)
        except Exception as e:  # HBM OOM at the top end is a result, not a bug
            print(f"batch {b:4d}: FAILED ({type(e).__name__}: {str(e)[:400]})")
            continue
        print(f"batch {b:4d}: {sps:8.1f} scenes/s  {dt * 1e3:8.1f} ms/step  "
              f"(compile+2 warmup {comp:.0f}s)")


if __name__ == "__main__":
    main()
