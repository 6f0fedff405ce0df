"""Headline benchmark: physics throughput at 1024 parallel scenes.

Measures the batched rigid-body stepper (Pallas pairwise-contact kernel +
SoA state prep + integration + gripper FK) advancing 1024 scenes on one
chip, reported as aggregate scene-steps/second. The baseline target is BASELINE.json's north star:
>= 10,000 physics steps/sec/chip at 1024 parallel scenes (the reference's
CoppeliaSim/Vortex setup is RPC-bound at roughly real time for ONE scene —
tens of steps/sec).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from smg_tpu.physics import scene as scene_mod
    from smg_tpu.physics import stepper

    B = 1024
    steps_per_call = 100
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    reset = jax.jit(
        jax.vmap(lambda k: scene_mod.reset_scene(k, settle_steps=50))
    )
    batch = jax.block_until_ready(reset(keys))

    roll = jax.jit(
        lambda b: stepper.run_steps_batched(b, b.gripper, steps_per_call)
    )
    # Warmup (compile).
    batch = jax.block_until_ready(roll(batch))

    n_calls = 10
    t0 = time.perf_counter()
    for _ in range(n_calls):
        batch = roll(batch)
    jax.block_until_ready(batch)
    dt = time.perf_counter() - t0

    scene_steps_per_sec = n_calls * steps_per_call * B / dt
    baseline = 10_000.0  # BASELINE.json: >=10k physics steps/sec/chip
    print(
        json.dumps(
            {
                "metric": "physics_scene_steps_per_sec_at_1024_scenes",
                "value": round(scene_steps_per_sec, 1),
                "unit": "scene-steps/s/chip",
                "vs_baseline": round(scene_steps_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
