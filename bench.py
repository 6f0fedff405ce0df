"""Headline benchmark: physics throughput + model MFU + train-step rate.

Measures, on one chip:

1. physics: the batched rigid-body stepper (Pallas pairwise-contact kernel
   + SoA state prep + integration + gripper FK) advancing 1024 scenes,
   as aggregate scene-steps/second — the BASELINE.json north star is
   >= 10,000 (the reference's CoppeliaSim/Vortex setup is RPC-bound at
   roughly real time for ONE scene);
2. model: the two-stream DenseNet-121 affordance score (the dominant cost
   of a real training step, reference models.py forward) at input 224 and
   the reference-parity 640, reported as TFLOP/s and MFU against the
   chip's bf16 peak (FLOPs from XLA's compiled cost analysis);
3. train_step: the full sense->score->label->update->execute loop step
   (DenseNet-121 @ 224, 8 scenes), as scenes/second.

Prints exactly ONE JSON line; the headline metric keeps the round-1
physics contract, the model/train numbers ride in "extra".
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _progress(msg: str) -> None:
    print(f"# bench: {msg}", file=sys.stderr, flush=True)

# bf16 peak FLOP/s per chip by device kind (public figures).
PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def _peak() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12


def _timeit(fn, *args, n_calls: int = 10, warmup: int = 2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_calls


def bench_physics() -> float:
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
    # Self-feeding rollout: time with the output as the next input.
    batch = jax.block_until_ready(roll(batch))
    n_calls = 10
    t0 = time.perf_counter()
    for _ in range(n_calls):
        batch = roll(batch)
    jax.block_until_ready(batch)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * B / dt


def bench_model(input_size: int, streams: int = 64):
    """Two-stream DenseNet-121 score: TFLOP/s + MFU at `input_size`.

    `streams` object-masked streams against one scene stream — the shape
    of a real scoring call (trainer.score_scene batches all object slots
    of a scene chunk into one model call). Times the trainer's actual
    eval path (fast_trunk.score_eval, Trainer._use_fast_eval); FLOPs
    come from the Flax apply's compiled cost analysis — the math is
    identical, so one count serves both.
    """
    from smg_tpu.models import affordance as aff
    from smg_tpu.models import fast_trunk
    from smg_tpu.models.affordance import AffordanceNet, ModelConfig

    cfg = ModelConfig(
        method="reinforcement", trunk="densenet121", input_size=input_size
    )
    params, stats = aff.init_params(jax.random.PRNGKey(0), cfg)
    model = AffordanceNet(cfg)
    S = input_size

    def fwd(scene_img, mask_imgs):
        return fast_trunk.score_eval(
            params, stats, scene_img, mask_imgs, cfg.num_out
        )

    def fwd_flax(scene_img, mask_imgs):
        return model.apply(
            {"params": params, "batch_stats": stats},
            scene_img, mask_imgs, 0, False, method=AffordanceNet.score,
        )

    jfwd = jax.jit(fwd)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    scene = jax.random.normal(k1, (1, S, S, 3), jnp.float32)
    masks = jax.random.normal(k2, (1, streams, S, S, 3), jnp.float32)

    compiled = jax.jit(fwd_flax).lower(scene, masks).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    dt = _timeit(jfwd, scene, masks, n_calls=5)
    tflops = flops / dt / 1e12 if flops else 0.0
    return tflops, tflops * 1e12 / _peak(), dt


def bench_update(batch_size: int = 32):
    """Train-mode update (batch-BN fwd + bwd + Adam) FLOP/s and MFU.

    The scoring benches run eval mode; the remat'd update is the other
    half of the training hot path (VERDICT r2 weak #7), so kernel work
    can be judged against the shape that actually backprops.
    """
    import jax.numpy as jnp

    from smg_tpu.models.affordance import ModelConfig
    from smg_tpu.train.trainer import Experience, TrainConfig, Trainer

    cfg = TrainConfig(
        model=ModelConfig(method="reinforcement", trunk="densenet121",
                          input_size=224),
        method="reinforcement", scene_chunk=min(batch_size, 8),
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    B = batch_size
    exp = Experience(
        scene_depth=jax.random.uniform(k1, (B, 224, 224)) * 0.1,
        exec_mask=jax.random.uniform(k2, (B, 224, 224)) > 0.7,
        style=jax.random.randint(k3, (B,), 0, 3),
        valid=jnp.ones((B,), bool),
    )
    labels = jnp.zeros((B,), jnp.float32)
    step = jax.jit(lambda s: trainer.update(s, exp, labels))
    compiled = step.lower(state).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    state2, _ = step(state)
    jax.block_until_ready(state2)
    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state2, loss = step(state2)
    jax.block_until_ready((state2, loss))
    dt = (time.perf_counter() - t0) / n_calls
    tflops = flops / dt / 1e12 if flops else 0.0
    return tflops, tflops * 1e12 / _peak(), dt


def bench_train_step(batch_size: int = 8):
    """Full training-loop step rate (DenseNet-121 @ 224), scenes/s."""
    import functools

    from smg_tpu.models.affordance import ModelConfig
    from smg_tpu.train.loop import LoopConfig, init_loop, train_step
    from smg_tpu.train.trainer import TrainConfig, Trainer
    from smg_tpu.envs.smg_env import EnvConfig

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
    state = init_loop(jax.random.PRNGKey(0), trainer, cfg)
    step = jax.jit(functools.partial(train_step, trainer, cfg))

    # Warmup: compile + reach the steady-state cache (2 calls).
    state, m = step(state)
    state, m = step(state)
    jax.block_until_ready((state, m))
    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step(state)
    # Block on the FULL output tree: on this platform blocking one leaf
    # (m.loss) returns before the rest of the program's outputs land,
    # under-reporting multi-hundred-ms steps ~10x (verified against the
    # profiler's device self time, scripts/profile_step.py).
    jax.block_until_ready((state, m))
    dt = (time.perf_counter() - t0) / n_calls
    return batch_size / dt, dt


def main() -> None:
    t0 = time.time()
    physics = bench_physics()
    _progress(f"physics done {time.time() - t0:.0f}s")
    tflops224, mfu224, dt224 = bench_model(224)
    _progress(f"model 224 done {time.time() - t0:.0f}s")
    tflops640, mfu640, dt640 = bench_model(640, streams=16)
    _progress(f"model 640 done {time.time() - t0:.0f}s")
    scenes_per_sec, step_dt = bench_train_step()
    _progress(f"train_step done {time.time() - t0:.0f}s")
    # Train-step scaling curve toward the >=1024-scene north star
    # (VERDICT r2 missing #5): same construction as
    # scripts/bench_batch_sweep.py so compiles share the persistent cache.
    scaling = {}
    for b in (32, 128, 256):
        try:
            sps_b, _ = bench_train_step(b)
            scaling[f"train_step_scenes_per_sec_b{b}"] = round(sps_b, 2)
        except Exception as e:  # OOM at the top end is a result, not a bug
            scaling[f"train_step_scenes_per_sec_b{b}"] = f"FAILED:{type(e).__name__}"
        _progress(f"train_step b{b} done {time.time() - t0:.0f}s")
    up_tflops, up_mfu, up_dt = bench_update()
    _progress(f"update done {time.time() - t0:.0f}s")
    baseline = 10_000.0  # BASELINE.json: >=10k physics steps/sec/chip
    print(
        json.dumps(
            {
                "metric": "physics_scene_steps_per_sec_at_1024_scenes",
                "value": round(physics, 1),
                "unit": "scene-steps/s/chip",
                "vs_baseline": round(physics / baseline, 2),
                "extra": {
                    "model_score_tflops_224": round(tflops224, 1),
                    "model_score_mfu_224": round(mfu224, 3),
                    "model_score_ms_224_b65": round(dt224 * 1e3, 2),
                    "model_score_tflops_640": round(tflops640, 1),
                    "model_score_mfu_640": round(mfu640, 3),
                    "model_score_ms_640_b17": round(dt640 * 1e3, 2),
                    "train_step_scenes_per_sec": round(scenes_per_sec, 2),
                    "train_step_ms_b8": round(step_dt * 1e3, 1),
                    **scaling,
                    "update_tflops_b32": round(up_tflops, 1),
                    "update_mfu_b32": round(up_mfu, 3),
                    "update_ms_b32": round(up_dt * 1e3, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
