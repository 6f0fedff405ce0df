"""Smoke test: one sense -> score -> act cycle, printed.

The parity counterpart of the reference's connectivity check
(code/simulation/simpleTest.py — connect, count scene objects, stream a
value): here there is no server to connect to, so the smoke test builds a
scene on-device, renders it, segments it, picks an action with a fresh
tiny network, executes the primitive and reports the outcome.

    python -m smg_tpu.cli.smoke [--batch 4] [--seed 0]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from smg_tpu.envs import smg_env as env
    from smg_tpu.models.affordance import ModelConfig
    from smg_tpu.policy import arbitrate as arb
    from smg_tpu.train.trainer import TrainConfig, Trainer

    t0 = time.time()
    print(f"devices: {jax.devices()}")
    cfg = env.EnvConfig(is_pe=True, is_oo=True)
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="tiny",
                              input_size=224)
        )
    )
    tstate = trainer.init_state(jax.random.PRNGKey(args.seed))

    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.batch)
    scenes = jax.jit(jax.vmap(lambda k: env.reset(k, cfg)))(keys)
    obs = jax.vmap(env.observe)(scenes)
    n = jax.device_get(obs.seg.number)
    print(f"scene objects in view: {n.tolist()}  "
          f"(simpleTest.py:38 'number of objects in scene' parity)")

    depths = jax.vmap(env.masked_scene_depth)(obs)
    scores = trainer.score_scene_batch(
        tstate, depths, obs.seg.masks, obs.seg.valid
    )
    choice = jax.vmap(
        lambda k, g, s, gs, v, c: arb.select_action(
            k, g, s, gs, v, c, is_testing=True
        )
    )(jax.random.split(jax.random.PRNGKey(2), args.batch),
      scores.gra_conf, scores.suc_conf, scores.gs_conf,
      obs.seg.valid, obs.seg.centers)
    geom = jax.vmap(lambda c, o: env.compute_geometry(c, o, cfg))(choice, obs)
    scenes, outcome = jax.jit(
        jax.vmap(lambda s, c, g: env.execute(s, c, g))
    )(scenes, choice, geom)

    names = {0: "suction", 1: "grasp", 2: "grasp_then_suction"}
    for i in range(args.batch):
        a = int(jax.device_get(choice.action[i]))
        r = float(jax.device_get(
            outcome.grasp_success[i] + outcome.suction_success[i]
            + outcome.gs_success[i]
        ))
        print(f"scene {i}: action={names[a]:<18} reward={r}")
    print(f"smoke ok in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
