#!/usr/bin/env python
"""Decision-level parity of the fast eval path on the real chip.

Re-runs tests/test_decision_parity.py's comparison at production scale:
compiled Pallas kernels (no interpret mode), full 224-pixel heightmaps,
DenseNet-121, real rendered scenes. Reports per-object value error and
argmax-object/style agreement between `fast_trunk.score_eval` (the path
the trainer scores and bootstraps DQN targets with, fast_eval='auto')
and the Flax `AffordanceNet.score` eval oracle (the path the update
backprops through) — the train/eval function split of PARITY.md
deviation 15.

Usage:
  python scripts/decision_parity.py [--scenes 8] [--input_size 224]
      [--snapshot logs/<run>/models/snapshot]   # orbax checkpoint
      [--backend xla_fl]

Prints one JSON line with per-style max rel err, argmax agreement, and
the oracle's per-scene value spread (to show the check is non-vacuous).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--snapshot", type=str, default="")
    ap.add_argument("--backend", type=str, default=None)
    args = ap.parse_args()

    from smg_tpu.envs import smg_env
    from smg_tpu.models import affordance as aff
    from smg_tpu.models import fast_trunk
    from smg_tpu.models.affordance import AffordanceNet, ModelConfig

    mcfg = ModelConfig(method="reinforcement", input_size=args.input_size)
    model = AffordanceNet(mcfg)
    if args.snapshot:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ref_p, ref_s = aff.init_params(jax.random.PRNGKey(0), mcfg)
        restored = ckptr.restore(
            os.path.abspath(args.snapshot),  # orbax requires absolute
            {"params": ref_p, "batch_stats": ref_s},
        )
        params, stats = restored["params"], restored["batch_stats"]
        src = args.snapshot
    else:
        # He-init params + randomized-but-alive BN stats (the CI test's
        # construction): fresh init stats (var=1, mean=0) leave 58
        # stacked relus near-dead and the compare vacuous.
        import sys

        sys.path.insert(0, "tests")
        from test_fast_trunk import _rand_stats

        params, stats = aff.init_params(jax.random.PRNGKey(0), mcfg)
        stats = _rand_stats(stats, jax.random.PRNGKey(1))
        src = "init+rand_stats"

    ecfg = smg_env.EnvConfig(is_cluttered=True)
    keys = jax.random.split(jax.random.PRNGKey(7), args.scenes)
    scenes = jax.jit(jax.vmap(lambda k: smg_env.reset(k, ecfg)))(keys)
    obs = jax.jit(jax.vmap(smg_env.observe))(scenes)
    masked = jax.vmap(smg_env.masked_scene_depth)(obs)
    valid = np.asarray(obs.seg.valid)

    prep = jax.jit(jax.vmap(lambda d: aff.preprocess_depth(d, mcfg)))
    scene_imgs = prep(masked)
    B, N = masked.shape[0], obs.seg.masks.shape[1]
    obj_depth = (masked[:, None] * obs.seg.masks).reshape(B * N, 224, 224)
    mask_imgs = prep(obj_depth).reshape(
        B, N, args.input_size, args.input_size, 3
    )

    result = {"source": src, "scenes": args.scenes,
              "input_size": args.input_size,
              "backend": args.backend or fast_trunk.default_backend(),
              "styles": {}}
    agree_all = total_all = 0
    for style, tk, hk in (
        (0, "grasp_trunk", "grasp_head"),
        (1, "suction_trunk", "suction_head"),
        (2, "gs_trunk", "suction_head" if mcfg.tied_ets_head else "gs_head"),
    ):
        ref = jax.jit(
            lambda si, mi, s=style: model.apply(
                {"params": params, "batch_stats": stats},
                si, mi, s, False, method=AffordanceNet.score,
            )
        )(scene_imgs, mask_imgs)
        got = jax.jit(
            lambda si, mi, tk=tk, hk=hk: fast_trunk.score_eval(
                params, stats, si, mi, mcfg.num_out,
                trunk_key=tk, head_key=hk, backend=args.backend,
            )
        )(scene_imgs, mask_imgs)
        ref = np.asarray(ref, np.float32)[..., 0]
        got = np.asarray(got, np.float32)[..., 0]
        spread = float((ref.max(axis=1) - ref.min(axis=1)).mean())
        scale = max(float(np.abs(ref).max()), 1e-3)
        err = float(np.abs(got - ref).max()) / scale
        neg = np.where(valid, 0.0, -1e9)
        am_ref = np.argmax(ref + neg, axis=1)
        am_got = np.argmax(got + neg, axis=1)
        agree = int((am_ref == am_got).sum())
        agree_all += agree
        total_all += B
        result["styles"][str(style)] = {
            "max_rel_err": round(err, 4),
            "argmax_agree": f"{agree}/{B}",
            "oracle_spread": round(spread, 4),
        }

    result["argmax_agreement_rate"] = round(agree_all / total_all, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
