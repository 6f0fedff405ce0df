"""Capture a TPU profile of one full train_step and print the op breakdown.

Usage: python scripts/profile_step.py [batch_size]

Answers "where does the step time go" at the loop level (model scoring
vs DQN labels vs update vs physics execution vs geometry), the way
profile_trunk.py does for the trunk alone.
"""

from __future__ import annotations

import functools
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.envs.smg_env import EnvConfig
from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train.loop import LoopConfig, init_loop, train_step
from smg_tpu.train.trainer import TrainConfig, Trainer


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = LoopConfig(
        env=EnvConfig(is_pe=True, is_oo=True, method="reinforcement"),
        batch_size=B,
    )
    trainer = Trainer(
        TrainConfig(
            model=ModelConfig(method="reinforcement", trunk="densenet121",
                              input_size=224),
            method="reinforcement", scene_chunk=min(B, 8),
        )
    )
    state = init_loop(jax.random.PRNGKey(0), trainer, cfg)
    step = jax.jit(functools.partial(train_step, trainer, cfg))
    state, m = step(state)
    state, m = step(state)
    jax.block_until_ready(m.loss)

    logdir = "/tmp/smg_profile_step"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, m = step(state)
        jax.block_until_ready(m.loss)

    xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    import json as _json

    table = _json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    ids = [c["id"] for c in table["cols"]]
    rows = [
        dict(zip(ids, [c["v"] if isinstance(c, dict) else c for c in r["c"]]))
        for r in table["rows"]
    ]
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r["total_self_time"]))
    tot = sum(float(r["total_self_time"]) for r in rows)
    print(f"device total self time: {tot/1e3:.2f} ms over 3 steps "
          f"(batch {B})")
    print(f"{'op type':<28} {'self ms':>8} {'%':>6}  occurrences")
    agg = {}
    for r in rows:
        t = r["type"]
        a = agg.setdefault(t, [0.0, 0])
        a[0] += float(r["total_self_time"])
        a[1] += int(r["occurrences"])
    for t, (us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:22]:
        print(f"{t:<28} {us/1e3:8.2f} {us/tot*100:6.1f}  {occ}")
    print("\ntop individual ops:")
    for r in rows[:25]:
        print(f"  {float(r['total_self_time'])/1e3:8.2f} ms  "
              f"{r['operation']}"[:120])


if __name__ == "__main__":
    main()
