"""Capture a TPU profile of one trainer.update (fwd + bwd + Adam) and
print the op breakdown.

Usage: python scripts/profile_update.py [batch] [fast_train] [conv2]
  batch       default 32
  fast_train  off | on       (default off = the Flax path)
  conv2       conv | taps    (score_train lowering when fast_train=on)

The update is the half of the hot path the eval-trunk kernels do not
touch (VERDICT r3 #2); this names where its device time actually goes so
kernel/VJP work can target the fat instead of guessing.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.models.affordance import ModelConfig
from smg_tpu.train.trainer import Experience, TrainConfig, Trainer
from smg_tpu.utils import profiling


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    fast_train = sys.argv[2] if len(sys.argv) > 2 else "off"
    conv2 = sys.argv[3] if len(sys.argv) > 3 else "conv"
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else min(batch, 8)

    cfg = TrainConfig(
        model=ModelConfig(method="reinforcement", trunk="densenet121",
                          input_size=224),
        method="reinforcement", scene_chunk=chunk,
        fast_train=fast_train, fast_train_conv2=conv2,
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
    step = jax.jit(lambda s: trainer.update(s, exp, labels))
    state, _ = step(state)
    profiling.readback(state)

    logdir = "/tmp/smg_profile_update"
    os.system(f"rm -rf {logdir}")
    n_steps = 3
    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            state, loss = step(state)
        profiling.readback((state, loss))

    xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    table = json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    ids = [c["id"] for c in table["cols"]]
    rows = [
        dict(zip(ids, [c["v"] if isinstance(c, dict) else c for c in r["c"]]))
        for r in table["rows"]
    ]
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r["total_self_time"]))
    tot = sum(float(r["total_self_time"]) for r in rows)
    print(f"update[{fast_train}/{conv2}] b{batch}: device self time "
          f"{tot/1e3/n_steps:.2f} ms/step")
    agg = {}
    for r in rows:
        t = r["type"]
        a = agg.setdefault(t, [0.0, 0])
        a[0] += float(r["total_self_time"])
        a[1] += int(r["occurrences"])
    print(f"{'op type':<28} {'self ms/step':>12} {'%':>6}  occurrences")
    for t, (us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:22]:
        print(f"{t:<28} {us/1e3/n_steps:12.2f} {us/tot*100:6.1f}  {occ}")
    print("\ntop individual ops:")
    for r in rows[:25]:
        print(f"  {float(r['total_self_time'])/1e3/n_steps:8.2f} ms  "
              f"{r['operation']}"[:120])


if __name__ == "__main__":
    main()
