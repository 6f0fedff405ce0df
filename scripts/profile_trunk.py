"""Capture a TPU profile of AffordanceNet.score and print the op breakdown.

Usage: python scripts/profile_trunk.py [input_size] [streams] [mode]
mode: xla (model.apply baseline) | fast (fast_trunk packed path)

Dumps the xplane trace under /tmp/smg_profile and prints the top ops by
self time via the xprof framework_op_stats converter.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from smg_tpu.models import affordance as aff
from smg_tpu.models import fast_trunk
from smg_tpu.models.affordance import AffordanceNet, ModelConfig


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    streams = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    mode = sys.argv[3] if len(sys.argv) > 3 else "xla"
    cfg = ModelConfig(method="reinforcement", trunk="densenet121",
                      input_size=size)
    params, stats = aff.init_params(jax.random.PRNGKey(0), cfg)
    model = AffordanceNet(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    scene = jax.random.normal(k1, (1, size, size, 3), jnp.float32)
    masks = jax.random.normal(k2, (1, streams, size, size, 3), jnp.float32)

    if mode == "xla":
        fn = jax.jit(lambda sc, mk: model.apply(
            {"params": params, "batch_stats": stats},
            sc, mk, 0, False, method=AffordanceNet.score,
        ))
    else:
        fn = jax.jit(lambda sc, mk: fast_trunk.score_eval(
            params, stats, sc[0:1], mk, cfg.num_out,
            backend=os.environ.get("SMG_FAST_BACKEND", "xla"),
        ))

    jax.block_until_ready(fn(scene, masks))  # compile
    logdir = "/tmp/smg_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(scene, masks)
        jax.block_until_ready(out)

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
    print(f"device total self time: {tot/1e3:.2f} ms over 3 calls")
    print(f"{'op type':<28} {'self ms':>8} {'%':>6}  occurrences")
    agg = {}
    for r in rows:
        t = r["type"]
        a = agg.setdefault(t, [0.0, 0])
        a[0] += float(r["total_self_time"])
        a[1] += int(r["occurrences"])
    for t, (us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]:
        print(f"{t:<28} {us/1e3:8.2f} {us/tot*100:6.1f}  {occ}")
    print("\ntop individual ops:")
    for r in rows[:15]:
        print(f"  {float(r['total_self_time'])/1e3:8.2f} ms  "
              f"{r['operation']}"[:110])


if __name__ == "__main__":
    main()
