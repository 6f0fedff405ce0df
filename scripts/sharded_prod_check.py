"""Production trunk under the sharded step, on the real chip.

VERDICT r3 weak #8: the multi-chip dryrun and tests exercise
make_sharded_step only with the tiny trunk; the Pallas fused-trunk path
(fast_eval auto = xla_fl) had never executed under pjit shardings. This
runs the FULL production configuration (DenseNet-121 @ 224, fast-eval
Pallas kernels) through `sharded.make_sharded_step` on a 1-device data
mesh — Pallas-under-pjit compiled and executed for real — and checks
its per-step losses against the plain jit step on identical state.

Usage: python scripts/sharded_prod_check.py [batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from smg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

from smg_tpu.parallel import mesh as mesh_mod
from smg_tpu.parallel import sharded
from smg_tpu.train.loop import init_loop, train_step
from smg_tpu.train.prod_config import make_prod_loop_cfg, make_prod_trainer
from smg_tpu.utils import profiling


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # The trainer/loop configs come from the SAME helper bench.py uses,
    # so the plain-jit cross-check leg is a persistent-cache HIT whenever
    # bench has run at this batch (the sharded leg is the one cold
    # compile this host can afford: 2026-08-20's batch-4 attempt burned
    # its whole budget compiling two distinct programs on the 1-CPU
    # host). Advisor finding r4: configs must not drift.
    trainer = make_prod_trainer(batch)
    loop_cfg = make_prod_loop_cfg(batch)

    n_dev = len(jax.devices())
    mesh = mesh_mod.make_mesh(n_dev)

    # Sharded path.
    state_s = init_loop(jax.random.PRNGKey(0), trainer, loop_cfg)
    state_s = sharded.place_loop_state(state_s, mesh)
    step_s = sharded.make_sharded_step(trainer, loop_cfg, mesh, state_s)
    t0 = time.time()
    state_s, m1 = step_s(state_s)
    profiling.readback(m1)
    compile_s = time.time() - t0
    state_s, m2 = step_s(state_s)
    profiling.readback(m2)
    losses_sharded = [float(m1.loss), float(m2.loss)]
    # Emit the core evidence (Pallas fast-eval executed under the pjit
    # sharded step) immediately: the plain-jit cross-check below costs a
    # second cold multi-minute compile, and an outer timeout there must
    # not erase this leg's result (it did on 2026-08-20's first attempt).
    print(json.dumps({
        "stage": "sharded_only",
        "backend": jax.default_backend(),
        "devices": n_dev, "batch": batch, "trunk": "densenet121",
        "fast_eval": trainer._use_fast_eval,
        "losses_sharded": losses_sharded,
        "compile_s": round(compile_s, 1),
        "finite": bool(all(jnp.isfinite(jnp.asarray(losses_sharded)))),
    }), flush=True)

    # Plain jit path on identical initial state.
    state_p = init_loop(jax.random.PRNGKey(0), trainer, loop_cfg)
    step_p = jax.jit(functools.partial(train_step, trainer, loop_cfg))
    state_p, p1 = step_p(state_p)
    state_p, p2 = step_p(state_p)
    profiling.readback((state_p, p2))
    losses_plain = [float(p1.loss), float(p2.loss)]

    diffs = [abs(a - b) for a, b in zip(losses_sharded, losses_plain)]
    print(json.dumps({
        "backend": jax.default_backend(),
        "devices": n_dev,
        "batch": batch,
        "trunk": "densenet121",
        "fast_eval": trainer._use_fast_eval,
        "losses_sharded": losses_sharded,
        "losses_plain": losses_plain,
        "max_loss_diff": max(diffs),
        "compile_s": round(compile_s, 1),
        "ok": bool(max(diffs) < 1e-2
                   and all(jnp.isfinite(jnp.asarray(losses_sharded)))),
    }))


if __name__ == "__main__":
    main()
