#!/usr/bin/env bash
# Round-3 TPU measurement backlog — run serially when the axon tunnel is
# live (the chip is exclusive: nothing else may touch it meanwhile).
#
#   bash scripts/tpu_queue.sh [outdir]
#
# Steps (each logged to $OUT/<step>.log; a failed step does not stop the
# queue):
#   1. kernel-smoke: compile + run each new Pallas kernel at production
#      shapes (Mosaic constraints are NOT checked by interpret mode).
#   2. bench_fast_trunk at 640/17 and 224/65 for xla_pk vs xla_fl.
#   3. update bench: fast_train off/on x conv2 conv/taps at batch 32.
#   4. batch sweep (scripts/bench_batch_sweep.py).
# Decision points (default flip, PERF.md, bench.py) stay manual.

set -u
OUT="${1:-logs/tpu_queue_r3}"
mkdir -p "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

step kernel_smoke python scripts/tpu_kernel_smoke.py

SMG_FAST_BACKEND=xla_pk step fast_trunk_pk_640 \
  python scripts/bench_fast_trunk.py 640 17
SMG_FAST_BACKEND=xla_fl step fast_trunk_fl_640 \
  python scripts/bench_fast_trunk.py 640 17
SMG_FAST_BACKEND=xla_pk step fast_trunk_pk_224 \
  python scripts/bench_fast_trunk.py 224 65
SMG_FAST_BACKEND=xla_fl step fast_trunk_fl_224 \
  python scripts/bench_fast_trunk.py 224 65

step update_bench python scripts/bench_update_modes.py

step batch_sweep python scripts/bench_batch_sweep.py

echo "queue done; logs in $OUT"
