#!/usr/bin/env bash
# Round-3b TPU measurement backlog — kernel-variant sweep + trunk
# profile + north-star batch sweep. Run serially on the live chip with
# nothing else touching it (axon is exclusive; concurrent host load
# skews wall times on this 1-core VM).
#
#   bash scripts/tpu_queue_r3b.sh [outdir]
#
# Steps:
#   1. kernel-smoke under SMG_FL_PLACE=roll — pltpu.roll lowering is not
#      exercised by interpret mode.
#   2. fast_trunk xla_fl at 640/17: (place dot|roll) x (chunk 8|16|32).
#   3. fast_trunk xla_fl at 224/65 for the winning variant knobs.
#   4. profile_trunk 640 16 fast (xla_fl): per-op device self-time — the
#      data that decides where the next kernel work goes.
#   5. batch sweep at 512 and 1024 (the >=1024-scene north star measured
#      against training; 32-256 already in PERF.md).
set -u
OUT="${1:-logs/tpu_queue_r3b}"
mkdir -p "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

SMG_FL_PLACE=roll step kernel_smoke_roll python scripts/tpu_kernel_smoke.py

for place in dot roll; do
  for chunk in 8 16 32; do
    SMG_FAST_BACKEND=xla_fl SMG_FL_PLACE=$place SMG_FL_CHUNK=$chunk \
      step "fl_640_${place}_c${chunk}" \
      python scripts/bench_fast_trunk.py 640 17
  done
done

SMG_FAST_BACKEND=xla_fl step fl_224_dot_c8 \
  python scripts/bench_fast_trunk.py 224 65
SMG_FAST_BACKEND=xla_fl SMG_FL_PLACE=roll SMG_FL_CHUNK=16 \
  step fl_224_roll_c16 python scripts/bench_fast_trunk.py 224 65

SMG_FAST_BACKEND=xla_fl step profile_640 \
  python scripts/profile_trunk.py 640 16 fast

step batch_sweep_big python scripts/bench_batch_sweep.py 512 1024

echo "queue done; logs in $OUT"
