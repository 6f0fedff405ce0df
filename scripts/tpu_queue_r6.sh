#!/usr/bin/env bash
# Round-6 TPU backlog, ordered by value (see PERF.md round-5 changes and
# RESULTS_bigbatch.md for the evidence behind each item). Run stages
# separately and inspect between them (the round-4 lesson; round-5's
# 1024-point compile crash also degraded the compile service for ~30
# min — do NOT queue anything fragile right after a huge compile).
#
#   bash scripts/tpu_queue_r6.sh stageA   # measurement-first items
set -u
OUT="${OUT:-logs/tpu_queue_r6}"
mkdir -p "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

stageA() {
  # 1. Eval-trunk 640 push (the open VERDICT r4 #5: 0.26 -> 0.32 MFU).
  #    Round-5's xprof capture (logs/tpu_queue_r5/profile_trunk_640.log)
  #    shows an op split dominated by reshape/convert OUTSIDE the Pallas
  #    kernels, but its device totals don't reconcile with the 14.3 ms
  #    wall — first re-profile with the capture scoped to the steady-
  #    state AOT call only, then act on whatever the honest split says.
  step profile_trunk timeout 1200 python scripts/profile_trunk.py 640 16 fast
  # 2. Knob sweep at current shapes (place/chunk were tuned in r3).
  step knob_roll timeout 1200 env SMG_FL_PLACE=roll python scripts/bench_fast_trunk.py 640 16
  step knob_chunk16 timeout 1200 env SMG_FL_CHUNK=16 python scripts/bench_fast_trunk.py 640 16
}

stageB() {
  # 3. Head-scale calibration A/B (RESULTS_bigbatch.md: test-time
  #    cross-head Q-scale arbitrage swings held-out success by tens of
  #    points; the reference has the same structure, but a calibrated
  #    variant — e.g. per-head running mean/var normalization of Q at
  #    argmax time, test-only — would make test success reflect
  #    competence instead of head drift). Requires the calibration knob
  #    to be implemented first; keep the A/B update-matched.
  echo "stageB: implement the test-time head-calibration knob first (see RESULTS_bigbatch.md)"
  # 4. BN-momentum attribution arm (the remaining open question of the
  #    r5 attribution): b32/800 with BN_MOMENTUM=0.99 (r2's constant)
  #    under otherwise-shipping paths — isolates the one behavioral
  #    code-path change from run-to-run arbitrage noise.
}

"$@"
echo "$* done; logs in $OUT"
