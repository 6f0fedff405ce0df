#!/usr/bin/env bash
# Warm-start A/B on one flagship configuration (VERDICT r2 missing #4 /
# next-round #5): pretrain the trunk (the ImageNet-init substitute,
# reference models.py:22,308 loads torchvision ImageNet weights), then
# train + test eses_drl_lc twice — He init vs --pretrained_trunks — and
# summarize both into RESULTS_warmstart.md.
#
# Usage: bash scripts/run_warmstart_ab.sh [TRAIN_EP] [TEST_EP] [OUTDIR]
set -u
cd "$(dirname "$0")/.."

TRAIN_EP="${1:-800}"
TEST_EP="${2:-300}"
OUT="${3:-logs/warmstart_ab}"
PRE="$OUT/trunk_pretrain"
COMMON="--batch_size 32 --imagery_every 0 --trunk densenet121 --input_size 224"
FLAGS="--method reinforcement --is_ets --is_pe --is_oo"

mkdir -p "$OUT"

if [ ! -d "$PRE" ]; then
  echo "=== pretrain trunks (1000 steps) ==="
  timeout "${RUN_TIMEOUT:-5400}" \
    python -m smg_tpu.cli.pretrain_trunks --steps 1000 --batch_size 16 \
    --out "$PRE" > "$OUT/pretrain.log" 2>&1
  tail -3 "$OUT/pretrain.log"
fi

RUNS=()
LABELS=()
for variant in cold warm; do
  extra=""
  [ "$variant" = warm ] && extra="--pretrained_trunks $PRE"
  dir="$OUT/eses_drl_lc_$variant"
  mkdir -p "$dir"
  # Idempotent: reuse a completed train run (has a model snapshot).
  done_run=""
  for d in $(ls -dt "$dir"/*/ 2>/dev/null); do
    [ -d "$d/models/snapshot" ] && { done_run="$d"; break; }
  done
  if [ -n "$done_run" ]; then
    echo "=== train eses_drl_lc ($variant): reusing $done_run ==="
  else
    echo "=== train eses_drl_lc ($variant) ==="
    timeout "${RUN_TIMEOUT:-5400}" \
      python -m smg_tpu.cli.main --is_sim $FLAGS $COMMON $extra \
      --training_episode "$TRAIN_EP" --logging_directory "$dir" \
      > "$dir/train.log" 2>&1
    tail -3 "$dir/train.log"
  fi
  run_dir=$(ls -dt "$dir"/*/ | head -1)
  RUNS+=("${run_dir%/}")
  LABELS+=("eses_drl_lc_$variant-train")
  snap="${run_dir%/}/models/snapshot"
  if [ -d "$snap" ]; then
    testdir="$OUT/eses_drl_lc_${variant}_test"
    mkdir -p "$testdir"
    done_test=""
    for d in $(ls -dt "$testdir"/*/ 2>/dev/null); do
      [ -s "$d/transitions/reward-value.log.txt" ] && { done_test="$d"; break; }
    done
    if [ -n "$done_test" ]; then
      echo "=== test eses_drl_lc ($variant): reusing $done_test ==="
    else
      echo "=== test eses_drl_lc ($variant) ==="
      timeout "${RUN_TIMEOUT:-5400}" \
        python -m smg_tpu.cli.main --is_sim $FLAGS $COMMON \
        --is_testing --load_snapshot --snapshot_file "$snap" \
        --obj_mesh_dir datasets/testing \
        --testing_episode "$TEST_EP" --logging_directory "$testdir" \
        > "$testdir/test.log" 2>&1
      tail -3 "$testdir/test.log"
    fi
    test_run=$(ls -dt "$testdir"/*/ | head -1)
    RUNS+=("${test_run%/}")
    LABELS+=("eses_drl_lc_$variant-test")
  fi
done

python scripts/analyze_results.py "${RUNS[@]}" \
  --labels "$(IFS=,; echo "${LABELS[*]}")" --out RESULTS_warmstart.md
echo "RESULTS_warmstart.md written"
