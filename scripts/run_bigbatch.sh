#!/usr/bin/env bash
# Flagship configuration at the largest fitting batch (VERDICT r2
# next-round #3): train eses_drl_lc with 256 parallel scenes and an
# update-matched episode budget (6400 episodes / 256 scenes ~= the same
# ~500 gradient updates the batch-32/800-episode protocol performs),
# then test 300 episodes on the held-out object set. Summarizes into
# RESULTS_bigbatch.md.
#
# Usage: bash scripts/run_bigbatch.sh [BATCH] [TRAIN_EP] [TEST_EP] [OUTDIR]
set -u
cd "$(dirname "$0")/.."

BATCH="${1:-256}"
TRAIN_EP="${2:-6400}"
TEST_EP="${3:-300}"
OUT="${4:-logs/bigbatch}"
COMMON="--batch_size $BATCH --imagery_every 0 --trunk densenet121 --input_size 224"
FLAGS="--method reinforcement --is_ets --is_pe --is_oo"

mkdir -p "$OUT"

dir="$OUT/eses_drl_lc_b$BATCH"
mkdir -p "$dir"
echo "=== train eses_drl_lc (batch $BATCH, $TRAIN_EP episodes) ==="
timeout "${RUN_TIMEOUT:-7200}" \
  python -m smg_tpu.cli.main --is_sim $FLAGS $COMMON \
  --training_episode "$TRAIN_EP" --logging_directory "$dir" \
  > "$dir/train.log" 2>&1
tail -4 "$dir/train.log"
run_dir=$(ls -dt "$dir"/*/ | head -1)
RUNS=("${run_dir%/}")
LABELS=("eses_drl_lc_b$BATCH-train")
snap="${run_dir%/}/models/snapshot"
if [ -d "$snap" ]; then
  echo "=== test eses_drl_lc (batch $BATCH, held-out objects) ==="
  testdir="$OUT/eses_drl_lc_b${BATCH}_test"
  mkdir -p "$testdir"
  timeout "${RUN_TIMEOUT:-7200}" \
    python -m smg_tpu.cli.main --is_sim $FLAGS $COMMON \
    --is_testing --load_snapshot --snapshot_file "$snap" \
    --obj_mesh_dir datasets/testing \
    --testing_episode "$TEST_EP" --logging_directory "$testdir" \
    > "$testdir/test.log" 2>&1
  tail -4 "$testdir/test.log"
  test_run=$(ls -dt "$testdir"/*/ | head -1)
  RUNS+=("${test_run%/}")
  LABELS+=("eses_drl_lc_b$BATCH-test")
fi

OUT_MD="${OUT_MD:-RESULTS_bigbatch.md}"
python scripts/analyze_results.py "${RUNS[@]}" \
  --labels "$(IFS=,; echo "${LABELS[*]}")" --out "$OUT_MD"
echo "$OUT_MD written"
