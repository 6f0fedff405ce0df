#!/usr/bin/env bash
# The 5 BASELINE.md configurations (reference README.md:42-73), trained and
# tested on one chip, then summarized into RESULTS.md.
#
# Usage: bash scripts/run_baselines.sh [BATCH] [TRAIN_EP] [TEST_EP] [OUTDIR]
set -u
cd "$(dirname "$0")/.."

BATCH="${1:-32}"
TRAIN_EP="${2:-800}"
TEST_EP="${3:-300}"
OUT="${4:-logs/baselines}"
COMMON="--batch_size $BATCH --imagery_every 0 --trunk densenet121 --input_size 224"
# PRETRAINED=<ckpt dir>: warm-start every training run's trunks from a
# cli.pretrain_trunks checkpoint (the reference trains from ImageNet
# weights, models.py:22,308; this is the self-supervised substitute).
if [ -n "${PRETRAINED:-}" ]; then
  COMMON="$COMMON --pretrained_trunks $PRETRAINED"
fi

declare -a NAMES=(
  "es_reactive_lc"
  "es_drl_lc"
  "eses_reactive_lc"
  "eses_drl_lc"
  "eses_drl_hc"
)
declare -a FLAGS=(
  "--method reactive --is_pe --is_oo --explore_rate_decay"
  "--method reinforcement --is_pe --is_oo"
  "--method reactive --is_ets --is_pe --is_oo --explore_rate_decay"
  "--method reinforcement --is_ets --is_pe --is_oo"
  "--method reinforcement --is_ets --is_pe --is_oo --is_cluttered"
)

mkdir -p "$OUT"
RUNS=()
LABELS=()
for i in "${!NAMES[@]}"; do
  name="${NAMES[$i]}"
  dir="$OUT/$name"
  mkdir -p "$dir"
  echo "=== train $name ==="
  timeout "${RUN_TIMEOUT:-5400}" \
    python -m smg_tpu.cli.main --is_sim ${FLAGS[$i]} $COMMON \
    --training_episode "$TRAIN_EP" --logging_directory "$dir" \
    > "$dir/train.log" 2>&1
  tail -4 "$dir/train.log"
  run_dir=$(ls -dt "$dir"/*/ | head -1)
  RUNS+=("${run_dir%/}")
  LABELS+=("$name-train")
  snap="${run_dir%/}/models/snapshot"
  if [ -d "$snap" ]; then
    echo "=== test $name ==="
    testdir="$OUT/${name}_test"
    mkdir -p "$testdir"
    # Held-out object set (reference README.md:76-113 testing command
    # passes --obj_mesh_dir datasets/testing).
    timeout "${RUN_TIMEOUT:-5400}" \
      python -m smg_tpu.cli.main --is_sim ${FLAGS[$i]} $COMMON \
      --is_testing --load_snapshot --snapshot_file "$snap" \
      --obj_mesh_dir datasets/testing \
      --testing_episode "$TEST_EP" --logging_directory "$testdir" \
      > "$testdir/test.log" 2>&1
    tail -4 "$testdir/test.log"
    test_run=$(ls -dt "$testdir"/*/ | head -1)
    RUNS+=("${test_run%/}")
    LABELS+=("$name-test")
  fi
done

python scripts/analyze_results.py "${RUNS[@]}" \
  --labels "$(IFS=,; echo "${LABELS[*]}")" --out RESULTS.md
echo "RESULTS.md written"
