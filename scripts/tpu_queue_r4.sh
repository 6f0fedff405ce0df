#!/usr/bin/env bash
# Round-4 TPU measurement backlog — run serially when the axon tunnel is
# live (the chip is exclusive: nothing else may touch it meanwhile).
#
#   bash scripts/tpu_queue_r4.sh [outdir]
#
# Steps (each logged to $OUT/<step>.log; a failed step does not stop the
# queue):
#   1. sharded-prod: the production DenseNet-121 + Pallas fast-eval path
#      under make_sharded_step on the real chip (VERDICT r3 weak #8).
#   2. bigbatch: flagship eses_drl_lc training at batch 256 under the
#      round-3/4 defaults + held-out test (VERDICT r3 missing #1).
#   3. segmenter: train the learned front-end, report mIoU/detection vs
#      the exact id-buffer on held-out scenes (VERDICT r3 missing #3).
#   4. decision-parity at production shape with the bigbatch snapshot.
#   5. batch sweep to 512/1024 (VERDICT r3 weak #7).

set -u
OUT="${1:-logs/tpu_queue_r4}"
mkdir -p "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

step sharded_prod timeout 2400 python scripts/sharded_prod_check.py 4

step bigbatch timeout 7000 bash scripts/run_bigbatch.sh 256 6400 300

step train_segmenter timeout 3600 python -m smg_tpu.cli.train_segmenter \
  --steps 600 --batch_size 16 --is_cluttered --out logs/segmenter/ckpt
step eval_segmenter_train timeout 1200 python scripts/eval_segmenter.py \
  --checkpoint logs/segmenter/ckpt --scenes 32 --cluttered
step eval_segmenter_test timeout 1200 python scripts/eval_segmenter.py \
  --checkpoint logs/segmenter/ckpt --scenes 32 --cluttered --testing
step learned_seg_loop timeout 3000 python -m smg_tpu.cli.main --is_sim \
  --method reinforcement --is_pe --is_oo --batch_size 32 \
  --trunk densenet121 --input_size 224 --imagery_every 0 \
  --segmentation learned --segmenter_checkpoint logs/segmenter/ckpt \
  --training_episode 160 --logging_directory logs/learned_seg_run

snap=$(ls -dt logs/bigbatch/eses_drl_lc_b256/*/models/snapshot 2>/dev/null | head -1)
if [ -n "$snap" ]; then
  step decision_parity_trained timeout 2400 python scripts/decision_parity.py \
    --scenes 8 --input_size 224 --snapshot "$snap"
fi
step decision_parity_init timeout 2400 python scripts/decision_parity.py \
  --scenes 8 --input_size 224

step batch_sweep_hi timeout 5400 python scripts/bench_batch_sweep.py 512 1024

echo "queue done; logs in $OUT"
