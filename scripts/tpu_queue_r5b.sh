#!/usr/bin/env bash
# Round-5 staged TPU queue (supersedes tpu_queue_r5.sh's single pass).
# Stages run separately so results can be inspected between them and a
# default flip (fast_train_conv2 pk vs conv) can happen before the bench
# cache is warmed — r4's systemic failure was one unattended queue dying
# mid-way and losing everything behind it (VERDICT r4 weak #8).
#
#   bash scripts/tpu_queue_r5b.sh stageA   # kernel smoke + update matrix + sharded prod
#   bash scripts/tpu_queue_r5b.sh stageB   # bench cache warm (after any default flip)
#   bash scripts/tpu_queue_r5b.sh stageC   # segmenter train/evals + decision parity + learned-seg loop
#   bash scripts/tpu_queue_r5b.sh stageD   # 512/1024 sweep + driver-budget bench check
set -u
OUT="${OUT:-logs/tpu_queue_r5}"
mkdir -p "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

stageA() {
  # New train-mode kernels: Mosaic lowering at production shapes.
  step train_kernel_smoke timeout 1800 python scripts/tpu_train_kernel_smoke.py
  # Update matrix: reconcile bench 285.5 vs matrix 204.2 ms (VERDICT r4
  # weak #3) and measure the Pallas 'pk' mode (with its conv fallback at
  # block 1).
  step update_modes timeout 3600 python scripts/bench_update_modes.py \
    on:conv:8 on:pk:8 off:conv:8
  # Production trunk under the sharded step (VERDICT r4 #2).
  step sharded_prod timeout 3000 python scripts/sharded_prod_check.py 4
}

stageB() {
  # Full bench with an effectively unlimited watchdog: warms the
  # persistent cache for every driver leg (VERDICT r4 #4).
  step bench_warm timeout 3600 env SMG_BENCH_BUDGET=3500 python bench.py
}

stageC() {
  step train_segmenter timeout 2400 python -m smg_tpu.cli.train_segmenter \
    --steps 600 --batch_size 16 --is_cluttered --out logs/segmenter/ckpt
  step eval_seg_base timeout 1200 python scripts/eval_segmenter.py \
    --checkpoint logs/segmenter/ckpt --scenes 32 --cluttered --testing
  step eval_seg_noise timeout 1200 python scripts/eval_segmenter.py \
    --checkpoint logs/segmenter/ckpt --scenes 32 --cluttered --testing \
    --depth_noise 0.005
  step eval_seg_persp timeout 1200 python scripts/eval_segmenter.py \
    --checkpoint logs/segmenter/ckpt --scenes 32 --cluttered --testing \
    --perspective
  # Decision parity at trained weights (VERDICT r4 #6): the b32
  # attribution run's snapshot (the b256 run's logs were not kept).
  snap=$(ls -dt logs/bigbatch32/eses_drl_lc_b32/*/models/snapshot 2>/dev/null | head -1)
  if [ -n "$snap" ]; then
    step decision_parity_trained timeout 2400 python scripts/decision_parity.py \
      --scenes 8 --input_size 224 --snapshot "$snap"
  else
    echo "=== decision_parity_trained SKIPPED (no snapshot)"
  fi
  # Train through predicted masks (VERDICT r4 #6).
  step learned_seg_loop timeout 3000 python -m smg_tpu.cli.main --is_sim \
    --method reinforcement --is_pe --is_oo --batch_size 32 \
    --trunk densenet121 --input_size 224 --imagery_every 0 \
    --segmentation learned --segmenter_checkpoint logs/segmenter/ckpt \
    --training_episode 160 --logging_directory logs/learned_seg_run
}

stageD() {
  # North-star batch sweep (VERDICT r4 #7): 512/1024 train step.
  step batch_sweep_hi timeout 5400 python scripts/bench_batch_sweep.py 512 1024
  # A normal-budget bench run: what the driver will see.
  step bench_check timeout 1500 python bench.py
}

"$@"
echo "$* done; logs in $OUT"
