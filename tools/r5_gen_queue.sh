#!/bin/bash
# Round-5 unattended chip queue, leg 2 (VERDICT r4 next #5): the scaled
# generated-scene 3-stage training run, then the eval cascade on its final
# checkpoint so the comparison vs the homography-only flagship is committed
# evidence even if the driving session dies.
#
#   nohup bash tools/r5_gen_queue.sh > /tmp/r5_gen_queue.log 2>&1 &
set -u
cd /root/repo

echo ":: [1/3] scaled generated-scene 3-stage training ($(date))"
timeout 18000 python -u tools/run_generated_training.py \
    --root /tmp/gen_md_r5 --out out/gen_training_r5 \
    --train_scenes 6 --train_caps 350 --val_caps 100 \
    --stage1_iters 10000 --stage2_iters 4000 --stage3_iters 2500 \
    --valid_iter 250 \
    --init_weights checkpoints/flagship.npz \
    > /tmp/gen_train_r5.log 2>&1
echo ":: gen training rc=$? ($(date))"
sleep 10

GEN3=$(ls -d out/gen_training_r5/runs/*suffix:gen3*/checkpoints/checkpoint 2>/dev/null | head -1)
echo ":: gen3 checkpoint: $GEN3"
if [ -n "$GEN3" ]; then
  echo ":: [2/3] eval_suite on gen3 checkpoint ($(date))"
  timeout 2400 python -u tools/eval_suite.py --ckpt "$GEN3" \
      --out out/eval_suite_gen3 > /tmp/eval_suite_gen3.log 2>&1
  echo ":: eval_suite rc=$? ($(date))"
fi

echo ":: [3/4] eval_suite rescue-mode on the flagship ($(date))"
timeout 3600 python -u tools/eval_suite.py --ckpt checkpoints/flagship.npz \
    --cycle_select rescue \
    --out out/eval_suite_flagship_rescue > /tmp/eval_suite_rescue.log 2>&1
echo ":: eval_suite rescue rc=$? ($(date))"

echo ":: [4/4] full bench ($(date))"
timeout 3600 python -u bench.py > /tmp/bench_r5.log 2>&1
echo ":: bench rc=$? ($(date))"
echo ":: queue complete ($(date))"
