#!/bin/bash
# Round-5 unattended chip queue: the moment the r4b training process exits,
# run the eval cascade back-to-back so the (exclusive) chip never idles even
# if the driving session dies. Publish decisions stay manual — this script
# only produces evidence JSONs under out/.
#
#   nohup bash tools/r5_chip_queue.sh <train_pid> > /tmp/r5_queue.log 2>&1 &
set -u
cd /root/repo
TRAIN_PID=${1:?usage: r5_chip_queue.sh <train_pid> [ckpt]}
CKPT=${2:-out/r4b_flagship/checkpoints/checkpoint}

echo ":: waiting for training pid $TRAIN_PID to exit ($(date))"
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 20; done
echo ":: training exited ($(date)); last log lines:"
tail -3 /tmp/r4b_train.log
sleep 10   # let the device handle release

echo ":: [1/3] eval_suite on r4b checkpoint ($(date))"
timeout 2400 python -u tools/eval_suite.py --ckpt "$CKPT" \
    --out out/eval_suite_r4b > /tmp/eval_suite_r4b.log 2>&1
echo ":: eval_suite rc=$? ($(date))"

echo ":: [2/3] eval_suite --cycle_select on r4b checkpoint ($(date))"
timeout 3600 python -u tools/eval_suite.py --ckpt "$CKPT" --cycle_select \
    --out out/eval_suite_r4b_cs > /tmp/eval_suite_r4b_cs.log 2>&1
echo ":: eval_suite cycle_select rc=$? ($(date))"

echo ":: [3/3] diagnose_tail --cycle_select ($(date))"
timeout 2400 python -u tools/diagnose_tail.py --ckpt "$CKPT" --cycle_select \
    --out out/diagnose_tail_cs > /tmp/diagnose_tail_cs.log 2>&1
echo ":: diagnose_tail rc=$? ($(date))"
echo ":: queue complete ($(date))"
