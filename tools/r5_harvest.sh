#!/bin/bash
# Round-5 unattended harvester: when the chip queue (r5_gen_queue.sh)
# completes, copy its evidence JSONs from the gitignored out/ tree into
# evals/ and commit, so round-end snapshots capture the results even if
# no interactive session is alive.
#
#   nohup bash tools/r5_harvest.sh <queue_pid> > /tmp/r5_harvest.log 2>&1 &
set -u
cd /root/repo
QPID=${1:?usage: r5_harvest.sh <queue_pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo ":: queue exited ($(date)); harvesting"

cp -f out/gen_training_r5/summary.json evals/gen_training_r5_summary.json 2>/dev/null
cp -f out/gen_training_r5/eval_megadepth.json evals/gen_training_r5_eval_megadepth.json 2>/dev/null
cp -f out/eval_suite_gen3/eval_suite.json evals/eval_suite_gen3.json 2>/dev/null
cp -f out/eval_suite_flagship_rescue/eval_suite.json evals/eval_suite_flagship_rescue.json 2>/dev/null
HL=$(grep -v WARNING /tmp/bench_r5.log 2>/dev/null | tail -1)
if echo "$HL" | python3 -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
  echo "$HL" > evals/bench_r5_headline.json
else
  echo ":: bench headline is not valid JSON, skipping (last line: $HL)"
fi
tail -40 /tmp/r5_gen_queue.log > evals/r5_queue_tail.log 2>/dev/null

git add evals/ 2>/dev/null
git commit -q -m "Harvest round-5 chip-queue evidence: gen-scene 3-stage training + gen3/rescue eval suites + bench" \
  && echo ":: committed" || echo ":: nothing to commit"
