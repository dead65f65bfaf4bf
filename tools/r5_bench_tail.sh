#!/bin/bash
# After the continuation queue finishes, run the full bench (north-star
# dense-grid regime included) and commit the headline if it parses.
#   nohup bash tools/r5_bench_tail.sh <queue_pid> > /tmp/r5_bench_tail.log 2>&1 &
set -u
cd /root/repo
QPID=${1:?usage: r5_bench_tail.sh <queue_pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
sleep 90   # let the harvester commit first and the device handle release

echo ":: running full bench ($(date))"
timeout 3600 python -u bench.py > /tmp/bench_r5.log 2>&1
echo ":: bench rc=$? ($(date))"
HL=$(grep -v WARNING /tmp/bench_r5.log | tail -1)
if echo "$HL" | python3 -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
  echo "$HL" > evals/bench_r5_headline.json
  cp -f /tmp/bench_r5.log evals/bench_r5_full.log
  git add evals/bench_r5_headline.json evals/bench_r5_full.log
  git commit -q -m "Round-5 bench run: guided both-arm headline + north-star dense-grid regime" \
    && echo ":: committed" || echo ":: commit failed"
else
  echo ":: bench produced no valid JSON headline: $HL"
fi
