#!/bin/bash
# Round-5 queue, phase 4: 42-day autoregressive rollout on the OPERATIONAL
# 13-year checkpoint (revin + quantile head) — extends the r4 rollout row
# (plain flagship: MAE 1.2746 over 504 steps) to the operational bundle.
set -u
cd /root/repo
LOG=/tmp/r5queue4.log
Q3=/tmp/r5queue3.log

echo "=== r5 queue4 start $(date) ===" > "$LOG"
while ! grep -q "queue3 DONE" "$Q3"; do sleep 60; done

echo "=== JOB: 504-step rollout on op13 === $(date)" >> "$LOG"
timeout 7200 python test.py --data-dir /tmp/scale13/proc --workdir /tmp/r5op \
  --run-name op13 --checkpoint latest --rollout-steps 504 --rollout-windows 8 \
  --output-dir /tmp/r5op/results_rollout >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== r5 queue4 DONE $(date) ===" >> "$LOG"
