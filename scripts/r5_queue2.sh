#!/bin/bash
# Round-5 TPU queue, phase 2: the full operational product at archive scale
# (VERDICT r4 "next" #3): 13-year archive, --config operational (revin +
# quantiles + stride 1 + val-tail 0.3), device-resident, surrogate backbone,
# then stride-1 test eval with ADAPTIVE conformal calibration.
set -u
cd /root/repo
LOG=/tmp/r5queue2.log
Q1=/tmp/r5queue1.log
PROC=/tmp/scale13/proc
WORK=/tmp/r5op

probe() {
  python - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(5)
try:
    s.connect(("127.0.0.1", 8082))
except Exception:
    sys.exit(1)
finally:
    s.close()
EOF
}

wait_tunnel() {
  while ! probe; do
    echo "[queue2] tunnel down, waiting 60s $(date)" >> "$LOG"
    sleep 60
  done
}

echo "=== r5 queue2 start $(date) ===" > "$LOG"

# CPU preprocess can overlap queue1's interleaved A/Bs (ratio-robust), but not
# its official benches: wait until JOB B is done (first ab_variants job starts)
while ! grep -q "ab_variants" "$Q1"; do sleep 60; done
if [ ! -f "$PROC/test_raw.npz" ]; then
  echo "=== JOB: 13-year preprocess === $(date)" >> "$LOG"
  mkdir -p /tmp/scale13
  PALLAS_AXON_POOL_IPS= timeout 3600 python -m tec_mollm_tpu.data.preprocess \
    --synthetic 56500 --out "$PROC" >> "$LOG" 2>&1
  echo "=== EXIT $? === $(date)" >> "$LOG"
fi

# TPU work only after queue1 fully drains (exclusive tunnel session)
while ! grep -q "queue1 DONE" "$Q1"; do sleep 60; done

echo "=== JOB: operational 13-year train === $(date)" >> "$LOG"
wait_tunnel
timeout 14400 python train.py --config operational --data-dir "$PROC" \
  --workdir "$WORK" --run-name op13 --epochs 6 --val-stride 37 \
  --device-data --checkpoint-every-steps 1000 \
  --gpt2-checkpoint checkpoints/surrogate_gpt2 >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== JOB: stride-1 test eval + adaptive conformal === $(date)" >> "$LOG"
wait_tunnel
timeout 7200 python test.py --data-dir "$PROC" --workdir "$WORK" \
  --run-name op13 --checkpoint latest --conformal fit \
  --conformal-mode adaptive >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== r5 queue2 DONE $(date) ===" >> "$LOG"
