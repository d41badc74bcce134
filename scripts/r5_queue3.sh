#!/bin/bash
# Round-5 queue, phase 3: the accuracy-parity north star head-to-head
# (VERDICT r4 "next" #1). The ACTUAL PyTorch reference trains in-env (CPU,
# compat GATv2 shim, surrogate GPT-2) on the shared 144-node arena; the same
# arena/regime then trains our stack; the reference's trained checkpoint is
# scored by BOTH eval stacks (ref_import) for the <=1% metric-parity check.
set -u
cd /root/repo
LOG=/tmp/r5queue3.log
Q1=/tmp/r5queue1.log
Q2=/tmp/r5queue2.log
REFW=/tmp/refwork
ARENA=/tmp/arena144/proc

echo "=== r5 queue3 start $(date) ===" > "$LOG"

# stage 1 (CPU): wait out queue1's official benches, then train the reference
while ! grep -q "queue1 DONE" "$Q1"; do sleep 60; done

echo "=== JOB: reference train (6 epochs, stride 1, B8) === $(date)" >> "$LOG"
PALLAS_AXON_POOL_IPS= timeout 10800 python scripts/run_reference.py \
  --workdir "$REFW" train --epochs 6 --batch_size 8 --accumulation_steps 1 \
  --train_stride 1 --num_workers 2 --patience 20 >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== JOB: reference test.py (their eval of their checkpoint) === $(date)" >> "$LOG"
PALLAS_AXON_POOL_IPS= timeout 3600 python scripts/run_reference.py \
  --workdir "$REFW" test --model_checkpoint latest >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

REF_CKPT=$(ls -t "$REFW"/checkpoints/best_model_*.pth | head -1)
echo "reference checkpoint: $REF_CKPT" >> "$LOG"

echo "=== JOB: OUR eval of the reference checkpoint (ref_import, CPU) === $(date)" >> "$LOG"
PALLAS_AXON_POOL_IPS= timeout 3600 python test.py --cpu \
  --config "$REFW/ours_config.json" --data-dir "$ARENA" --workdir "$REFW" \
  --checkpoint "$REF_CKPT" --output-dir "$REFW/results_import" >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

# stage 2 (TPU): wait for queue2 to drain the tunnel, then train OUR arm
# on the same arena/regime/pretrained backbone
while ! grep -q "queue2 DONE" "$Q2"; do sleep 60; done

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
while ! probe; do
  echo "[queue3] tunnel down, waiting 60s $(date)" >> "$LOG"
  sleep 60
done

echo "=== JOB: our arm train (TPU, same arena/regime) === $(date)" >> "$LOG"
timeout 7200 python train.py --config "$REFW/ours_config.json" \
  --data-dir "$ARENA" --workdir "$REFW" --run-name ours_h2h \
  --epochs 6 --train-stride 1 --batch-size 8 --accumulation-steps 1 \
  --gpt2-checkpoint checkpoints/surrogate_gpt2 >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== JOB: our arm eval (TPU) === $(date)" >> "$LOG"
timeout 3600 python test.py --config "$REFW/ours_config.json" \
  --data-dir "$ARENA" --workdir "$REFW" --run-name ours_h2h \
  --checkpoint latest --output-dir "$REFW/results_ours_h2h" >> "$LOG" 2>&1
echo "=== EXIT $? === $(date)" >> "$LOG"

echo "=== r5 queue3 DONE $(date) ===" >> "$LOG"
