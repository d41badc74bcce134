#!/bin/bash
# Round-5 TPU queue, phase 1: surrogate regen + preset re-bench at HEAD
# (VERDICT r4 "next" #2). Serial: one TPU process at a time (CLAUDE.md rule 3).
set -u
cd /root/repo
LOG=/tmp/r5queue1.log

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
    echo "[queue] tunnel down, waiting 60s $(date)" >> "$LOG"
    sleep 60
  done
}

run() {
  echo "=== JOB: $* === $(date)" >> "$LOG"
  wait_tunnel
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== EXIT $? === $(date)" >> "$LOG"
}

echo "=== r5 queue1 start $(date) ===" > "$LOG"

# JOB A: regenerate the surrogate GPT-2 fixture (gitignored weights wiped by reset)
run python scripts/pretrain_backbone.py --steps 3000 --seq-len 128

# JOB B: official benches at round-5 HEAD, all four presets
run python bench.py
run python bench.py --eval
run python bench.py --preset long_horizon
run python bench.py --preset scaled_backbone
run python bench.py --preset scale_up

# JOB C: pad_nodes on/off interleaved A/B per non-default preset (VERDICT weak #1)
run python scripts/ab_variants.py --variants base no_pad --preset long_horizon --batch-size 4 --steps 8 --rounds 3
run python scripts/ab_variants.py --variants base no_pad --preset scaled_backbone --batch-size 4 --steps 8 --rounds 3
run python scripts/ab_variants.py --variants base no_pad --preset scale_up --batch-size 1 --steps 4 --rounds 3

echo "=== r5 queue1 DONE $(date) ===" >> "$LOG"
