#!/usr/bin/env bash
# Scale-up preset — counterpart of the reference's 4-GPU preset
# (train_with_dynamic_naming.sh: L_in=336, stride 3, 6 LLM layers, effective batch 8, lr 5e-5).
# Drives `--config scale_up` so the run's config.json records the preset's FULL
# tuned policy (incl. eval_batch_size=4 — the default 16 OOMs a single chip at
# these shapes); env vars override individual knobs (explicit flags beat --config).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/processed}
STAMP=$(date +%Y%m%d-%H%M)
mkdir -p logs

ARGS=(--config scale_up --data-dir "$DATA_DIR")
[[ -n "${L_IN:-}" ]] && ARGS+=(--L-in "$L_IN")
[[ -n "${STRIDE:-}" ]] && ARGS+=(--train-stride "$STRIDE")
[[ -n "${BATCH:-}" ]] && ARGS+=(--batch-size "$BATCH")
[[ -n "${ACCUM:-}" ]] && ARGS+=(--accumulation-steps "$ACCUM")
[[ -n "${LR:-}" ]] && ARGS+=(--lr "$LR")
[[ -n "${LLM_LAYERS:-}" ]] && ARGS+=(--llm-layers "$LLM_LAYERS")
[[ -n "${EPOCHS:-}" ]] && ARGS+=(--epochs "$EPOCHS")

# train.py derives the dynamic L/S/B/LR/LLM run name from the resolved config
python train.py "${ARGS[@]}" "$@" 2>&1 | tee "logs/scale_up_${STAMP}.log"
