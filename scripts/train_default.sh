#!/usr/bin/env bash
# Default training preset — counterpart of the reference's 2-GPU memory preset
# (train_2gpu.sh: L_in=48, stride 12, 3 LLM layers, batch 2, accum 6).
# On TPU the same effective batch comes from batch x accum x data-parallel chips.
set -euo pipefail

L_IN=${L_IN:-48}
STRIDE=${STRIDE:-12}
BATCH=${BATCH:-2}
ACCUM=${ACCUM:-6}
LR=${LR:-1e-4}
LLM_LAYERS=${LLM_LAYERS:-3}
EPOCHS=${EPOCHS:-50}
DATA_DIR=${DATA_DIR:-data/processed}

RUN_NAME="L${L_IN}_S${STRIDE}_B${BATCH}_LR${LR}_LLM${LLM_LAYERS}_$(date +%Y%m%d-%H%M)"
mkdir -p logs

python train.py \
  --data-dir "$DATA_DIR" \
  --L-in "$L_IN" --train-stride "$STRIDE" \
  --batch-size "$BATCH" --accumulation-steps "$ACCUM" \
  --lr "$LR" --llm-layers "$LLM_LAYERS" --epochs "$EPOCHS" \
  --run-name "$RUN_NAME" \
  "$@" 2>&1 | tee "logs/${RUN_NAME}.log"
