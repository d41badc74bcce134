#!/usr/bin/env bash
# Scale-up preset — counterpart of the reference's 4-GPU preset
# (train_with_dynamic_naming.sh: L_in=336, stride 3, 6 LLM layers, effective batch 8, lr 5e-5).
# Ships the r3-tuned policy: B=1 x accum 8, remat off (+29.5% vs B=2 + remat).
set -euo pipefail

L_IN=${L_IN:-336}
STRIDE=${STRIDE:-3}
BATCH=${BATCH:-1}
ACCUM=${ACCUM:-8}
LR=${LR:-5e-5}
LLM_LAYERS=${LLM_LAYERS:-6}
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
