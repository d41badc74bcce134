#!/usr/bin/env bash
# End-to-end drive on synthetic data at the flagship 2911-node size:
# preprocess -> train -> evaluate vs the Historical-Average baseline -> forecast.
# Runs on whatever backend jax finds (TPU if available; pass --cpu via EXTRA
# to force CPU). Mirrors the round-2 demo recorded in BASELINE.md.
#
#   bash scripts/e2e_synthetic.sh [workdir] [steps] [epochs]
#
# GPT2_CKPT=<dir> drives the pretrained-backbone path: train.py imports the
# HF-format checkpoint (e.g. checkpoints/surrogate_gpt2 from
# scripts/pretrain_backbone.py) through models/hf_import before training —
# the exact flow a real downloaded gpt2 checkpoint would take.
set -euo pipefail

WORKDIR="${1:-/tmp/tec_e2e}"
STEPS="${2:-4000}"
EPOCHS="${3:-6}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
RUN="${RUN_NAME:-e2e_$(date +%Y%m%d_%H%M%S)}"
GPT2_ARGS=()
[ -n "${GPT2_CKPT:-}" ] && GPT2_ARGS=(--gpt2-checkpoint "$GPT2_CKPT")

# the package runs in place from the repo root; keep any site dir the TPU
# backend needs (e.g. /root/.axon_site on the tunneled dev rig) on the path too
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
[ -d /root/.axon_site ] && export PYTHONPATH="$PYTHONPATH:/root/.axon_site"

mkdir -p "$WORKDIR"
cd "$WORKDIR"

# 1. synthetic dataset with the exact CRIM pipeline shape (hermetic, CPU)
PALLAS_AXON_POOL_IPS= python -m tec_mollm_tpu.data.preprocess \
    --synthetic "$STEPS" --out proc

# 2. train (stride 1: the model needs window volume to generalize — at the
#    reference's stride-12 default the synthetic set has too few windows and
#    overfits; the real 2013-21 archive is ~12x larger)
python "$REPO/train.py" --data-dir proc --workdir . --run-name "$RUN" \
    --epochs "$EPOCHS" --train-stride 1 --batch-size 8 --accumulation-steps 1 \
    "${GPT2_ARGS[@]}"

# 3. evaluate best checkpoint vs HA (per-horizon MAE/RMSE/R2/Pearson, CSV)
python "$REPO/test.py" --data-dir proc --workdir . \
    --checkpoint "checkpoints/$RUN/best_params" --output-dir results

# 4. physical-unit forecast from the trained model
python "$REPO/predict.py" --data-dir proc --workdir . \
    --checkpoint "checkpoints/$RUN/best_params" --output-dir results

echo "results in $WORKDIR/results"
