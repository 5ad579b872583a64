#!/bin/bash
# Pretrained-model demo (parity with reference start.sh:15-22, which pip-
# installed deps, fetched a pretrained SC2 tarball over wget, and ran
# --evaluate).  This framework's dependencies are jax/optax/numpy (assumed
# present); the demo trains a small gridworld model from scratch when no
# pretrained bundle is available, then runs the evaluation protocol on it.
set -euo pipefail

PRETRAINED_DIR="${PRETRAINED_DIR:-pretrained_models/gridworld}"
ENV="${DEMO_ENV:-gridworld}"

python - <<'PY'
import importlib, sys
for mod in ("jax", "optax", "numpy"):
    importlib.import_module(mod)
print("Dependencies OK")
PY

if [[ ! -f "$PRETRAINED_DIR/model-encoder.npz" ]]; then
    echo "No pretrained bundle at $PRETRAINED_DIR — training a small model"
    mkdir -p "$PRETRAINED_DIR"
    python main.py --env "$ENV" --train-iters 500 --batch-size 16 \
        --horizon-min 3 --horizon-max 5 --iters-per-video 500 \
        --eval-batch-size 16 --eval-timesteps 20 \
        --out-dir "$PRETRAINED_DIR" --no-videos
fi

echo "Running evaluation with models from $PRETRAINED_DIR"
python main.py --env "$ENV" --evaluate --evaluations 1 \
    --load-from "$PRETRAINED_DIR" --out-dir "$PRETRAINED_DIR" \
    --eval-batch-size 32 --eval-timesteps 50
