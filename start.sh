#!/bin/bash
# Pretrained-model demo (parity with reference start.sh:15-22, which pip-
# installed deps, fetched a pretrained SC2 tarball over wget, and ran
# --evaluate).  This framework ships pretrained bundles in-repo under
# pretrained_models/ (scripts/export_pretrained.py), so the default demo
# evaluates the tracked minipacman flagship immediately; it falls back to
# training a small gridworld model only if the bundle is absent.
set -euo pipefail

if [[ -z "${DEMO_ENV:-}" && -f pretrained_models/minipacman_cf/model-encoder.npz ]]; then
    DEMO_ENV=minipacman
    PRETRAINED_DIR="${PRETRAINED_DIR:-pretrained_models/minipacman_cf}"
fi
PRETRAINED_DIR="${PRETRAINED_DIR:-pretrained_models/gridworld}"
ENV="${DEMO_ENV:-gridworld}"
# Eval artifacts (MSE JSON/PNGs, videos) go to a scratch dir so the demo
# never dirties a git-tracked bundle.
OUT_DIR="${OUT_DIR:-runs/demo_${ENV}}"
mkdir -p "$OUT_DIR"
# PLATFORM=cpu runs the demo off-TPU (the axon plugin ignores
# JAX_PLATFORMS, so this must go through main.py --platform).
PLATFORM_ARGS=()
if [[ -n "${PLATFORM:-}" ]]; then
    PLATFORM_ARGS=(--platform "$PLATFORM")
fi

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
        --out-dir "$PRETRAINED_DIR" --no-videos "${PLATFORM_ARGS[@]}"
fi

echo "Running evaluation with models from $PRETRAINED_DIR"
python main.py --env "$ENV" --evaluate --evaluations 1 \
    --load-from "$PRETRAINED_DIR" --out-dir "$OUT_DIR" \
    --eval-batch-size 32 --eval-timesteps 50 "${PLATFORM_ARGS[@]}"
