#!/bin/bash
# Ablation grid runner — the reference's experiment series
# ({BPTT baseline, +LO, +TD, combos}; scripts/generate_mse_plot_pong.py:84-110)
# as one script over this framework's CLI.
#
# Usage: scripts/run_ablations.sh [ENV] [ITERS] [OUT_ROOT]
set -euo pipefail

ENV="${1:-pong}"
ITERS="${2:-6000}"
ROOT="${3:-runs/ablations_$ENV}"

COMMON=(--env "$ENV" --train-iters "$ITERS" --batch-size 32
        --iters-per-video 2000 --eval-batch-size 64 --eval-timesteps 64)

run() {
    local name="$1"; shift
    local out="$ROOT/$name"
    mkdir -p "$out"
    echo ">>> ablation: $name"
    python main.py "${COMMON[@]}" --out-dir "$out" "$@" \
        > "$out/train.log" 2>&1
}

run baseline
run truncated --truncate-bptt
run latent_overshooting --latent-overshooting
run latent_td --latent-td
run counterfactual --enable-disentanglement-loss --enable-action-control-loss

python scripts/generate_mse_plot.py \
    --series "BPTT baseline:$ROOT/baseline" \
    --series "truncated BPTT:$ROOT/truncated" \
    --series "+LO:$ROOT/latent_overshooting" \
    --series "+TD(lambda):$ROOT/latent_td" \
    --series "+CF losses:$ROOT/counterfactual" \
    --metric pixel --out "$ROOT/mse_comparison.png" \
    --title "Prediction Error vs. Time ($ENV, $ITERS iters)"
echo "Ablation grid complete: $ROOT"
