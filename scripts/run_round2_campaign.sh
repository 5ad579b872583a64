#!/bin/bash
# Round-2 training + evaluation campaign (single chip, serialized).
#
# Produces the artifacts the reference's experiment protocol defines
# (SURVEY §6): trained flagship models, MPC cumulative-reward score files
# averaged over 10 evaluations (reference main.py:397-399,
# scripts/run_evals.sh:17-20), the stochastic-vs-deterministic ablation
# grid at 5k iters (reference scripts/generate_mse_plot_deterministic.py),
# and a Higgins positive control on a fully-identifiable env.
#
# Usage: bash scripts/run_round2_campaign.sh [stage]
#   stages: flagship | grid | higgins | evals | all
set -e
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
PY=python

flagship() {
  # Flagship models with the counterfactual recipe (round-1 README: CF
  # halves MSE@20 vs the BPTT baseline on pong).
  $PY main.py --env pong --train-iters 20000 --iters-per-video 10000 \
      --enable-action-control-loss --enable-disentanglement-loss \
      --counterfactual-horizon 1 --no-videos --out-dir runs/pong_cf
  $PY main.py --env minipacman --train-iters 20000 --iters-per-video 10000 \
      --enable-action-control-loss --enable-disentanglement-loss \
      --counterfactual-horizon 1 --no-videos --out-dir runs/minipacman_cf
}

grid() {
  # Ablation grid: {BPTT, +LO, +TD, +CF} x {stochastic, deterministic}
  # at 5k iters on pong (mirrors the reference deterministic plot script).
  for det in "" "--deterministic-transition"; do
    tag=$([ -n "$det" ] && echo "_det" || echo "")
    $PY main.py --env pong --train-iters 5000 --iters-per-video 5000 \
        --no-videos $det --out-dir "runs/grid_bptt$tag"
    $PY main.py --env pong --train-iters 5000 --iters-per-video 5000 \
        --latent-overshooting --no-videos $det --out-dir "runs/grid_lo$tag"
    $PY main.py --env pong --train-iters 5000 --iters-per-video 5000 \
        --latent-td --no-videos $det --out-dir "runs/grid_td$tag"
    $PY main.py --env pong --train-iters 5000 --iters-per-video 5000 \
        --enable-action-control-loss --enable-disentanglement-loss \
        --no-videos $det --out-dir "runs/grid_cf$tag"
  done
}

higgins() {
  # Positive control: minipong's 4 factors are fully identifiable from
  # pixels (reference envs/minipong.py:91-105); boxes likewise.
  $PY main.py --env minipong --train-iters 10000 --iters-per-video 10000 \
      --enable-action-control-loss --enable-disentanglement-loss \
      --no-videos --out-dir runs/minipong_cf
  $PY main.py --env boxes --train-iters 10000 --iters-per-video 10000 \
      --enable-action-control-loss --enable-disentanglement-loss \
      --no-videos --out-dir runs/boxes_cf
  $PY main.py --env minipong --evaluate --higgins --no-videos \
      --load-from runs/minipong_cf --out-dir runs/minipong_cf/eval \
      | tee runs/minipong_cf/higgins.log
  $PY main.py --env boxes --evaluate --higgins --no-videos \
      --load-from runs/boxes_cf --out-dir runs/boxes_cf/eval \
      | tee runs/boxes_cf/higgins.log
}

evals() {
  # MPC cumulative-reward scores: 10 playthroughs per model (the
  # reference's second headline metric).
  $PY main.py --env pong --evaluate --evaluations 10 --no-videos \
      --load-from runs/pong_cf --out-dir runs/pong_cf/eval
  $PY main.py --env minipacman --evaluate --evaluations 10 --no-videos \
      --load-from runs/minipacman_cf --out-dir runs/minipacman_cf/eval
  bash scripts/print_metrics.sh runs/pong_cf/eval || true
  bash scripts/print_metrics.sh runs/minipacman_cf/eval || true
}

case "$STAGE" in
  flagship) flagship ;;
  grid) grid ;;
  higgins) higgins ;;
  evals) evals ;;
  all) flagship; evals; grid; higgins ;;
  *) echo "unknown stage $STAGE"; exit 1 ;;
esac
