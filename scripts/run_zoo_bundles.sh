#!/bin/bash
# Rebuild the trained-model zoo as TRACKED pretrained bundles.
#
# runs/ is untracked scratch (wiped between machines); this script
# re-establishes every checkpoint the docs cite, re-records the eval
# artifacts next to it, and snapshots each run into pretrained_models/
# via scripts/export_pretrained.py — so a fresh checkout reproduces the
# README's MPC scores, MSE tables, and the spatial-Higgins sweep
# (scripts/higgins_zoo.py) without retraining.
#
# Stages (single chip, serialized):
#   pong      — flagship pong_cf (20k iters, CF recipe) + 10 MPC plays
#               + causal graph + higgins
#   gridworld — gridworld_cf (10k iters) + 10 MPC plays
#   higgins   — minipong_cf / boxes_cf positive controls (10k iters)
#               + the zoo-wide spatial-Higgins sweep
#   export    — snapshot all of the above into pretrained_models/
#
# Usage: bash scripts/run_zoo_bundles.sh [pong|gridworld|higgins|export|all]
set -e
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
PY=python

CF=(--enable-action-control-loss --enable-disentanglement-loss
    --counterfactual-horizon 1 --no-videos)

pong() {
  $PY main.py --env pong --train-iters 20000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/pong_cf
  $PY main.py --env pong --evaluate --evaluations 10 --no-videos \
      --higgins --causal-graph --start-iter 20000 \
      --load-from runs/pong_cf --out-dir runs/pong_cf/eval \
      | tee runs/pong_cf/higgins.log
  bash scripts/print_metrics.sh runs/pong_cf/eval || true
}

gridworld() {
  $PY main.py --env gridworld --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/gridworld_cf
  $PY main.py --env gridworld --evaluate --evaluations 10 --no-videos \
      --start-iter 10000 \
      --load-from runs/gridworld_cf --out-dir runs/gridworld_cf/eval
  bash scripts/print_metrics.sh runs/gridworld_cf/eval || true
}

higgins() {
  $PY main.py --env minipong --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/minipong_cf
  $PY main.py --env boxes --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/boxes_cf
  $PY scripts/higgins_zoo.py | tee runs/higgins_zoo.log
}

export_bundles() {
  for run in runs/pong_cf runs/gridworld_cf runs/minipong_cf runs/boxes_cf; do
    [ -d "$run" ] && $PY scripts/export_pretrained.py "$run"
  done
  # eval artifacts live one level down; copy score files into the bundle
  for run in pong_cf gridworld_cf; do
    if [ -d "runs/$run/eval" ] && [ -d "pretrained_models/$run" ]; then
      mkdir -p "pretrained_models/$run/eval"
      cp runs/$run/eval/evaluation_metrics_*.txt \
         "pretrained_models/$run/eval/" 2>/dev/null || true
    fi
  done
  [ -f runs/higgins_zoo.json ] && cp runs/higgins_zoo.json docs/higgins_zoo.json
}

case "$STAGE" in
  pong) pong ;;
  gridworld) gridworld ;;
  higgins) higgins ;;
  export) export_bundles ;;
  all) pong; gridworld; higgins; export_bundles ;;
  *) echo "unknown stage $STAGE"; exit 1 ;;
esac
