#!/bin/bash
# Round-3 retraining campaign.
#
# Round 3 fixed an off-by-one action alignment in the on-device rollout
# (commit d3c536a): actions[t] now produces obs[t+1], the reference's
# convention (reference envs/gridworld.py:77-92). Every round-2 bundle
# was trained on misaligned data — the transition silently learned
# action-independent dynamics, which is why MPC was ~random beyond
# gridworld. This script re-establishes the whole tracked zoo on
# correctly-aligned data and re-records every eval artifact.
#
# Stages (single chip, serialized):
#   train    — retrain the 5 zoo bundles (CF recipe, same iters as r2)
#   sweep    — MPC arm sweep on minipacman + pong + gridworld
#   plays    — 10 MPC score files per flagship env (best arm flags set
#              AFTER reading the sweep; see run_plays below)
#   higgins  — zoo-wide spatial-Higgins sweep
#   export   — snapshot into pretrained_models/ + copy eval artifacts
#
# Usage: bash scripts/run_round3_campaign.sh [train|sweep|plays|higgins|export|all]
set -e
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
PY=python

CF=(--enable-action-control-loss --enable-disentanglement-loss
    --counterfactual-horizon 1 --no-videos)

train() {
  $PY main.py --env minipacman --train-iters 20000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/minipacman_cf
  $PY main.py --env pong --train-iters 20000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/pong_cf
  $PY main.py --env gridworld --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/gridworld_cf
  $PY main.py --env minipong --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/minipong_cf
  $PY main.py --env boxes --train-iters 10000 --iters-per-video 10000 \
      "${CF[@]}" --out-dir runs/boxes_cf
}

sweep() {
  $PY scripts/mpc_sweep.py --env minipacman --bundle runs/minipacman_cf \
      --episodes 10 | tee runs/mpc_sweep_minipacman.log
  $PY scripts/mpc_sweep.py --env pong --bundle runs/pong_cf \
      --episodes 10 | tee runs/mpc_sweep_pong.log
  $PY scripts/mpc_sweep.py --env gridworld --bundle runs/gridworld_cf \
      --episodes 10 | tee runs/mpc_sweep_gridworld.log
}

# Final 10-episode score files with the winning arm per env. The MPC
# flags below are updated after reading runs/mpc_sweep_*.json.
run_plays() {
  local env=$1 run=$2 iters=$3; shift 3
  $PY main.py --env "$env" --evaluate --evaluations 10 --no-videos \
      --start-iter "$iters" --load-from "runs/$run" \
      --out-dir "runs/$run/eval" "$@"
}

plays() {
  run_plays minipacman minipacman_cf 20000
  run_plays pong pong_cf 20000
  run_plays gridworld gridworld_cf 10000
}

higgins() {
  $PY scripts/higgins_zoo.py | tee runs/higgins_zoo.log
}

# Re-distill the serving students from the retrained teacher: the round-2
# students live in the OLD teacher's latent space (misaligned-action
# dynamics) so their weights and fidelity gates are void. Same schedules
# that cleared the gate in round 2 (BENCH_NOTES "Distillation breaks the
# ceiling"): narrower width x longer schedule.
students() {
  $PY scripts/distill_student.py --env minipacman --teacher runs/minipacman_cf \
      --hidden 48 --iters 8000 --qat-from 0.5 --gt-iters 2500 \
      --eval-seeds 4 --out runs/minipacman_student_h48 \
      | tee runs/distill_h48.log
  $PY scripts/distill_student.py --env minipacman --teacher runs/minipacman_cf \
      --hidden 64 --iters 6000 --qat-from 0.5 --gt-iters 1500 \
      --eval-seeds 4 --out runs/minipacman_student_h64 \
      | tee runs/distill_h64.log
  $PY scripts/distill_student.py --env minipacman --teacher runs/minipacman_cf \
      --hidden 80 --iters 4000 --qat-from 0.5 --gt-iters 1500 \
      --eval-seeds 4 --out runs/minipacman_student_h80 \
      | tee runs/distill_h80.log
}

export_bundles() {
  for run in runs/minipacman_cf runs/pong_cf runs/gridworld_cf \
             runs/minipong_cf runs/boxes_cf runs/minipacman_student_h48 \
             runs/minipacman_student_h64 runs/minipacman_student_h80; do
    [ -d "$run" ] && $PY scripts/export_pretrained.py "$run"
  done
  for run in minipacman_cf pong_cf gridworld_cf; do
    if [ -d "runs/$run/eval" ] && [ -d "pretrained_models/$run" ]; then
      mkdir -p "pretrained_models/$run/eval"
      cp runs/$run/eval/evaluation_metrics_*.txt \
         "pretrained_models/$run/eval/" 2>/dev/null || true
    fi
  done
  [ -f runs/higgins_zoo.json ] && cp runs/higgins_zoo.json docs/higgins_zoo.json
}

case "$STAGE" in
  train) train ;;
  sweep) sweep ;;
  plays) plays ;;
  higgins) higgins ;;
  students) students ;;
  export) export_bundles ;;
  all) train; sweep; higgins; students; export_bundles ;;
  *) echo "unknown stage $STAGE"; exit 1 ;;
esac
