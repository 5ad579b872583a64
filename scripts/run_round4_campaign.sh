#!/bin/bash
# Round-4 campaign: finish what run_round3_campaign.sh prescribed but only
# ran for minipacman (round-3 VERDICT "Next round" #1/#2/#6), with
# self-verifying gates.
#
# Stages (single chip, serialized; bundles come from pretrained_models/):
#   sweep     — MPC arm sweeps for pong + gridworld (10 episodes/arm,
#               random baseline n=30, oracle arms) — the stage round 3
#               ran for minipacman only
#   ref_power — resolve the reference-recipe margin on minipacman at
#               >=3 SE: ref arm to n=30 (+ oracle_ref/oracle_deep),
#               merged into docs/mpc_sweep_minipacman.json
#   plays     — the winning arm's 10 evaluation_metrics_*.txt score files
#               are copied from the sweep's per-arm score dirs into the
#               tracked bundles (the sweep already runs them; reference
#               protocol main.py:393-399)
#   higgins   — re-run the Higgins zoo on the RETRAINED encoders and
#               refresh docs/higgins_zoo.json (round-3 rows were computed
#               on encoders the repo itself declared void)
#   students  — re-distill h64/h80 from the retrained teacher (their
#               round-2 gates are void; fidelity.json now records the
#               teacher weight hash, enforced by bench.py and
#               tests/test_pretrained_gates.py)
#   h48_recheck — re-measure the shipped h48 gate against the shipped
#               teacher (writes teacher_hash from an actual measurement)
#
# Usage: bash scripts/run_round4_campaign.sh [stage|all]
set -e
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
PY=python

sweep() {
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --arms ref,greedy,caution,greedy_caution,mc8 \
      --out runs/mpc_sweep_pong.json
  $PY scripts/mpc_sweep.py --env gridworld \
      --bundle pretrained_models/gridworld_cf \
      --episodes 10 --arms ref,greedy,caution,greedy_caution,mc8 \
      --out runs/mpc_sweep_gridworld.json
}

ref_power() {
  # 30 more ref-arm episodes on a seed0 range disjoint from the original
  # sweep's (seed0=0, episodes 0-9); merge_sweeps.py refuses overlapping
  # seed ranges, so a wrong seed0 here fails loudly instead of silently
  # duplicating episodes (ADVICE r4 "high").
  $PY scripts/mpc_sweep.py --env minipacman \
      --bundle pretrained_models/minipacman_cf \
      --episodes 30 --random-episodes 0 --arms ref --seed0 100 \
      --out runs/mpc_ref30_minipacman.json
  $PY scripts/merge_sweeps.py docs/mpc_sweep_minipacman.json \
      runs/mpc_ref30_minipacman.json --out docs/mpc_sweep_minipacman.json
}

plays() {
  # winning arms per the sweep JSONs; score files land in the bundles
  for env in pong gridworld; do
    $PY scripts/promote_winning_arm.py --sweep runs/mpc_sweep_$env.json \
        --bundle pretrained_models/${env}_cf
  done
}

higgins() {
  $PY scripts/higgins_zoo.py | tee runs/higgins_zoo.log
  [ -f runs/higgins_zoo.json ] && cp runs/higgins_zoo.json docs/higgins_zoo.json
}

students() {
  $PY scripts/distill_student.py --env minipacman \
      --teacher pretrained_models/minipacman_cf \
      --hidden 64 --iters 6000 --qat-from 0.5 --gt-iters 1500 \
      --eval-seeds 4 --out runs/minipacman_student_h64 \
      | tee runs/distill_h64.log
  $PY scripts/distill_student.py --env minipacman \
      --teacher pretrained_models/minipacman_cf \
      --hidden 80 --iters 4000 --qat-from 0.5 --gt-iters 1500 \
      --eval-seeds 4 --out runs/minipacman_student_h80 \
      | tee runs/distill_h80.log
  for run in runs/minipacman_student_h64 runs/minipacman_student_h80; do
    [ -d "$run" ] && $PY scripts/export_pretrained.py "$run"
  done
}

h48_recheck() {
  cp -r pretrained_models/minipacman_student_h48 runs/ 2>/dev/null || true
  $PY scripts/distill_student.py --env minipacman \
      --teacher pretrained_models/minipacman_cf --hidden 48 \
      --iters 8000 --qat-from 0.5 --eval-seeds 4 --fidelity-only \
      --out runs/minipacman_student_h48
  $PY scripts/export_pretrained.py runs/minipacman_student_h48
}

case "$STAGE" in
  sweep) sweep ;;
  ref_power) ref_power ;;
  plays) plays ;;
  higgins) higgins ;;
  students) students ;;
  h48_recheck) h48_recheck ;;
  all) sweep; ref_power; plays; higgins; students; h48_recheck ;;
  *) echo "unknown stage $STAGE"; exit 1 ;;
esac
