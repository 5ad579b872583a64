#!/bin/bash
# Round-5 campaign: the experiment battery behind this round's results,
# recorded for reproducibility (pattern of run_round{2,3,4}_campaign.sh).
#
# Stages:
#   dedup      — repair the minipacman sweep's duplicated ref-arm episodes
#                (ADVICE r4 "high") — already applied to the tracked JSON;
#                merge_sweeps.py now refuses overlapping seed ranges
#   bisect     — map the 64x64 on-device play worker fault
#                (scripts/repro_play64_crash.py; result: lanes x beam-steps
#                boundary, budget wired into agent/play_device.py)
#   pong       — the oracle control + full planner sweep on pong
#                (VERDICT #1: settles planner-limited vs model-limited)
#   interp     — causal-graph + excitation-BPTT artifacts per flagship
#                bundle (VERDICT #2)
#   rewards    — reward-eval arithmetic parity on identical weights
#                (VERDICT #4)
#   higgins    — multi-seed pong Higgins anatomy (VERDICT #5)
#   mfu        — training-MFU ceiling decomposition (VERDICT #8)
#
# Usage: bash scripts/run_round5_campaign.sh [stage|all]
set -e
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
PY=python

bisect() {
  $PY scripts/repro_play64_crash.py
}

pong() {
  # oracle controls (device; env-state beams)
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --random-episodes 0 --device --arms none --seed0 0 \
      --out runs/mpc_pong_oracle.json
  # depth/tradeoff arms (device, auto-chunked under the lane-step budget)
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --random-episodes 0 --skip-oracle --device \
      --arms caution,d20,d30 --seed0 0 --out runs/mpc_pong_r5a.json
  # lookahead-3 and greedy depth arms exceed the single-episode device
  # budget at 64x64 — the sweep auto-falls back to the host loop;
  # greedy arms run as parallel processes to overlap tunnel latency
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --random-episodes 0 --skip-oracle --device \
      --arms l3 --seed0 0 --out runs/mpc_pong_r5l3.json
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --random-episodes 0 --skip-oracle --device \
      --arms greedy_d20 --seed0 0 --out runs/mpc_pong_r5g20.json &
  $PY scripts/mpc_sweep.py --env pong --bundle pretrained_models/pong_cf \
      --episodes 10 --random-episodes 0 --skip-oracle --device \
      --arms greedy_d30 --seed0 0 --out runs/mpc_pong_r5g30.json &
  wait
  for f in runs/mpc_pong_oracle.json runs/mpc_pong_r5a.json \
           runs/mpc_pong_r5l3.json runs/mpc_pong_r5g20.json \
           runs/mpc_pong_r5g30.json; do
    [ -f "$f" ] && $PY scripts/merge_sweeps.py docs/mpc_sweep_pong.json \
        "$f" --out docs/mpc_sweep_pong.json
  done
}

interp() {
  SCMGAN_PLATFORM=cpu $PY scripts/interpretability_zoo.py
}

rewards() {
  $PY scripts/reference_cpu_ab/ab_paired.py \
      --ckpt pretrained_models/reference_ab_gridworld --env gridworld \
      --iter 5000 --sets 3 --rewards \
      --out-json docs/reference_ab_paired_gridworld_rewards.json
}

higgins() {
  SCMGAN_FORCE_CPU=1 $PY scripts/higgins_pong_anatomy.py
}

mfu() {
  $PY scripts/profile_mfu_ceiling.py --env pong --batch-size 32
}

case "$STAGE" in
  bisect|pong|interp|rewards|higgins|mfu) "$STAGE" ;;
  all) bisect; pong; interp; rewards; higgins; mfu ;;
  *) echo "unknown stage $STAGE"; exit 1 ;;
esac
