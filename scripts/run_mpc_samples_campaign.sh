#!/bin/bash
# Monte-Carlo planner campaign: measure --mpc-samples K=4 against the
# deterministic beam on the shipped bundles (10 episodes each), and
# re-record the minipacman exact-planner scores from the tracked bundle
# (its original score files predate the bundle export).
#
# Hypothesis: plan scores under the deterministic hard-threshold rollout
# are single chaotic draws, so near-tie argmaxes are coin flips
# (BENCH_NOTES rollout-chaos study) and gridworld's planner can lock
# into a reward-hallucination fixed point (the 0-score episodes).
# Averaging K sampled rollouts per plan estimates the plan's EXPECTED
# return - it should break the fixed point and stabilize near-tie picks.
set -e
cd "$(dirname "$0")/.."
PY=python

$PY main.py --env minipacman --evaluate --evaluations 10 --no-videos \
    --start-iter 20000 --load-from pretrained_models/minipacman_cf \
    --out-dir runs/minipacman_eval_exact
echo DONE_MINIPACMAN_EXACT

$PY main.py --env gridworld --evaluate --evaluations 10 --no-videos \
    --mpc-samples 4 --start-iter 20000 --load-from runs/gridworld_cf20 \
    --out-dir runs/gridworld_cf20/eval_mc4
echo DONE_GRIDWORLD_MC4

$PY main.py --env pong --evaluate --evaluations 10 --no-videos \
    --mpc-samples 4 --start-iter 20000 --load-from runs/pong_cf \
    --out-dir runs/pong_cf/eval_mc4
echo DONE_PONG_MC4

$PY main.py --env minipacman --evaluate --evaluations 10 --no-videos \
    --mpc-samples 4 --start-iter 20000 \
    --load-from pretrained_models/minipacman_cf \
    --out-dir runs/minipacman_eval_mc4
echo DONE_MINIPACMAN_MC4
