#!/bin/bash
# Minipacman reference-recipe power-up (round-3 VERDICT "Weak #4"): bring
# the ref arm to n=30 and add the oracle control arms, so the
# ref-vs-random margin is resolved (or plainly declared unresolved).
#
# The host play loop is tunnel-latency-bound (the chip idles between
# beam calls), so three sweep processes with disjoint --seed0 ranges run
# concurrently at ~3x throughput.  The oracle arms use the on-device
# episode engine — their beam is pure env dynamics (no 64x64 convs), a
# small program the remote worker handles fine.
set -u
cd "$(dirname "$0")/.."
PY=python
EPS="${1:-10}"   # episodes per process (3 processes)

# seed0 ranges MUST be disjoint from every prior run of this arm: the
# original sweep used seed0=0, so power-up processes start at 100.
# merge_sweeps.py now refuses overlapping seeds outright (ADVICE r4
# "high": a seed0=0 rerun once duplicated the original 10 episodes
# verbatim into the tracked JSON).
for s in 100 200 300; do
  $PY scripts/mpc_sweep.py --env minipacman \
      --bundle pretrained_models/minipacman_cf \
      --episodes "$EPS" --random-episodes 0 --skip-oracle --arms ref \
      --seed0 $s --out runs/mpc_ref30_minipacman_$s.json \
      > runs/ref30_$s.log 2>&1 &
  echo "launched seed0=$s"
done
wait

# oracle control arms, on-device (env-state beam only)
$PY scripts/mpc_sweep.py --env minipacman \
    --bundle pretrained_models/minipacman_cf \
    --episodes 10 --episodes-per-call 5 --random-episodes 0 \
    --arms none --device --out runs/mpc_oracle_minipacman.json \
    > runs/oracle_minipacman.log 2>&1

# merge everything into the tracked sweep JSON
for f in runs/mpc_ref30_minipacman_0.json runs/mpc_ref30_minipacman_100.json \
         runs/mpc_ref30_minipacman_200.json runs/mpc_oracle_minipacman.json; do
  [ -f "$f" ] && $PY scripts/merge_sweeps.py docs/mpc_sweep_minipacman.json \
      "$f" --out docs/mpc_sweep_minipacman.json
done
