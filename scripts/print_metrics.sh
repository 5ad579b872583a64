#!/bin/bash
# Extract headline metrics from a run directory.
#
# Parity with the reference's shell aggregators
# (reference scripts/print_metrics_minipacman.sh:8-20,
#  scripts/parse_generalization_experiment_results.sh:3-9):
#   * MSE at horizon H = line H+1 of the pretty-printed MSE JSON
#   * MPC score = last word of each evaluation_metrics_*.txt, averaged
#
# Usage: scripts/print_metrics.sh RUN_DIR [pixel|reward]
set -euo pipefail

DIR="${1:-.}"
METRIC="${2:-pixel}"

latest_json=$(ls "$DIR"/mse_${METRIC}_iter_*.json 2>/dev/null | sort | tail -1 || true)
if [[ -n "$latest_json" ]]; then
    echo "MSE artifact: $latest_json"
    for H in 3 5 10 20; do
        # line H+1 of the JSON list (reference extraction scheme)
        val=$(sed -n "$((H + 1))p" "$latest_json" | tr -d ' ,')
        echo "  MSE@${H}: ${val:-n/a}"
    done
else
    echo "No mse_${METRIC}_iter_*.json artifacts in $DIR"
fi

scores=$(for f in "$DIR"/evaluation_metrics_*.txt; do
    [[ -e "$f" ]] || continue
    awk '{print $NF}' "$f"
done)
if [[ -n "${scores}" ]]; then
    echo "MPC episode scores:"
    echo "$scores" | awk '{s+=$1; n+=1; print "  " $1} END {if (n>0) printf "  avg over %d evals: %.3f\n", n, s/n}'
else
    echo "No evaluation_metrics_*.txt score files in $DIR"
fi
