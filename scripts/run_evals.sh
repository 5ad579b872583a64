#!/bin/bash
# Launch evaluation jobs for a set of checkpoints, including the
# generalization variants (parity with reference scripts/run_evals.sh:17-20,
# which dispatched via the gnomehat job runner; here they run inline).
#
# Usage: scripts/run_evals.sh CKPT_DIR [ENV] [N_EVALS]
set -euo pipefail

CKPT="${1:?usage: run_evals.sh CKPT_DIR [ENV] [N_EVALS]}"
ENV="${2:-pong}"
N="${3:-10}"

run() {
    echo ">>> $*"
    python main.py "$@"
}

run --env "$ENV" --evaluate --evaluations "$N" --load-from "$CKPT"

# SC2 generalization variants A/B/C (reference datasource.py:11-16)
if [[ "$ENV" == "sc2_star_intruders" ]]; then
    for variant in a b c; do
        run --env "sc2_star_intruders_variant_${variant}" \
            --evaluate --evaluations "$N" --load-from "$CKPT"
    done
fi
