#!/bin/bash
# Full-suite runner that cannot be killed by the XLA:CPU cache-write abort.
#
# History: rounds 2-4 observed `Fatal Python error: Aborted` near the end
# of full single-process suite runs, inside the persistent-cache write
# path (put_executable_and_time / executable serialize).  Round 4
# isolated the trigger profile: it needs BOTH a cache-cold big program
# AND hundreds of prior compilations in the same process — the same
# tests pass in isolation with a cold cache (test_train 7/7, 282s), and
# a warm suite performs no writes at all.  Foreign-machine AOT cache
# entries (fixed by fingerprint-keyed cache dirs, conftest.py) were an
# earlier aggravator with the same symptom.
#
# Strategy:
#   Phase 1 (warming, only work when the cache is cold): run each test
#   file in its OWN pytest process with writes enabled.  Per-process
#   compile count stays small, which is outside the abort's trigger
#   profile, and every compiled program lands in the persistent cache.
#   Phase 2 (verification): the canonical full-suite run under
#   pytest-xdist, workers derived from the per-process compile budget
#   (see verify() below), persistent cache enabled.  A standalone
#   no-repo-imports repro of the underlying XLA:CPU limit is
#   scripts/repro_xla_crash.py.
#
# Usage: bash scripts/run_tests.sh [--warm-only|--verify-only]
set -u
cd "$(dirname "$0")/.."
MODE="${1:-all}"

warm() {
  local fail=0
  for f in tests/test_*.py; do
    echo "== warm: $f"
    python -m pytest "$f" -q -p no:cacheprovider || fail=1
  done
  return $fail
}

verify() {
  # Round-4 repro matrix for the late-suite crash: a SINGLE-process full
  # run dies around test ~230 in EVERY cache mode — cold+writes (C-level
  # abort in the cache write path), warm+read-only (SIGSEGV), and cache
  # fully off (SIGSEGV in compile) — while the same tests always pass in
  # small processes.  The trigger is the number of XLA:CPU programs
  # compiled by one process, not the cache: an upstream JIT bug this
  # repo cannot patch (standalone repro: scripts/repro_xla_crash.py).
  # The canonical full-suite run therefore uses pytest-xdist worker
  # processes, each compiling a bounded share of the programs — below
  # the crash threshold — with per-file distribution so intra-file
  # fixtures/order are preserved, and automatic worker restart so a
  # straggler crash surfaces as a visible failure instead of killing
  # the run.
  #
  # Worker count is derived from the compile budget, NOT from CPU
  # count: the binding constraint is per-process program count (a
  # single process dies at ~230 programs; the full suite compiles
  # ~260), so even a 1-CPU box needs >=ceil(260/80)=4 workers.  Extra
  # workers beyond the minimum are only added when real CPUs exist to
  # run them.
  local workers
  workers=$(python -c "
import os, glob
programs = 260          # full-suite distinct-program count (measured)
budget = 80             # per-process compiles, well under the ~230 crash
need = -(-programs // budget)
print(max(need, min(os.cpu_count() or 1, 2 * need)))")
  echo "== verify: pytest-xdist with $workers workers"
  python -m pytest tests/ -q -n "$workers" --dist loadfile \
      --max-worker-restart 2
}

case "$MODE" in
  --warm-only) warm ;;
  --verify-only) verify ;;
  all) warm && verify ;;
  *) echo "unknown mode $MODE"; exit 1 ;;
esac
