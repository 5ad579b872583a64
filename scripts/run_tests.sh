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
#   Phase 2 (verification): the canonical single-process full-suite run
#   with cache writes disabled (SCMGAN_TEST_CACHE_WRITE=0) — fully warm,
#   no write path, no abort surface.
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
  # cache fully OFF: round 4 measured single-process full runs dying
  # late in the suite with the cache in ANY mode (cold+writes: C abort
  # in the write path; warm+read-only: SIGSEGV on an AOT load), while
  # the same tests pass in small per-file processes.  Fresh compiles
  # are slower (~cold-suite time) but have no cache code path at all.
  SCMGAN_TEST_CACHE=0 python -m pytest tests/ -q
}

case "$MODE" in
  --warm-only) warm ;;
  --verify-only) verify ;;
  all) warm && verify ;;
  *) echo "unknown mode $MODE"; exit 1 ;;
esac
