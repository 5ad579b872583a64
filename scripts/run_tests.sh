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
  # Round-4 repro matrix for the late-suite crash: a SINGLE-process full
  # run dies around test ~230 in EVERY cache mode — cold+writes (C-level
  # abort in the cache write path), warm+read-only (SIGSEGV), and cache
  # fully off (SIGSEGV in compile) — while the same tests always pass in
  # small processes.  The trigger is the number of XLA:CPU programs
  # compiled by one process, not the cache: an upstream JIT bug this
  # repo cannot patch.  The canonical full-suite run therefore uses
  # pytest-xdist worker processes, each compiling a bounded share
  # (~1/4) of the programs — below the crash threshold — with
  # per-file distribution so intra-file fixtures/order are preserved,
  # and automatic worker restart so a straggler crash surfaces as a
  # visible failure instead of killing the run.
  python -m pytest tests/ -q -n 4 --dist loadfile --max-worker-restart 2
}

case "$MODE" in
  --warm-only) warm ;;
  --verify-only) verify ;;
  all) warm && verify ;;
  *) echo "unknown mode $MODE"; exit 1 ;;
esac
