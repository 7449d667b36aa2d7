#!/usr/bin/env bash
# Chunked full-suite run on the REAL TPU backend (SM_TEST_BACKEND=tpu),
# one test file per pytest invocation so tunnel blackouts lose at most one
# chunk and results accumulate incrementally in tpu_suite_results.txt.
#
# Run alone: only ONE process may talk to the TPU at a time.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_suite_results.txt}
: > "$OUT"
for f in tests/test_*.py; do
    start=$(date +%s)
    # 40-min ceiling per file: a blackout-stalled chunk gets killed and
    # recorded as TIMEOUT rather than wedging the whole run.
    out=$(SM_TEST_BACKEND=tpu timeout 2400 python -m pytest "$f" -q --no-header 2>&1)
    rc=$?   # pytest's exit code, not tail's (a piped capture masked failures)
    res=$(echo "$out" | tail -3)
    dur=$(( $(date +%s) - start ))
    tally=$(echo "$res" | grep -Eo '[0-9]+ (passed|failed|skipped|error)[a-z]*' | tr '\n' ' ')
    if [ $rc -eq 124 ]; then tally="TIMEOUT"; fi
    echo "$f | rc=$rc | ${dur}s | ${tally:-$(echo "$res" | tail -1)}" >> "$OUT"
    echo "done $f rc=$rc ${dur}s" >&2
done
echo "ALL DONE" >> "$OUT"
