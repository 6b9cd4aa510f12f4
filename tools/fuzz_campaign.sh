#!/bin/bash
# Multi-seed fuzz campaign: all generators, both modes, plus encoding.
# Usage: bash tools/fuzz_campaign.sh [cases_per_run] [n_seeds]
set -u
CASES=${1:-600}
SEEDS=${2:-6}
FAIL=0
for i in $(seq 1 "$SEEDS"); do
  for style in mixed formatting foreign; do
    python3 tools/fuzz_diff.py "$CASES" --seed "$((1000+i))" --style "$style" | tail -1
    [ ${PIPESTATUS[0]} -ne 0 ] && FAIL=1
    python3 tools/fuzz_diff.py "$CASES" --seed "$((2000+i))" --style "$style" --fragment | tail -1
    [ ${PIPESTATUS[0]} -ne 0 ] && FAIL=1
    python3 tools/fuzz_diff.py "$CASES" --seed "$((4000+i))" --style "$style" --tokens | tail -1
    [ ${PIPESTATUS[0]} -ne 0 ] && FAIL=1
  done
  python3 tools/fuzz_encoding.py "$CASES" --seed "$((3000+i))" | tail -1
  [ ${PIPESTATUS[0]} -ne 0 ] && FAIL=1
done
echo "campaign done FAIL=$FAIL"
exit $FAIL
