#!/usr/bin/env bash
# Round-close pre-flight: refuse to snapshot with a red suite.
#
# Rounds 11 and 12 both shipped end-of-round snapshots carrying a failing
# test; the round-12 verdict asked for this rule to be MECHANICAL. Run
# this before the final commit of a round (and before any commit that
# claims a green suite): it runs the full ScalaTest suite, appends an
# auditable line to tools/preflight.log, and exits non-zero on any
# failure so a `preflight.sh && git commit` chain cannot snapshot red.
set -u
cd "$(dirname "$0")/.."
sha="$(git rev-parse --short HEAD 2>/dev/null || echo unknown)"
start="$(date -u +%Y-%m-%dT%H:%M:%SZ)"
out="$(mktemp)"
sbt -batch test >"$out" 2>&1
rc=$?
summary="$(grep -E '^\[info\] (Tests:|Passed:)|TESTS? FAILED|error' "$out" | tail -3 | tr '\n' ' ')"
if [ $rc -eq 0 ]; then
  echo "$start PASS head=$sha $summary" >> tools/preflight.log
  echo "preflight: GREEN — safe to snapshot ($summary)"
else
  echo "$start FAIL head=$sha $summary" >> tools/preflight.log
  echo "preflight: RED — DO NOT SNAPSHOT. Failing output tail:"
  tail -40 "$out"
fi
rm -f "$out"
exit $rc
