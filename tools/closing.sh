#!/usr/bin/env bash
# Closing-verification runner — mechanizes the freeze ordering that
# slipped by hand in rounds 10 and 11 (a closing record was committed,
# then more code commits followed it, so the recorded sweep predated
# the snapshot).
#
# Contract:
#   1. Refuses to run on a dirty tree — the record must describe a
#      commit, not a working state.
#   2. Captures HEAD (the last CODE commit), runs the full closing
#      sweep on it: sbt test, Verify+oracle at all three SFs, Bench at
#      sf0.1.
#   3. Writes CLOSING_RECORD.md with that sha INSIDE it and commits
#      the record (plus the refreshed BENCH_FULL.json the bench run
#      rewrites) as the very next commit.
#   4. tools/check_closing.sh then verifies, from git alone, that the
#      record's recorded sha == the record commit's parent and that no
#      commits follow the record. Any code commit after the record
#      makes the check FAIL — regenerate the record, don't explain it.
#
# Usage: bash tools/closing.sh            (full sweep, ~20 min)
#        bash tools/closing.sh --quick    (skip sbt test; for re-runs
#                                          when only docs moved — the
#                                          record marks itself QUICK)
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ -n "$(git status --porcelain)" ]]; then
  echo "closing.sh: working tree is dirty — commit or stash first" >&2
  git status --short >&2
  exit 1
fi

SHA=$(git rev-parse HEAD)
QUICK=${1:-}
echo "[closing] verifying HEAD=$SHA"

# --quick's stated precondition is "only docs moved since the last FULL
# sweep" — ENFORCED, not trusted: a QUICK record atop code changes
# would pass check_closing.sh while sbt test never ran on that code.
# (check_closing.sh independently re-verifies this from git alone.)
if [[ "$QUICK" == "--quick" ]]; then
  source tools/closing_paths.sh
  LAST_FULL=$(last_full_verified_sha HEAD || true)
  if [[ -z "$LAST_FULL" ]]; then
    echo "closing.sh: --quick needs a prior parent-linked FULL record" >&2
    echo "  to anchor the docs-only check — run the full sweep first" >&2
    exit 1
  fi
  CODE_MOVED=$(git diff --name-only "$LAST_FULL" HEAD -- \
    "${CODE_PATHS[@]}" || echo __DIFF_FAILED__)
  if [[ -n "$CODE_MOVED" ]]; then
    echo "closing.sh: --quick refused — code moved since the last FULL" >&2
    echo "  sweep (${LAST_FULL:0:9}):" >&2
    echo "$CODE_MOVED" | head -20 >&2
    echo "  run the full sweep instead" >&2
    exit 1
  fi
fi

TESTLINE="(skipped: --quick)"
if [[ "$QUICK" != "--quick" ]]; then
  echo "[closing] sbt test..."
  sbt -batch test > /tmp/closing_test.log 2>&1 || {
    echo "closing.sh: sbt test FAILED — see /tmp/closing_test.log" >&2
    tail -30 /tmp/closing_test.log >&2
    exit 1
  }
  # every grep-substitution carries '|| true': under set -e+pipefail a
  # non-matching grep would otherwise kill the script silently AFTER a
  # succeeded 20-minute sweep; the emptiness checks below stay loud
  TESTLINE=$(grep -E "Tests: succeeded" /tmp/closing_test.log | tail -1 | sed 's/\[info\] *//' || true)
  if [[ -z "$TESTLINE" ]]; then
    echo "closing.sh: could not find the test summary line in /tmp/closing_test.log" >&2
    exit 1
  fi
  # one UNAMBIGUOUS tuple (suites / ScalaTest cases / sbt total tasks):
  # rounds 12 and 13 recorded different counting methods (439 tasks vs
  # 428 cases) and the delta needed adjudicating — recording all three
  # names every round makes the comparison mechanical
  SUITES=$(grep -E "Suites: completed" /tmp/closing_test.log | tail -1 \
    | sed -n 's/.*Suites: completed \([0-9]*\).*/\1/p' || true)
  CASES=$(echo "$TESTLINE" | sed -n 's/.*Tests: succeeded \([0-9]*\).*/\1/p' || true)
  TASKS=$(grep -E "Passed: Total" /tmp/closing_test.log | tail -1 \
    | sed -n 's/.*Passed: Total \([0-9]*\).*/\1/p' || true)
  TESTLINE="$TESTLINE (tuple: suites=${SUITES:-?} cases=${CASES:-?} total_tasks=${TASKS:-?})"
fi

VERIFY_LINES=""
for sf in sf0.001 sf0.01 sf0.1; do
  echo "[closing] verify $sf..."
  # stale-output guard: Verify catches per-query failures (exit 0) and
  # a previous sweep's parquet would make check_oracle pass on OLD
  # results — wipe the dir first and grep the log for per-query errors
  rm -rf "/tmp/closing_verify_$sf"
  sbt -batch "runMain graft.Verify /root/testdata/$sf /tmp/closing_verify_$sf" \
    > /tmp/closing_verify_$sf.log 2>&1 || {
    echo "closing.sh: Verify $sf FAILED" >&2; exit 1; }
  if grep -q "\[verify\] .* failed" /tmp/closing_verify_$sf.log; then
    echo "closing.sh: per-query Verify failures at $sf:" >&2
    grep "\[verify\] .* failed" /tmp/closing_verify_$sf.log >&2
    exit 1
  fi
  # `|| true` inside the substitution: with set -e + pipefail, a
  # failing check_oracle would otherwise kill the script AT this
  # assignment, silently — before the loud case-statement below
  line=$(python3 tools/check_oracle.py /root/testdata/$sf /tmp/closing_verify_$sf 2>/dev/null | tail -1 || true)
  echo "[closing]   $sf: $line"
  case "$line" in
    *" 0 fail"*) ;;
    *) echo "closing.sh: oracle gate FAILED at $sf: $line" >&2; exit 1 ;;
  esac
  VERIFY_LINES="$VERIFY_LINES- $sf: $line"$'\n'
done

echo "[closing] bench sf0.1..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/closing_bench.log 2>/tmp/closing_bench.err || {
  echo "closing.sh: Bench FAILED" >&2; exit 1; }
BENCHLINE=$(grep -E "^\[bench\] [0-9]+ queries" /tmp/closing_bench.err | tail -1 | sed 's/\[bench\] *//' || true)
RIDELINE=$(grep -E "^\[bench\] ride-along" /tmp/closing_bench.err | tail -1 | sed 's/\[bench\] *//' || true)
CALLINE=$(grep -E "^\[bench\] calibration" /tmp/closing_bench.err | tail -1 | sed 's/\[bench\] *//' || true)
if [[ -z "$BENCHLINE" ]]; then
  echo "closing.sh: no bench summary line in /tmp/closing_bench.err" >&2
  exit 1
fi

DATE=$(date -u +%Y-%m-%dT%H:%M:%SZ)
cat > CLOSING_RECORD.md <<EOF
# Closing verification record

- **verified_sha**: $SHA
- **date**: $DATE
- **mode**: $([[ "$QUICK" == "--quick" ]] && echo QUICK || echo FULL)
- **sbt test**: $TESTLINE
- **oracle sweep**:
$VERIFY_LINES- **bench (sf0.1)**: $BENCHLINE
- **bench calibration**: $CALLINE
- **bench ride-along**: $RIDELINE

This record was generated by \`tools/closing.sh\` and committed as the
immediate child of the verified sha. \`tools/check_closing.sh\` FAILS
if the recorded sha is not this commit's parent or if any commit
follows the record — a stale record must be regenerated, not explained.
EOF

git add CLOSING_RECORD.md BENCH_FULL.json
git commit -m "Record closing verification for ${SHA:0:9}"
echo "[closing] record committed; run tools/check_closing.sh to confirm"
