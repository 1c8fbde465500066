#!/usr/bin/env bash
# Freeze-ordering check: FAILS unless the closing record at HEAD
# describes exactly the code state it sits on top of. Verifiable from
# git alone:
#   1. HEAD must be the closing-record commit (nothing may follow it).
#   2. The sha recorded INSIDE CLOSING_RECORD.md must equal HEAD's
#      parent — i.e. the record was generated from, and committed
#      immediately after, the last code commit.
# Exit 0 = the freeze ordering held; anything else = regenerate the
# record with tools/closing.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
source tools/closing_paths.sh

if [[ ! -f CLOSING_RECORD.md ]]; then
  echo "check_closing: no CLOSING_RECORD.md — run tools/closing.sh" >&2
  exit 1
fi

RECORDED=$(sed -n 's/.*\*\*verified_sha\*\*: \([0-9a-f]\{40\}\).*/\1/p' CLOSING_RECORD.md | head -1)
if [[ -z "$RECORDED" ]]; then
  echo "check_closing: CLOSING_RECORD.md carries no verified_sha" >&2
  exit 1
fi

HEAD_SUBJ=$(git log -1 --format=%s HEAD)

if [[ "$HEAD_SUBJ" != Record\ closing\ verification* ]]; then
  echo "check_closing: HEAD ($(git rev-parse --short HEAD) '$HEAD_SUBJ')" >&2
  echo "  is not the closing-record commit — commits follow the record" >&2
  echo "  (or it was never generated). Re-run tools/closing.sh." >&2
  exit 1
fi

# guarded: a root commit (or depth-1 shallow clone) has no parent — under
# set -e a bare rev-parse would die with a raw git error instead of the
# diagnostic (the subject check above filters most such cases, but a
# grafted record commit must still fail loudly, not crypticly)
if ! PARENT=$(git rev-parse --verify --quiet HEAD^); then
  echo "check_closing: HEAD has no parent (root commit / shallow clone)" >&2
  echo "  — a closing record must sit immediately atop the verified" >&2
  echo "  code commit. Re-run tools/closing.sh on the full history." >&2
  exit 1
fi

if [[ "$RECORDED" != "$PARENT" ]]; then
  echo "check_closing: record verified $RECORDED" >&2
  echo "  but the record commit's parent is $PARENT" >&2
  echo "  — the sweep ran on a different code state. Re-run tools/closing.sh." >&2
  exit 1
fi

# Dirty-tree check, minus the driver's round artifacts: the round
# driver writes BENCH_r*.json / CORRECTNESS_r*.json and refreshes
# BENCH_FULL.json / LEAKCHECK.json / COPYCHECK.json AFTER the record
# commit, every round, and the builder cannot prevent it — without
# this carve-out the one-command adjudication ("exit 0 = ordering
# held") fails on the judged snapshot from files the sweep never
# covered anyway. ANY other dirty path (src/, tools/, docs, build)
# still fails. Rename lines ("R  a -> b") are checked on both sides.
DIRTY_NON_ARTIFACT=""
while IFS= read -r line; do
  [[ -z "$line" ]] && continue
  entry=${line:3}
  for f in "${entry%% -> *}" "${entry##* -> }"; do
    if ! is_driver_artifact "$f"; then
      DIRTY_NON_ARTIFACT+="$f"$'\n'
      break
    fi
  done
done < <(git status --porcelain)
if [[ -n "$DIRTY_NON_ARTIFACT" ]]; then
  echo "check_closing: working tree dirty on top of the record" >&2
  echo "  (beyond the driver's round artifacts):" >&2
  echo "$DIRTY_NON_ARTIFACT" | head -20 >&2
  exit 1
fi

# The record commit may carry ONLY the record artifacts: the sweep ran
# on the PARENT, so any other file smuggled into the record commit
# itself was never tested — that hole would otherwise defeat every
# check above (subject matches, sha matches, tree clean).
SMUGGLED=$(git diff --name-only HEAD^ HEAD \
  | grep -v -e '^CLOSING_RECORD\.md$' -e '^BENCH_FULL\.json$' || true)
if [[ -n "$SMUGGLED" ]]; then
  echo "check_closing: the record commit carries files beyond the" >&2
  echo "  record artifacts — those changes were never swept:" >&2
  echo "$SMUGGLED" | head -20 >&2
  echo "  Re-run tools/closing.sh from a clean code commit." >&2
  exit 1
fi

# A QUICK record skips sbt test — legitimate ONLY when no code moved
# since the last FULL sweep. Without this check a code commit could
# acquire a passing freeze record by running closing.sh --quick, with
# no test run ever touching it. Verifiable from git alone: find the
# most recent FULL record among HEAD's ancestors and require the
# src/build diff from its verified sha to THIS record's verified sha
# to be empty.
MODE=$(sed -n 's/.*\*\*mode\*\*: \([A-Z]*\).*/\1/p' CLOSING_RECORD.md | head -1)
# A missing/lowercase/malformed mode line must fail LOUDLY: an empty
# MODE would otherwise fall through every branch below and be treated
# as FULL — a hand-edited QUICK record could then evade the
# "code moved since the last FULL sweep" gate entirely.
if [[ "$MODE" != "FULL" && "$MODE" != "QUICK" ]]; then
  echo "check_closing: CLOSING_RECORD.md mode is '${MODE:-<missing>}'" >&2
  echo "  — must be exactly FULL or QUICK. Re-run tools/closing.sh." >&2
  exit 1
fi
if [[ "$MODE" == "QUICK" ]]; then
  LAST_FULL=$(last_full_verified_sha HEAD^ || true)
  if [[ -z "$LAST_FULL" ]]; then
    echo "check_closing: QUICK record with no prior parent-linked FULL" >&2
    echo "  record in history — the code state was never swept. Re-run" >&2
    echo "  tools/closing.sh (full mode)." >&2
    exit 1
  fi
  CODE_MOVED=$(git diff --name-only "$LAST_FULL" "$RECORDED" -- \
    "${CODE_PATHS[@]}" || echo __DIFF_FAILED__)
  if [[ -n "$CODE_MOVED" ]]; then
    echo "check_closing: QUICK record sits atop CODE changes since the" >&2
    echo "  last FULL sweep (${LAST_FULL:0:9}):" >&2
    echo "$CODE_MOVED" | head -20 >&2
    echo "  — sbt test never ran on this state. Re-run tools/closing.sh" >&2
    echo "  (full mode)." >&2
    exit 1
  fi
fi

echo "check_closing: OK — record at HEAD verifies parent ${RECORDED:0:9}${MODE:+ (mode $MODE)}"
