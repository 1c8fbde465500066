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

if [[ ! -f CLOSING_RECORD.md ]]; then
  echo "check_closing: no CLOSING_RECORD.md — run tools/closing.sh" >&2
  exit 1
fi

RECORDED=$(sed -n 's/.*\*\*verified_sha\*\*: \([0-9a-f]\{40\}\).*/\1/p' CLOSING_RECORD.md | head -1)
if [[ -z "$RECORDED" ]]; then
  echo "check_closing: CLOSING_RECORD.md carries no verified_sha" >&2
  exit 1
fi

PARENT=$(git rev-parse HEAD^)
HEAD_SUBJ=$(git log -1 --format=%s HEAD)

if [[ "$HEAD_SUBJ" != Record\ closing\ verification* ]]; then
  echo "check_closing: HEAD ($(git rev-parse --short HEAD) '$HEAD_SUBJ')" >&2
  echo "  is not the closing-record commit — commits follow the record" >&2
  echo "  (or it was never generated). Re-run tools/closing.sh." >&2
  exit 1
fi

if [[ "$RECORDED" != "$PARENT" ]]; then
  echo "check_closing: record verified $RECORDED" >&2
  echo "  but the record commit's parent is $PARENT" >&2
  echo "  — the sweep ran on a different code state. Re-run tools/closing.sh." >&2
  exit 1
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "check_closing: working tree dirty on top of the record" >&2
  exit 1
fi

echo "check_closing: OK — record at HEAD verifies parent ${RECORDED:0:9}"
