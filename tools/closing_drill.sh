#!/usr/bin/env bash
# Drill the freeze-ordering mechanism end-to-end in a scratch clone:
# every soundness property check_closing.sh claims is exercised with a
# hostile fixture (the r13 review found two holes — record-commit
# smuggling and an unlinked cherry-picked anchor — exactly because the
# checks had only ever seen well-formed records; this script keeps
# those scenarios failing forever). Read-only against the real repo:
# all fixtures are commits in a throwaway clone.
#
# Usage: bash tools/closing_drill.sh   (exit 0 = every scenario behaved)
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=$(pwd)
D=$(mktemp -d /tmp/closing_drill.XXXXXX)
trap 'rm -rf "$D"' EXIT
git clone -q "$SRC" "$D/repo"
cd "$D/repo"
git config user.email drill@drill >/dev/null
git config user.name drill >/dev/null

fail=0
expect() { # <name> <wanted-exit 0|1>
  local name=$1 want=$2 got=0
  bash tools/check_closing.sh >/dev/null 2>&1 || got=1
  if [[ "$got" == "$want" ]]; then
    echo "drill OK   $name"
  else
    echo "drill FAIL $name (check_closing exited $got, wanted $want)"
    fail=1
  fi
}
record() { # <mode> [verified_sha] — commit a record for HEAD
  local mode=$1 sha=${2:-$(git rev-parse HEAD)}
  printf -- "- **verified_sha**: %s\n- **mode**: %s\n" "$sha" "$mode" \
    > CLOSING_RECORD.md
  git add CLOSING_RECORD.md
  git commit -qm "Record closing verification for ${sha:0:9}"
}
code_commit() { echo "$1" >> src/drill_marker.txt; git add -A; git commit -qm "code: $1"; }
docs_commit() { echo "$1" >> SCALING.md; git add -A; git commit -qm "docs: $1"; }

# 1. a well-formed FULL record atop a code commit verifies
code_commit A
record FULL
expect "full-record-at-head passes" 0

# 2. commits AFTER the record invalidate it
docs_commit after-record
expect "commit-after-record fails" 1
git reset -q --hard HEAD~1

# 3. docs-only movement + QUICK record verifies (anchored to drill 1's FULL)
docs_commit B
record QUICK
expect "quick-over-docs passes" 0

# 4. code movement + QUICK record fails (sbt test never ran on it)
code_commit C
record QUICK
expect "quick-over-code fails" 1
git reset -q --hard HEAD~2   # drop the bad record + code commit

# 5. a file smuggled INTO the record commit fails (swept state = parent)
git reset -q --hard HEAD~1   # drop the drill-3 QUICK record
SHA=$(git rev-parse HEAD)
printf -- "- **verified_sha**: %s\n- **mode**: QUICK\n" "$SHA" > CLOSING_RECORD.md
echo smuggled >> src/drill_marker.txt
git add -A && git commit -qm "Record closing verification for ${SHA:0:9}"
expect "smuggled-record-commit fails" 1
git reset -q --hard HEAD~1

# 6. a record whose verified_sha is not its parent fails outright
# (a fresh docs commit first, so this record's content can't collide
# with drill 1's and no-op the commit)
docs_commit E
record FULL "$(git rev-parse HEAD~1)"
expect "sha-mismatch-record fails" 1
# ...and an unlinked record must NOT anchor a later QUICK: the walk
# skips it (parent linkage check), lands on drill 1's genuine FULL,
# and the code change since that anchor fails the quick record
code_commit D
record QUICK
expect "quick-anchored-past-unlinked-record fails" 1

# 8. the driver's round artifacts dirty the tree AFTER the record —
# the exact state every judged snapshot is in — and must NOT fail;
# a dirtied CODE file alongside them still must (the carve-out is
# is_driver_artifact exactly, nothing wider)
git reset -q --hard HEAD~2   # back to a passing FULL-record state (drill 1+3 tail)
code_commit F
record FULL
expect "clean-full-record-baseline passes" 0
echo '{"drill":1}' > BENCH_r99.json
echo '{"drill":1}' > CORRECTNESS_r99.json
echo '{"drill":1}' >> BENCH_FULL.json
echo '{"drill":1}' > LEAKCHECK.json
expect "dirty-driver-artifacts-only passes" 0
echo drill-dirty >> src/drill_marker.txt
expect "dirty-src-beside-artifacts fails" 1
git checkout -q -- src/drill_marker.txt
expect "artifacts-still-pass-after-src-restore passes" 0
rm -f BENCH_r99.json CORRECTNESS_r99.json
git checkout -q -- BENCH_FULL.json LEAKCHECK.json

# 9. a record with a malformed/missing **mode** line fails loudly
# instead of silently degrading to FULL (which would skip the QUICK
# anchoring enforcement on a hand-edited record)
SHA=$(git rev-parse HEAD~1)
printf -- "- **verified_sha**: %s\n- **mode**: quick\n" "$SHA" > CLOSING_RECORD.md
git add CLOSING_RECORD.md
git commit -q --amend -m "Record closing verification for ${SHA:0:9}"
expect "lowercase-mode-record fails" 1
printf -- "- **verified_sha**: %s\n" "$SHA" > CLOSING_RECORD.md
git add CLOSING_RECORD.md
git commit -q --amend -m "Record closing verification for ${SHA:0:9}"
expect "missing-mode-record fails" 1

echo "drill: $([[ $fail == 0 ]] && echo all scenarios behaved || echo FAILURES above)"
exit $fail
