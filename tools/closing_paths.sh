# Shared between closing.sh and check_closing.sh — the single
# definition of "code" for the docs-only/quick-record checks. The two
# scripts run at different times (generation vs verification) but must
# agree on WHAT counts as code, or one drifts weaker than the other.
CODE_PATHS=(src/ build.sbt project/ tools/)

# Files the ROUND DRIVER writes into the repo root after the builder's
# work ends: the per-round bench/correctness artifacts plus the two
# committed records the driver refreshes in place. They land on top of
# the closing-record commit by construction — outside the builder's
# control — so the freeze-ordering dirty check ignores EXACTLY these
# and nothing else (a dirty src/ file, doc, or tool still fails). Keep
# this list tight: every added glob is a file a hostile edit could
# hide in.
is_driver_artifact() {
  case $1 in
    BENCH_r[0-9]*.json | CORRECTNESS_r[0-9]*.json | \
    BENCH_FULL.json | LEAKCHECK.json | COPYCHECK.json) return 0 ;;
    *) return 1 ;;
  esac
}

# The most recent trustworthy FULL closing record reachable from $1
# (exclusive of $1 itself when it has a ^ suffix): prints the
# verified_sha of the newest 'Record closing verification' commit whose
# CLOSING_RECORD.md says mode FULL AND whose verified_sha equals that
# record commit's own parent. The parent check matters: a cherry-picked
# or rebased record commit carries a sha the sweep never ran against
# THIS history — anchoring a quick diff to it would hide every change
# between the foreign sha and the record's real parent.
last_full_verified_sha() {
  local from=$1 c rec sha
  for c in $(git log --format=%H --grep='^Record closing verification' "$from"); do
    rec=$(git show "$c:CLOSING_RECORD.md" 2>/dev/null) || continue
    echo "$rec" | grep -q '\*\*mode\*\*: FULL' || continue
    sha=$(echo "$rec" \
      | sed -n 's/.*\*\*verified_sha\*\*: \([0-9a-f]\{40\}\).*/\1/p' | head -1)
    [[ -n "$sha" ]] || continue
    [[ "$(git rev-parse --verify --quiet "$c^")" == "$sha" ]] || continue
    echo "$sha"
    return 0
  done
  return 1
}
