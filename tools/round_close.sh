#!/bin/bash
# Round-close custody: stage and commit the driver-written artifacts
# (BENCH_r*.json, CORRECTNESS_r*.json, LEAKCHECK.json, COPYCHECK.json,
# bench_full.json) so the round-close snapshot carries them tracked —
# the judge flagged untracked/modified driver records four rounds
# running (r12-r15) because the driver writes them AFTER the builder's
# last commit. Run this at the top of a round (to adopt the previous
# round's records) or any time the records should enter history.
#
# Usage: tools/round_close.sh [label]
set -euo pipefail
cd "$(dirname "$0")/.."
label="${1:-driver-records}"

for f in bench_full.json LEAKCHECK.json COPYCHECK.json \
         BENCH_r*.json CORRECTNESS_r*.json BENCH_sf*.json \
         BENCH_sf*_AUDIT.md; do
  # skip files the repo deliberately gitignores (e.g. COPYCHECK.json);
  # the trailing true keeps a skipped last entry from tripping set -e
  { [ -e "$f" ] && ! git check-ignore -q -- "$f" && git add -- "$f"; } \
    || true
done

if git diff --cached --quiet; then
  echo "[round_close] driver records already tracked and unchanged"
else
  git commit -m "Adopt driver round records ($label)"
  echo "[round_close] committed:"
  git show --stat --oneline HEAD | sed 's/^/  /'
fi
git status --short
