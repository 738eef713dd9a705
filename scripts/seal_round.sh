#!/usr/bin/env bash
# Seal a round's record set so it cannot be left dangling (VERDICT r16/r17/r18
# all flagged uncommitted records). Usage:
#
#   scripts/seal_round.sh <round> <anchor_ts> [extra_bench_ts ...]
#
# e.g. scripts/seal_round.sh 19 1786851051 1786851557 1786851926
#
# What it does, in order:
#   1. Restores BENCH_FULL.json from bench_runs/<anchor_ts>.json — the repo-root
#      map is clobbered by every targeted Bench run, so the committed copy MUST
#      be the cited clean-staging anchor, never whatever ran last.
#   2. Runs a leak grep over src/ scripts/ build.sbt (same categories the
#      driver's LEAKCHECK covers) and refuses to stage on a hit.
#   3. git-adds the full record set: BENCH_FULL.json, BENCH_r<N>.json,
#      CORRECTNESS_r<N>.json, LEAKCHECK.json, BASELINE.md, and every
#      bench_runs/<ts>.json named on the command line.
#   4. Prints what is staged; the caller commits.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: seal_round.sh <round> <anchor_ts> [extra_ts ...]}"
ANCHOR="${2:?usage: seal_round.sh <round> <anchor_ts> [extra_ts ...]}"
shift 2

ANCHOR_FILE="bench_runs/${ANCHOR}.json"
[[ -f "$ANCHOR_FILE" ]] || { echo "FATAL: $ANCHOR_FILE missing" >&2; exit 1; }

# Guard (VERDICT r19 #3): refuse an anchor that is not a FULL-suite run at
# the protocol scale — a targeted sf100 map must never become the committed
# BENCH_FULL.json. Full size = the query count in the last committed map
# (monotone: the suite only grows round over round).
python3 - "$ANCHOR_FILE" <<'EOF'
import json, subprocess, sys
anchor = json.load(open(sys.argv[1]))
sf = str(anchor.get("sf", ""))
if not sf.rstrip("/").endswith("sf0.1"):
    sys.exit(f"FATAL: anchor sf={sf!r} is not the protocol dir (…/sf0.1)")
try:
    prev = json.loads(subprocess.check_output(
        ["git", "show", "HEAD:BENCH_FULL.json"], text=True))
    prev_n = len(prev.get("queries", {}))
except Exception:
    prev_n = 0
n = len(anchor.get("queries", {}))
if n < prev_n:
    sys.exit(f"FATAL: anchor has {n} queries < committed suite size {prev_n}")
print(f"anchor guard OK: sf={sf} n={n} (committed {prev_n})")
EOF

cp "$ANCHOR_FILE" BENCH_FULL.json
echo "BENCH_FULL.json <- $ANCHOR_FILE ($(python3 -c "import json;d=json.load(open('BENCH_FULL.json'));print(d['value'],'s,',len(d['queries']),'queries')"))"

# Leak grep: anything proprietary/internal-looking in shipped code is a seal
# failure. Patterns mirror the driver's LEAKCHECK categories.
if grep -rInE 's3://|gs://|wasbs://|proprietary|CONFIDENTIAL' \
     src/ scripts/ build.sbt 2>/dev/null | grep -v seal_round.sh; then
  echo "FATAL: leak grep hit — fix before sealing" >&2; exit 1
fi

STAGE=(BENCH_FULL.json LEAKCHECK.json BASELINE.md "$ANCHOR_FILE")
for f in "BENCH_r${ROUND}.json" "CORRECTNESS_r${ROUND}.json"; do
  [[ -f "$f" ]] && STAGE+=("$f") || echo "note: $f not present yet (driver writes it)"
done
for ts in "$@"; do
  f="bench_runs/${ts}.json"
  [[ -f "$f" ]] || { echo "FATAL: cited run $f missing" >&2; exit 1; }
  STAGE+=("$f")
done

git add "${STAGE[@]}"
echo "staged:"; git diff --cached --name-only | sed 's/^/  /'
echo "seal_round: OK — commit when ready"
