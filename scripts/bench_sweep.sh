#!/usr/bin/env bash
# Targeted/sweep Bench runner with the guards the r19 sf100 attempt lacked
# (VERDICT r19 #2):
#   1. Disk preflight: refuse to launch with < MIN_FREE_GB free — the r19
#      sf100 sweep died of ENOSPC mid-run (and took a JVM SIGSEGV with it),
#      leaving 8 keys ERROR and no usable reading.
#   2. BENCH_FULL.json clobber-proofing: every Bench run overwrites the
#      repo-root map; after a TARGETED run this script restores the
#      committed copy (the run's own map survives in bench_runs/<ts>.json,
#      whose path is printed).
#
# Usage: scripts/bench_sweep.sh <sf_dir> [comma_keys] [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?usage: bench_sweep.sh <sf_dir> [comma_keys] [cpus]}"
KEYS="${2:-}"
CPUS="${3:-32}"
MIN_FREE_GB="${MIN_FREE_GB:-15}"

free_gb=$(df -BG --output=avail "$PWD" | tail -1 | tr -dc '0-9')
if (( free_gb < MIN_FREE_GB )); then
  echo "FATAL: ${free_gb}G free < ${MIN_FREE_GB}G preflight floor — not launching" >&2
  exit 1
fi
echo "preflight: ${free_gb}G free (floor ${MIN_FREE_GB}G)"

before=$(ls bench_runs 2>/dev/null | sort | tail -1 || true)
# sbt's own exit status must gate the run (ADVICE r20: '| grep ... || true'
# masked crashes; a run that died after emitting its record passed the
# new-file gate and its partial map could clobber BENCH_FULL.json). Log to
# a file, grep afterwards, and fail on a nonzero sbt exit.
sbt_log=$(mktemp /tmp/bench_sweep.XXXXXX.log)
rc=0
if [[ -n "$KEYS" ]]; then
  SPARK_GRAFT_BENCH_ONLY="$KEYS" SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    sbt "runMain graft.Bench" > "$sbt_log" 2>&1 || rc=$?
else
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    sbt "runMain graft.Bench" > "$sbt_log" 2>&1 || rc=$?
fi
grep -E '"metric"|FAILED' "$sbt_log" || true
if (( rc != 0 )); then
  echo "FATAL: sbt exited $rc — bench run is not trustworthy (log: $sbt_log)" >&2
  # ADVICE r21: stash the current map before restoring — a legitimate
  # uncommitted protocol map from an earlier successful run must not be
  # silently discarded (it also survives in bench_runs/, but keep the copy)
  if ! git diff --quiet -- BENCH_FULL.json 2>/dev/null; then
    cp BENCH_FULL.json "BENCH_FULL.json.failed-$(date +%s)" 2>/dev/null || true
  fi
  git checkout -- BENCH_FULL.json 2>/dev/null || true
  exit "$rc"
fi
rm -f "$sbt_log"  # keep the log only on failure
after=$(ls bench_runs | sort | tail -1)
[[ "$after" != "$before" ]] || { echo "FATAL: no bench_runs record produced" >&2; exit 1; }
echo "run recorded: bench_runs/$after"

# Restore the committed protocol map after ANY run that is not the full
# suite at the protocol sf0.1 dir (ADVICE r20: the old guard only covered
# targeted runs, so an untargeted sf100 sweep still clobbered the map).
# The run's own map survives in bench_runs/<ts>.json, printed above.
if [[ -n "$KEYS" || "$(basename "$SF_DIR")" != "sf0.1" ]]; then
  git checkout -- BENCH_FULL.json 2>/dev/null \
    && echo "BENCH_FULL.json restored to committed map (non-protocol run)" || true
fi
