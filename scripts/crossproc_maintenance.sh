#!/usr/bin/env bash
# Cross-process maintenance gate (VERDICT r18 #4): one JVM runs the real
# IndexMaintenance land/fold/sweep loop (with a compressed 30 s grace
# window so superseded segments are PHYSICALLY deleted during the run),
# a second JVM hammers probes the whole time. Passes iff the prober
# reports PROBER_OK: zero failed reads, every answer equal to the batch
# feed face for a non-decreasing prefix of the op script.
#
# Usage: scripts/crossproc_maintenance.sh [n_batches]   (default 8)
# Requires a compiled tree: sbt compile. Runs ~3 minutes. Documented as a
# manual gate in BASELINE.md (too heavy for the sbt test loop).
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-8}"
WORK=$(mktemp -d /tmp/crossproc.XXXX)
CORPUS="$WORK/corpus"; ROOT="$WORK/root"; LAND="$WORK/landing"; CKPT="$WORK/ckpt"
mkdir -p "$CORPUS" "$ROOT" "$LAND"

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

# 30 s grace: longer than any probe (~1 s), short enough that stamped
# segments are really deleted while the prober is still running
java $ADD_OPENS -Xmx4g -Dspark.ui.enabled=false -Dgraft.sweep.grace.ms=30000 \
  -cp "$CP" graft.streaming.MaintWriter "$CORPUS" "$ROOT" "$LAND" "$CKPT" "$N" \
  > "$WORK/writer.log" 2>&1 &
WPID=$!

# Belt-and-braces with the prober's in-JVM deadline (ADVICE r19): a hung
# JVM (not just a spinning loop) still cannot wedge the gate's `wait`.
timeout -k 30 1200 \
  java $ADD_OPENS -Xmx4g -Dspark.ui.enabled=false \
  -cp "$CP" graft.streaming.MaintProber "$CORPUS" "$ROOT" "$N" \
  > "$WORK/prober.log" 2>&1 &
PPID2=$!

set +e
wait "$WPID"; WRC=$?
wait "$PPID2"; PRC=$?
set -e

grep -E "WRITER|PROBER|PROBE_" "$WORK/writer.log" "$WORK/prober.log" | grep -v "^.*log:2" || true
echo "writer rc=$WRC prober rc=$PRC (logs in $WORK)"
if [[ $WRC -ne 0 || $PRC -ne 0 ]]; then
  echo "CROSSPROC GATE: FAIL"; exit 1
fi
grep -q "PROBER_OK" "$WORK/prober.log" || { echo "CROSSPROC GATE: FAIL (no PROBER_OK)"; exit 1; }
echo "CROSSPROC GATE: PASS"
