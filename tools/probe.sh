#!/usr/bin/env bash
# sbt-free ScaleProbe launcher — same isolation contract as bench.sh
# (staged classes, no sbt in the measurement window; see bench.sh for
# the full rationale). Probe timings feed SCALING.md growth ratios, so
# they deserve the same protection as the official bench record.
#
# Usage: tools/probe.sh [maxFactor [queryName...]]
# Env:   SPARK_GRAFT_MIN_FACTOR skips factors below it (knee hunts);
#        SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM as for bench.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
STAGE=tools/.probe_stage/classes
[ -d "$CLASSES" ] || { echo "probe.sh: no $CLASSES — run 'sbt compile' first" >&2; exit 1; }

if [ "${SPARK_GRAFT_BENCH_FORCE:-0}" != "1" ]; then
  # only a real JVM counts: pgrep -f also matches non-java processes that
  # merely mention these class names in their argv (e.g. an orchestration
  # shell whose prompt text cites graft.Bench), so filter by process name
  busy=""
  # graft.ScaleProbe itself is in the pattern: a sibling probe run would
  # contaminate growth ratios just like a sibling bench (the guard runs
  # while we are still bash, so the current process never matches)
  for p in $(pgrep -f 'sbt-launch|xsbt.boot.Boot|graft.Bench|graft.ScaleProbe' || true); do
    [ "$(cat /proc/"$p"/comm 2>/dev/null)" = "java" ] && busy="$busy $p"
  done
  if [ -n "$busy" ]; then
    echo "probe.sh: refusing to probe while sbt/Bench/another ScaleProbe runs (pids:$busy)" >&2
    exit 2
  fi
fi

rm -rf "$STAGE"
mkdir -p "$(dirname "$STAGE")"
cp -a "$CLASSES" "$STAGE"

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-32g}" \
  -cp "$STAGE:/opt/spark/jars/*" \
  graft.ScaleProbe "$@"
