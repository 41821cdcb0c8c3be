#!/bin/bash
# Second half of compact_wave_mem.sh for hosts without /usr/bin/time:
# peak RSS via VmHWM polling. Assumes $S/work and $S/work_wave exist
# (uncompacted copies of the same MOR table).
set -e
JAVA_OPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
S=${1:-/tmp/wavemem}
HEAP=${2:-4g}

run_with_peak() { # label, extra_env, workdir
  local label=$1 extra=$2 wdir=$3
  local t0=$(date +%s)
  env $extra GRAFT_CORES=32 java $JAVA_OPTS -Xmx$HEAP -cp "$CP" \
    graft.tools.ReplayCli compact $wdir 500000 > $S/$label.out 2>&1 &
  local pid=$!
  local peak=0
  while kill -0 $pid 2>/dev/null; do
    local hwm=$(awk '/VmHWM/{print $2}' /proc/$pid/status 2>/dev/null)
    [ -n "$hwm" ] && peak=$hwm
    sleep 0.2
  done
  wait $pid; local rc=$?
  echo "$label rc=$rc secs=$(( $(date +%s) - t0 )) peakRSS_kB=$peak"
  grep -h "\[compact\]" $S/$label.out || tail -3 $S/$label.out
}

echo "=== single-shot compact, heap=$HEAP ==="
run_with_peak single "" $S/work || true
echo "=== wave compact (8 buckets/wave), heap=$HEAP ==="
run_with_peak wave "GRAFT_COMPACT_WAVE=8" $S/work_wave || true

echo "=== state hash parity ==="
for W in work work_wave; do
  java $JAVA_OPTS -Xmx8g -cp "$CP" graft.tools.ReplayCli sql $S/$W "SELECT count(*) AS n, sum(hash(repo, path, seq, commit, language, content, size_bytes)) AS state_hash FROM \$TABLE" 2>&1 | grep -v "^2[0-9]" | tail -3
done
echo "=== DONE ==="
