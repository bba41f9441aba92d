#!/bin/bash
# Run a targeted graft.Bench only when the host is quiet: sample TOTAL host
# CPU from /proc/stat busy jiffies over 3s windows (correct as a foreign-CPU
# proxy only because this script runs nothing of its own while sampling) and
# wait (bounded) until the busy rate is below half a core.
# Usage: quiet_bench.sh <ONLY-list> <logfile> [sfdir]
# Honors an existing SPARK_GRAFT_CPUS override (default 32).
set -u
ONLY="$1"; LOG="$2"; SF="${3:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
busy() { awk '/^cpu /{print ($2+$3+$4+$7+$8+$9)/100}' /proc/stat; }
for i in $(seq 1 60); do
  b0=$(busy); sleep 3; b1=$(busy)
  rate=$(python3 -c "print(($b1-$b0)/3.0)")
  ok=$(python3 -c "print(1 if $rate < 0.5 else 0)")
  if [ "$ok" = "1" ]; then break; fi
  echo "# quiet_bench: host busy at ${rate} cores, waiting ($i/60)" >&2
  sleep 7
done
SPARK_GRAFT_NO_QUIESCE=1 SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_SF_DIR="$SF" \
  SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Bench" > "$LOG" 2>&1
grep -E '# bench |"metric"' "$LOG" | head -60
