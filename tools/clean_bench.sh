#!/bin/bash
# Re-run a targeted graft.Bench until the run itself self-labels CLEAN
# (no dirty_host / dirty_mid tag in the JSON line), up to N attempts.
# Usage: clean_bench.sh <ONLY-list> <logfile> [attempts] [sfdir]
set -u
ONLY="$1"; LOG="$2"; N="${3:-5}"; SF="${4:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
busy() { awk '/^cpu /{print ($2+$3+$4+$7+$8+$9)/100}' /proc/stat; }
for a in $(seq 1 "$N"); do
  # wait (bounded) for foreign-quiet before each attempt
  for i in $(seq 1 40); do
    b0=$(busy); sleep 3; b1=$(busy)
    ok=$(python3 -c "print(1 if ($b1-$b0)/3.0 < 0.5 else 0)")
    [ "$ok" = "1" ] && break
    sleep 12
  done
  SPARK_GRAFT_NO_QUIESCE=1 SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Bench" > "$LOG.$a" 2>&1
  line=$(grep '"metric"' "$LOG.$a" | tail -1)
  echo "# attempt $a: $line"
  if ! echo "$line" | grep -qE '"dirty_(host|mid)"'; then
    grep '# bench ' "$LOG.$a"
    echo "# clean_bench: CLEAN on attempt $a"
    exit 0
  fi
done
echo "# clean_bench: no clean run in $N attempts; last:"
grep '# bench ' "$LOG.$N" 2>/dev/null
exit 1
