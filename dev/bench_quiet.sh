#!/usr/bin/env bash
# Drift-gated bench launcher: the host has periodic external load
# bursts (~10-15 min apart, NOTES r16), and a record taken inside one
# inflates totals and trips phantom >1.5x movers. This encodes the
# manual ritual: wait until 1-min load stays below LOAD_MAX for
# QUIET_SECS, launch graft.Bench, accept the record only when the
# contention sentinel's drift stayed within DRIFT_MAX (Bench then
# updates BENCH_CANONICAL.json itself); otherwise retry on the next
# quiet window, up to MAX_TRIES.
#
# Usage: dev/bench_quiet.sh
#   env overrides: SF_DIR (default /root/testdata/sf0.1), LOAD_MAX
#   (1.0), QUIET_SECS (480), POLL (20), DRIFT_MAX (1.05), MAX_TRIES
#   (4), WAIT_CAP (1800 = max wait per attempt)
set -u
cd "$(dirname "$0")/.."

SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
LOAD_MAX=${LOAD_MAX:-1.0}
QUIET_SECS=${QUIET_SECS:-480}
POLL=${POLL:-20}
DRIFT_MAX=${DRIFT_MAX:-1.05}
MAX_TRIES=${MAX_TRIES:-4}
WAIT_CAP=${WAIT_CAP:-1800}

quiet_wait() {
  local streak=0 waited=0 load
  while [ "$waited" -lt "$WAIT_CAP" ]; do
    load=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{exit !(l < m)}'; then
      streak=$((streak + POLL))
      echo "[bench_quiet] load $load quiet ${streak}s/${QUIET_SECS}s" >&2
      [ "$streak" -ge "$QUIET_SECS" ] && return 0
    else
      [ "$streak" -gt 0 ] && echo "[bench_quiet] burst (load $load) - streak reset" >&2
      streak=0
    fi
    sleep "$POLL"
    waited=$((waited + POLL))
  done
  echo "[bench_quiet] no ${QUIET_SECS}s quiet window within ${WAIT_CAP}s" >&2
  return 1
}

for try in $(seq 1 "$MAX_TRIES"); do
  echo "[bench_quiet] attempt $try/$MAX_TRIES: waiting for quiet (load < $LOAD_MAX)" >&2
  quiet_wait || continue
  echo "[bench_quiet] quiet window reached - launching Bench at $SF_DIR" >&2
  launch_ts=$(date +%s)
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '\[bench\]|"metric"' | tail -60
  # a crashed Bench leaves the PREVIOUS record in bench_full.json, whose
  # stale drift could pass the gate — only evaluate a record this run wrote
  record_ts=$(stat -c %Y bench_full.json 2>/dev/null || echo 0)
  if [ "$record_ts" -lt "$launch_ts" ]; then
    echo "[bench_quiet] rejected: Bench produced no new bench_full.json (stale record) - retrying" >&2
    continue
  fi
  drift=$(python3 -c 'import json
try: print(json.load(open("bench_full.json"))["sentinel"]["drift"])
except Exception: print("99")')
  if awk -v d="$drift" -v m="$DRIFT_MAX" 'BEGIN{exit !(d <= m && d >= 1/m)}'; then
    echo "[bench_quiet] ACCEPTED: drift $drift within $DRIFT_MAX (BENCH_CANONICAL.json updated by Bench)" >&2
    exit 0
  fi
  echo "[bench_quiet] rejected: drift $drift outside $DRIFT_MAX - retrying" >&2
done
echo "[bench_quiet] no accepted record after $MAX_TRIES attempts" >&2
exit 1
