#!/usr/bin/env bash
# Generic watchdog driver for long checkpointed runs over the flaky
# tunneled chip (generalization of run_flagship_watchdog.sh — same
# progress model: a process is "frozen" only if BOTH host CPU time and
# every progress file (out_logs/, out_Qckpt/, compile cache, run log)
# stop advancing for STALL_S seconds; long device-side phases burn no
# host CPU while healthy).
#
# Usage:
#   ARTIFACT=HUBBARD4x4.json LOG=/tmp/h44.log \
#     bash benchmarks/run_watchdog.sh [max_attempts] -- <command...>
set -u
# [max_attempts] is optional: if the first arg is the "--" separator the
# caller omitted it ("run_watchdog.sh -- cmd..."), default to 8
if [ "${1:-}" = "--" ]; then
  MAX_ATTEMPTS=8
else
  MAX_ATTEMPTS=${1:-8}
  shift || true
fi
[ "${1:-}" = "--" ] && shift
STALL_S=${STALL_S:-2700}
LOG=${LOG:-/tmp/watchdog_run.log}
ARTIFACT=${ARTIFACT:?set ARTIFACT=<output json that marks success>}
export QBX_COMPILE_CACHE="${QBX_COMPILE_CACHE:-$PWD/.xla_cache}"
mkdir -p "$QBX_COMPILE_CACHE"

cputime() {
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""
}

progress_stamp() {
  local m
  m=$(stat -c %Y out_logs/*.txt out_Qckpt/* "$QBX_COMPILE_CACHE"/* "$LOG" 2>/dev/null | sort -n | tail -1)
  echo "${m:-0}"
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "=== watchdog attempt $attempt/$MAX_ATTEMPTS $(date -u +%H:%M:%S): $* ===" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  MIN_JIFFIES=${MIN_JIFFIES:-50}
  win_cpu=$(cputime "$PID"); win_files=$(progress_stamp); win_start=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now_cpu=$(cputime "$PID")
    [ -z "$now_cpu" ] && break
    now_files=$(progress_stamp)
    if [ $(( now_cpu - win_cpu )) -ge "$MIN_JIFFIES" ] \
        || [ "$now_files" -gt "$win_files" ]; then
      win_cpu=$now_cpu; win_files=$now_files; win_start=$(date +%s)
    elif [ $(( $(date +%s) - win_start )) -ge "$STALL_S" ]; then
      echo "=== watchdog: no CPU/file progress in ${STALL_S}s; killing $PID ===" | tee -a "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 45
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ] && [ -f "$ARTIFACT" ]; then
    echo "=== watchdog: completed on attempt $attempt ===" | tee -a "$LOG"
    exit 0
  fi
done
echo "=== watchdog: exhausted attempts ===" | tee -a "$LOG"
exit 1
