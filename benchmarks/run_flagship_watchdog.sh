#!/usr/bin/env bash
# Watchdog driver for the flagship run over a flaky tunneled chip.
#
# The remote-dispatch path can wedge indefinitely at an arbitrary call
# (observed: process CPU time frozen while blocked in an RPC). With
# checkpointing enabled the flagship resumes past completed work, so the
# recovery policy is: detect a frozen process, kill it, wait for the
# tunnel to quiesce, relaunch.
#
# "Frozen" = no progress for STALL_S seconds, where progress is EITHER
# host CPU time advancing OR any solver/checkpoint/log file advancing
# (out_logs/, out_Qckpt/, the run log): long device-side phases (large
# remote compiles, multi-GB device pulls) burn no host CPU while healthy,
# and the solver logs tick every restart — CPU alone false-killed a
# healthy momentum-sector solve (round-4, 07:06 UTC).
#
# Usage: bash benchmarks/run_flagship_watchdog.sh [max_attempts]
set -u
MAX_ATTEMPTS=${1:-12}
STALL_S=${STALL_S:-2700}
LOG=${LOG:-/tmp/flagship24.log}
# persistent XLA compile cache: the N=2^24 solver programs compile for
# 15-40 min (device-side, zero host CPU/file progress — hence the large
# STALL_S for the FIRST attempt); every restart/sector after a successful
# compile loads from here in seconds (measured 30.3s -> 2.4s)
export QBX_COMPILE_CACHE="${QBX_COMPILE_CACHE:-$PWD/.xla_cache}"
mkdir -p "$QBX_COMPILE_CACHE"

cputime() {  # jiffies of utime+stime for pid $1 (empty if gone)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""
}

progress_stamp() {  # newest mtime across progress files (0 if none)
  local m
  m=$(stat -c %Y out_logs/*.txt out_Qckpt/* "$QBX_COMPILE_CACHE"/* "$LOG" 2>/dev/null | sort -n | tail -1)
  echo "${m:-0}"
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "=== watchdog attempt $attempt/$MAX_ATTEMPTS $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  python -u benchmarks/flagship_kagome24.py --lx 2 --ly 4 \
      --out FLAGSHIP_kagome24.json >> "$LOG" 2>&1 &
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
      sleep 45   # let the tunnel quiesce before the next client
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ] && [ -f FLAGSHIP_kagome24.json ]; then
    echo "=== watchdog: flagship completed on attempt $attempt ===" | tee -a "$LOG"
    exit 0
  fi
done
echo "=== watchdog: exhausted attempts ===" | tee -a "$LOG"
exit 1
