#!/usr/bin/env bash
# Watchdog driver for the flagship run over a flaky tunneled chip.
#
# The remote-dispatch path can wedge indefinitely at an arbitrary call
# (observed: process CPU time frozen while blocked in an RPC). With
# checkpointing enabled the flagship resumes past completed work, so the
# recovery policy is: detect a frozen process (CPU time unchanged for
# STALL_S seconds), kill it, wait for the tunnel to quiesce, relaunch.
#
# Usage: bash benchmarks/run_flagship_watchdog.sh [max_attempts]
set -u
MAX_ATTEMPTS=${1:-12}
STALL_S=${STALL_S:-420}
LOG=${LOG:-/tmp/flagship24.log}

cputime() {  # jiffies of utime+stime for pid $1 (0 if gone)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "=== watchdog attempt $attempt/$MAX_ATTEMPTS $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  python -u benchmarks/flagship_kagome24.py --lx 2 --ly 4 \
      --out FLAGSHIP_kagome24.json >> "$LOG" 2>&1 &
  PID=$!
  # stalled = less than MIN_JIFFIES (~0.5 s) of CPU progress across a
  # STALL_S window; exact-equality tests are defeated by background
  # threads ticking a few jiffies while the main thread blocks in an RPC
  MIN_JIFFIES=${MIN_JIFFIES:-50}
  win_cpu=$(cputime "$PID"); win_start=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(cputime "$PID")
    [ -z "$now" ] && break
    if [ $(( now - win_cpu )) -ge "$MIN_JIFFIES" ]; then
      win_cpu=$now; win_start=$(date +%s)
    elif [ $(( $(date +%s) - win_start )) -ge "$STALL_S" ]; then
      echo "=== watchdog: <${MIN_JIFFIES}j CPU in ${STALL_S}s; killing $PID ===" | tee -a "$LOG"
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
