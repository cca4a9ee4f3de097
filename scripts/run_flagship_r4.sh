#!/bin/bash
# Watchdog runner for the 1M-node flagship workload (params_3d.cfg).
#
# The TPU relay worker has twice hung mid-run on a device->host transfer
# (futex wait, no progress, process alive) — round 3 once, round 4 once.
# With checkpoint_every=4 now actually firing in the fused branch (dynamic
# cycle_cap, coupling.py), the cheap mitigation is: watch the log for
# stalls, kill the run, resume from the last checkpoint.
#
# Usage: scripts/run_flagship_r4.sh <output_dir> <log> [extra overrides...]
set -u
OUT=${1:?output_dir}
LOG=${2:?log path}
shift 2
STALL_LIMIT=${STALL_LIMIT:-2700}  # s of no log growth before kill. The
                                  # fused coupled-cycles chunk compile at 1M
                                  # is 15-30 min of SILENCE on a cold cache
                                  # (killed a round-5 attempt at the old
                                  # 900 s limit); cached after.
POLL=30
export PYTHONUNBUFFERED=1         # block-buffered stdout defeats the
                                  # log-mtime stall detector
cd "$(dirname "$0")/.."

attempt=0
while :; do
  attempt=$((attempt + 1))
  RESUME=""
  if [ -f "$OUT/checkpoint.npz" ]; then
    RESUME="resume_from=$OUT/checkpoint.npz"
  elif [ $attempt -gt 1 ]; then
    # no checkpoint yet -> restart from scratch (wipe partial artifacts so
    # frame numbering restarts cleanly)
    rm -rf "$OUT"
  fi
  echo "=== watchdog: attempt $attempt $(date -u +%H:%M:%S) $RESUME ===" >> "$LOG"
  python -m pd_mg_pin_corrosion_tpu config/params_3d.cfg \
    output_dir="$OUT" "$@" $RESUME >> "$LOG" 2>&1 &
  PID=$!
  echo $PID > /tmp/flagship_r4.pid

  while kill -0 $PID 2>/dev/null; do
    sleep $POLL
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_LIMIT" ]; then
      echo "=== watchdog: stall >${STALL_LIMIT}s, killing $PID $(date -u +%H:%M:%S) ===" >> "$LOG"
      kill $PID 2>/dev/null
      sleep 10
      kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== watchdog: run completed OK after $attempt attempt(s) ===" >> "$LOG"
    exit 0
  fi
  if [ $attempt -ge 6 ]; then
    echo "=== watchdog: giving up after $attempt attempts (rc=$rc) ===" >> "$LOG"
    exit 1
  fi
done
