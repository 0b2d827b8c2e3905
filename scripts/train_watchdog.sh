#!/bin/bash
# Run train.loop under a wedge watchdog. The tunneled accelerator can hang
# (not error) mid-run — observed 2026-08-21: a 100k-step run froze at step
# 73.6k for 12+ min and needed a client restart, after which checkpoint
# resume continued it losslessly. This wrapper restarts the trainer
# whenever its log stops moving for STALL_S seconds; train.loop resumes
# from the newest checkpoint dir automatically, so the only loss is the
# steps since the last --ckpt-every.
#
#   scripts/train_watchdog.sh LOGFILE PIDFILE -- python -m ... (train args)
#
# Exits when the trainer exits cleanly (rc 0).
set -u
if [ $# -lt 4 ] || [ "$3" != "--" ]; then
  echo "usage: $0 LOGFILE PIDFILE -- COMMAND [ARGS...]" >&2
  exit 2
fi
LOG="$1"; PIDFILE="$2"; shift 3   # LOGFILE PIDFILE --
STALL_S="${STALL_S:-300}"
# A trainer that dies within FAST_S seconds is not a wedge but a
# persistent failure (bad args, OOM-on-start): give up after MAX_FAST
# consecutive fast deaths instead of crash-looping forever.
FAST_S="${FAST_S:-60}"; MAX_FAST="${MAX_FAST:-5}"
FAST_COUNT=0

while :; do
  LAUNCH_T=$(date +%s)
  "$@" >> "$LOG" 2>&1 &
  TPID=$!
  echo "$TPID" > "$PIDFILE"
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 30
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
    if [ "$AGE" -ge "$STALL_S" ]; then
      echo "[watchdog $(date -u +%T)] log stalled ${AGE}s — restarting trainer" >> "$LOG"
      kill "$TPID" 2>/dev/null; sleep 5
      kill -9 "$TPID" 2>/dev/null; sleep 3
      break
    fi
  done
  if wait "$TPID" 2>/dev/null; then
    echo "[watchdog $(date -u +%T)] trainer exited cleanly" >> "$LOG"
    exit 0
  fi
  if [ $(( $(date +%s) - LAUNCH_T )) -lt "$FAST_S" ]; then
    FAST_COUNT=$(( FAST_COUNT + 1 ))
    if [ "$FAST_COUNT" -ge "$MAX_FAST" ]; then
      echo "[watchdog $(date -u +%T)] trainer died <${FAST_S}s ${FAST_COUNT}x in a row — giving up" >> "$LOG"
      exit 1
    fi
  else
    FAST_COUNT=0
  fi
  sleep 10   # then relaunch; train.loop resumes from the last checkpoint
done
