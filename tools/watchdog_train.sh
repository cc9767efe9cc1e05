#!/usr/bin/env bash
# Supervise a pretrain_flagship.py run against axon tunnel drops
# (STATUS_R4 incident: the connection drops, the in-flight fetch never
# returns, the client parks on a futex with zero CPU forever).
#
#   tools/watchdog_train.sh LOGFILE -- python tools/pretrain_flagship.py ...
#
# Detection = BOTH signals for two consecutive 45 s windows: the process
# accrues no CPU jiffies AND the log mtime is stale. A healthy run logs
# every ~25 s; a restoring/compiling run is silent but burns CPU — so the
# jiffies test avoids killing a legitimate restore. On detection: SIGKILL
# (SIGTERM is undeliverable — the main thread is blocked in C) and
# relaunch; pretrain resumes from its last orbax checkpoint. Exits when
# the run prints its completion line.
set -u
LOG="$1"; shift
[ "$1" = "--" ] && shift
jiffies() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo dead; }
launch() { "$@" >> "$LOG" 2>&1 & CHILD=$!; echo "[watchdog] launched pid $CHILD" >&2; }
# Only accept a completion line written AFTER this watchdog started: launch
# appends (>>), so a reused LOG from a previous completed run would make any
# child crash look like completion (ADVICE r4 #4).
BASELINE_LINES=$(wc -l < "$LOG" 2>/dev/null || echo 0)
completed() { tail -n "+$((BASELINE_LINES + 1))" "$LOG" 2>/dev/null | grep -q "saved checkpoint to"; }
launch "$@"
stale=0
while :; do
  sleep 45
  if ! kill -0 "$CHILD" 2>/dev/null; then
    if completed; then
      echo "[watchdog] run completed" >&2; exit 0
    fi
    echo "[watchdog] child died without completing; relaunching" >&2
    stale=0; launch "$@"; continue
  fi
  j0=$(jiffies "$CHILD"); sleep 45; j1=$(jiffies "$CHILD")
  age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
  if [ "$j0" = "$j1" ] && [ "$age" -gt 120 ]; then
    stale=$((stale + 1))
  else
    stale=0
  fi
  if [ "$stale" -ge 2 ]; then
    echo "[watchdog] stranded (no CPU, log ${age}s stale) — SIGKILL + resume" >&2
    kill -9 "$CHILD" 2>/dev/null; sleep 5
    stale=0; launch "$@"
  fi
done
