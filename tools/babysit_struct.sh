#!/bin/bash
# Babysitter for the big struct training run (CLAUDE.md round-2/4 outage
# playbook): launch tools/train_struct_base.py, watch for a tunnel-outage
# wedge (log silent AND an independent short-timeout probe failing twice),
# kill the EXACT trainer pid, wait for the tunnel to return, and relaunch
# from the latest checkpoints (STRUCT_BASE_INIT base snapshot + step meta,
# STRUCT_DRAFT_INIT distill snapshot). A legitimately quiet trainer
# (congestion — CLAUDE.md round-3: the same cached build ranged 129s-35min)
# is NOT killed: the probe must fail, not just the log go quiet.
#
# Usage: bash tools/babysit_struct.sh [scale]   (default big; logs to
#        /tmp/struct_<scale>_train.log, babysitter log /tmp/babysit.log)
set -u
SCALE=${1:-big}
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOG=/tmp/struct_${SCALE}_train.log
BLOG=/tmp/babysit.log
BASE_LAST=/tmp/struct_base_${SCALE}_last.npz
SNAP=/tmp/struct_distill_snap_1792h12L.npz   # big scale (hidden x layers)
REPORT=$REPO/checkpoints/struct_${SCALE}.json
QUIET_S=1500          # log silent this long before probing (25 min)
QUIET_WEDGE_S=2700    # silent this long WITH a healthy tunnel = stale RPC
                      # (r5 observed: trainer slept 45+ min mid-save while
                      # a fresh probe attached in 14s); kept above the
                      # 8-30 min silent remote-compile window so a slow
                      # compile is never killed into a relaunch loop
PROBE_TIMEOUT=150     # a probe blocked behind the trainer attaches in 60-90s

blog() { echo "[babysit $(date +%H:%M:%S)] $*" >> "$BLOG"; }

launch() {
  local envs=(STRUCT_SCALE="$SCALE" STRUCT_SAVE_EVERY=1000
              STRUCT_DRAFT_SAVE=/tmp/struct_draft_${SCALE}.npz)
  if [ -f "$BASE_LAST" ]; then envs+=(STRUCT_BASE_INIT="$BASE_LAST"); fi
  if [ -f "$SNAP" ]; then envs+=(STRUCT_DRAFT_INIT="$SNAP"); fi
  blog "launch: ${envs[*]}"
  (cd "$REPO" && env "${envs[@]}" python tools/train_struct_base.py \
      >> "$LOG" 2>&1) &
  PID=$!
  blog "trainer pid $PID"
}

probe_ok() {
  timeout $PROBE_TIMEOUT python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}

kill_trainer() {
  # $PID is the launch subshell; the python trainer is its CHILD (the
  # `cd && env` chain prevents bash's exec optimization). Kill children
  # by exact parent pid first — an orphaned trainer would keep holding
  # the TPU and block the relaunch from attaching.
  pkill -TERM -P "$PID" 2>/dev/null
  kill "$PID" 2>/dev/null
  sleep 10
  pkill -KILL -P "$PID" 2>/dev/null
  kill -9 "$PID" 2>/dev/null
}

launch
FAILS=0
while true; do
  sleep 120
  if [ -f "$REPORT" ] && ! kill -0 "$PID" 2>/dev/null; then
    blog "report exists and trainer exited: DONE"; exit 0
  fi
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null; RC=$?
    blog "trainer exited rc=$RC without report — relaunching from checkpoints"
    sleep 30; launch; FAILS=0; continue
  fi
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
  if [ "$AGE" -lt "$QUIET_S" ]; then FAILS=0; continue; fi
  blog "log quiet ${AGE}s — probing tunnel"
  if probe_ok; then
    if [ "$AGE" -ge "$QUIET_WEDGE_S" ]; then
      blog "tunnel alive but trainer silent ${AGE}s: stale RPC — killing pid $PID"
      kill_trainer
      sleep 10; launch
    else
      blog "probe ok: trainer quiet but tunnel alive (congestion) — waiting"
    fi
    FAILS=0
  else
    FAILS=$((FAILS + 1))
    blog "probe FAILED ($FAILS/2)"
    if [ "$FAILS" -ge 2 ]; then
      blog "tunnel down + trainer wedged: killing pid $PID"
      kill_trainer
      until probe_ok; do blog "waiting for tunnel..."; sleep 120; done
      blog "tunnel back — relaunching from checkpoints"
      launch; FAILS=0
    fi
  fi
done
