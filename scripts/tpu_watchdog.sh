#!/bin/bash
# Watchdog runner for TPU jobs through the axon tunnel: the tunnel
# occasionally wedges a single RPC forever (process blocks on a futex with
# no CPU use). Runs CMD, watches LOG for output growth, kills and restarts
# the exact process group when the log goes stale.
#
#   scripts/tpu_watchdog.sh LOG STALE_SECS MAX_TRIES CMD...
#
# Exit code: the command's exit code on success/regular failure, 98 if all
# tries wedged.
set -u
LOG="$1"; STALE="$2"; TRIES="$3"; shift 3

for attempt in $(seq 1 "$TRIES"); do
  echo "== watchdog attempt $attempt/$TRIES: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  pgid=$!
  while kill -0 "$pgid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALE" ]; then
      echo "== watchdog: log stale for $((now - mt))s, killing pgid $pgid" >> "$LOG"
      kill -- -"$pgid" 2>/dev/null
      sleep 5
      kill -9 -- -"$pgid" 2>/dev/null
      break
    fi
  done
  if wait "$pgid"; then
    exit 0
  else
    rc=$?
    # 143/137 = our own kill (wedge); anything else is a real failure
    if [ "$rc" != 143 ] && [ "$rc" != 137 ]; then
      echo "== watchdog: command exited rc=$rc" >> "$LOG"
      exit "$rc"
    fi
  fi
done
echo "== watchdog: exhausted $TRIES tries" >> "$LOG"
exit 98
