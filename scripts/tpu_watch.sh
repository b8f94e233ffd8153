#!/usr/bin/env bash
# Probe the axon TPU tunnel every 5 minutes until it answers, then launch
# the benchmark capture immediately (the tunnel has gone down for hours at
# a time — grab the window the moment it opens) and exit 0 so the driving
# session is notified.  Exits 1 after MAX_HOURS without recovery.
#
# Usage: bash scripts/tpu_watch.sh [MAX_HOURS] [SESSION_SCRIPT]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-10}"
SESSION="${2:-scripts/tpu_session.sh}"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
mkdir -p .dev

while true; do
  if python scripts/tpu_probe.py 90 >> .dev/tpu_watch.log 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP — launching measurement session" >> .dev/tpu_watch.log
    nohup bash "$SESSION" > .dev/tpu_session_nohup.log 2>&1 &
    echo $! > .dev/tpu_session.pid
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >> .dev/tpu_watch.log
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) giving up after ${MAX_HOURS}h" >> .dev/tpu_watch.log
    exit 1
  fi
  sleep 300
done
