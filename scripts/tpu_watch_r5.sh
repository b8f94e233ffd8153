#!/usr/bin/env bash
# Resilient r5 tunnel watch: probe every 5 minutes; when the tunnel answers,
# run the measurement session SYNCHRONOUSLY; if the session aborts (tunnel
# flap — observed up-for-90s windows) keep watching instead of exiting.
# Stops only when the session log says "session complete" or MAX_HOURS pass.
#
# Usage: bash scripts/tpu_watch_r5.sh [MAX_HOURS]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-8}"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
mkdir -p .dev

while true; do
  if python scripts/tpu_probe.py 90 >> .dev/tpu_watch.log 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP — running r5 session" >> .dev/tpu_watch.log
    bash scripts/tpu_session_r5.sh >> .dev/tpu_session_nohup.log 2>&1
    if grep -q "session complete" .dev/tpu_session_r5.log 2>/dev/null; then
      echo "$(date -u +%FT%TZ) r5 session complete — watch done" >> .dev/tpu_watch.log
      exit 0
    fi
    echo "$(date -u +%FT%TZ) session aborted (flap) — resuming watch" >> .dev/tpu_watch.log
  else
    echo "$(date -u +%FT%TZ) tunnel still down" >> .dev/tpu_watch.log
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) giving up after ${MAX_HOURS}h" >> .dev/tpu_watch.log
    exit 1
  fi
  sleep 300
done
