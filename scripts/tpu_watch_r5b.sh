#!/usr/bin/env bash
# Watch for the r5 follow-up session (bench + NE sweep + nb>1 A/B).
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-8}"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
mkdir -p .dev
while true; do
  if python scripts/tpu_probe.py 90 >> .dev/tpu_watch.log 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP — running r5b session" >> .dev/tpu_watch.log
    bash scripts/tpu_session_r5b.sh >> .dev/tpu_session_nohup.log 2>&1
    if grep -q "session complete" .dev/tpu_session_r5b.log 2>/dev/null; then
      echo "$(date -u +%FT%TZ) r5b session complete — watch done" >> .dev/tpu_watch.log
      exit 0
    fi
    echo "$(date -u +%FT%TZ) r5b session aborted (flap) — resuming watch" >> .dev/tpu_watch.log
  else
    echo "$(date -u +%FT%TZ) tunnel still down" >> .dev/tpu_watch.log
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) giving up after ${MAX_HOURS}h" >> .dev/tpu_watch.log
    exit 1
  fi
  sleep 300
done
