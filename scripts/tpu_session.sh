#!/usr/bin/env bash
# Full TPU measurement session, run when the tunnel is up.  STRICTLY
# sequential (one TPU client at a time — the axon tunnel serializes
# clients; a parallel second process just hangs).  Each step logs under
# .dev/ and tolerates individual failures.
#
# Usage: bash scripts/tpu_session.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .dev
log() { echo "$(date -u +%FT%TZ) $*" | tee -a .dev/tpu_session.log; }

if ! python scripts/tpu_probe.py 90 >> .dev/tpu_session.log 2>&1; then
  log "tunnel down — aborting session"
  exit 1
fi

log "1/2 bench.py (full capture)"
timeout 3600 python bench.py > .dev/bench_r3.json 2> .dev/bench_r3.log
log "bench rc=$? -> .dev/bench_r3.json"

log "2/2 NE crossover sweep"
timeout 3600 python scripts/ne_crossover.py > .dev/ne_crossover.log 2>&1
log "crossover rc=$? -> .dev/ne_crossover.json"

log "session complete"
