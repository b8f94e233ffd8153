#!/usr/bin/env bash
# Full TPU measurement session, run when the tunnel is up.  STRICTLY
# sequential (one TPU client at a time — the axon tunnel serializes
# clients; a parallel second process just hangs).  Each step logs under
# .dev/ and tolerates individual failures.  Ordered by evidence value:
# the driver-facing bench capture first, then hardware parity of the
# r3/r4 device paths, then the optimization sweeps.
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

log "1/4 bench.py (full capture)"
timeout 5400 python bench.py > .dev/bench_r4.json 2> .dev/bench_r4.log
log "bench rc=$? -> .dev/bench_r4.json"

log "2/4 mosaic_validate.py (hardware parity, r3/r4 device paths)"
timeout 1800 python scripts/mosaic_validate.py > .dev/mosaic_validate_r4.json 2> .dev/mosaic_validate_r4.log
log "mosaic_validate rc=$? -> .dev/mosaic_validate_r4.json"

log "3/4 collision_opt.py (tile sweep + exact-tier bar)"
timeout 3600 python scripts/collision_opt.py > .dev/collision_opt_r4.json 2> .dev/collision_opt_r4.log
log "collision_opt rc=$? -> .dev/collision_opt_r4.json"

log "4/4 NE crossover sweep"
timeout 3600 python scripts/ne_crossover.py > .dev/ne_crossover.log 2>&1
log "crossover rc=$? -> .dev/ne_crossover.json"

log "session complete"
