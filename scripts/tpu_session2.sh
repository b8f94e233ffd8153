#!/usr/bin/env bash
# Follow-up TPU measurement session (r4, post-capture): arbitrate the
# pair-walk emission order on hardware, then refresh the full bench
# capture so the single-transcendental phonon epilogue (fdcb12c) and the
# walk winner land in driver-visible numbers.  STRICTLY sequential (one
# TPU client at a time — CLAUDE.md).
#
# Usage: bash scripts/tpu_session2.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .dev
log() { echo "$(date -u +%FT%TZ) $*" | tee -a .dev/tpu_session2.log; }

if ! python scripts/tpu_probe.py 90 >> .dev/tpu_session2.log 2>&1; then
  log "tunnel down — aborting session"
  exit 1
fi

log "1/2 walk_ab.py (pair vs diag emission order + exact-tier bar)"
timeout 3000 python scripts/walk_ab.py > .dev/walk_ab_r4.json 2> .dev/walk_ab_r4.log
log "walk_ab rc=$? -> .dev/walk_ab_r4.json"

log "2/2 bench.py (full refresh capture)"
timeout 5400 python bench.py > .dev/bench_r4b.json 2> .dev/bench_r4b.log
log "bench rc=$? -> .dev/bench_r4b.json"

log "session complete"
