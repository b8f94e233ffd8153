#!/usr/bin/env bash
# Round-5 follow-up session: the three stages the first session didn't
# land — bench (its internal probe hit the client-drain window), the NE
# block sweep (hung RPC from a mid-compile tunnel drop), and the nb>1
# separable A/B (crashed on the fused baseline's scoped-VMEM OOM, now
# guarded).  Strictly sequential, one TPU client at a time; the caller
# (watch) just proved the tunnel so stage 1 starts without re-probing.
set -u
cd "$(dirname "$0")/.."
mkdir -p .dev
log() { echo "$(date -u +%FT%TZ) $*" | tee -a .dev/tpu_session_r5b.log; }
probe() {
  python scripts/tpu_probe.py 180 >> .dev/tpu_session_r5b.log 2>&1 && return 0
  log "probe retry (drain window?)"
  sleep 30
  python scripts/tpu_probe.py 180 >> .dev/tpu_session_r5b.log 2>&1
}

if python - <<'PY' 2>/dev/null
import json, sys
d = json.load(open(".dev/bench_r5b.json"))
sys.exit(0 if d.get("value", 0) > 0 else 1)
PY
then
  log "1/3 bench already captured (nonzero value) — skipping"
else
  log "1/3 bench.py (full capture)"
  QPSIM_BENCH_PROBE_TIMEOUT_S=300 timeout 5400 python bench.py > .dev/bench_r5b.json 2> .dev/bench_r5b.log
  log "bench rc=$? -> .dev/bench_r5b.json"
  if ! probe; then log "tunnel dropped — stopping after stage 1"; exit 1; fi
fi
log "2/3 NE block-size sweep"
timeout 3600 python scripts/ne_block_sweep.py > .dev/ne_block_sweep.json 2> .dev/ne_block_sweep.log
log "ne_block_sweep rc=$? -> .dev/ne_block_sweep.json"

if ! probe; then log "tunnel dropped — stopping after stage 2"; exit 1; fi
log "3/3 nb>1 separable A/B (guarded fused baseline)"
timeout 3000 python scripts/sep_nb_ab.py > .dev/sep_nb_ab.json 2> .dev/sep_nb_ab.log
log "nb_ab rc=$? -> .dev/sep_nb_ab.json"

log "session complete"
