#!/usr/bin/env bash
# Round-5 TPU measurement session, run when the tunnel is up.  STRICTLY
# sequential (one TPU client at a time — the axon tunnel serializes
# clients; a parallel second process just hangs).  Each step logs under
# .dev/ and tolerates individual failures; the tunnel is re-probed between
# stages (it has flapped with ~90 s up-windows) so a mid-session outage
# skips the remaining stages quickly instead of hanging to each timeout.
# Ordered by evidence value:
#  1. hardware parity of every unwitnessed device path (incl. the
#     separable ADI kernel, ensemble vmap composition, diffgrad remat)
#  2. full bench capture with the retuned separable-ADI scalar headline
#  3. NE 65-256 blocked-collision block-size sweep (the ~9x cliff)
#  4. nb>1 separable-prefactoring A/B (fused-ADI roofline lever)
#
# Usage: bash scripts/tpu_session_r5.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p .dev
log() { echo "$(date -u +%FT%TZ) $*" | tee -a .dev/tpu_session_r5.log; }
# The axon tunnel serializes clients and a just-exited client's work
# drains for ~90 s — a probe launched immediately after another probe
# blocks behind the drain and reads as "down" (observed twice on
# 2026-08-21: watch probe OK at T, session probe timeout at T+94 s).
# Give probes 180 s and one retry.
probe() {
  python scripts/tpu_probe.py 180 >> .dev/tpu_session_r5.log 2>&1 && return 0
  log "probe retry (drain window?)"
  sleep 30
  python scripts/tpu_probe.py 180 >> .dev/tpu_session_r5.log 2>&1
}

# The watch just proved the tunnel; its probe client may still be
# draining, so do NOT probe again here — go straight to stage 1 (which
# has its own generous timeout and rides out the drain).

log "1/4 mosaic_validate.py (hardware parity incl. sep-ADI/ensemble/diffgrad)"
timeout 2400 python scripts/mosaic_validate.py > .dev/mosaic_validate_r5.json 2> .dev/mosaic_validate_r5.log
log "mosaic_validate rc=$? -> .dev/mosaic_validate_r5.json"

if ! probe; then log "tunnel dropped — stopping after stage 1"; exit 1; fi
log "2/4 bench.py (full capture, retuned sep-ADI scalar headline)"
# bench has its own internal health probe — give it drain headroom too
# (the stage-1 probe's client may still be draining when bench starts)
QPSIM_BENCH_PROBE_TIMEOUT_S=300 timeout 5400 python bench.py > .dev/bench_r5.json 2> .dev/bench_r5.log
log "bench rc=$? -> .dev/bench_r5.json"

if ! probe; then log "tunnel dropped — stopping after stage 2"; exit 1; fi
log "3/4 NE block-size sweep (65-256 collision cliff)"
timeout 3600 python scripts/ne_block_sweep.py > .dev/ne_block_sweep.json 2> .dev/ne_block_sweep.log
log "ne_block_sweep rc=$? -> .dev/ne_block_sweep.json"

if ! probe; then log "tunnel dropped — stopping after stage 3"; exit 1; fi
log "4/4 nb>1 separable-prefactoring A/B"
timeout 3000 python scripts/sep_nb_ab.py > .dev/sep_nb_ab.json 2> .dev/sep_nb_ab.log
log "nb_ab rc=$? -> .dev/sep_nb_ab.json"

log "session complete"
