#!/bin/bash
# Round-4 sequential hardware session (one TPU process at a time), ordered
# gating-evidence-first (see tools/hw_session.sh for the round-3 session).
# Round-4 goals (VERDICT r3): refresh EVERY BASELINE.md table at HEAD after
# the prev/cur-split canonical-order change, add the measured on-chip
# per-feed latency table, and re-run the truncated batch-scaling probe.
cd "$(dirname "$0")/.."
log() { echo "=== $(date +%H:%M:%S) $1 ==="; }
T=timeout
P="python tools/perf.py -l 20 -r 64 -s 256 -a 256 -d 512 -m persistent -n 8192 -c 256 -t 3"
C4="python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3"

log "1. verify_drive (required hardware verification at HEAD)"
$T 3600 python tools/verify_drive.py || exit 1

log "2. bench headline at HEAD (prev/cur split)"
$T 2700 python bench.py

log "3. low-precision contract at the new canonical order (lowprec_tpu)"
$T 3600 python tools/lowprec_tpu.py

log "4. on-chip per-feed latency table (VERDICT r3 #5)"
$T 2700 stdbuf -oL python tools/feed_latency.py

log "5. measured config ladder at HEAD (VERDICT r3 weak #1)"
$T 5400 python tools/baseline_sweep.py --samples 8192

log "6. batch-scaling probe at HEAD (VERDICT r3 weak #2: flagship b=64/128, config-4 b=32)"
$T 1800 $P -b 64
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 128 -d 512 -m persistent -n 4096 -c 128 -t 3
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 32 -d 128 -m persistent -n 2048 -c 256 -t 3

log "7. fused-tier A/B at HEAD (fast table refresh vs the 117 kHz exact path)"
$T 1800 $P -b 16 --fused --fast_math
$T 1800 $P -b 1 --fused --fast_math
$T 1800 $P -b 16 --fused
$T 1800 $P -b 16 --fused --fused_pack

log "8. equivalence matrix at HEAD"
$T 5400 python tools/equivalence_tpu.py

log "SESSION COMPLETE"
