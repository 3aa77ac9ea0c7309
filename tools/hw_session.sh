#!/bin/bash
# Sequential hardware session (one TPU process at a time), ordered so the
# round's gating evidence lands first if the tunnel drops again mid-run:
# verification, then the headline bench, then the precision contract, then
# mode A/Bs, then the long sweeps.  Every step under timeout so a tunnel
# stall can't wedge the sequence.
cd "$(dirname "$0")/.."
log() { echo "=== $(date +%H:%M:%S) $1 ==="; }
T=timeout
P="python tools/perf.py -l 20 -r 64 -s 256 -a 256 -d 512 -m persistent -n 8192 -c 256 -t 3"
C4="python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3"

log "1. verify_drive (required hardware verification, incl. int8 leg + fused TV)"
$T 3600 python tools/verify_drive.py || exit 1

log "2. bench headline (BENCH_r03 evidence)"
$T 2700 python bench.py

log "3. low-precision contract incl. fused + int8 rows (lowprec_tpu)"
$T 3600 python tools/lowprec_tpu.py

log "4. FUSED-chain A/B on the flagship (per-utterance rate), b=16"
$T 1800 $P -b 16
$T 1800 $P -b 16 --fused
$T 1800 $P -b 16 --fused --fast_math
$T 1800 $P -b 16 --fused -p 16
$T 1800 $P -b 16 --fused --compute 16
$T 1800 $P -b 1 --fused --fast_math

log "5. fused PACK-GATES A/B (tight R-lane gate packing)"
$T 1800 $P -b 16 --fused --fused_pack
$T 1800 $P -b 16 --fused --fused_pack --fast_math
$T 1800 $P -b 16 --fused --fused_pack --compute 16
$T 1800 $P -b 1 --fused --fused_pack --fast_math

log "6. config-4 int8 weight streaming"
$T 1800 $C4 --stream_quant int8
$T 1800 $C4 --stream_quant int8 --stream_prefetch

log "7. config-4 A/B: grouped streaming (bf16) / prefetch / fp32"
$T 1800 $C4 -p 16
$T 1800 $C4 -p 16 --stream_prefetch
$T 1800 $C4

log "8. baseline sweep (incl. flagship fast modes)"
$T 5400 python tools/baseline_sweep.py --samples 8192

log "9. equivalence matrix"
$T 5400 python tools/equivalence_tpu.py

log "10. batch-scaling probe (flagship b=128)"
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 128 -d 512 -m persistent -n 4096 -c 128 -t 3

log "11. fused quality on the trained vocoder (60k checkpoint)"
$T 2700 python tools/eval_checkpoint.py -c ckpt_demo3 --fused -o /tmp/eval_fused.wav || true

log "SESSION COMPLETE"
