#!/bin/bash
# Sequential hardware session (one TPU process at a time), priority order.
# Every step under timeout so a tunnel stall can't wedge the sequence.
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $1 ==="; }
T=timeout

log "1. verify_drive (required hardware verification)"
$T 3600 python tools/verify_drive.py || exit 1

log "2. config-4 A/B: grouped streaming (bf16), gs=8 no-prefetch"
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3 -p 16
log "2b. gs=8 + prefetch"
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3 -p 16 --stream_prefetch
log "2c. fp32 gs=8"
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3

log "3. baseline sweep (incl. flagship fast modes)"
$T 5400 python tools/baseline_sweep.py --samples 8192

log "4. bench headline"
$T 2700 python bench.py

log "5. equivalence matrix"
$T 5400 python tools/equivalence_tpu.py

log "6. batch-scaling probe (flagship b=128)"
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 128 -d 512 -m persistent -n 4096 -c 128 -t 3

log "7. FUSED-chain A/B on the flagship (per-utterance rate)"
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fast_math
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused -p 16
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --compute 16
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 1 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fast_math
log "7b. fused PACK-GATES A/B (tight R-lane gate packing)"
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fused_pack
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fused_pack --fast_math
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 16 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fused_pack --compute 16
$T 1800 python tools/perf.py -l 20 -r 64 -s 256 -a 256 -b 1 -d 512 -m persistent -n 8192 -c 256 -t 3 --fused --fused_pack --fast_math
log "8. fused low-precision contract on hardware"
$T 3600 python tools/lowprec_tpu.py

log "9. fused quality on the trained vocoder (60k checkpoint)"
$T 2700 python tools/eval_checkpoint.py -c ckpt_demo3 --fused -o /tmp/eval_fused.wav || true

log "10. config-4 int8 weight streaming"
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3 --stream_quant int8
$T 1800 python tools/perf.py -l 40 -r 128 -s 256 -a 256 -b 64 -d 128 -m manyblock -n 2048 -c 256 -t 3 --stream_quant int8 --stream_prefetch
log "SESSION COMPLETE"
