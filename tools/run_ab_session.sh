#!/bin/bash
# One-command A/B session for the tunnel-return window (NOTES.md runbook).
# Each step is a fresh process (env-flag jit caches); outputs under
# bench_artifacts/ab_r03/.  Run:  bash tools/run_ab_session.sh
set -u
cd /root/repo
OUT=bench_artifacts/ab_r03
mkdir -p $OUT
log() { echo "=== $* ($(date +%H:%M:%S)) ==="; }

log "1. PT pair vs separate (kernel level, bounce distribution)"
timeout 1800 python tools/bench_pair.py 8500 1048576 5 2>&1 | tee $OUT/bench_pair.txt

log "2a. PT frame, pair ON (default)"
EVPLP_PT_PAIR=1 timeout 1800 python tools/profile_pt.py 8500 1024 5 2>&1 | tee $OUT/pt_pair1.txt
log "2b. PT frame, pair OFF (round-2 formulation)"
EVPLP_PT_PAIR=0 timeout 1800 python tools/profile_pt.py 8500 1024 5 2>&1 | tee $OUT/pt_pair0.txt
log "2c. PT frame, pair ON, first vertex tile-NEE"
EVPLP_PT_PAIR=1 EVPLP_PT_PAIR_FIRST=0 timeout 1800 python tools/profile_pt.py 8500 1024 5 2>&1 | tee $OUT/pt_pair1_first0.txt
log "2d. control: pair ON again (drift check)"
EVPLP_PT_PAIR=1 timeout 1800 python tools/profile_pt.py 8500 1024 5 2>&1 | tee $OUT/pt_pair1_ctrl.txt

log "3. VPL dual-record shadows (kernel level)"
timeout 1800 python tools/bench_vplpair.py 8500 1024 5 2>&1 | tee $OUT/bench_vplpair.txt

log "4. streamed-tris tax at a size where both paths compile (~1.02M)"
EVPLP_STREAM_TRIS=0 timeout 2400 python tools/bench_capacity.py 85000 3 2>&1 | tee $OUT/cap_resident.txt
EVPLP_STREAM_TRIS=1 timeout 2400 python tools/bench_capacity.py 85000 3 2>&1 | tee $OUT/cap_streamed.txt

log "5. full bench"
timeout 3600 python bench.py 2>&1 | tee $OUT/bench.txt

log "done — read the five sections, flip defaults per the runbook, commit"
