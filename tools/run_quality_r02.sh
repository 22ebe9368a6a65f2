#!/bin/bash
# Round-2 quality protocol: glossy variants + glossy ground truth.
set -x
cd /root/repo
export EVPLP_SYNC_EVERY=5
python tools/quality_r02.py run glossy
python tools/quality_r02.py gt glossy 4000
python tools/quality_r02.py report
