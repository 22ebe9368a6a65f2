#!/bin/bash
# Round-2 quality protocol: technique variants + glossy ground truth.
set -x
cd /root/repo
python tools/quality_r02.py run cornell
python tools/quality_r02.py run glossy
python tools/quality_r02.py gt glossy 4000
python tools/quality_r02.py report
