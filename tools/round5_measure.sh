#!/bin/bash
# Round-5 measurement batch — run with the device otherwise IDLE.
# Usage: bash tools/round5_measure.sh 2>&1 | tee /tmp/r5_measure.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 1. bench.py (fold-conv ON, default)"
timeout 1800 python bench.py

echo "=== 2. bench.py fold-conv OFF (A/B)"
ASY_PRESTEM_FOLD_CONV=0 timeout 1800 python bench.py

echo "=== 3. trace train bs=128 (fold-conv ON)"
timeout 2000 python tools/trace_forward.py --batch 128 --train --top 14 --out /tmp/r5_trace_on

echo "=== 4. trace train bs=128 (fold-conv OFF)"
ASY_PRESTEM_FOLD_CONV=0 timeout 2000 python tools/trace_forward.py --batch 128 --train --top 14 --out /tmp/r5_trace_off

echo "=== 5. bs=256 remat=none"
timeout 2400 python tools/profile_train.py --batch 256 --chain 3 --stages step_full

echo "=== 6. bs=256 remat=blocks (fallback if none OOMs)"
timeout 2400 python tools/profile_train.py --batch 256 --chain 3 --stages step_full --remat blocks

echo "=== 7. e2e host pipeline"
timeout 2400 python tools/bench_e2e.py --batch 16 --images 64 --epochs 3

echo "=== DONE"
