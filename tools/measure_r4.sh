#!/bin/bash
# Round-4 measurement battery (VERDICT items 2-6). Runs each bench
# sequentially on the one real chip; results land in /tmp/measure_r4.log.
set -x
cd /root/repo
L=/tmp/measure_r4.log
: > "$L"

run() {
  echo "=== $* ===" >> "$L"
  timeout 1800 "$@" >> "$L" 2>&1
  echo "--- exit $? ---" >> "$L"
}

# 1. single-pass + B=4 batched (fp32 baseline)
run python bench.py --batch 4
# 2. bf16 A/B: single-pass + B=4
run python bench.py --batch 4 --dtype bfloat16
# 3. train step at the reference shape (B=3, 4 target views)
run python bench.py --train 3
# 4. bf16 train step A/B
run python bench.py --train 3 --dtype bfloat16
# 5. eval step (val-sweep workload) at B=1 and B=4
run python bench.py --evalstep 1
run python bench.py --evalstep 4
# 6. V=8 multi-view train step (reference main_multi shape) + peak HBM
run python bench.py --train-views 8
# 7. render-loss microbench with the FIXED normalized intrinsics
run python tools/mb_train_decomp.py
echo "ALL DONE" >> "$L"
