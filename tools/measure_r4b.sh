#!/bin/bash
# Round-4 measurement battery, part 2 (after the Pallas backward landed).
# Sequential — one big TPU compile at a time. Results in /tmp/measure_r4b.log.
set -x
cd /root/repo
L=/tmp/measure_r4b.log
: > "$L"

run() {
  echo "=== $* ===" >> "$L"
  timeout 3000 "$@" >> "$L" 2>&1
  echo "--- exit $? ---" >> "$L"
}

# 0. jnp-twin backward A/B at the same render shape as the gradcheck
SIU3R_RASTER_BWD=jnp run python tools/mb_raster_bwd.py
# 1. train step at the reference shape (B=3, 4 target views) with the
#    in-step DEFAULT rasterizer backward (jnp twin unless SIU3R_RASTER_BWD
#    is set — see rasterizer._rtd_bwd)
run python bench.py --train 3
# 2. bf16 train step A/B
run python bench.py --train 3 --dtype bfloat16
# 3. eval step (val-sweep workload) at B=1 and B=4
run python bench.py --evalstep 1
run python bench.py --evalstep 4
# 4. V=8 multi-view train step (reference main_multi shape) + peak HBM
run python bench.py --train-views 8
# 5. train-step decomposition with fixed intrinsics + Pallas bwd
run python tools/mb_train_decomp.py
echo "ALL DONE" >> "$L"
