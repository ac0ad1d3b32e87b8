#!/bin/bash
# Round-5 in-step Pallas-backward fault isolation (VERDICT r4 Next #2).
# One variable at a time; one big TPU compile at a time.
# Results in /tmp/r5_fault.log.
set -x
cd /root/repo
L=/tmp/r5_fault.log
: > "$L"

run() {
  echo "=== $* ===" >> "$L"
  timeout 3000 env "$@" >> "$L" 2>&1
  echo "--- exit $? ---" >> "$L"
}

# E0: AOT memory plan of the FAULTING executable (pallas bwd, B=3)
run SIU3R_RASTER_BWD=pallas python bench.py --no-retry --train 3 --memcheck
# E1: HBM-headroom probe — B=1 (temp far below 16 GB)
run SIU3R_RASTER_BWD=pallas python bench.py --no-retry --train 1
# E2: donation probe — B=1 without state donation (only fits at B=1)
run SIU3R_RASTER_BWD=pallas python bench.py --no-retry --train 1 --no-donate
# E3: full B=3 with the pallas backward (post-rewrite kernel)
run SIU3R_RASTER_BWD=pallas python bench.py --no-retry --train 3
# E4: full B=3 with the jnp-twin backward (post-rewrite A/B baseline)
run SIU3R_RASTER_BWD=jnp python bench.py --no-retry --train 3
echo "ALL DONE" >> "$L"
