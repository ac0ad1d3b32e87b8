#!/bin/bash
# Run the full round-3 TPU measurement matrix once the chip is reachable.
# Logs each step to $LOGDIR; continues past individual failures.
# One big compile at a time (concurrent remote compiles OOM the helper).
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_bench_logs}
mkdir -p "$LOGDIR"
cd /root/repo
# `python tools/x.py` puts tools/ on sys.path, not the repo root
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" >"$LOGDIR/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -3 "$LOGDIR/$name.log"
}

TMO=3600
run ab_binning python tools/ab_binning.py
run bench_default python bench.py
run bench_bf16 python bench.py --dtype bfloat16
run bench_batch4 python bench.py --batch 4
run bench_batch8 python bench.py --batch 8
run bench_evalstep1 python bench.py --evalstep 1
run bench_evalstep4 python bench.py --evalstep 4
run bench_train3 python bench.py --train 3
run bench_trainviews8 python bench.py --train-views 8
run mb_decomp python tools/mb_train_decomp.py
run prof_train python tools/profile_steps.py train 3
run prof_fwd1 python tools/profile_steps.py fwd 1
run prof_fwd4 python tools/profile_steps.py fwd 4
run prof_eval python tools/profile_steps.py eval 1
echo "ALL DONE"
