#!/bin/bash
# Scheduler A/B on the 4x2-core (8-core) drain leg, mult=16: interleaved
# legs across four configs — baseline (FIFO, locality.wait=3s default),
# FAIR pools, locality.wait=0, and FAIR+locality0 — with a bare-kernel
# probe before every leg so window drift is observable. Targets the two
# anti-scaling commit-tail hypotheses (BENCH.md §2.4): FIFO queueing of
# the concurrent commit jobs, and locality-wait slot idling on tiny
# cached-input jobs. Appends a summary to ab_sched.out; per-leg logs in
# ab_sched_leg_<i>_<tag>.log.
cd "$(dirname "$0")/.."
export SPARK_MASTER="local-cluster[4,2,18432]"
export SPARK_EXECUTOR_MEMORY=16g
export SPARK_DRIVER_MEMORY=8g
export SPARK_GRAFT_SCALE_MULT=16
export SPARK_GRAFT_IMG_SIZES=256
export SPARK_GRAFT_ARROW_BATCH=128
export SPARK_GRAFT_SHUFFLE_PARTS=32
export CRAWL_PROFILE=1
export PYTHONPATH="$PWD:$PYTHONPATH"
i=0
for TAG in base fair loc0 fair_loc0 base fair loc0 fair_loc0; do
  i=$((i+1))
  case $TAG in
    base)      unset SPARK_GRAFT_SCHEDULER; unset SPARK_GRAFT_LOCALITY_WAIT ;;
    fair)      export SPARK_GRAFT_SCHEDULER=FAIR; unset SPARK_GRAFT_LOCALITY_WAIT ;;
    loc0)      unset SPARK_GRAFT_SCHEDULER; export SPARK_GRAFT_LOCALITY_WAIT=0 ;;
    fair_loc0) export SPARK_GRAFT_SCHEDULER=FAIR; export SPARK_GRAFT_LOCALITY_WAIT=0 ;;
  esac
  {
    echo "=== leg $i $TAG ==="
    python scripts/bench_kernel.py 1200 256 2,8
    python scripts/bench_scaling_final.py --run 8 > ab_sched_leg_${i}_${TAG}.log 2>&1
    grep -a "profile\] epoch\|commit tasks" ab_sched_leg_${i}_${TAG}.log
    tail -1 ab_sched_leg_${i}_${TAG}.log
  } >> ab_sched.out 2>&1
done
