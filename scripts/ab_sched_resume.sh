#!/bin/bash
# Resume of scripts/ab_sched_leg.sh from leg 2: the original run's legs 2-8
# were killed by an environmental SIGHUP (all executors exited 129 at once,
# ab_sched_leg_2_fair.log) — leg 1 (base) completed and its result is kept
# in ab_sched.out. Same interleaved design: FAIR pools, locality.wait=0,
# and their combination vs the already-recorded FIFO baseline, with a
# bare-kernel probe before every leg so window drift is observable.
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
i=1
for TAG in fair loc0 fair_loc0 base fair loc0 fair_loc0; do
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
echo "AB_SCHED_RESUME_DONE" >> ab_sched.out
