#!/bin/bash
# Definitive sp32-vs-sp64 A/B on the 4x2-core (8-core) drain leg:
# interleaved legs (32,64,32,64), full per-leg logs (CRAWL_PROFILE phase
# marks preserved), kernel probe before every leg. Appends a summary to
# ab_sp_interleaved.out; per-leg logs in ab_leg_<i>_sp<SP>.log.
cd "$(dirname "$0")/.."
export SPARK_MASTER="local-cluster[4,2,18432]"
export SPARK_EXECUTOR_MEMORY=16g
export SPARK_DRIVER_MEMORY=8g
export SPARK_GRAFT_SCALE_MULT=16
export SPARK_GRAFT_IMG_SIZES=256
export SPARK_GRAFT_ARROW_BATCH=128
export CRAWL_PROFILE=1
export PYTHONPATH="$PWD:$PYTHONPATH"
i=0
for SP in 32 64 32 64; do
  i=$((i+1))
  {
    echo "=== leg $i sp$SP ==="
    python scripts/bench_kernel.py 1200 256 2,8
    SPARK_GRAFT_SHUFFLE_PARTS=$SP python scripts/bench_scaling_final.py --run 8 \
      > ab_leg_${i}_sp${SP}.log 2>&1
    tail -1 ab_leg_${i}_sp${SP}.log
  } >> ab_sp_interleaved.out 2>&1
done
