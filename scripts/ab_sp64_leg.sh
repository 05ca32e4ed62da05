#!/bin/bash
# Matched same-window A/B: the 4x2-core (8-core) drain leg at
# spark.sql.shuffle.partitions=32 vs 64, mult=16 — back-to-back legs,
# identical code+workload. Appends to ab_sp64_leg.out. Pass the SP order
# as args (default "32 64"); run both orders in different windows so the
# window-drift confound cancels.
cd "$(dirname "$0")/.."
ORDER="${@:-32 64}"
export SPARK_MASTER="local-cluster[4,2,18432]"
export SPARK_EXECUTOR_MEMORY=16g
export SPARK_DRIVER_MEMORY=8g
export SPARK_GRAFT_SCALE_MULT=16
export SPARK_GRAFT_IMG_SIZES=256
export SPARK_GRAFT_ARROW_BATCH=128
export CRAWL_PROFILE=1
export PYTHONPATH="$PWD:$PYTHONPATH"
{
  python scripts/bench_kernel.py 1200 256 2,8
  for SP in $ORDER; do
    echo "=== sp$SP ==="
    SPARK_GRAFT_SHUFFLE_PARTS=$SP python scripts/bench_scaling_final.py --run 8 2>/dev/null | tail -1
    python scripts/bench_kernel.py 1200 256 2,8
  done
} >> ab_sp64_leg.out 2>&1
