"""Bare decode+validate kernel scaling — the hardware ceiling measure.

Runs the SAME per-image work the fetch stage's pandas UDF performs
(decode ppm/bmp/qpng -> expected-pixel compare / PSNR -> phash) as a pure
Python multiprocessing pool at N and 4N workers, no Spark involved. On a
single box, 4x the workers share 1x the DRAM bandwidth, so this ratio is
the ceiling ANY framework can reach here; a real 4N-executor cluster
multiplies memory bandwidth per node instead of sharing it.

Usage: python scripts/bench_kernel.py [n_images] [img_size]
Prints one JSON line with rows/s at each level and the ceiling efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = (4, 16)  # default N and 4N worker counts; override with argv[3] "2,8"


def _work(args) -> int:
    lo, hi, seed = args
    import numpy as np

    from newscrawler_spark import codecs, datagen

    n_ok = 0
    for i in range(lo, hi):
        image_id, data, w, h, fmt, caption, phash = datagen.payload_row(i, seed)
        arr = codecs.decode(data, fmt)
        if arr.shape[1] != w or arr.shape[0] != h:
            continue
        exp = datagen.expected_pixels(i, seed)
        if fmt == "qpng":
            if codecs.psnr(exp, arr) < 40.0:
                continue
        elif not np.array_equal(exp, arr):
            continue
        if codecs.average_phash(arr) == phash:
            n_ok += 1
    return n_ok


def run_level(n_imgs: int, workers: int, seed: int = 42) -> float:
    chunk = max(1, n_imgs // (workers * 8))
    tasks = [(lo, min(lo + chunk, n_imgs), seed) for lo in range(0, n_imgs, chunk)]
    t0 = time.time()
    with mp.Pool(workers) as pool:
        total = sum(pool.map(_work, tasks))
    wall = time.time() - t0
    assert total > 0
    return n_imgs / wall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    size = sys.argv[2] if len(sys.argv) > 2 else "256"
    os.environ["SPARK_GRAFT_IMG_SIZES"] = size
    global LEVELS
    if len(sys.argv) > 3:
        LEVELS = tuple(int(x) for x in sys.argv[3].split(","))
        if len(LEVELS) != 2 or LEVELS[1] != 4 * LEVELS[0]:
            raise SystemExit(
                f"usage: bench_kernel.py [n_images] [img_size] [N,4N] — "
                f"levels must be exactly two with the second 4x the first, "
                f"got {sys.argv[3]!r}"
            )
    # interleave levels twice to ride out host noise; report best-of
    reps: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _ in range(2):
        for c in LEVELS:
            reps[c].append(round(run_level(n, c), 1))
    best = {c: max(v) for c, v in reps.items()}
    n1, n4 = LEVELS
    print(
        json.dumps(
            {
                "n_images": n,
                "img_size": int(size),
                "reps_rows_per_sec": {str(c): reps[c] for c in LEVELS},
                "best_rows_per_sec": {str(c): best[c] for c in LEVELS},
                "kernel_ceiling_eff_N_to_4N": round(best[n4] / (4 * best[n1]), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
