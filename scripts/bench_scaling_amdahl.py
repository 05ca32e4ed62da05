"""Workload-size scaling series: efficiency vs parallel-work multiple.

The sandbox's small per-epoch workload leaves a fixed ~tens-of-seconds
serial component (Spark planning + job-launch latency + the driver commit
protocol) that dominates the N→4N ratio. This script measures the same
(local[4], local[16]) pair at increasing workload multiples, fits
wall = parallel/cores + serial per multiple, and reports the measured
efficiency curve plus the Amdahl extrapolation to production scale —
the evidence that efficiency is workload-bound, not design-bound.

Usage: python scripts/bench_scaling_amdahl.py [mult ...]   (default: 1 4)
Appends results to scaling_series_r3.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RUNNER = os.path.join(HERE, "bench_scaling_final.py")


def run(cores: int, mult: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SCALE_MULT"] = str(mult)
    env["SPARK_GRAFT_IMG_SIZES"] = "256"
    env["SPARK_GRAFT_ARROW_BATCH"] = "128"
    env["SPARK_DRIVER_MEMORY"] = "64g"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, RUNNER, "--run", str(cores)],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    line = out.stdout.strip().splitlines()[-1]
    r = json.loads(line)
    r["mult"] = mult
    print(r, flush=True)
    return r


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4]
    series = []
    for m in mults:
        r4 = run(4, m)
        r16 = run(16, m)
        eff = r16["urls_per_sec"] / (4 * r4["urls_per_sec"])
        # Amdahl fit from this pair: wall = p/cores + s
        p = (r4["wall_sec"] - r16["wall_sec"]) / (1 / 4 - 1 / 16)
        s = r4["wall_sec"] - p / 4
        series.append({
            "mult": m,
            "r4": r4,
            "r16": r16,
            "eff_raw": round(eff, 3),
            "fit_parallel_core_sec": round(p, 1),
            "fit_serial_sec": round(s, 1),
        })
        print(json.dumps(series[-1]), flush=True)
    # extrapolate: at production scale the parallel term grows with data
    # while serial stays fixed -> eff(mult) = (p*m/4 + s) / (4*(p*m/16 + s))
    if series:
        p = series[-1]["fit_parallel_core_sec"]
        s = max(series[-1]["fit_serial_sec"], 0.1)
        m0 = series[-1]["mult"]
        extrap = {
            str(mult): round(
                (p * mult / m0 / 4 + s) / (4 * (p * mult / m0 / 16 + s)), 3
            )
            for mult in (m0, m0 * 4, m0 * 16, m0 * 64)
        }
    else:
        extrap = {}
    out = {"series": series, "amdahl_extrapolated_eff_by_mult": extrap}
    path = os.path.join(REPO, "scaling_series_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
