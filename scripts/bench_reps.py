"""Repeated quiet-window bench reps with ambient-noise evidence.

Runs bench.py N times back-to-back at the given SF dir, recording before
each rep (a) the 1/5/15-min load averages and (b) a quick bare-kernel
decode-rate probe (no Spark) so a slow rep can be attributed to ambient
DRAM contention vs a code change. Written for VERDICT r04 next-step #1:
the r4 driver bench regressed ~25% uniformly across untouched queries and
the official record needed a same-window A/B.

Usage: python scripts/bench_reps.py [reps] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

KERNEL_PROBE_IMAGES = 600  # ~15 s; enough for a stable single-box rate


def kernel_probe() -> dict:
    """Single-level decode-rate probe: images/s at 4 workers, no Spark."""
    os.environ.setdefault("SPARK_GRAFT_IMG_SIZES", "256")
    sys.path.insert(0, HERE)
    from bench_kernel import run_level  # noqa: E402

    rate = run_level(KERNEL_PROBE_IMAGES, 4)
    return {"probe_images_per_sec_4w": round(rate, 1)}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "bench_reps_r5.json")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    runs = []
    for i in range(reps):
        load = os.getloadavg()
        probe = kernel_probe()
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        r = json.loads(line)
        runs.append(
            {
                "rep": i,
                "loadavg_before": [round(x, 2) for x in load],
                **probe,
                "bench_wall_sec": round(time.time() - t0, 1),
                "value": r["value"],
                "queries": r["queries"],
                "drain_urls_per_sec": r["drain_urls_per_sec"],
                "drain_phases": r.get("drain_phases"),
            }
        )
        # incremental write so a killed run still leaves evidence
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "runs": runs}, f, indent=2)
        print(json.dumps(runs[-1]), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
