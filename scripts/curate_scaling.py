"""Append a scaling run's pairs into a curated round-evidence file.

`bench_scaling_cluster.py` overwrites `scaling_cluster_last_run.json` on
every run; the per-round evidence files (`scaling_cluster_r*_{2,4}c.json`)
accumulate pairs across runs and must never be clobbered. This script does
the append mechanically:

    python scripts/curate_scaling.py scaling_cluster_r5_4c.json [label]

- creates the curated file from the last run's protocol header if absent;
- refuses to mix runs with different exec_cores/exec_mem/mult;
- appends only complete pairs (skips `{"error": ...}` reps, but counts
  them in the run log line);
- tags each appended pair with the optional label (e.g. "r5e");
- recomputes best_eff over ALL curated pairs.

Prose (BENCH.md / BASELINE.md) is still updated by hand.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    curated_path = os.path.join(REPO, sys.argv[1])
    label = sys.argv[2] if len(sys.argv) > 2 else None

    with open(os.path.join(REPO, "scaling_cluster_last_run.json")) as f:
        run = json.load(f)

    good = [p for p in run["pairs"] if "eff" in p]
    failed = [p for p in run["pairs"] if "eff" not in p]
    if label:
        for p in good:
            p["run_label"] = label

    if os.path.exists(curated_path):
        with open(curated_path) as f:
            cur = json.load(f)
        for k in ("exec_cores", "exec_mem_mb", "workload_mult"):
            if cur.get(k) != run.get(k):
                raise SystemExit(
                    f"refusing to mix configs: curated {k}={cur.get(k)} "
                    f"vs run {k}={run.get(k)}"
                )
        cur["pairs"].extend(good)
    else:
        cur = {k: v for k, v in run.items() if k != "best_eff"}
        cur["pairs"] = good

    cur["best_eff"] = max((p["eff"] for p in cur["pairs"]), default=None)
    with open(curated_path, "w") as f:
        json.dump(cur, f, indent=2)
    print(
        f"appended {len(good)} pair(s) (skipped {len(failed)} failed) -> "
        f"{curated_path}; best_eff={cur['best_eff']}; "
        f"effs={[p['eff'] for p in cur['pairs']]}"
    )


if __name__ == "__main__":
    main()
