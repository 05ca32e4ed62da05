"""Seen-set + bloom design-point validation at 10^7 keys (slow-marked).

The default suite proves bloom soundness at toy scale
(tests/test_seenfilter.py); this gate runs the same build → fill-to-full-
headroom → probe protocol the 10^8 harness (`scripts/bench_seen_scale.py`)
measures, with hard assertions on the sizing math the 10^10 design relies
on: no resize inside the headroom budget, measured fpp tracking the
analytic bound at the worst legal load, and both physical probe paths
(bloom broadcast / one-sided bucket shuffle) returning identical, exact
results. Run with `pytest -m slow tests/test_seen_scale.py`.
"""

import pytest

from scripts.bench_seen_scale import run


@pytest.mark.slow
def test_seen_scale_1e7(spark, tmp_path):
    res = run(spark, str(tmp_path / "cat"), 10_000_000, n_probe=200_000)
    # bitmaps were sized for BUILD_HEADROOM x the build count: filling to
    # exactly that load must not trigger a resize-rebuild
    assert res["resize_after_fill"] == []
    # exactness on both probe paths: every novel probe key comes back
    assert res["split_counts_equal"]
    # measured fpp at full headroom tracks the analytic per-bucket bound
    # (pow-2 m sizing keeps the analytic value <= (1/2)^k ~= 3.1%)
    assert res["fpp_analytic"] <= 0.032
    assert res["fpp_measured"] <= 2 * res["fpp_analytic"] + 0.005
    # the sizing helper stays consistent with the configured bucket count
    assert res["required_bucket_count"] <= res["bucket_count"]
