"""Approx-quantile contract: at reduced sketch accuracy the GK
`percentile_approx` result must stay within the documented rank-error
bound of the exact per-group quantile — the property that actually
matters when the exact sort-the-group path is swapped out at 100 TB."""

from __future__ import annotations

from mini_distributed_search_engine_spark.operators.analytics import (
    events_value_quantiles, events_value_quantiles_approx)

SF_DIR = "/root/testdata/sf0.01"


def test_low_accuracy_sketch_stays_within_rank_error(spark):
    approx = {r["event_type"]: (r["p50"], r["p95"], r["p99"])
              for r in events_value_quantiles_approx(
                  spark, SF_DIR, accuracy=100).collect()}
    # the GK guarantee is a RANK bound, not a value bound (on a
    # long-tailed distribution p99 +/- 1% rank can legitimately be the
    # group max): the returned value's empirical rank must sit within
    # 1/accuracy of the requested quantile.
    values = {}
    for row in spark.read.parquet(f"{SF_DIR}/events.parquet") \
            .select("event_type", "value").collect():
        values.setdefault(row["event_type"], []).append(row["value"])
    eps = 1.0 / 100 + 1e-6
    for et, (a50, a95, a99) in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for q, a in ((0.5, a50), (0.95, a95), (0.99, a99)):
            lo_rank = sum(1 for v in vs if v < a - 1e-9) / n
            hi_rank = sum(1 for v in vs if v <= a + 1e-9) / n
            assert lo_rank <= q + eps and hi_rank >= q - eps, \
                (et, q, a, lo_rank, hi_rank)


def test_max_accuracy_equals_exact_discrete_quantile(spark):
    # at the default max accuracy the sketch holds every value -> the
    # result IS the exact discrete quantile; interpolating `exact` p50
    # may differ, but p95/p99 on large groups sit within one element
    exact = {r["event_type"]: r["p50"]
             for r in events_value_quantiles(spark, SF_DIR).collect()}
    approx = {r["event_type"]: r["p50"]
              for r in events_value_quantiles_approx(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = min(r["c"] for r in
            ev.groupBy("event_type").count().withColumnRenamed(
                "count", "c").collect())
    # discrete vs interpolated p50 differ by at most one order-statistic
    # gap; with n >= 100 per group that is a tiny fraction of the spread
    assert n >= 100
    for et in exact:
        assert abs(exact[et] - approx[et]) <= 1.0, (et, exact[et], approx[et])
