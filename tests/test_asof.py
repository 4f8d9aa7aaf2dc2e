"""As-of join semantics: latest right row at or before each left ts per
key; equality included; nulls when nothing precedes; keys don't leak."""

from __future__ import annotations

from datetime import datetime, timezone

from mini_distributed_search_engine_spark.operators.asof import asof_join


def _ts(e):
    return datetime.fromtimestamp(e, timezone.utc).replace(tzinfo=None)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(100.0)), (2, "u", _ts(200.0)), (3, "u", _ts(50.0)),
         (4, "w", _ts(100.0))],
        "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u", _ts(90.0), 1.5), (11, "u", _ts(200.0), 2.5),
         (12, "v", _ts(10.0), 9.9)],
        "rid int, k string, ts timestamp, value double")
    out = {r["lid"]: (r["asof_rid"], r["asof_value"])
           for r in asof_join(left, right, on=["k"], ts_col="ts",
                              right_cols=("rid", "value")).collect()}
    assert out[1] == (10, 1.5)      # 90 <= 100, latest
    assert out[2] == (11, 2.5)      # equality included (200 <= 200)
    assert out[3] == (None, None)   # nothing precedes ts=50
    assert out[4] == (None, None)   # key 'v' must not leak into 'w'
    assert len(out) == 4            # exactly one output row per left row


def test_range_join_bucket_boundaries(spark):
    """Bucketed range join: rows at the exact window edges (inclusive lo,
    exclusive hi) and in neighbor buckets resolve correctly."""
    from mini_distributed_search_engine_spark.operators.asof import range_join
    left = spark.createDataFrame([(1, "u", _ts(600.0))],
                                 "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(20, "u", _ts(299.0), 1.0),    # before window
         (21, "u", _ts(300.0), 2.0),    # lo edge: included
         (22, "u", _ts(599.0), 3.0),    # inside, same bucket as hi
         (23, "u", _ts(600.0), 4.0),    # hi edge: excluded
         (24, "x", _ts(400.0), 5.0)],   # wrong key
        "rid int, k string, ts timestamp, value double")
    got = sorted(r["r_rid"] for r in range_join(
        left, right, on=["k"], ts_col="ts", lo=-300.0, hi=0.0,
        right_cols=("rid", "value")).collect())
    assert got == [21, 22]
