"""Analytics operators beyond the reference's inventory.

SURVEY.md §2.1 records what the reference LACKS: no sort, no order-by-limit,
no window functions, no grouping sets/rollup, no sessionization. These are
table stakes for an analytics engine at scale, so they're implemented here
Spark-natively, each with a DuckDB oracle (returned by `oracle_pairs`).

Float discipline for cross-engine checks: aggregate sums are rounded (2-4dp,
magnitudes make 1e-8 association noise irrelevant); ordered-limit queries
order by the ROUNDED measure with a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- TPC-H Q1 shape: filtered multi-aggregate groupBy ------------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").cast("long").alias("count_order")))


PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


# -- TPC-H Q3 shape: join + ordered top-k (TakeOrderedAndProject) ------------
def top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey))
    rev = (j.groupBy("l_orderkey")
           .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                        4).alias("revenue")))
    return (rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10))


TOP_UNSHIPPED_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""


# -- TPC-H Q6 shape: scalar aggregate with pushed predicates -----------------
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= "1994-01-01")
                     & (F.col("l_shipdate") < "1995-01-01")
                     & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))


FORECAST_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""


# -- window functions: rank + running total per customer ---------------------
def customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
        F.round(F.col("o_totalprice")
                - F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("delta_prev"))
    )


WINDOWS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS order_seq,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""


# -- rollup (grouping sets) ---------------------------------------------------
def rollup_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").cast("long").alias("cnt"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
            .select(F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
                    F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
                    "cnt", "sum_qty"))


ROLLUP_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


# -- sessionization over the events stream table ------------------------------
def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second epochs: ts carries microseconds, and engines differ
    # in truncate-vs-round on integer casts — compare gaps in full precision,
    # floor only for output
    epoch = F.col("ts").cast("timestamp").cast("double")  # NTZ -> epoch (session tz UTC)
    gap = F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | ((epoch - gap) > gap_minutes * 60),
                      1).otherwise(0)
    sess = (ev.withColumn("new_sess", new_sess)
            .withColumn("session_seq",
                        F.sum("new_sess").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.floor(F.min(F.col("ts").cast("timestamp").cast("double"))).cast("long")
                 .alias("t_start_epoch"),
                 F.floor(F.max(F.col("ts").cast("timestamp").cast("double"))).cast("long")
                 .alias("t_end_epoch"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .withColumn("session_seq", F.col("session_seq").cast("int")))


def sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked)
SELECT user_id, CAST(session_seq AS INT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS t_start_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS t_end_epoch,
       round(sum(value), 4) AS total_value
FROM sess GROUP BY user_id, session_seq"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'click' event, the latest preceding 'view' by the same
    user (union-window as-of join, operators/asof.py); the oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from .asof import asof_join
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(clicks, views, on=["user_id"], ts_col="ts",
                    right_cols=("event_id", "ts", "value"))
    epoch = lambda c: F.floor(F.col(c).cast("timestamp")
                              .cast("double")).cast("long")  # noqa: E731
    return out.select(
        "event_id", "user_id", epoch("ts").alias("ts_epoch"),
        F.col("asof_event_id").cast("long").alias("asof_event_id"),
        epoch("asof_ts").alias("asof_ts_epoch"),
        F.col("asof_value").alias("asof_value"))


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95/p99 of event value per type —
    `F.percentile` (exact linear interpolation, same definition as
    DuckDB's quantile_cont). Exact percentiles need the full sorted group;
    at 100 TB use the sibling :func:`events_value_quantiles_approx`
    (mergeable GK sketch, identical query shape, pytest-bounded error)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(*[F.round(F.percentile("value", F.lit(q)), 6)
                   .alias(f"p{int(q * 100)}")
                   for q in (0.5, 0.95, 0.99)]))


QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1"""


def events_value_quantiles_approx(spark: SparkSession, sf_dir: str,
                                  accuracy: int = 2_147_483_647) -> DataFrame:
    """The 100 TB quantile path: `percentile_approx` (Greenwald-Khanna
    sketch — mergeable, map-side partial, O(accuracy) state per group
    instead of the full sorted group the exact `F.percentile` needs).

    At the default max accuracy the sketch holds every value, so the result
    is the exact DISCRETE quantile (an element of the data — DuckDB's
    quantile_disc), which is what the oracle checks; a pytest lowers
    `accuracy` and bounds the sketch error against the exact result, which
    is the contract that actually matters at scale."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(*[F.round(F.percentile_approx("value", F.lit(q),
                                               F.lit(accuracy)), 6)
                   .alias(f"p{int(q * 100)}")
                   for q in (0.5, 0.95, 0.99)]))


QUANTILES_APPROX_SQL = """
SELECT event_type,
       round(quantile_disc(value, 0.5), 6) AS p50,
       round(quantile_disc(value, 0.95), 6) AS p95,
       round(quantile_disc(value, 0.99), 6) AS p99
FROM events GROUP BY 1"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 'error' event: count and value-sum of the same user's 'click'
    events in the preceding 5 minutes (bucketed range join,
    operators/asof.py:range_join); zero-match errors kept via left join."""
    from .asof import range_join
    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts", "value")
    pairs = range_join(errors, clicks, on=["user_id"], ts_col="ts",
                       lo=-300.0, hi=0.0, right_cols=("value",))
    agg = (pairs.groupBy("event_id")
           .agg(F.count("*").cast("long").alias("n_clicks_5m"),
                F.round(F.sum("r_value"), 4).alias("sum_value_5m")))
    return (errors.join(agg, "event_id", "left")
            .select("event_id", "user_id",
                    F.floor(F.col("ts").cast("timestamp").cast("double"))
                    .cast("long").alias("ts_epoch"),
                    F.coalesce("n_clicks_5m", F.lit(0)).cast("long")
                    .alias("n_clicks_5m"),
                    F.coalesce("sum_value_5m", F.lit(0.0))
                    .alias("sum_value_5m")))


RANGE_SQL = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_epoch,
       CAST(count(c.ts) AS BIGINT) AS n_clicks_5m,
       round(coalesce(sum(c.value), 0), 4) AS sum_value_5m
FROM e LEFT JOIN c ON c.user_id = e.user_id
  AND epoch(c.ts) >= epoch(e.ts) - 300 AND epoch(c.ts) < epoch(e.ts)
GROUP BY 1, 2, 3"""


ASOF_SQL = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view')
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       v.event_id AS asof_event_id,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS asof_ts_epoch,
       v.value AS asof_value
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts"""


def queries() -> dict:
    return {
        "analytics_pricing_summary": pricing_summary,
        "analytics_top_unshipped": top_unshipped,
        "analytics_forecast_revenue": forecast_revenue,
        "analytics_windows": customer_order_windows,
        "analytics_rollup": rollup_lineitems,
        "analytics_sessionize": sessionize_events,
        "events_asof_join": events_asof_join,
        "events_range_join": events_range_join,
        "events_value_quantiles": events_value_quantiles,
        "events_value_quantiles_approx": events_value_quantiles_approx,
    }


def oracles() -> dict:
    return {
        "analytics_pricing_summary": PRICING_SQL,
        "analytics_top_unshipped": TOP_UNSHIPPED_SQL,
        "analytics_forecast_revenue": FORECAST_SQL,
        "analytics_windows": WINDOWS_SQL,
        "analytics_rollup": ROLLUP_SQL,
        "analytics_sessionize": sessionize_sql(),
        "events_asof_join": ASOF_SQL,
        "events_range_join": RANGE_SQL,
        "events_value_quantiles": QUANTILES_SQL,
        "events_value_quantiles_approx": QUANTILES_APPROX_SQL,
    }
