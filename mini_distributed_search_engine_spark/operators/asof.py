"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (pandas has merge_asof; DuckDB has ASOF JOIN, which is exactly what
the oracle uses).

Semantics: for each left row, attach the LATEST right row with
``right.ts <= left.ts`` within the same key group (left join: no prior
right row -> nulls).

The naive expression is a range self-join (`l.ts >= r.ts` + a per-pair
max), which explodes to O(|L| x |R|) candidate pairs per key before the
aggregation. The scale shape used here is the UNION-WINDOW pattern:

    tag both sides -> union -> one window per key ordered by
    (ts, side) -> carry the last-seen right payload forward with
    last(ignorenulls) -> keep the left rows.

Cost is ONE shuffle on the key (the partitioning both inputs need
anyway) and a single ordered pass per key — no candidate-pair blowup, no
per-row Python. Right rows sort before left rows at equal ts, so
equality (`>=`) is included. Among right rows sharing an exact ts the
carried row is the last in (ts, tie) order; DuckDB's ASOF picks
arbitrarily there, so oracle comparison assumes per-key-unique right
timestamps (true of the events table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts_col: str = "ts", right_cols: tuple[str, ...] = (),
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join; output = all left columns plus ``prefix<c>`` for
    each c in right_cols (nulls when no right row precedes)."""
    rpayload = right.select(*right_cols)
    r_ddl = "struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}"
        for f in rpayload.schema.fields) + ">"
    lt = (left.select(F.struct(*left.columns).alias("_l"), *on,
                      F.col(ts_col).alias("_ts"))
          .withColumn("_side", F.lit(1))
          .withColumn("_r", F.lit(None).cast(r_ddl)))
    rt = right.select(
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *on, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r")) \
        .where(F.col("_ts").isNotNull())
    # right NULL timestamps are dropped, not sorted-first: ts >= NULL is
    # false in the reference semantics (DuckDB ASOF, pandas merge_asof),
    # so a timestamp-less right row must never be carried into a match
    u = lt.unionByName(rt)
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ts").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = (u.withColumn("_carry", F.last("_r", ignorenulls=True).over(w))
               .where(F.col("_side") == 1))
    out_cols = [F.col("_l." + c).alias(c) for c in left.columns]
    out_cols += [F.col("_carry." + c).alias(prefix + c) for c in right_cols]
    return carried.select(*out_cols)


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               ts_col: str = "ts", lo: float = -300.0, hi: float = 0.0,
               right_cols: tuple[str, ...] = (),
               prefix: str = "r_") -> DataFrame:
    """Interval/range join: every (left, right) pair within the same key
    where ``left.ts + lo <= right.ts < left.ts + hi`` (half-open window,
    seconds).

    The naive plan is a key join followed by the range predicate — the
    key join alone materializes O(|L| x |R|) rows per key before any
    filtering. The scale shape here is TIME BUCKETING: width = hi - lo,
    bucket the right side by floor(ts / width), explode each left row to
    its (at most two) candidate buckets, equi-join on (key, bucket), then
    apply the exact range filter. Candidate fan-out is bounded by rows
    per bucket, and Catalyst gets a pure hash join — the same trick
    Spark's own interval-join literature (and Flink's window join) uses.
    Returns all left columns plus ``prefix<c>`` for each right_col."""
    if not hi > lo:
        raise ValueError(f"range_join window must be non-empty: lo={lo}, "
                         f"hi={hi} (width 0 would NULL the bucket math "
                         "and silently drop every row)")
    width = float(hi - lo)
    lts = F.col(ts_col).cast("timestamp").cast("double")
    lt = (left.select(F.struct(*left.columns).alias("_l"), *on,
                      lts.alias("_lts"))
          .withColumn("_bucket", F.explode(F.sequence(
              F.floor((F.col("_lts") + F.lit(lo)) / F.lit(width)),
              F.floor((F.col("_lts") + F.lit(hi)) / F.lit(width))))))
    rt = right.select(
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"), *on,
        lts.alias("_rts")).withColumn(
            "_bucket", F.floor(F.col("_rts") / F.lit(width)))
    joined = (lt.join(rt, [*on, "_bucket"])
              .where((F.col("_rts") >= F.col("_lts") + F.lit(lo))
                     & (F.col("_rts") < F.col("_lts") + F.lit(hi))))
    out_cols = [F.col("_l." + c).alias(c) for c in left.columns]
    out_cols += [F.col("_r." + c).alias(prefix + c) for c in right_cols]
    return joined.select(*out_cols)
