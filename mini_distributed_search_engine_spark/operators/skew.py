"""Explicit skew handling: salted two-phase aggregation.

The reference's answer to skew was lossy truncation of hot posting lists
(`Indexer.java:320-400`). Ours is exact: beyond AQE's runtime skew-join
splitting and the packed index's doc-range sharding (which bounds any hot
term's group), this operator provides generic salted aggregation for
skewed groupBy keys — phase 1 aggregates on (key, salt), phase 2 combines
the partials — producing results identical to the unsalted plan while
spreading any hot key over `salt_buckets` reducers.

Only algebraic aggregates (re-combinable partials) are supported; that is
exactly the class where salting is sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,   # partial counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]],
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_col -> (fn, input_col) with fn in sum/count/min/max.
    Example: salted_agg(li, ["l_returnflag"], {"cnt": ("count", "*"),
    "sum_qty": ("sum", "l_quantity")}).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count("*" if col == "*" else col)
                                 .cast("long").alias(f"_p_{out}"))
        else:
            partial_exprs.append(_COMBINE[fn](col).alias(f"_p_{out}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = []
    for out, (fn, col) in aggs.items():
        comb = _COMBINE[fn]
        final_exprs.append(comb(f"_p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*final_exprs)
