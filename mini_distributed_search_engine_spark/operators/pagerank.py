"""PageRank — the reference's second ranking signal, Spark-native.

Reference semantics (`Integration/src/cis5550/jobs/PageRank.java`):
  * node set = sources (rows of pt-url with adjacency; PageRank.java:39-52)
  * init rank = 1.0 (:60-66)
  * each node sends 0.85 * rank / n to each of its n children, plus a
    0.0 self-contribution that keeps dangling nodes alive (:76-108)
  * new rank = 0.15 + sum(contributions) (:134-140) — unnormalized, as in
    the course slides
  * converge when max |rank - prev| < threshold (:159-186)

The north rule replaces the search-time PageRank blend with BM25 (the blend
was a constant offset anyway — Searcher.java:214-218 hard-codes pr=0.15),
but the job itself is part of the reference's operator inventory, so it is
reproduced here: edge DataFrame, driver-side convergence loop, per-iteration
persist to cut lineage growth. The golden three-node expectations from the
reference's own test (HW9Test.java:235-240) are asserted in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
BASE = 0.15


def _one_iteration(state: DataFrame, edges_deg: DataFrame) -> DataFrame:
    contribs = (edges_deg.join(state, edges_deg.src == state.node)
                .select(F.col("dst").alias("node"),
                        (F.lit(DAMPING) * F.col("rank") / F.col("n")).alias("c"))
                .groupBy("node").agg(F.sum("c").alias("inc")))
    return (state.join(contribs, "node", "left")
            .select("node",
                    (F.lit(BASE) + F.coalesce("inc", F.lit(0.0))).alias("rank"),
                    F.col("rank").alias("prev")))


def pagerank(edges: DataFrame, threshold: float | None = None,
             max_iter: int | None = None) -> DataFrame:
    """(src, dst) edges -> (node, rank). Node set = distinct sources
    (reference semantics). Stop on max|rank-prev| < threshold and/or after
    max_iter iterations."""
    edges = edges.select("src", "dst").distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("n"))
    edges_deg = edges.join(deg, "src").persist()
    state = (edges.select(F.col("src").alias("node")).distinct()
             .withColumn("rank", F.lit(1.0))
             .withColumn("prev", F.lit(1.0))
             .localCheckpoint(eager=True))
    it = 0
    while True:
        it += 1
        # localCheckpoint (not persist): the iteration references state
        # twice, so an uncheckpointed loop doubles the logical plan every
        # pass — O(2^iters) analysis cost; checkpointing truncates lineage
        state = _one_iteration(state, edges_deg).localCheckpoint(eager=True)
        if threshold is not None:
            delta = state.agg(
                F.max(F.abs(F.col("rank") - F.col("prev")))).collect()[0][0]
            if delta < threshold:
                break
        if max_iter is not None and it >= max_iter:
            break
        if threshold is None and max_iter is None:
            raise ValueError("need threshold and/or max_iter")
    edges_deg.unpersist()
    return state.select("node", "rank")


# ---------------------------------------------------------------------------
# Oracle-able variants over edges derived from documents
# ---------------------------------------------------------------------------

def derived_edges(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic link graph over documents, SQL-derivable in
    any engine: doc i links to (7i+1) mod N and (13i+3) mod N.

    Degenerate on purpose-discovered grounds: 7 and 13 are coprime to the
    corpus sizes used in tests, so BOTH maps are bijections, in-degree is
    uniform, and PageRank is stationary at 1.0 from iteration one. Kept for
    back-compat; the gated queries use :func:`derived_edges_uneven`."""
    n = docs.count()
    a = docs.select(F.col("doc_id").alias("src"),
                    ((F.col("doc_id") * 7 + 1) % n).alias("dst"))
    b = docs.select(F.col("doc_id").alias("src"),
                    ((F.col("doc_id") * 13 + 3) % n).alias("dst"))
    return a.unionByName(b)


def derived_edges_uneven(docs: DataFrame) -> DataFrame:
    """Deterministic link graph with NON-uniform in-degree (0..2): every doc
    links to (7i+1) mod N; docs with i % 3 != 0 also link to (13i+3) mod N.
    Ranks genuinely vary, so the oracle hash actually discriminates (the
    fully-bijective graph above is rank-stationary at 1.0)."""
    n = docs.count()
    a = docs.select(F.col("doc_id").alias("src"),
                    ((F.col("doc_id") * 7 + 1) % n).alias("dst"))
    b = (docs.where(F.col("doc_id") % 3 != 0)
         .select(F.col("doc_id").alias("src"),
                 ((F.col("doc_id") * 13 + 3) % n).alias("dst")))
    return a.unionByName(b)


# The sf0.01 gate fixture (500 docs) converges at depth 9 for the
# reference's default threshold 0.1 (PageRank.java:159-186, default t=0.1):
# max|delta| per iteration = 0.425, 0.542, 0.461, 0.424, 0.347, 0.295,
# 0.238, 0.118, 0.0755 < 0.1. The converged ORACLE no longer bakes this in
# (pagerank_converged_sql self-selects its stop level in SQL); the constant
# remains as the documented fixture expectation, pinned by a pytest that
# recomputes it, plus a second pytest at a different corpus size proving
# loop<->unrolled parity is not fixture luck.
CONVERGED_THRESHOLD = 0.1
CONVERGED_DEPTH_SF001 = 9


def pagerank_fixed_query(spark, sf_dir: str, iters: int = 5) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranks = pagerank(derived_edges_uneven(docs), max_iter=iters)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def pagerank_converged_query(spark, sf_dir: str,
                             threshold: float = CONVERGED_THRESHOLD) -> DataFrame:
    """Threshold-convergence mode (the reference's actual stopping rule,
    PageRank.java:159-186) over the uneven derived graph."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranks = pagerank(derived_edges_uneven(docs), threshold=threshold,
                     max_iter=64)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


_UNEVEN_EDGES_CTE = """
WITH n_docs AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM n_docs) AS dst
    FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM n_docs)
    FROM documents WHERE doc_id % 3 <> 0)),
deg AS (SELECT src, count(*) AS n FROM edges GROUP BY src),
r0 AS (SELECT DISTINCT src AS node, 1.0 AS rank FROM edges)"""


def unrolled_pagerank_sql(iters: int, edges_cte: str = _UNEVEN_EDGES_CTE) -> str:
    """Unrolled ``iters`` PageRank levels as chained CTEs (DuckDB oracle)."""
    sql = [edges_cte]
    for i in range(1, iters + 1):
        sql.append(f""",
c{i} AS (SELECT e.dst AS node, sum({DAMPING} * r.rank / d.n) AS inc
        FROM edges e JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
r{i} AS (SELECT r.node, {BASE} + coalesce(c.inc, 0.0) AS rank
        FROM r{i - 1} r LEFT JOIN c{i} c ON c.node = r.node)""")
    sql.append(f"\nSELECT node, round(rank, 9) AS rank FROM r{iters}")
    return "".join(sql)


def pagerank_fixed_sql(iters: int = 5) -> str:
    return unrolled_pagerank_sql(iters)


def pagerank_converged_sql(threshold: float = CONVERGED_THRESHOLD,
                           max_iter: int = 64) -> str:
    """Oracle for the converged query: SELF-SELECTING unroll. All
    ``max_iter`` levels are generated; per-level max|rank - prev| CTEs
    (d1..dN) feed a stop CTE that picks the FIRST level whose delta drops
    under the threshold (falling back to max_iter, mirroring the engine
    loop's safety cap), and the result is read from that level of a
    level-tagged union. No fixture-size constant anywhere: running the
    correctness check at any corpus size compares against the depth the
    threshold rule actually reaches THERE — the same stopping rule as
    `pagerank(threshold=..., max_iter=64)`, evaluated in SQL."""
    # every r{i} is referenced three times (next level, its delta, the
    # final union) — MATERIALIZED stops DuckDB inlining the whole chain
    # into an exponentially-replicated scan tree
    sql = [_UNEVEN_EDGES_CTE.replace("edges AS (", "edges AS MATERIALIZED (")
           .replace("r0 AS (", "r0 AS MATERIALIZED (")
           .replace("deg AS (", "deg AS MATERIALIZED (")]
    for i in range(1, max_iter + 1):
        sql.append(f""",
c{i} AS (SELECT e.dst AS node, sum({DAMPING} * r.rank / d.n) AS inc
        FROM edges e JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
r{i} AS MATERIALIZED (SELECT r.node, {BASE} + coalesce(c.inc, 0.0) AS rank
        FROM r{i - 1} r LEFT JOIN c{i} c ON c.node = r.node),
d{i} AS (SELECT max(abs(r.rank - p.rank)) AS delta
        FROM r{i} r JOIN r{i - 1} p ON p.node = r.node)""")
    lv_union = " UNION ALL ".join(
        f"SELECT {i} AS i, delta FROM d{i}" for i in range(1, max_iter + 1))
    all_union = " UNION ALL ".join(
        f"SELECT {i} AS i, node, rank FROM r{i}"
        for i in range(1, max_iter + 1))
    sql.append(f""",
lv AS ({lv_union}),
stop AS (SELECT coalesce(min(i), {max_iter}) AS i FROM lv
         WHERE delta < {threshold}),
alllv AS ({all_union})
SELECT node, round(rank, 9) AS rank FROM alllv
WHERE i = (SELECT i FROM stop)""")
    return "".join(sql)
