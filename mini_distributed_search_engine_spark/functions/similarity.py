"""Similarity search over embedding columns (array<float>).

* `cosine_topk` — brute-force exact top-k, the correctness baseline. The
  per-row cosine is a JVM-side `aggregate(zip_with(...))` fold in float64
  (sequential, deterministic association order), so the DuckDB oracle's
  per-index sum reproduces it to rounding precision.
* `lsh_ann_topk` — the scale path: random-hyperplane (sign) LSH. Hyperplanes
  are +/-1 vectors derived from md5 bits in PYTHON and embedded as literals
  in both the Spark plan and the oracle SQL, so both engines bucket
  identically. Query cost drops from O(N) rows to O(bucket size); exactness
  is traded for recall (evaluated in tests against brute force).

* `ivf_ann_topk` — the second scale path: IVF-flat. Vectors join the
  inverted list of their nearest coarse centroid; a query exact-scores only
  its n_probe nearest lists. Centroids here are deterministically sampled
  (first C vec_ids) so the DuckDB oracle reproduces the assignment; at
  scale they come from a k-means job, same structure.

At 100 TB scale: brute force is one pass (fine for batch joins); the LSH
variant turns per-query scans into a bucket-pruned lookup — bucket id is a
groupable key, so the same pattern shards across executors with no driver
state; the IVF variant stores the corpus partitioned by centroid_id so a
query is n_probe partition scans (partition pruning), the layout every
production ANN system (FAISS IVF, SCANN) uses.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 4   # planes per table -> 16 buckets/table
N_TABLES = 4   # independent hash tables; candidates = union over tables


def hyperplanes(dim: int = DIM, n_planes: int = N_PLANES,
                n_tables: int = N_TABLES) -> list[list[list[float]]]:
    """Deterministic +/-1 hyperplanes from md5 bits, per table —
    reproducible in any engine (embedded as literals in oracle SQL).
    Returns [table][plane][dim]."""
    tables = []
    for t in range(n_tables):
        planes = []
        for j in range(n_planes):
            row = []
            for i in range(dim):
                h = hashlib.md5(f"plane{t}_{j}_{i}".encode()).hexdigest()
                row.append(1.0 if int(h[0], 16) < 8 else -1.0)
            planes.append(row)
        tables.append(planes)
    return tables


def _cos(a, b):
    """Cosine of two array columns, float64, sequential fold order."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk(embeddings: DataFrame, query_ids: tuple[int, ...] = (0, 1, 2),
                k: int = 10) -> DataFrame:
    """Exact cosine top-k of every vector vs each query vector (excluding
    self). Output: (query_vec_id, rank, vec_id, cos). Rank on rounded cosine
    for cross-engine determinism; ties by vec_id."""
    from pyspark.sql import Window
    q = (embeddings.where(F.col("vec_id").isin(list(query_ids)))
         .select(F.col("vec_id").alias("query_vec_id"),
                 F.col("embedding").alias("q_emb")))
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_vec_id"))
    scored = joined.select(
        "query_vec_id", "vec_id",
        F.round(_cos(F.col("embedding"), F.col("q_emb")), 6).alias("cos"))
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos").desc(),
                                                   F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_vec_id", "rank", "vec_id", "cos"))


def lsh_buckets(embeddings: DataFrame,
                tables: list[list[list[float]]] | None = None) -> DataFrame:
    """(vec_id, embedding, t, bucket): one sign-LSH bucket per hash table.
    bit j of a bucket = sign(round(dot(v, plane_tj), 6)) >= 0; rounding
    before sign keeps float32-input dot products engine-agnostic."""
    tables = tables or hyperplanes()
    entries = []
    for t, planes in enumerate(tables):
        bucket = F.lit(0).cast("long")
        for j, plane in enumerate(planes):
            lit = F.array(*[F.lit(x) for x in plane])
            dot = F.round(F.aggregate(
                F.zip_with(F.col("embedding"), lit,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, v: acc + v), 6)
            bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        entries.append(F.struct(F.lit(t).alias("t"), bucket.alias("bucket")))
    return (embeddings
            .select("vec_id", "embedding",
                    F.explode(F.array(*entries)).alias("tb"))
            .select("vec_id", "embedding", F.col("tb.t").alias("t"),
                    F.col("tb.bucket").alias("bucket")))


def lsh_ann_topk(embeddings: DataFrame, query_ids: tuple[int, ...] = (0, 1, 2),
                 k: int = 10) -> DataFrame:
    """Approximate top-k: exact cosine restricted to candidates sharing ANY
    hash table's bucket with the query (multi-table union boosts recall).
    Output: (query_vec_id, rank, vec_id, cos)."""
    from pyspark.sql import Window
    bucketed = lsh_buckets(embeddings)
    q = (bucketed.where(F.col("vec_id").isin(list(query_ids)))
         .select(F.col("vec_id").alias("query_vec_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("t").alias("q_t"), F.col("bucket").alias("q_bucket")))
    cands = (bucketed.join(F.broadcast(q),
                           (F.col("t") == F.col("q_t"))
                           & (F.col("bucket") == F.col("q_bucket"))
                           & (F.col("vec_id") != F.col("query_vec_id")))
             .select("query_vec_id", "vec_id", "embedding", "q_emb")
             .dropDuplicates(["query_vec_id", "vec_id"]))
    scored = cands.select(
        "query_vec_id", "vec_id",
        F.round(_cos(F.col("embedding"), F.col("q_emb")), 6).alias("cos"))
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos").desc(),
                                                   F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_vec_id", "rank", "vec_id", "cos"))


N_CENTROIDS = 8
N_PROBE = 2


def _resolve_centroids(embeddings: DataFrame, n_centroids: int,
                       centroids: DataFrame | None) -> DataFrame:
    """The ONE place the default centroid frame is derived: the first
    n_centroids vec_ids of the FULL corpus (deterministic sampled
    centroids — sampling keeps the DuckDB oracle able to reproduce the
    assignment exactly). Callers that pre-filter `embeddings` must resolve
    centroids from the unfiltered frame first, or the centroid set would
    silently change."""
    return centroids if centroids is not None else (
        embeddings.where(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("c_emb")))


def _centroid_scores(embeddings: DataFrame, n_centroids: int,
                     centroids: DataFrame | None = None) -> DataFrame:
    """(vec_id, embedding, centroid_id, ccos): cosine of every vector vs
    every centroid; pass a (centroid_id, c_emb) frame (e.g. `kmeans_fit`)
    for learned ones. Broadcast nested-loop join: narrow, no shuffle."""
    cents = _resolve_centroids(embeddings, n_centroids, centroids)
    return embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "centroid_id",
        F.round(_cos(F.col("embedding"), F.col("c_emb")), 6).alias("ccos"))


def _probe_lists(embeddings: DataFrame, query_ids: tuple[int, ...],
                 n_centroids: int, n_probe: int,
                 cents: DataFrame) -> DataFrame:
    """(query_vec_id, q_emb, centroid_id): each query vector's n_probe
    nearest centroids — scoring runs only over the (tiny) query set, and
    the tie-break (ccos desc, centroid_id asc) is defined HERE once for
    both the in-memory and partitioned top-k paths."""
    from pyspark.sql import Window
    return (_centroid_scores(
                embeddings.where(F.col("vec_id").isin(list(query_ids))),
                n_centroids, cents)
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("vec_id")
                .orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())))
            .where(F.col("rn") <= n_probe)
            .select(F.col("vec_id").alias("query_vec_id"),
                    F.col("embedding").alias("q_emb"), "centroid_id"))


def _rank_probed_candidates(corpus: DataFrame, probe: DataFrame,
                            k: int) -> DataFrame:
    """Join corpus rows to broadcast probe lists on centroid_id, score
    exact cosine, keep each query's top-k (cos desc, vec_id asc) — the
    shared tail of both IVF top-k physical plans."""
    from pyspark.sql import Window
    cands = (corpus.join(F.broadcast(probe), "centroid_id")
             .where(F.col("vec_id") != F.col("query_vec_id")))
    scored = cands.select(
        "query_vec_id", "vec_id",
        F.round(_cos(F.col("embedding"), F.col("q_emb")), 6).alias("cos"))
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos").desc(),
                                                   F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_vec_id", "rank", "vec_id", "cos"))


def kmeans_fit(embeddings: DataFrame, k: int = N_CENTROIDS,
               iters: int = 3) -> DataFrame:
    """(centroid_id, c_emb): Lloyd's k-means on cosine similarity, seeded
    from the first k vec_ids — the learned-centroid upgrade for IVF
    (`ivf_ann_topk(centroids=kmeans_fit(...))`).

    Each iteration is one broadcast-join assign (argmax by groupBy+max_by,
    O(N)-row exchange) and one posexplode/avg update (O(N x dim) rows with
    map-side partial aggregation — dim is small and fixed). Mean
    components are rounded to 6dp per iteration so any engine replaying
    the same arithmetic (the DuckDB oracle unrolls the loop as CTEs)
    converges through identical intermediate centroids. Empty clusters
    keep their previous centroid. Driver-side loop is over ITERATIONS
    (a handful), never over data."""
    cents = (embeddings.where(F.col("vec_id") < k)
             .select(F.col("vec_id").cast("int").alias("centroid_id"),
                     F.col("embedding").alias("c_emb")))
    for _ in range(iters):
        scored = embeddings.crossJoin(F.broadcast(cents)).select(
            "vec_id", "embedding", "centroid_id",
            F.round(_cos(F.col("embedding"), F.col("c_emb")), 6).alias("ccos"))
        best = (scored.groupBy("vec_id")
                .agg(F.max_by(F.struct("centroid_id", "embedding"),
                              F.struct(F.col("ccos"),
                                       (-F.col("centroid_id")).alias("nc")))
                     .alias("b"))
                .select(F.col("b.centroid_id").alias("centroid_id"),
                        F.col("b.embedding").alias("embedding")))
        means = (best.select("centroid_id",
                             F.posexplode("embedding").alias("i", "x"))
                 .groupBy("centroid_id", "i")
                 .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
                 .groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(F.struct("i", "m")))
                      .alias("sm"))
                 .select("centroid_id",
                         F.transform("sm", lambda s: s["m"]).alias("new_emb")))
        nxt = (cents.join(means, "centroid_id", "left")
               .select("centroid_id",
                       F.coalesce(
                           "new_emb",
                           F.transform("c_emb",
                                       lambda x: x.cast("double")))
                       .alias("c_emb")))
        # materialize each generation: cents appears twice in the next
        # iteration's plan (assign + update), and without a cut the plan
        # re-evaluates the whole chain ~2^iters times. k x dim doubles are
        # tiny, so round-trip through the driver — also keeps plan depth
        # constant for any iters.
        rows = [(int(r["centroid_id"]), [float(x) for x in r["c_emb"]])
                for r in nxt.collect()]
        cents = embeddings.sparkSession.createDataFrame(
            rows, "centroid_id int, c_emb array<double>")
    return cents


def ivf_assign(embeddings: DataFrame, n_centroids: int = N_CENTROIDS,
               centroids: DataFrame | None = None) -> DataFrame:
    """(vec_id, embedding, centroid_id): IVF coarse quantization — each
    vector joins the inverted list of its nearest centroid (rounded cosine,
    ties to the smaller centroid id). groupBy+max_by, not a window: the
    argmax partial-aggregates map-side to one row per vec_id, so the
    exchange moves O(N) rows, not the O(N x centroids) score rows. At scale
    the assigned table is written partitioned by centroid_id, so a query
    scans only its probed partitions (partition pruning = the IVF win)."""
    best = (_centroid_scores(embeddings, n_centroids, centroids)
            .groupBy("vec_id")
            .agg(F.max_by("centroid_id",
                          F.struct(F.col("ccos"),
                                   (-F.col("centroid_id")).alias("nc")))
                 .alias("centroid_id")))
    return embeddings.join(best, "vec_id").select(
        "vec_id", "embedding", "centroid_id")


def ivf_ann_topk(embeddings: DataFrame,
                 query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10,
                 n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
                 centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k, IVF-flat: exact cosine restricted to the inverted
    lists of each query's n_probe nearest centroids. The second scale path
    next to sign-LSH (`lsh_ann_topk`): LSH prunes by hash bucket equality,
    IVF prunes by centroid-partition locality — per query it scans
    ~n_probe/n_centroids of the corpus instead of all of it. Output:
    (query_vec_id, rank, vec_id, cos); recall vs brute force is
    pytest-bounded, exactness traded like every ANN method."""
    # resolve centroids ONCE from the unfiltered corpus, then probe-side
    # scoring is O(|query_ids| x n_centroids), not a second full N x C pass.
    # One centroid per vector + distinct probed centroids per query =>
    # (query_vec_id, vec_id) pairs are unique by construction, no dedup.
    cents = _resolve_centroids(embeddings, n_centroids, centroids)
    assigned = ivf_assign(embeddings, n_centroids, cents)
    probe = _probe_lists(embeddings, query_ids, n_centroids, n_probe, cents)
    return _rank_probed_candidates(assigned, probe, k)


def ivf_write_partitioned(assigned: DataFrame, path: str) -> None:
    """Materialize IVF inverted lists as a `centroid_id`-partitioned parquet
    layout — the at-rest form of the IVF win: a probe-filtered scan touches
    only ~n_probe/n_centroids of the files (Spark partition pruning on the
    directory column), so per-query IO shrinks with the centroid count
    instead of the corpus size. `assigned` is `ivf_assign(...)` output."""
    (assigned.select("vec_id", "embedding", "centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def ivf_append_partitioned(new_embeddings: DataFrame, path: str,
                           centroids: DataFrame,
                           n_centroids: int = N_CENTROIDS) -> None:
    """Fold NEW vectors into an existing centroid_id-partitioned IVF
    layout WITHOUT rebuilding it — the ANN side of the LSM append
    discipline. New vectors are assigned against the layout's FROZEN
    centroid frame (pass the one the layout was built with; standard IVF
    maintenance re-fits centroids only at the next full rebuild, and
    re-deriving them from a grown corpus would silently shift every
    existing assignment), then appended to their partition directories:
    `mode=append` + `partitionBy` writes only new files under the
    touched centroid dirs, existing files untouched. Cost O(new
    vectors); queries over the layout see old + new rows identically
    (`ivf_partitioned_topk` is layout-agnostic within a partition)."""
    assigned = ivf_assign(new_embeddings, n_centroids, centroids)
    (assigned.select("vec_id", "embedding", "centroid_id")
     .write.mode("append").partitionBy("centroid_id").parquet(path))


def ivf_partitioned_topk(spark, path: str, embeddings: DataFrame,
                         query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10,
                         n_centroids: int = N_CENTROIDS,
                         n_probe: int = N_PROBE,
                         centroids: DataFrame | None = None,
                         corpus_df: DataFrame | None = None) -> DataFrame:
    """`ivf_ann_topk` against the partitioned layout written by
    :func:`ivf_write_partitioned`: probe lists are chosen from the (tiny)
    query set vs the centroids, their ids are collected driver-side (a few
    ints — the same literal-IN prune the BM25 path uses for terms), and the
    corpus scan carries `centroid_id IN (...)` so Catalyst prunes unprobed
    partition directories before any file is opened. Rank/tie-break
    semantics identical to `ivf_ann_topk` on the same assignment.

    ``corpus_df``: a pre-resolved ``spark.read.parquet(path)`` frame — a
    warm server passes one resolved once (`SearchEngine.warm_hybrid`) so
    per-request calls skip the file-listing/schema-resolution of a fresh
    read; the literal-IN probe filter partition-prunes it identically."""
    cents = _resolve_centroids(embeddings, n_centroids, centroids)
    probe = _probe_lists(embeddings, query_ids, n_centroids, n_probe, cents)
    probed = sorted({int(r["centroid_id"])
                     for r in probe.select("centroid_id").distinct().collect()})
    if query_ids and not probed:
        # every query id has >= n_probe probed centroids when it exists in
        # the embeddings table, so an empty probe set means the ids are
        # unknown — fail loudly (a serving front maps this to HTTP 400)
        # instead of silently returning an empty/degraded candidate list.
        # This rides the probe collect that happens anyway: zero extra jobs.
        raise ValueError(f"query vec ids {list(query_ids)} not found in "
                         "the embeddings table")
    base = corpus_df if corpus_df is not None else spark.read.parquet(path)
    corpus = base.where(F.col("centroid_id").isin(probed))
    return _rank_probed_candidates(corpus, probe, k)


def embedding_near_dup_pairs(embeddings: DataFrame,
                             threshold: float = 0.4) -> DataFrame:
    """(vec_a, vec_b, cos): BRUTE-FORCE cosine near-duplicate pairs —
    O(N^2), the recall oracle for `embedding_near_dup_lsh` and the
    correctness baseline. Do not run at scale; the bucketed variant below
    is the production path."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"),
                          F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"),
                          F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    return (pairs.select("vec_a", "vec_b",
                         F.round(_cos(F.col("ea"), F.col("eb")), 6).alias("cos"))
            .where(F.col("cos") >= threshold))


def embedding_near_dup_lsh(embeddings: DataFrame,
                           threshold: float = 0.4) -> DataFrame:
    """(vec_a, vec_b, cos): LSH-bucketed near-duplicate pairs — the scale
    path. Candidate pairs are vectors sharing ANY hash table's sign-LSH
    bucket (self-equi-join on (t, bucket): work is sum of bucket sizes
    squared, never all-pairs; bucket count grows with N_PLANES if buckets
    run hot), deduped, then exact-cosine-verified against the threshold.
    Same deterministic hyperplane literals as `lsh_ann_topk`, so the
    DuckDB oracle buckets identically; recall vs the brute-force pairs is
    pytest-bounded."""
    bucketed = lsh_buckets(embeddings).select("vec_id", "t", "bucket")
    a = bucketed.select(F.col("vec_id").alias("vec_a"), "t", "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), "t", "bucket")
    cand = (a.join(b, ["t", "bucket"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct())
    ea = embeddings.select(F.col("vec_id").alias("vec_a"),
                           F.col("embedding").alias("ea"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"),
                           F.col("embedding").alias("eb"))
    return (cand.join(ea, "vec_a").join(eb, "vec_b")
            .select("vec_a", "vec_b",
                    F.round(_cos(F.col("ea"), F.col("eb")), 6).alias("cos"))
            .where(F.col("cos") >= threshold))
