"""Deduplication operators for large-scale training-data pipelines.

All hash primitives are cross-engine portable by construction (md5 hex and a
32-bit hash = first 8 md5 hex chars parsed as int), so every op here has a
DuckDB oracle. All heavy paths are JVM-side (explode/groupBy/join on
codegen'd expressions) — no Python in the per-token hot path.

Scale notes:
* exact dedup: md5-groupBy — map-side partial agg, one exchange.
* shingle/minhash: explode(shingles) x explode(seeds) then groupBy min —
  partial min aggregation makes the seed fan-out cheap.
* LSH banding: signature concat per band -> groupBy bucket -> pair join;
  buckets are the only quadratic surface and they're bounded by band width.
* SimHash: per-(doc, bit) weighted sums, then bit reassembly — one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzer import normalize_text

NUM_HASHES = 16
BANDS = 4  # rows per band = NUM_HASHES // BANDS
SIMHASH_BITS = 32


def h32(col):
    """Portable 32-bit hash: first 8 hex chars of md5, parsed base-16.
    DuckDB mirror: ('0x' || substr(md5(x), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min doc_id per
    identical-text group. The reference's analogue is row-key collision
    dedup (flame/Worker.java:158-174)."""
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("h"))
    groups = keyed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").cast("long").alias("group_size"))
    return (keyed.join(groups, "h")
            .select("doc_id", "canonical_id", "group_size"))


def word_shingles(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct word k-gram shingles, via a single
    JVM-side transform (sliding window = transform+slice over the token
    array; no UDF, no self-join)."""
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    positions = F.when(F.size(toks) >= k,
                       F.sequence(F.lit(1), F.size(toks) - k + 1)
                       ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(positions,
                           lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(shingles).alias("shingle"))
            .distinct())


_shingles_expr = word_shingles


def minhash_signatures(docs: DataFrame, k: int = 3, num_hashes: int = NUM_HASHES,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, seed, minhash): minhash = lexicographic min of
    md5(seed || '|' || shingle) — one permutation approximation per seed."""
    sh = _shingles_expr(docs, k, id_col, text_col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    fanned = sh.select("doc_id", "shingle", seeds)
    return (fanned
            .withColumn("h", F.md5(F.concat_ws("|", F.col("seed").cast("string"),
                                               F.col("shingle"))))
            .groupBy("doc_id", "seed").agg(F.min("h").alias("minhash")))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = BANDS,
                        num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs: docs sharing any LSH band
    bucket (band key = md5 of the band's concatenated minhashes)."""
    rows = num_hashes // bands
    banded = (signatures
              .withColumn("band", (F.col("seed") / rows).cast("int"))
              .groupBy("doc_id", "band")
              .agg(F.md5(F.concat_ws(",", F.array_sort(
                  F.collect_list(F.concat_ws(":", F.col("seed").cast("string"),
                                             F.col("minhash"))))))
                   .alias("bucket")))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int = 10_000) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact k-gram Jaccard for every pair sharing
    at least one KEPT shingle, thresholded.

    The self-join's fan-out per shingle is quadratic in its doc frequency
    — one stop-phrase-like shingle with df=d contributes d^2/2 pairs, and
    AQE's skew-join only splits partitions, it cannot shrink the pair
    count. Standard df-cut: shingles with df > ``max_shingle_df`` are
    dropped BEFORE the join (they carry ~no Jaccard signal — a shingle in
    10k+ docs separates nothing) and, for consistency, before the per-doc
    set sizes, so the result is the exact Jaccard over the df-filtered
    shingle universe. The oracle applies the same cut."""
    sh0 = _shingles_expr(docs, k, id_col, text_col)
    dfreq = sh0.groupBy("shingle").agg(F.count("*").alias("_df"))
    sh = (sh0.join(dfreq.where(F.col("_df") <= max_shingle_df), "shingle")
          .select("doc_id", "shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle").where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def decontaminate(docs: DataFrame, bench: DataFrame, k: int = 13,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, bench_id, n_shared): corpus docs sharing at least one
    distinct word k-gram shingle with a benchmark doc, with the count of
    distinct shared shingles — n-gram benchmark decontamination (k=13 in
    the published GPT-3 appendix-C recipe; pass a smaller k for short
    docs).

    Scale: the benchmark side is small by definition (eval suites are
    10^4..10^6 docs against a 10^12-turn corpus), so its shingle set is
    broadcast — the corpus side never shuffles its shingle expansion:
    scan -> shingle transform -> broadcast hash join -> partial-agg
    groupBy. No df-cut here (unlike ngram_jaccard_pairs): decontamination
    wants every exact overlap, and the bench side's size bounds the
    join fan-out per corpus shingle.
    """
    corpus_sh = word_shingles(docs, k, id_col, text_col)
    bench_sh = (word_shingles(bench, k, id_col, text_col)
                .select(F.col("doc_id").alias("bench_id"), "shingle"))
    # both sides are distinct per (doc, shingle), so count(*) after the
    # join counts distinct shared shingles per (doc_id, bench_id)
    return (corpus_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("doc_id", "bench_id")
            .agg(F.count("*").cast("long").alias("n_shared")))


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): tf-weighted sign-sum over token-hash bits.

    Token hash = portable h32; bit j of the simhash is 1 iff
    sum over tokens of tf * (bit_j(h32) ? +1 : -1) >= 0.
    """
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(normalize_text(F.col(text_col)),
                                          r"\s+")).alias("tok"))
            .where(F.col("tok") != ""))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    hashed = tf.withColumn("h", h32(F.col("tok")))
    fanned = hashed.select(
        "doc_id", "tf", "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"))
    bitsum = (fanned
              .withColumn("bit", F.expr("shiftright(h, j) & 1"))
              .withColumn("w", F.when(F.col("bit") == 1, F.col("tf"))
                          .otherwise(-F.col("tf")))
              .groupBy("doc_id", "j").agg(F.sum("w").alias("s")))
    return (bitsum
            .withColumn("contrib",
                        F.when(F.col("s") >= 0,
                               F.pow(F.lit(2.0), F.col("j")).cast("long"))
                        .otherwise(F.lit(0)))
            .groupBy("doc_id").agg(F.sum("contrib").cast("long").alias("simhash")))
