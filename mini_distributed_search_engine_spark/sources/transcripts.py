"""Transcript sources.

The engine's primary input is a table
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` (BASELINE.json input_hint). Document identity:
one turn = one document; stable docID = dense rank over
(conv_id ASC, turn_idx ASC) — replacing the reference's SHA-1 row keys
(`tools/Hasher.java:27-38`).

Three deterministic sources, no external data:

* `transcripts_from_documents(spark, sf_dir)` — derives transcripts from the
  driver-generated `documents.parquet` with pure SQL-expressible rules, so a
  DuckDB oracle can reproduce the identical table (the correctness gate).
* `synthesize_transcripts(...)` — seeded generator per FIXTURES.md §1 for
  tests and throughput benchmarks (Zipfian vocab, analyzer-stressing tokens,
  hot role/tool terms for the skew fixture).
* `golden_corpus(spark)` — the 3-doc exact-expectation corpus recast from the
  reference indexer test (`Integration/src/cis5550/test/HW9Test.java:168-196`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
])

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "calc", "browse")
TURNS_PER_CONV = 4
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
_TOOL_BY_MOD = {3: "search", 5: "calc", 6: "browse"}

# Shared derivation rules (Spark SQL and DuckDB SQL dialects agree on all of
# this except timestamp arithmetic, which each side builds from BASE_EPOCH).
_DERIVE_CORE = """
    SELECT
        'conv' || lpad(CAST({idiv} AS {str_t}), 8, '0')                          AS conv_id,
        CAST(doc_id % {tpc} AS INT)                                             AS turn_idx,
        CASE CAST(doc_id % {tpc} AS INT)
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
            WHEN 2 THEN 'system' ELSE 'tool' END                                AS role,
        text                                                                    AS text,
        CASE CAST(doc_id % 7 AS INT)
            WHEN 3 THEN 'search' WHEN 5 THEN 'calc'
            WHEN 6 THEN 'browse' ELSE '' END                                    AS tool,
        CAST(doc_id AS BIGINT)                                                  AS _seq
    FROM {src}
"""


def derive_sql(src: str, engine: str) -> str:
    """Transcript derivation SQL over a documents relation ``src``.

    ``engine`` is 'spark' or 'duckdb'. Dialect differences handled here:
    integer division (Spark ``DIV`` vs DuckDB ``//`` — a double CAST would
    round in DuckDB but truncate in Spark), STRING vs VARCHAR, and the
    epoch->timestamp expression.
    """
    if engine == "spark":
        idiv, str_t = f"(doc_id DIV {TURNS_PER_CONV})", "STRING"
        ts = f"timestamp_seconds({BASE_EPOCH} + _seq * 60)"
    else:
        idiv, str_t = f"(doc_id // {TURNS_PER_CONV})", "VARCHAR"
        ts = f"CAST(to_timestamp({BASE_EPOCH} + _seq * 60) AS TIMESTAMP)"
    core = _DERIVE_CORE.format(tpc=TURNS_PER_CONV, src=src, idiv=idiv, str_t=str_t)
    return (f"SELECT conv_id, turn_idx, role, text, tool, {ts} AS ts "
            f"FROM ({core})")


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts derived from the sf documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("__mdse_documents_src")
    return spark.sql(derive_sql("__mdse_documents_src", "spark"))


# ---------------------------------------------------------------------------
# Seeded synthesizer (FIXTURES.md §1) — used by tests and bench, not oracles.
# ---------------------------------------------------------------------------

_VOCAB_BASE = [
    # ~200-word salad vocabulary; mixed case/punct/digits injected below.
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "apple",
    "apples", "banana", "bananas", "fig", "figs", "coconut", "coconuts",
    "date", "dates", "elderberry", "elderberries", "guava", "guavas",
    "hazelnut", "hazelnuts", "running", "jumped", "flies", "tries",
    "happiness", "relational", "conditional", "operator", "formalize",
    "adjustment", "dependent", "activate", "effective", "revival",
    "allowance", "inference", "gyroscopic", "adjustable", "defensible",
    "irritant", "replacement", "communism", "plastered", "motoring",
    "conflated", "troubled", "hopping", "tanned", "falling", "hissing",
    "failing", "filing", "agreement", "generalization", "oscillation",
    "query", "index", "search", "engine", "spark", "shuffle", "partition",
    "broadcast", "executor", "driver", "cluster", "parquet", "iceberg",
    "catalyst", "tungsten", "arrow", "vectorized", "posting", "merge",
    "compress", "varint", "delta", "scoring", "ranking", "retrieval",
]
# analyzer-stress tokens: stop words, digits, overlong, mixed case, punct
_STRESS = [
    "the", "and", "you", "only", "may", "again", "any", "are",
    "Word123", "42", "x9y",
    "supercalifragilisticexpialidocious",  # > 20 chars -> dropped
    "Mixed-Case,Token!", "tab\tsep", "UPPER", "Ellipsis...",
]


def _zipf_probs(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def synthesize_transcripts_pdf(n_convs: int, turns_per_conv: int = TURNS_PER_CONV,
                               seed: int = 42, hot_token_frac: float = 0.0) -> pd.DataFrame:
    """Seeded pandas transcript table (FIXTURES.md §1 shape).

    ``hot_token_frac`` > 0 produces the skew fixture (§5): that fraction of
    all tokens is drawn from the 4 role words, making a handful of terms own
    a matching share of all postings.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(_VOCAB_BASE + _STRESS)
    probs = _zipf_probs(len(vocab))
    n_turns = n_convs * turns_per_conv
    lens = rng.integers(5, 61, size=n_turns)
    total = int(lens.sum())
    toks = rng.choice(vocab, size=total, p=probs)
    if hot_token_frac > 0:
        hot_mask = rng.random(total) < hot_token_frac
        toks = np.where(hot_mask, rng.choice(np.array(ROLES), size=total), toks)
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(toks, bounds)]
    seq = np.arange(n_turns)
    conv = seq // turns_per_conv
    tidx = (seq % turns_per_conv).astype("int32")
    return pd.DataFrame({
        "conv_id": [f"conv{c:08d}" for c in conv],
        "turn_idx": tidx,
        "role": [ROLES[i] for i in tidx],
        "text": texts,
        "tool": [_TOOL_BY_MOD.get(s % 7, "") for s in seq],
        "ts": pd.to_datetime(BASE_EPOCH + seq * 60, unit="s"),
    })


def synthesize_transcripts(spark: SparkSession, n_convs: int,
                           turns_per_conv: int = TURNS_PER_CONV, seed: int = 42,
                           hot_token_frac: float = 0.0,
                           partitions: int | None = None) -> DataFrame:
    """Distributed seeded synthesis: each partition generates its conv range
    locally (no driver-resident data), so the same generator scales to bench
    sizes. Determinism: per-conv seed = seed * 1e9 + conv index.
    """
    partitions = partitions or max(2 * spark.sparkContext.defaultParallelism,
                                   math.ceil(n_convs / 50_000))
    ranges = spark.range(0, n_convs, 1, partitions).toDF("conv")
    vocab = np.array(_VOCAB_BASE + _STRESS)
    probs = _zipf_probs(len(vocab))
    roles_arr = np.array(ROLES)

    def gen(iterator):
        for pdf in iterator:
            convs = pdf["conv"].to_numpy()
            n = len(convs) * turns_per_conv
            texts = []
            for conv in convs:
                # per-conv RNG: content independent of partitioning
                rng = np.random.default_rng(
                    int(seed * 1_000_000_007 + conv) % (2**63))
                lens = rng.integers(5, 61, size=turns_per_conv)
                toks = rng.choice(vocab, size=int(lens.sum()), p=probs)
                if hot_token_frac > 0:
                    hot = rng.random(len(toks)) < hot_token_frac
                    toks = np.where(hot, rng.choice(roles_arr, size=len(toks)), toks)
                for chunk in np.split(toks, np.cumsum(lens)[:-1]):
                    texts.append(" ".join(chunk))
            seq = (np.repeat(convs, turns_per_conv) * turns_per_conv
                   + np.tile(np.arange(turns_per_conv), len(convs)))
            tidx = (seq % turns_per_conv).astype("int32")
            yield pd.DataFrame({
                "conv_id": np.char.add("conv", np.char.zfill(
                    np.repeat(convs, turns_per_conv).astype(str), 8)),
                "turn_idx": tidx,
                "role": roles_arr[tidx],
                "text": texts,
                "tool": [_TOOL_BY_MOD.get(s % 7, "") for s in seq],
                "ts": pd.to_datetime(BASE_EPOCH + seq * 60, unit="s"),
            })
            assert len(texts) == n

    return ranges.mapInPandas(gen, TRANSCRIPT_SCHEMA)


def golden_corpus(spark: SparkSession) -> DataFrame:
    """HW9Test.java:168-196 corpus recast onto transcripts (FIXTURES.md §2)."""
    import datetime as _dt
    base = _dt.datetime(2024, 1, 1)
    rows = [
        ("conv00000001", 0, "user",
         "are only you you you apple apples apple banana bananas figs figs figs fig coconuts",
         "", base),
        ("conv00000002", 0, "user",
         "you may only apple dates bananas banana elderberries figs",
         "", base + _dt.timedelta(seconds=60)),
        ("conv00000003", 0, "user",
         "again any guavas hazelnuts apple ",
         "", base + _dt.timedelta(seconds=120)),
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
