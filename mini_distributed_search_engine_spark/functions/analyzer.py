"""Shared text analyzer — the one chain used by BOTH index build and query.

Faithfully reproduces the reference indexer's token pipeline
(`Integration/src/cis5550/jobs/Indexer.java:160-204`):

    lowercase -> strip tags -> non-alphanumerics to space -> split \\s+
    -> pre-stem stop-word filter (Indexer.java:31-55 list, :180)
    -> junk filter: any digit or length > 20 dropped (Indexer.java:447-461)
    -> Porter stem (external/PorterStemmer.java)
    -> overlong stems keep LAST 20 chars (Indexer.java:192-194)
    -> post-stem stop-word filter (Indexer.java:199)

The reference uses a *different, larger* stop list at query time
(`jobs/Searcher.java:19-63`) — a quirk we deliberately do not copy: one
analyzer serves both paths (SURVEY.md §7), which is what makes index terms
and query terms comparable.

Two implementations with identical semantics:
  * `term_tokens_df(df, text_col)` — the distributed path: JVM-side
    lower/regexp/split/explode/filters (whole-stage codegen), with ONLY the
    Porter stem in an Arrow-batched pandas UDF (one Python call per unique
    token per batch, never per row).
  * `analyze(text)` — plain-Python single-doc path for tests/oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .porter import porter_stem, stem_series

MAX_WORD_LEN = 20

# Exact set from Integration/src/cis5550/jobs/Indexer.java:31-55.
STOP_WORDS = frozenset("""
a about above actually after again against all almost also although always am an and any are aren't as at
b be because been before being below between both but by
c can couldn't could come comes could've
d did didn't do does doesn't doing down during
e each either else enough ever every
f few for from further furthermore
g get gets getting got
h had hadn't has hasn't have haven't having he he'd he'll he's her here here's hers herself him himself his how how's
however http https htm html
i i'd i'll i'm i've if in into is isn't it it's its itself
j just k
l let let's like likely
m may maybe me might mine more most mostly must mustn't my myself
n no nor not now of off often
o on once only or org other our ours ourselves out over own
p perhaps
q quite
r rather really regarding
s same shan't she she'd she'll she's should shouldn't so some such
t than that that's the their theirs them themselves then there there's these they they'd they'll they're they've this those through to too under until up very
u v w was wasn't we we'd we'll we're we've were weren't what what's when when's where where's which while who who's whom why why's will with won't would wouldn't
www x
yet you you'd you'll you're you've your yours yourself yourselves z
""".split())

# Normalization regexes (searcher-side cleaning, jobs/Searcher.java:135,
# matching what the crawler's processPageText already did to indexed text,
# jobs/Crawler.java:954-973).
_TAG_RE = r"<[^>]+>"
_NON_ALNUM_RE = r"[^a-z0-9]+"


def normalize_text(col: Column) -> Column:
    """lowercase, strip tags, collapse non-alphanumerics to single spaces."""
    c = F.lower(col)
    c = F.regexp_replace(c, _TAG_RE, " ")
    c = F.regexp_replace(c, _NON_ALNUM_RE, " ")
    return F.trim(c)


@F.pandas_udf(T.StringType())
def porter_stem_udf(tokens):  # pragma: no cover - executed on executors
    """Arrow-batched Porter stem; one Python stem per unique token per batch."""
    return stem_series(tokens)


def _filtered_tokens(df: DataFrame, text_col: str,
                     keep_cols: tuple) -> DataFrame:
    """Explode + pre-stem filters, all JVM-side (codegen): tokenize via
    split/explode, stop/junk filters via isin/rlike/length."""
    kept = [F.col(c) for c in keep_cols]
    return (
        df.select(*kept, F.explode(F.split(normalize_text(F.col(text_col)), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
        # pre-stem stop filter + junk filter (digit or >20 chars)
        .where(~F.col("tok").isin(*STOP_WORDS))
        .where(~F.col("tok").rlike("[0-9]"))
        .where(F.length("tok") <= MAX_WORD_LEN)
    )


def _stem_dict(toks: DataFrame) -> DataFrame:
    """(tok, term) dictionary over the DISTINCT tokens of ``toks``.

    Stemming DISTINCT tokens, not occurrences, means the Python/Arrow path
    sees O(vocabulary) rows instead of O(token occurrences) — at 10^12-turn
    scale that is the difference between streaming the whole corpus through
    Python and a side computation. Zipf makes the distinct set tiny relative
    to occurrences; map-side partial dedup keeps the distinct shuffle small,
    and AQE turns the join broadcast when the dictionary fits (it
    essentially always does — and is left to AQE rather than a broadcast
    hint so a genuinely huge vocabulary degrades to a shuffle join instead
    of an OOM).
    """
    return (
        toks.select("tok").distinct()
        .withColumn("term", porter_stem_udf(F.col("tok")))
        # overlong stems keep the LAST 20 chars (Indexer.java:192-194)
        .withColumn(
            "term",
            F.when(F.length("term") > MAX_WORD_LEN,
                   F.substring(F.col("term"), -MAX_WORD_LEN, MAX_WORD_LEN))
            .otherwise(F.col("term")))
    )


def term_tokens_df(df: DataFrame, text_col: str = "text",
                   keep_cols: tuple = ("doc_id",),
                   stem: bool = True) -> DataFrame:
    """Explode ``text_col`` into analyzed terms (one output row per surviving
    token occurrence), keeping ``keep_cols``. ``stem=False`` yields the
    stem-free variant used by the DuckDB-oracle-checked queries (DuckDB in
    this sandbox cannot load its fts/stem extension).
    """
    toks = _filtered_tokens(df, text_col, keep_cols)
    kept = [F.col(c) for c in keep_cols]
    if stem:
        toks = toks.join(_stem_dict(toks), "tok")
    else:
        toks = toks.withColumn("term", F.col("tok"))
    # post-stem stop filter (Indexer.java:199)
    return toks.where(~F.col("term").isin(*STOP_WORDS)).select(*kept, "term")


def _make_stem_memo():
    """Per-partition memoized Porter stem (incl. the overlong-stem tail
    truncation) — O(vocabulary) Python calls per partition lifetime."""
    memo: dict[str, str] = {}

    def stem_tok(t: str) -> str:
        s = memo.get(t)
        if s is None:
            s = porter_stem(t)
            if len(s) > MAX_WORD_LEN:
                s = s[-MAX_WORD_LEN:]
            memo[t] = s
        return s
    return stem_tok


def _batch_term_codes(pdf, text_col: str, doc_col: str, stem: bool,
                      stem_tok):
    """Analyze one Arrow batch to ``(docs_kept, term_codes, t_uniq)`` —
    the shared core of every fused pandas pass (TF, positions, bigrams).

    ONE hash pass over the token occurrences (`pd.factorize`); every
    string operation after that — stop/junk/length filters, the Porter
    stem, the post-stem stop filter — runs once per UNIQUE token
    (O(vocabulary), which Zipf keeps tiny relative to occurrences) and is
    applied back by int-code indexing, so the only per-occurrence work is
    int64 take. ``docs_kept`` is int64 doc ids of surviving occurrences in
    doc-major in-doc order, ``term_codes`` their int64 codes into the
    object array ``t_uniq`` of analyzed terms. Null text tokenizes to []
    (arbitrary --documents parquet can carry null text)."""
    import re

    import numpy as np
    import pandas as pd

    digit_re = re.compile("[0-9]")
    stop = STOP_WORDS
    txt = (pdf[text_col].fillna("").str.lower()
           .str.replace(_TAG_RE, " ", regex=True)
           .str.replace(_NON_ALNUM_RE, " ", regex=True)
           .str.strip())
    toks = txt.str.split()
    lens = toks.str.len().fillna(0).astype(np.int64)
    doc_rep = np.repeat(pdf[doc_col].to_numpy(), lens)
    tok_arr = (np.concatenate(toks.to_numpy())
               if int(lens.sum()) else np.empty(0, dtype=object))
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=object))
    if not len(tok_arr):
        return empty
    codes, uniq = pd.factorize(tok_arr, sort=False)
    uniq_s = pd.Series(uniq, dtype=object)
    pre = (~uniq_s.isin(stop)
           & (uniq_s.str.len() <= MAX_WORD_LEN)
           & ~uniq_s.str.contains(digit_re, regex=True)).to_numpy()
    if stem:
        stems = np.array([stem_tok(u) if k else None
                          for u, k in zip(uniq, pre)], dtype=object)
    else:
        stems = np.where(pre, uniq, None)
    post = pre & ~pd.Series(stems, dtype=object).isin(stop).to_numpy()
    u_tcode = np.full(len(uniq), -1, dtype=np.int64)
    kept_idx = np.nonzero(post)[0]
    if not len(kept_idx):
        return empty
    t_codes_kept, t_uniq = pd.factorize(stems[kept_idx], sort=False)
    u_tcode[kept_idx] = t_codes_kept
    occ_t = u_tcode[codes]
    occ_mask = occ_t >= 0
    return (doc_rep[occ_mask].astype(np.int64), occ_t[occ_mask],
            np.asarray(t_uniq, dtype=object))


def term_doc_tf_pandas(df: DataFrame, text_col: str = "text",
                       doc_col: str = "doc_id",
                       stem: bool = True,
                       with_dl: bool = False) -> DataFrame:
    """(term, doc_id, tf[, dl]) via a fused Arrow/pandas tokenize+count
    pass — ZERO shuffle for the TF aggregation.

    With ``with_dl=True`` the doc length (sum of kept tf) is also computed
    in-pass — per-doc complete, so no dl groupBy/join downstream — and one
    SENTINEL row ``(term=NULL, doc_id, tf=0, dl)`` is emitted per input doc
    (including zero-term docs): ``WHERE term IS NULL`` recovers the dl
    table, ``WHERE term IS NOT NULL`` the dl-denormalized postings, both as
    narrow filters over one persisted pass.

    Each document is one input row, so a doc's tokens never span Arrow
    batches: a per-batch vectorized pandas groupby produces the doc's final
    (term, tf) rows — partition-local, exact, no exchange. This is the
    scale-out path: the JVM explode+groupBy alternative hash-exchanges
    O(token occurrences) rows, and that wide shuffle is the piece that
    scales worst with parallelism on shared memory bandwidth (measured:
    the fused pass lifted 4->16-core build scaling efficiency). Everything
    here is vectorized pandas str ops / numpy (no per-row Python); stemming
    is memoized per unique token per partition via the same `porter_stem`
    proven against the reference's Java stemmer.

    Semantics identical to `term_tokens_df(...).groupBy(...).count()` — the
    plain-Python `analyze` mirror is the shared spec, and equality is
    pytest-enforced (tests/test_analyzer.py).
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        stem_tok = _make_stem_memo()

        for pdf in batches:
            docs_kept, tcodes, t_uniq = _batch_term_codes(
                pdf, text_col, doc_col, stem, stem_tok)
            if len(docs_kept):
                out = (pd.DataFrame({doc_col: docs_kept, "_tc": tcodes})
                       .groupby([doc_col, "_tc"], sort=False)
                       .size().reset_index(name="tf"))
                out["term"] = pd.Series(
                    t_uniq[out["_tc"].to_numpy()]
                    if len(out) else np.empty(0, dtype=object),
                    dtype=object)
            else:
                out = pd.DataFrame({doc_col: np.empty(0, dtype=np.int64),
                                    "term": pd.Series(dtype=object),
                                    "tf": np.empty(0, dtype=np.int64)})
            if not with_dl:
                yield pd.DataFrame({
                    "term": out["term"],
                    doc_col: out[doc_col].astype("int64"),
                    "tf": out["tf"].astype("int64"),
                })
                continue
            dl_by_doc = out.groupby(doc_col, sort=False)["tf"].sum()
            all_docs = pdf[doc_col].astype("int64")
            dl_full = all_docs.map(dl_by_doc).fillna(0).astype("int64")
            yield pd.DataFrame({
                "term": pd.concat([out["term"],
                                   pd.Series([None] * len(all_docs))],
                                  ignore_index=True),
                doc_col: pd.concat([out[doc_col].astype("int64"), all_docs],
                                   ignore_index=True),
                "tf": pd.concat([out["tf"].astype("int64"),
                                 pd.Series(0, index=range(len(all_docs)),
                                           dtype="int64")],
                                ignore_index=True),
                "dl": pd.concat([out[doc_col].map(dl_by_doc).astype("int64"),
                                 dl_full], ignore_index=True),
            })

    schema = f"term string, {doc_col} long, tf long"
    if with_dl:
        schema += ", dl long"
    return df.select(doc_col, text_col).mapInPandas(gen, schema)


def term_positions_pandas(df: DataFrame, text_col: str = "text",
                          doc_col: str = "doc_id",
                          stem: bool = True) -> DataFrame:
    """(doc_id, term, pos) via the fused Arrow pass — ZERO shuffle.

    Position semantics identical to `term_positions_df` (= index in the
    doc's post-analyzer term sequence, pytest-equality-enforced), but
    computed partition-locally: each input row is one document, so the
    surviving tokens' order within the flattened frame IS the position
    order and a per-doc cumcount assigns positions with no exchange. The
    JVM alternative posexplode+window hash-exchanges O(token occurrences)
    rows — the same wide shuffle `term_doc_tf_pandas` eliminated for TF.
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        stem_tok = _make_stem_memo()

        for pdf in batches:
            docs_kept, tcodes, t_uniq = _batch_term_codes(
                pdf, text_col, doc_col, stem, stem_tok)
            if not len(docs_kept):
                yield pd.DataFrame({
                    doc_col: np.empty(0, dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "pos": np.empty(0, dtype=np.int32)})
                continue
            # per-doc position = index in the SURVIVING term sequence
            # (flattened order is doc-major and in-doc order already)
            pos = (pd.Series(docs_kept).groupby(docs_kept, sort=False)
                   .cumcount())
            yield pd.DataFrame({
                doc_col: docs_kept,
                "term": pd.Series(t_uniq[tcodes], dtype=object),
                "pos": pos.astype("int32"),
            })

    return df.select(doc_col, text_col).mapInPandas(
        gen, f"{doc_col} long, term string, pos int")


def bigram_counts_pandas(df: DataFrame, text_col: str = "text",
                         doc_col: str = "doc_id",
                         stem: bool = True) -> DataFrame:
    """Partition-local adjacent-term bigram counts ``(t1, t2, cnt)`` over
    the post-analyzer term sequence — the positional-index statistic
    computed WITHOUT materializing positions or self-joining them: each
    input row is one document, so adjacency within the fused pass is a
    shifted-array compare on the doc-id column, and the per-batch count is
    an int64-code groupby. The caller finishes with a global
    ``groupBy(t1, t2).sum`` whose input is O(bigram vocabulary) rows per
    partition, not O(token occurrences) — map-side partial aggregation in
    pandas, exactly the TF pass's trick one n-gram order up. A positional
    self-join (seq a JOIN seq b ON a.doc=b.doc AND b.pos=a.pos+1, the
    oracle's formulation) shuffles O(occurrences) twice; this shuffles the
    tiny count table once."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        stem_tok = _make_stem_memo()

        for pdf in batches:
            docs_kept, tcodes, t_uniq = _batch_term_codes(
                pdf, text_col, doc_col, stem, stem_tok)
            adj = np.nonzero(docs_kept[1:] == docs_kept[:-1])[0] \
                if len(docs_kept) > 1 else np.empty(0, dtype=np.int64)
            if not len(adj):
                yield pd.DataFrame({"t1": pd.Series(dtype=object),
                                    "t2": pd.Series(dtype=object),
                                    "cnt": np.empty(0, dtype=np.int64)})
                continue
            out = (pd.DataFrame({"_a": tcodes[adj], "_b": tcodes[adj + 1]})
                   .groupby(["_a", "_b"], sort=False)
                   .size().reset_index(name="cnt"))
            yield pd.DataFrame({
                "t1": pd.Series(t_uniq[out["_a"].to_numpy()], dtype=object),
                "t2": pd.Series(t_uniq[out["_b"].to_numpy()], dtype=object),
                "cnt": out["cnt"].astype("int64"),
            })

    return (df.select(doc_col, text_col)
            .mapInPandas(gen, "t1 string, t2 string, cnt long")
            .groupBy("t1", "t2")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def term_positions_df(df: DataFrame, text_col: str = "text",
                      doc_col: str = "doc_id",
                      stem: bool = True) -> DataFrame:
    """(doc_id, term, pos) — the positional index rows.

    ``pos`` is the 0-based index in the doc's POST-ANALYZER term sequence
    (stop words and junk tokens removed before positions are assigned —
    Lucene-style, so the phrase "fast key" matches the text "the fast key").
    Same chain as `term_tokens_df` but with `posexplode` carrying the raw
    token position through the filters; surviving positions are re-densified
    with a per-doc window over the raw order.
    """
    from pyspark.sql import Window
    toks = (
        df.select(F.col(doc_col),
                  F.posexplode(F.split(normalize_text(F.col(text_col)),
                                       r"\s+")).alias("rpos", "tok"))
        .where(F.col("tok") != "")
        .where(~F.col("tok").isin(*STOP_WORDS))
        .where(~F.col("tok").rlike("[0-9]"))
        .where(F.length("tok") <= MAX_WORD_LEN)
    )
    if stem:
        toks = toks.join(_stem_dict(toks), "tok")
    else:
        toks = toks.withColumn("term", F.col("tok"))
    toks = toks.where(~F.col("term").isin(*STOP_WORDS))
    w = Window.partitionBy(doc_col).orderBy("rpos")
    return (toks.withColumn("pos", (F.row_number().over(w) - 1).cast("int"))
            .select(doc_col, "term", "pos"))


# ---------------------------------------------------------------------------
# Plain-Python mirror (tests / brute-force oracle; NOT used on executors)
# ---------------------------------------------------------------------------
import re as _re

_TAG_CRE = _re.compile(_TAG_RE)
_NON_ALNUM_CRE = _re.compile(_NON_ALNUM_RE)
_DIGIT_CRE = _re.compile(r"[0-9]")


def analyze(text: str, stem: bool = True) -> list[str]:
    """Single-string analyzer with semantics identical to `term_tokens_df`."""
    s = _NON_ALNUM_CRE.sub(" ", _TAG_CRE.sub(" ", text.lower())).strip()
    out: list[str] = []
    for tok in s.split():
        if tok in STOP_WORDS or _DIGIT_CRE.search(tok) or len(tok) > MAX_WORD_LEN:
            continue
        term = porter_stem(tok) if stem else tok
        if len(term) > MAX_WORD_LEN:
            term = term[-MAX_WORD_LEN:]
        if term in STOP_WORDS:
            continue
        out.append(term)
    return out
