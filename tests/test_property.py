"""Property-based tests (hypothesis): codec round-trips and splice/merge
equivalence hold for arbitrary inputs, not just the fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_distributed_search_engine_spark.functions.analyzer import (
    MAX_WORD_LEN, STOP_WORDS, analyze)
from mini_distributed_search_engine_spark.index.codec import (
    decode_postings, encode_postings, splice_gap_streams, varint_decode,
    varint_encode)

uint64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)


@settings(max_examples=200, deadline=None)
@given(uint64s)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


posting_sets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2**40),
              st.integers(min_value=1, max_value=1000),
              st.integers(min_value=1, max_value=5000)),
    min_size=1, max_size=400, unique_by=lambda t: t[0])


@settings(max_examples=100, deadline=None)
@given(posting_sets, st.floats(min_value=1.0, max_value=500.0))
def test_posting_roundtrip(postings, avgdl):
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    enc = encode_postings(docs, tfs, dls, avgdl)
    dec = decode_postings(enc["doc_gaps"], enc["tfs"], enc["dls"])
    order = np.argsort(docs, kind="stable")
    assert np.array_equal(dec.doc_ids, docs[order])
    assert np.array_equal(dec.tfs, tfs[order])
    assert np.array_equal(dec.dls, dls[order])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=2, max_size=400, unique=True),
       st.integers(min_value=1, max_value=399))
def test_splice_equals_full_encode(doc_ids, split_at):
    docs = np.array(sorted(doc_ids), dtype=np.int64)
    split_at = min(split_at, len(docs) - 1)
    ones = np.ones(len(docs), dtype=np.int64)
    full = encode_postings(docs, ones, ones, 10.0)
    a = encode_postings(docs[:split_at], ones[:split_at], ones[:split_at], 10.0)
    b = encode_postings(docs[split_at:], ones[split_at:], ones[split_at:], 10.0)
    spliced = splice_gap_streams(a["first_doc"], a["doc_gaps"],
                                 int(docs[split_at - 1]),
                                 b["first_doc"], b["doc_gaps"])
    assert spliced == full["doc_gaps"]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_analyzer_invariants(text):
    terms = analyze(text)
    for t in terms:
        assert t not in STOP_WORDS
        assert 1 <= len(t) <= MAX_WORD_LEN
        assert t == t.lower()
        assert not any(c.isdigit() for c in t)


# -- fused pandas analyzer vs the plain-Python spec -------------------------
# (pure pandas, no Spark: drive the mapInPandas generator directly)

texts = st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=120), min_size=1, max_size=12)


@settings(max_examples=120, deadline=None)
@given(texts)
def test_fused_pandas_tf_matches_analyze(docs):
    import pandas as pd
    from collections import Counter
    from mini_distributed_search_engine_spark.functions import analyzer as A

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    # call the inner generator the way mapInPandas does
    captured = {}

    def fake_mapInPandas(gen, schema):
        captured["gen"] = gen
        return None

    class Shim:
        def select(self, *cols):
            return self
        mapInPandas = staticmethod(fake_mapInPandas)

    A.term_doc_tf_pandas(Shim(), "text", stem=True, with_dl=True)
    out = pd.concat(list(captured["gen"]([pdf])), ignore_index=True)

    for doc_id, text in enumerate(docs):
        exp = Counter(analyze(text, stem=True))
        got_rows = out[(out.doc_id == doc_id) & out.term.notna()]
        got = dict(zip(got_rows.term, got_rows.tf))
        assert got == dict(exp), text
        dl_rows = out[(out.doc_id == doc_id) & out.term.isna()]
        assert len(dl_rows) == 1 and int(dl_rows.dl.iloc[0]) == sum(exp.values())


def test_fused_pandas_tf_tolerates_null_text():
    """Arbitrary --documents parquet can carry null text: a NaN from
    .str.split() must not reach np.concatenate (regression: crashed with
    'zero-dimensional arrays cannot be concatenated')."""
    import pandas as pd
    from mini_distributed_search_engine_spark.functions import analyzer as A

    pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "text": [None, "apple banana", float("nan"), ""]})
    captured = {}

    def fake_mapInPandas(gen, schema):
        captured["gen"] = gen
        return None

    class Shim:
        def select(self, *cols):
            return self
        mapInPandas = staticmethod(fake_mapInPandas)

    A.term_doc_tf_pandas(Shim(), "text", stem=True, with_dl=True)
    out = pd.concat(list(captured["gen"]([pdf])), ignore_index=True)
    # null/empty docs contribute only their dl sentinel row, with dl=0
    dl = out[out.term.isna()].set_index("doc_id")["dl"]
    assert sorted(dl.index) == [0, 1, 2, 3]
    assert dl[0] == 0 and dl[2] == 0 and dl[3] == 0 and dl[1] == 2
    terms = out[out.term.notna()]
    assert set(terms.doc_id) == {1}


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10), max_size=400))
def test_block_byte_ends_fast_path_matches_general(lengths):
    # the <=BLOCK single-block fast path must byte-match the cumsum form
    # for every size, including the 127/128/129 boundary
    from mini_distributed_search_engine_spark.index.codec import (
        BLOCK, _block_byte_ends)
    L = np.asarray(lengths, dtype=np.int64)
    got = _block_byte_ends(L)
    if not len(L):
        assert got == b""
        return
    ends = np.cumsum(L)
    nb = (len(L) + BLOCK - 1) // BLOCK
    idx = np.minimum(np.arange(1, nb + 1) * BLOCK - 1, len(L) - 1)
    assert got == ends[idx].astype("<i8").tobytes()


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_batch_term_codes_matches_analyze(texts):
    # the shared factorize core of the fused passes == the plain-Python
    # analyzer spec, doc by doc, in order (positions AND bigrams depend
    # on the order, not just the multiset)
    import pandas as pd
    from mini_distributed_search_engine_spark.functions.analyzer import (
        _batch_term_codes, _make_stem_memo)
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                        "text": texts})
    docs, tcodes, t_uniq = _batch_term_codes(
        pdf, "text", "doc_id", True, _make_stem_memo())
    got: dict[int, list[str]] = {}
    for d, tc in zip(docs.tolist(), tcodes.tolist()):
        got.setdefault(d, []).append(t_uniq[tc])
    want = {i: analyze(t, stem=True) for i, t in enumerate(texts)}
    want = {i: terms for i, terms in want.items() if terms}
    assert got == want
    # derived bigram adjacency matches the zip-spec per doc
    big_got: dict[tuple, int] = {}
    mask = docs[1:] == docs[:-1] if len(docs) > 1 else np.empty(0, bool)
    for i in np.nonzero(mask)[0]:
        key = (t_uniq[tcodes[i]], t_uniq[tcodes[i + 1]])
        big_got[key] = big_got.get(key, 0) + 1
    big_want: dict[tuple, int] = {}
    for terms in want.values():
        for a, b in zip(terms, terms[1:]):
            big_want[(a, b)] = big_want.get((a, b), 0) + 1
    assert big_got == big_want
