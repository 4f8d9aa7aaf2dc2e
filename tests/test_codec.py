"""Codec round-trips: varint, posting encode/decode, gap-stream splicing."""

from __future__ import annotations

import numpy as np
import pytest

from mini_distributed_search_engine_spark.index.codec import (
    decode_postings, encode_postings, splice_gap_streams, varint_decode,
    varint_encode)


@pytest.mark.parametrize("values", [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63, 2**64 - 1],
             dtype=np.uint64),
])
def test_varint_roundtrip_edges(values):
    assert np.array_equal(varint_decode(varint_encode(values)), values)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        bits = int(rng.integers(1, 64))
        vals = rng.integers(0, 2**bits, size=n, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_posting_roundtrip_and_blocks():
    rng = np.random.default_rng(11)
    doc_ids = np.sort(rng.choice(10**7, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=1000).astype(np.int64)
    dls = rng.integers(1, 200, size=1000).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, dls, avgdl=37.5)
    dec = decode_postings(enc["doc_gaps"], enc["tfs"], enc["dls"])
    assert np.array_equal(dec.doc_ids, doc_ids)
    assert np.array_equal(dec.tfs, tfs)
    assert np.array_equal(dec.dls, dls)
    assert enc["df"] == 1000
    assert len(enc["block_last_doc"]) == (1000 + 127) // 128
    assert enc["block_last_doc"][-1] == doc_ids[-1]
    assert enc["max_tf_norm"] == pytest.approx(max(enc["block_max_tf_norm"]))
    # compression sanity: gaps of sorted draws from 10^7 fit well under 8B/doc
    assert len(enc["doc_gaps"]) < 8 * 1000 / 2


def test_splice_equals_reencode():
    rng = np.random.default_rng(13)
    docs = np.sort(rng.choice(10**6, size=500, replace=False)).astype(np.int64)
    a_docs, b_docs = docs[:300], docs[300:]
    tfs = np.ones(500, dtype=np.int64)
    dls = np.ones(500, dtype=np.int64)
    enc_a = encode_postings(a_docs, tfs[:300], dls[:300], avgdl=10.0)
    enc_b = encode_postings(b_docs, tfs[300:], dls[300:], avgdl=10.0)
    enc_full = encode_postings(docs, tfs, dls, avgdl=10.0)
    spliced = splice_gap_streams(enc_a["first_doc"], enc_a["doc_gaps"],
                                 int(a_docs[-1]),
                                 enc_b["first_doc"], enc_b["doc_gaps"])
    assert spliced == enc_full["doc_gaps"]
    dec = decode_postings(spliced, enc_full["tfs"], enc_full["dls"])
    assert np.array_equal(dec.doc_ids, docs)
