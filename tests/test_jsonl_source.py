"""JSONL transcript source: schema-enforced read, quarantine semantics,
and end-to-end indexability of the clean frame."""

from __future__ import annotations

import json

from mini_distributed_search_engine_spark.index.build import build_index
from mini_distributed_search_engine_spark.sources.jsonl import (
    transcripts_from_jsonl)

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user",
     "text": "apple banana query", "tool": "", "ts": "2024-01-01 00:00:00"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
     "text": "banana index", "tool": "search", "ts": "2024-01-01 00:01:00"},
    # optional fields absent -> defaulted, ts may be null
    {"conv_id": "c2", "turn_idx": 0, "text": "gamma delta"},
]
BAD = [
    '{"conv_id": "c3", "turn_idx": 0',            # truncated JSON
    '{"conv_id": "c4", "text": "no turn idx"}',   # missing required
    'not json at all',
]


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    lines = [json.dumps(r) for r in GOOD] + BAD
    p.write_text("\n".join(lines) + "\n")

    clean, quarantine = transcripts_from_jsonl(spark, str(p))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in clean.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1), ("c2", 0)}
    assert rows[("c2", 0)]["role"] == "" and rows[("c2", 0)]["tool"] == ""
    assert rows[("c2", 0)]["ts"] is None
    assert rows[("c1", 1)]["tool"] == "search"

    q = quarantine.collect()
    reasons = sorted(r["reason"] for r in q)
    assert reasons == ["missing_required", "unparseable", "unparseable"]
    raws = {r["raw"] for r in q if r["raw"] is not None}
    assert "not json at all" in raws                 # raw line retained

    # the clean frame is indexable end to end
    idx = build_index(clean, stem=True)
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert {"appl", "banana", "queri"} <= terms
    idx.unpersist()
