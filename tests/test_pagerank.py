"""PageRank golden test — the reference's own three-node expectations
(HW9Test.java:213-240: page1->page2; page2->page1,page3; page3->page1,
threshold 0.001)."""

from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.operators.pagerank import pagerank

GOLDEN = {
    "p1": 1.191681575822917,
    "p2": 1.1637322274926893,
    "p3": 0.644586196684393,
}


def test_reference_golden_graph(spark):
    edges = spark.createDataFrame(
        [("p1", "p2"), ("p2", "p1"), ("p2", "p3"), ("p3", "p1")],
        "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, threshold=0.001).collect()}
    for node, expected in GOLDEN.items():
        assert got[node] == pytest.approx(expected, abs=1e-3), (node, got[node])


def test_dangling_node_stays_alive(spark):
    # p3 has no children in the edge list -> not a source -> reference
    # semantics drop it from the node set; p2's rank flows only from p1
    edges = spark.createDataFrame([("p1", "p2"), ("p2", "p1")],
                                  "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, max_iter=30).collect()}
    assert set(got) == {"p1", "p2"}
    assert got["p1"] == pytest.approx(1.0, abs=1e-6)
    assert got["p2"] == pytest.approx(1.0, abs=1e-6)
