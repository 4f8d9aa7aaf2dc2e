"""Connected components: multi-hop chains converge to the min id,
isolated nodes stay singleton, and non-convergence fails loudly."""

from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.operators.components import (
    connected_components)


def test_components_chain_and_isolated(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # 0-1-2-3-4 chain (diameter 4: takes several propagation rounds),
    # 6-7 pair, 5 isolated
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (3, 4), (6, 7)], "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 6}


def test_components_nonconvergence_raises(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(nodes, edges, max_iters=1)
