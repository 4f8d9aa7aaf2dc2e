"""Connected components by iterative min-label propagation — the step
that turns near-duplicate PAIRS into duplicate GROUPS (transitive
closure), so corpus dedup can keep one canonical doc per component
instead of reasoning about an edge list.

Algorithm: every node starts labeled with its own id; each round a node
takes the min of its label and its neighbors' labels; converged when no
label changes. Rounds needed = graph diameter (near-dup clusters are
shallow — a handful of rounds). Each round is one join + one groupBy
(map-side partial min), then `localCheckpoint` — which, unlike persist,
TRUNCATES the lineage, so plan depth and analysis cost stay constant no
matter how many rounds run, and there is no unpersist bookkeeping (the
checkpoint blocks free when the frame is garbage-collected). The
previous round's label rides along in the same frame, so convergence is
one filter+count on checkpointed data — no extra join. The driver only
ever sees one integer per round (the changed-label count). This is the
simplified form of the small-star/large-star CC algorithm (Kiveris et
al., "Connected Components in MapReduce"), which is the drop-in upgrade
if diameters ever get deep.

The DuckDB oracle computes the same fixpoint as a recursive CTE
(min label over the reachability set), so convergence is value-checked,
not just assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "id", a_col: str = "a",
                         b_col: str = "b", max_iters: int = 25) -> DataFrame:
    """(node, component): component = min node id reachable via edges.
    Isolated nodes are their own component. Raises if the propagation has
    not converged after max_iters rounds (diameter larger than expected —
    switch to small-star/large-star before raising the cap)."""
    labels = nodes.select(F.col(id_col).alias("node"),
                          F.col(id_col).alias("label"))
    sym = (edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
           .unionByName(
               edges.select(F.col(b_col).alias("src"),
                            F.col(a_col).alias("dst")))
           .persist())
    try:
        for _ in range(max_iters):
            neigh = (sym.join(labels, sym["src"] == labels["node"])
                     .groupBy("dst").agg(F.min("label").alias("nmin")))
            nxt = (labels.join(neigh, labels["node"] == neigh["dst"], "left")
                   .select("node", F.col("label").alias("old"),
                           F.least("label", F.coalesce("nmin", "label"))
                           .alias("label"))
                   .localCheckpoint())   # truncate lineage, no unpersist debt
            changed = nxt.where(F.col("old") != F.col("label")).count()
            labels = nxt.select("node", "label")
            if changed == 0:
                return labels.select("node", F.col("label").alias("component"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "graph diameter exceeds expectations for near-dup clusters")
    finally:
        sym.unpersist()
