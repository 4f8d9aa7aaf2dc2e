"""Storage backend probe: what flips when the Iceberg runtime is present.

The north rule asks for Iceberg-backed shards; this sandbox ships no
Iceberg runtime jar (verified: no org.apache.iceberg classes on the
classpath), so every stage writes plain parquet directories and the
`_COMMITTED.json` rename in `plans.pipeline.Stage` supplies the atomic
commit Iceberg's snapshot swap would give us. This module makes the
boundary EXPLICIT and testable:

* `iceberg_available(spark)` — classpath probe, False here, True on any
  cluster launched with `--packages org.apache.iceberg:
  iceberg-spark-runtime-3.5_2.12:<ver>` (or the jar on the executors).
* `iceberg_configs(...)` — the EXACT session configs that flip storage
  over; nothing else in the engine changes, because all reads/writes go
  through paths, and Iceberg tables are addressable as paths or
  `catalog.db.table` names at the same call sites.

What changes when the jar IS present (the flip list the survey claim is
scoped to):
  1. `StagedIndexBuild` stage writes become `df.writeTo(f"{cat}.idx.{stage}")
     .createOrReplace()` — the `_COMMITTED.json` marker becomes redundant
     (Iceberg commit = atomic snapshot swap) but harmless, and resume
     reads the committed snapshot instead of checking the marker.
  2. The streaming sink's manifest (`streaming.indexing`) maps onto
     Iceberg's own manifest lists: `segs_gN` append = one `append()`
     commit; superseding the boundary shard = one `overwritePartitions()`
     on the shard_id partition; generation pruning = `expire_snapshots`.
  3. Time travel / incremental consumption of the index (VERSION AS OF)
     comes free; the `_meta.json` n_docs/sum_dl pair moves to snapshot
     summary properties.
The engine's partitioning story is identical either way: segments are
written partitioned by doc-shard ranges, which maps 1:1 onto an Iceberg
`bucket`/identity partition spec on `shard_id`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def iceberg_configs(catalog: str = "mdse",
                    warehouse: str = "/data/warehouse") -> dict[str, str]:
    """Session configs that switch stage storage to Iceberg — apply via
    SparkSession.builder.config(k, v) BEFORE session creation (extensions
    cannot be injected later). With these set, a stage path
    `<root>/<stage>` becomes the table `{catalog}.idx.<stage>`."""
    return {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
