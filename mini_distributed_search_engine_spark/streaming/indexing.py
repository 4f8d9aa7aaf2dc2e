"""Streaming index ingestion: a transcript file stream feeding the packed
inverted index via incremental appends.

The reference has no streaming at all; its closest analogue is the crawler
re-running the batch Indexer over a grown pt-crawl table. Spark-native
shape: ``readStream`` over a transcript directory -> ``foreachBatch`` ->
each micro-batch is analyzed, TF-aggregated, and folded into the existing
packed index with `append_packed` (boundary-shard byte splice, O(batch)
work). Appended conversations must sort after all existing ones (the
append-only stable-docID discipline); each batch's docIDs continue from the
running total.

The sink keeps index state in plain parquet under ``root/`` the same way
`plans.pipeline.StagedIndexBuild` does, so a streaming-built index is
readable by the same SearchEngine / wand_topk path, and parity with a
one-shot batch build is testable (tests/test_streaming_index.py).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analyzer import term_tokens_df
from ..index.packed import append_packed, build_packed_postings
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    return (spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            # transcripts usually land as per-batch parquet DIRECTORIES;
            # the file source only lists the top level without this
            .option("recursiveFileLookup", "true")
            .parquet(input_dir))


class StreamingIndexer:
    """foreachBatch sink state: packed index + doc stats under ``root``."""

    def __init__(self, spark: SparkSession, root: str,
                 shard_span: int = 4096):
        self.spark = spark
        self.root = Path(root)
        self.shard_span = shard_span
        self.root.mkdir(parents=True, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def _meta(self) -> dict:
        if self._meta_path().exists():
            return json.loads(self._meta_path().read_text())
        return {"n_docs": 0, "sum_dl": 0, "generation": 0}

    def _save_meta(self, meta: dict) -> None:
        tmp = self.root / "_meta.json.tmp"
        tmp.write_text(json.dumps(meta))
        tmp.rename(self._meta_path())

    def packed(self) -> DataFrame:
        gen = self._meta()["generation"]
        return self.spark.read.parquet(str(self.root / f"packed_g{gen}"))

    def corpus_stats(self) -> tuple[int, float]:
        m = self._meta()
        n = int(m["n_docs"])
        return n, (m["sum_dl"] / n if n else 0.0)

    def doc_stats_df(self) -> DataFrame:
        n, avgdl = self.corpus_stats()
        return self.spark.createDataFrame([(n, avgdl)],
                                          "n_docs long, avgdl double")

    # -- the sink ---------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Analyze the micro-batch, assign continuing docIDs, append.

        Exactly-once across restarts: the generation counter in _meta.json
        only advances after the new packed parquet is fully written, and
        foreachBatch re-delivers an uncommitted batch on restart.
        """
        meta = self._meta()
        if meta.get("batch_id", -1) >= batch_id:
            return  # crash landed between meta commit and checkpoint commit:
            # the redelivered batch is already folded in — skip (idempotent)
        base = int(meta["n_docs"])
        # docIDs continue the stable ordering WITHIN the batch; the source
        # must deliver conversations in non-decreasing order across batches
        # (append-only discipline). Single partition + local sort keeps the
        # id assignment deterministic; micro-batches are small by
        # construction so this is not a scale bottleneck (the 10^12-turn
        # bulk load is the batch pipeline, not this sink).
        w_rows = (batch_df.repartition(1)
                  .sortWithinPartitions("conv_id", "turn_idx")
                  .withColumn("doc_id",
                              (F.monotonically_increasing_id() + F.lit(base))
                              .cast("long")))
        terms = term_tokens_df(w_rows, "text", keep_cols=("doc_id",))
        tf = (terms.groupBy("term", "doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("tf")))
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
        tf_dl = tf.join(dl, "doc_id")

        n_new = w_rows.count()
        if n_new == 0:
            return
        sum_dl_new = dl.agg(F.sum("dl")).collect()[0][0] or 0
        new_n = base + n_new
        new_sum = int(meta["sum_dl"]) + int(sum_dl_new)
        avgdl = new_sum / new_n

        gen = int(meta["generation"])
        out = self.root / f"packed_g{gen + 1}"
        if gen == 0:
            packed = build_packed_postings(tf_dl, avgdl,
                                           shard_span=self.shard_span)
        else:
            old = self.spark.read.parquet(str(self.root / f"packed_g{gen}"))
            packed = append_packed(old, tf_dl, avgdl,
                                   shard_span=self.shard_span)
        packed.write.mode("overwrite").parquet(str(out))
        self._save_meta({"n_docs": new_n, "sum_dl": new_sum,
                         "generation": gen + 1,
                         "batch_id": int(batch_id),
                         "updated_at": time.time()})

    def start(self, stream_df: DataFrame, checkpoint: str | None = None):
        """availableNow: drain everything currently in the source, then stop
        (deterministic for tests; drop availableNow for a live stream)."""
        return (stream_df.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation",
                        checkpoint or str(self.root / "_checkpoint"))
                .trigger(availableNow=True)
                .start())
