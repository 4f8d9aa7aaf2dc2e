"""JSONL transcript source — the interchange format for conversation data.

The reference ingests via its crawler into the KVS
(`jobs/Crawler.java` — out of scope per the north rule); real transcript
corpora arrive as JSON-lines drops. This reader enforces the canonical
transcript schema (sources/transcripts.py TRANSCRIPT_SCHEMA), tolerates
the junk a crawl inevitably contains, and quarantines rather than drops
malformed records so ingestion loss is observable:

* explicit schema (never inferSchema — a schema inference pass reads the
  whole input twice and silently widens types under dirty data);
* PERMISSIVE mode with ``_corrupt_record`` retained: unparseable lines
  land in a quarantine frame with the raw line intact;
* rows missing REQUIRED fields (conv_id, turn_idx, text) are quarantined
  too, not nulled through to the index;
* optional fields default (role '', tool '', ts NULL — the analyzer and
  the docID assignment tolerate all three).

Scale: a JSONL scan is a narrow per-file map — splittable per line,
no shuffle; the schema projection prunes unknown keys at parse time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .transcripts import TRANSCRIPT_SCHEMA

_READ_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in TRANSCRIPT_SCHEMA]
    + [T.StructField("_corrupt_record", T.StringType(), True)])

REQUIRED = ("conv_id", "turn_idx", "text")


def transcripts_from_jsonl(spark: SparkSession, path: str
                           ) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL transcript drop -> (clean, quarantine).

    ``clean`` matches TRANSCRIPT_SCHEMA (role/tool null-defaulted to '');
    ``quarantine`` holds one row per rejected input line with a ``reason``
    and the raw line (when the parser could not even tokenize it)."""
    raw = (spark.read.schema(_READ_SCHEMA)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", "_corrupt_record")
           .json(path))
    # Spark leaves _corrupt_record non-null for unparseable lines and
    # nulls EVERY schema field for them; a parseable line missing a
    # required key parses with that field null.
    missing = [F.col(c).isNull() for c in REQUIRED]
    bad_parse = F.col("_corrupt_record").isNotNull()
    bad_required = ~bad_parse & (missing[0] | missing[1] | missing[2])
    quarantine = (raw.where(bad_parse | bad_required)
                  .select(
                      F.when(bad_parse, F.lit("unparseable"))
                      .otherwise(F.lit("missing_required")).alias("reason"),
                      F.col("_corrupt_record").alias("raw"),
                      "conv_id", "turn_idx"))
    clean = (raw.where(~bad_parse & ~(missing[0] | missing[1] | missing[2]))
             .select(
                 "conv_id", "turn_idx",
                 F.coalesce(F.col("role"), F.lit("")).alias("role"),
                 "text",
                 F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
                 "ts"))
    return clean, quarantine
