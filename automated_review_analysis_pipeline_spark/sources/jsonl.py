"""JSONL (newline-delimited JSON) source/sink -- the interchange format
LLM training corpora actually ship in (one document object per line).

Scale rules baked in:
* READS ALWAYS TAKE AN EXPLICIT SCHEMA. Schema inference reads the entire
  input once before the real scan -- a full extra pass over 100 TB. With a
  schema the read is one streaming pass, malformed lines land in
  ``_corrupt_record`` (PERMISSIVE) instead of failing the job, and column
  pruning still applies (Spark's JSON reader skips unprojected fields
  during parsing).
* Writes are partitioned-directory-of-files (one file per task) --
  parallel, atomic-per-task, resumable; compression defaults to gzip for
  the 3-10x wire/storage win on text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# The `documents` table's interchange schema (doc_id/text/lang/source),
# plus the permissive corrupt-line catcher.
DOCUMENTS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "_corrupt_record string"
)


def read_jsonl(spark: SparkSession, path: str,
               schema: str | StructType = DOCUMENTS_JSONL_SCHEMA) -> DataFrame:
    """Read newline-delimited JSON with a REQUIRED explicit schema."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, partition_by: str | None = None,
                compression: str = "gzip", mode: str = "overwrite") -> None:
    """Write a DataFrame as (optionally partitioned) compressed JSONL."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def corrupt_line_stats(df: DataFrame) -> DataFrame:
    """Data-quality gate for a permissive JSONL read: count of parsed vs
    corrupt lines (corrupt = `_corrupt_record` non-null).

    Spark refuses to answer queries that project ONLY the corrupt-record
    column from a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) -- the officially documented pattern is to cache the
    parsed frame first, which this helper does. Run the gate on a sample
    or one partition when auditing 100 TB; the cache is scoped to the
    audit, not the pipeline."""
    from pyspark.sql import functions as F

    return df.cache().agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count("_corrupt_record").alias("n_corrupt"),
    )
