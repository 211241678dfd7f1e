"""ORC source/sink -- the other columnar interchange format (Hive/Trino
ecosystems ship ORC where the parquet world ships parquet).

Same scale rules as the JSONL module: explicit schema on read (no
inference pass), partitioned-directory writes (one file per task,
atomic-per-task, resumable), and predicate pushdown / column pruning via
the native vectorized ORC reader -- Spark's ORC scan reports
``PushedFilters`` exactly like parquet, so every plan-gate discipline in
this repo applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(spark: SparkSession, path: str,
             schema: str | StructType | None = None) -> DataFrame:
    """Read an ORC dataset. ORC files self-describe their schema in the
    footer (no data pass, unlike JSON inference), so ``schema`` is
    optional -- pass one to PIN the contract: reads fail loudly on drift
    instead of silently widening."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: str | None = None,
              compression: str = "zstd") -> None:
    """Write an ORC dataset; ``partition_by`` produces the
    directory-per-value layout partition pruning needs."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
