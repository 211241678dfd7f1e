"""Star-schema / extension-table parquet loader for the driver testdata."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    `events.ts` has shipped in two physical forms across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects outright -- read as raw nanos via legacy.parquet.nanosAsLong
    and integer-divide to micros; a double division would lose precision at
    ~1.7e18 ns > 2^53) and plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ
    directly). Normalize both to session-TZ TimestampType; all event
    queries pin the session to UTC so wall-clock math matches the oracle's
    naive timestamps either way.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type != "timestamp":
            raise ValueError(f"unexpected events.ts physical type: {ts_type}")
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
