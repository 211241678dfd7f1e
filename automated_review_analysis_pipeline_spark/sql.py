"""SQL entry point: expose the star-schema + extension tables as temp
views so the whole engine is drivable from ``spark.sql`` -- the same
parquet-backed names the DuckDB oracles use (``region nation customer
supplier part orders lineitem events documents embeddings``), with
``events.ts`` already normalized to TimestampType by the shared loader.

Catalyst treats a view exactly like the DataFrame it wraps: filters and
projections written in SQL push into the parquet scans, joins broadcast,
AQE re-plans -- there is no performance cliff between the DataFrame API
and this surface, so teams can mix freely (views for ad-hoc SQL, the
operator library for pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_review_analysis_pipeline_spark.sources.tables import (
    DEFAULT_SF_DIR,
    TABLES,
    load_table,
)


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                    names: tuple[str, ...] = TABLES) -> None:
    """Create (or replace) one temp view per testdata table."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str,
        sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Run ANSI SQL over the registered tables (registering them first
    if needed -- idempotent)."""
    missing = [n for n in TABLES
               if not spark.catalog.tableExists(n)]
    if missing:
        register_tables(spark, sf_dir, tuple(missing))
    return spark.sql(query)
