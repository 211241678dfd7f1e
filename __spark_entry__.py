"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's summary-pivot
surface over the documents table) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2; ``oracle_sql()`` carries the exact
DuckDB twin for each SQL-expressible one. Implementations live in
automated_review_analysis_pipeline_spark/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_review_analysis_pipeline_spark.registry import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["doc_sentiment_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query in
    :func:`queries` (same column names/aliases both sides)."""
    return dict(ORACLE_SQL)
