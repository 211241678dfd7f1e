"""Local replica of the driver's Spark-vs-DuckDB correctness compare.

Usage: python tools/oracle_diff.py <query_name> [sf_dir]

Runs QUERIES[name] on Spark and ORACLE_SQL[name] on DuckDB over the same
parquet tables, canonicalizes both (column-name sort, row sort, string
render), and prints the first differing rows so hash mismatches can be
debugged at value level.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v) if isinstance(v, (list, tuple)) else v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from automated_review_analysis_pipeline_spark.registry import ORACLE_SQL, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("oracle-diff").getOrCreate()
    )
    spark_pd = QUERIES[name](spark, sf_dir).toPandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle_pd = con.execute(ORACLE_SQL[name]).df()

    s, o = _canon(spark_pd), _canon(oracle_pd)
    print(f"spark rows={len(s)} oracle rows={len(o)}")
    print(f"spark cols={list(s.columns)}")
    print(f"oracle cols={list(o.columns)}")
    if list(s.columns) != list(o.columns):
        print("SCHEMA MISMATCH")
        return
    if len(s) != len(o):
        print("ROWCOUNT MISMATCH")
    n = min(len(s), len(o))
    neq = (s.iloc[:n].values != o.iloc[:n].values).any(axis=1)
    idx = [i for i in range(n) if neq[i]]
    print(f"differing rows: {len(idx)}")
    for i in idx[:10]:
        print(f"--- row {i}")
        print("  spark :", dict(s.iloc[i]))
        print("  oracle:", dict(o.iloc[i]))
    if not idx and len(s) == len(o):
        print("MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
