"""Run every registry query against its DuckDB oracle (driver-compare
replica) and flag (a) value mismatches, (b) array-typed output columns
that would crash the driver's pandas sort canonicalization.

Usage: python tools/check_all.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(list(v))
                          if isinstance(v, (list, tuple)) or
                          type(v).__name__ == "ndarray" else v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from automated_review_analysis_pipeline_spark.registry import ORACLE_SQL, QUERIES

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("check-all").getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    from automated_review_analysis_pipeline_spark.plan_cache import (
        release_plan_caches,
    )

    bad, ok, rows_only = [], [], []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        release_plan_caches()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            arr_cols = [f.name for f in sdf.schema.fields
                        if f.dataType.typeName() in ("array", "map", "struct")]
            spark_pd = sdf.toPandas()
        except Exception:
            bad.append((name, "SPARK ERROR:\n" + traceback.format_exc(limit=3)))
            continue
        if arr_cols:
            bad.append((name, f"NON-SCALAR OUTPUT COLS (driver canon hazard): {arr_cols}"))
            continue
        if name not in ORACLE_SQL:
            rows_only.append((name, len(spark_pd)))
            print(f"  [rows-only] {name}: {len(spark_pd)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            oracle_pd = con.execute(ORACLE_SQL[name]).df()
        except Exception:
            bad.append((name, "ORACLE ERROR:\n" + traceback.format_exc(limit=2)))
            continue
        try:
            s, o = _canon(spark_pd), _canon(oracle_pd)
        except Exception:
            bad.append((name, "CANON ERROR:\n" + traceback.format_exc(limit=3)))
            continue
        if list(s.columns) != list(o.columns):
            bad.append((name, f"SCHEMA: spark={list(s.columns)} oracle={list(o.columns)}"))
        elif len(s) != len(o):
            bad.append((name, f"ROWS: spark={len(s)} oracle={len(o)}"))
        elif not s.equals(o):
            n = min(len(s), len(o))
            neq = (s.values != o.values).any(axis=1)
            i = next(j for j in range(n) if neq[j])
            bad.append((name, f"VALUES ({neq.sum()} rows differ); first:\n"
                        f"  spark : {dict(s.iloc[i])}\n  oracle: {dict(o.iloc[i])}"))
        else:
            ok.append(name)
            print(f"  [ok] {name}: {len(s)} rows ({time.time()-t0:.1f}s)",
                  flush=True)

    print(f"\n=== {len(ok)} ok, {len(rows_only)} rows-only, {len(bad)} BAD")
    for name, msg in bad:
        print(f"\n### {name}\n{msg}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
