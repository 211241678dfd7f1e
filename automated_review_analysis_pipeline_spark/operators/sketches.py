"""Deterministic, mergeable frequency sketches as relational plans.

Count-min (Cormode/Muthukrishnan 2005): d hash rows x w buckets of
counters; point estimate = min over rows of the key's bucket counter.
Spark-first reading: the counter table IS a groupBy aggregate -- partial
aggregation collapses each executor's contribution to <= d*w rows before
the shuffle, which is exactly the sketch's mergeability property (the
reason a 1000-executor build ships KBs, not the keys). The hash family is
the portable md5 convention (cf. operators/dedup.py), so the DuckDB
oracle rebuilds the identical counters and the estimate check is exact,
not statistical.

Spark's own ``count_min_sketch`` aggregate exists but its binary sketch
is not comparable across engines; building the counters relationally
keeps the operator oracle-checkable and the plan transparent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_PRIME = 2_147_483_647


def _cms_hash(key: Column, row_i: int, w: int) -> Column:
    """Row-``row_i`` bucket of ``key``: md5 of a salted rendering -> int32
    -> mod w. Independent rows come from the salt, not from coefficient
    families -- md5 already mixes."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row_i}:"),
                                   key.cast("string"))), 1, 8),
        16, 10).cast("long")
    return (h % CMS_PRIME) % F.lit(w)


def count_min_counters(df: DataFrame, key_col: str,
                       d: int = 4, w: int = 1024) -> DataFrame:
    """The d x w counter table: (row_i, bucket, n). One wide aggregate;
    the explode multiplies rows by d but partial hash aggregation bounds
    what crosses the wire at d*w per map task."""
    key = F.col(key_col)
    buckets = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 _cms_hash(key, i, w).alias("bucket"))
        for i in range(d)
    ])
    return (
        df.select(F.explode(buckets).alias("b"))
        .groupBy(F.col("b.row_i").alias("row_i"),
                 F.col("b.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_report(df: DataFrame, key_col: str,
                     d: int = 4, w: int = 1024) -> DataFrame:
    """Per-key exact count vs count-min estimate: (key, exact_n, cms_n,
    over_n). cms_n >= exact_n always (the sketch only over-counts);
    over_n shows the collision error the w/d choice buys.

    The counter table is at most d*w rows -- broadcast to the probe join
    regardless of the input's size. The input is scanned twice (counters
    + exacts); at scale both are one-pass partial aggregates over the
    same scan, and AQE/exchange reuse dedupes the scan when the plans
    canonicalize identically."""
    key = F.col(key_col)
    counters = count_min_counters(df, key_col, d, w)
    exact = df.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n"))
    probe_buckets = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 _cms_hash(F.col("key"), i, w).alias("bucket"))
        for i in range(d)
    ])
    probed = (
        exact.select("key", "exact_n", F.explode(probe_buckets).alias("b"))
        .select("key", "exact_n", "b.row_i", "b.bucket")
        .join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("n").alias("cms_n"))
    )
    return (
        probed.select(
            F.col("key"), "exact_n", "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("over_n"))
        .orderBy("key")
    )


def count_min_sql(table: str, key_expr: str, d: int = 4,
                  w: int = 1024) -> str:
    """DuckDB twin, generated from the same salts/width so the counters
    are bit-identical."""
    def h(i: int, key: str) -> str:
        return (f"(CAST(('0x' || substr(md5('cms{i}:' || "
                f"CAST({key} AS VARCHAR)), 1, 8)) AS UBIGINT)::BIGINT "
                f"% {CMS_PRIME}) % {w}")

    return f"""
WITH counters AS (
  SELECT t.row_i, CASE t.row_i
      {' '.join(f"WHEN {i} THEN {h(i, key_expr)}" for i in range(d))}
    END AS bucket, CAST(count(*) AS BIGINT) AS n
  FROM {table} CROSS JOIN (
      SELECT unnest(range({d})) AS row_i) t
  GROUP BY 1, 2
), exact AS (
  SELECT {key_expr} AS key, CAST(count(*) AS BIGINT) AS exact_n
  FROM {table} GROUP BY 1
), probed AS (
  SELECT e.key, e.exact_n, min(c.n) AS cms_n
  FROM exact e
  CROSS JOIN (SELECT unnest(range({d})) AS row_i) r
  JOIN counters c ON c.row_i = r.row_i AND c.bucket = CASE r.row_i
      {' '.join(f"WHEN {i} THEN {h(i, 'e.key')}" for i in range(d))}
    END
  GROUP BY 1, 2
)
SELECT key, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
       CAST(cms_n - exact_n AS BIGINT) AS over_n
FROM probed ORDER BY key
"""
