"""Scale-stress the relational core: replicate the sf0.1 lineitem/orders
fact tables 1x/3x/10x (order keys shifted per replica so join fan-out
stays exactly linear) and time representative plan shapes -- scan+agg
(Q1), fact-fact join+agg (Q18 shape), salted skew agg, window cumsum.

Usage: python tools/scale_stress_relational.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.plan_cache import (  # noqa: E402
    release_plan_caches,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

SCALES = (1, 3, 10)


def replicate(base: DataFrame, key_cols: list[str], shift: int,
              factor: int) -> DataFrame:
    parts = [
        base.select(*[
            (F.col(c) + F.lit(i * shift)).alias(c) if c in key_cols
            else F.col(c)
            for c in base.columns])
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).cache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-stress-relational")
    spark.sparkContext.setLogLevel("ERROR")

    li0 = load_table(spark, sf_dir, "lineitem")
    od0 = load_table(spark, sf_dir, "orders")
    shift = (od0.agg(F.max("o_orderkey")).first()[0] or 0) + 1

    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1).cast("decimal(4,2)")
              - F.col("l_discount").cast("decimal(4,2)")))

    def q1_scan_agg(li, od):
        return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sum_qty"),
                     F.sum(rev).alias("sum_disc_price"),
                     F.count(F.lit(1)).alias("n")))

    def q18_join_agg(li, od):
        big = (li.groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("qty"))
               .where(F.col("qty") > 300))
        return (od.join(big, od.o_orderkey == big.l_orderkey)
                .select("o_orderkey", "o_totalprice", "qty"))

    def salted_agg(li, od):
        salted = li.withColumn("__salt", F.pmod(F.col("l_partkey"), F.lit(8)))
        partial = (salted.groupBy("l_returnflag", "__salt")
                   .agg(F.sum(rev).alias("r"), F.count(F.lit(1)).alias("n")))
        return (partial.groupBy("l_returnflag")
                .agg(F.sum("r").alias("revenue"), F.sum("n").alias("n")))

    def window_cumsum(li, od):
        from pyspark.sql.window import Window

        w = (Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                     "o_orderkey")
             .rowsBetween(Window.unboundedPreceding, 0))
        return od.select("o_custkey", "o_orderkey",
                         F.sum("o_totalprice").over(w).alias("cum"))

    ops = {
        "q1 scan+agg (lineitem)": q1_scan_agg,
        "q18-shape join+agg (orders x big-qty)": q18_join_agg,
        "salted two-stage agg": salted_agg,
        "per-customer window cumsum (orders)": window_cumsum,
    }

    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    rows_out: dict[str, dict[int, int]] = {k: {} for k in ops}
    n_li, n_od = li0.count(), od0.count()
    for factor in SCALES:
        li = replicate(li0, ["l_orderkey"], shift, factor)
        od = replicate(od0, ["o_orderkey"], shift, factor)
        li.count(), od.count()
        for name, fn in ops.items():
            best, nrows = 1e9, -1
            for _ in range(2):
                release_plan_caches()
                t0 = time.perf_counter()
                nrows = fn(li, od).count()
                best = min(best, time.perf_counter() - t0)
            results[name][factor] = round(best, 2)
            rows_out[name][factor] = nrows
            print(f"  {factor}x {name}: {best:.2f}s ({nrows} rows)",
                  flush=True)
        li.unpersist()
        od.unpersist()

    print(f"\nfacts at 1x: {n_li} lineitem / {n_od} orders\n")
    print("| plan shape | 1x | 3x | 10x | t(10x)/t(1x) | rows@10x |")
    print("|---|---|---|---|---|---|")
    for name in ops:
        r = results[name]
        ratio = round(r[10] / r[1], 1) if r[1] else float("inf")
        print(f"| {name} | {r[1]} s | {r[3]} s | {r[10]} s | {ratio}x "
              f"| {rows_out[name][10]} |")
    spark.stop()


if __name__ == "__main__":
    main()
