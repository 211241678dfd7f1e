"""Skew stress for assign_global_ids (round-10 fix): the round-9 design
value-bucketed on the LEADING order column, so a tie-heavy leading key
(a constant, or the modal token length of a real corpus) collapsed the
rank window into one partition. Round 10 range-partitions on the FULL
order tuple; this harness proves both failure shapes now scale:

  a) CONSTANT leading key -- every row shares one value; only the
     tiebreak column can spread the buckets;
  b) zipf-modal -n_tokens key -- the length_grouped_batches shape, where
     one modal length holds ~30% of the corpus.

Runs at 1x/3x/10x of sf0.1 documents and reports wall seconds plus the
max/mean bucket-size ratio the rank window actually sees. Pass = no
super-linear time step and max/mean stays near 1.

Usage: python tools/scale_stress_gid.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E402
    assign_global_ids,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

SCALES = (1, 3, 10)
N_BUCKETS = 64


def replicate(base: DataFrame, n_docs: int, factor: int) -> DataFrame:
    reps = [
        base.select((F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                    "n_tokens")
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def bucket_skew(df: DataFrame, order_cols: list[str]) -> float:
    """max/mean partition size of the range exchange the rank window
    rides -- the quantity that was unbounded in the round-9 design."""
    sizes = [
        r["count"]
        for r in (df.repartitionByRange(N_BUCKETS,
                                        *[F.col(c) for c in order_cols])
                  .groupBy(F.spark_partition_id().alias("b")).count()
                  .collect())
    ]
    return max(sizes) / (sum(sizes) / len(sizes))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("raw_tokens"))
    n_docs = docs.count()

    # zipf-modal: 30% of docs snap to the modal length 128, the rest
    # keep their raw token count -- the corpus shape that breaks
    # leading-column bucketing for length_grouped_batches.
    modal = docs.select(
        "doc_id",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3, F.lit(128))
        .otherwise(F.col("raw_tokens")).alias("n_tokens"))
    constant = docs.select("doc_id", F.lit(7).alias("n_tokens"))

    print("| scenario | scale | rows | wall s | window max/mean |")
    print("|---|---|---|---|---|")
    for name, frame, order in (
        ("constant-lead", constant, ["n_tokens", "doc_id"]),
        ("zipf-modal -n_tokens", modal, ["__neg", "doc_id"]),
    ):
        for factor in SCALES:
            rep = replicate(frame, n_docs, factor)
            if order[0] == "__neg":
                rep = rep.withColumn("__neg", -F.col("n_tokens"))
            rep = rep.localCheckpoint(eager=True)  # isolate op cost
            t0 = time.time()
            out = assign_global_ids(rep, order, n_buckets=N_BUCKETS)
            got = out.agg(F.count(F.lit(1)).alias("n"),
                          F.min("global_id").alias("mn"),
                          F.max("global_id").alias("mx")).first()
            wall = time.time() - t0
            assert got["n"] == n_docs * factor, (got, factor)
            assert (got["mn"], got["mx"]) == (1, n_docs * factor), got
            skew = bucket_skew(rep, order)
            print(f"| {name} | {factor}x | {got['n']} | {wall:.2f} "
                  f"| {skew:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
