"""Skew-robustness stress for the token/gram aggregates (round-7 ops):
a DELIBERATELY zipf-broken corpus where 10% of documents share one
viral boilerplate sentence, so one 8-gram's posting list and one word's
lookup-join key carry ~10% of the corpus. Replicates 1x/3x/10x and
times substring_dedup and bpe_encode_ids -- the claim under test is
that both stay near-linear because their hot key flows through ONE
keyed aggregate / join (map-side-combined, AQE skew-split), never a
pairwise expansion.

Usage: python tools/scale_stress_skew.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import dedup  # noqa: E402
from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    textanalysis as ta,
)
from automated_review_analysis_pipeline_spark.plan_cache import (  # noqa: E402
    release_plan_caches,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

SCALES = (1, 3, 10)
BOILERPLATE = ("subscribe to our newsletter for the latest updates and "
               "exclusive offers delivered straight to your inbox")


def skewed_corpus(base: DataFrame, n_docs: int, factor: int) -> DataFrame:
    """factor replicas with per-replica word shuffles (decorrelated, as
    in scale_stress.py) -- then 10% of ALL docs get the SAME viral
    boilerplate sentence appended, so its 8-grams and words are the hot
    keys at every scale."""
    def shuffled(i: int):
        if i == 0:
            return F.col("text")
        toks = F.split(F.col("text"), r"\s+")
        keyed = F.transform(
            toks, lambda t, p: F.struct(
                F.xxhash64(t, p, F.lit(i)).alias("k"), t.alias("t")))
        return F.array_join(
            F.transform(F.array_sort(keyed), lambda s: s["t"]), " ")

    reps = [
        base.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            shuffled(i).alias("text"), "source")
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0,
               F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE)))
        .otherwise(F.col("text")).alias("text"),
        "source",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]",
                      extra_confs={"spark.ui.enabled": "false",
                                   "spark.sql.shuffle.partitions": "32"})
    base = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "source")
    n_docs = base.count()

    ops = {
        "substring_dedup (k=8)":
            lambda d: dedup.substring_dedup(d, k=8),
        "bpe_encode_ids (3 merges)":
            lambda d: ta.bpe_encode_ids(d, n_merges=3),
        "token_freq_score":
            lambda d: ta.token_freq_score(d),
    }
    results: dict[str, dict[int, float]] = {name: {} for name in ops}
    hot_share: dict[int, str] = {}
    for factor in SCALES:
        corpus = skewed_corpus(base, n_docs, factor).cache()
        total = corpus.count()
        # measure the skew actually present: top-1 8-gram doc share
        toked = corpus.select(
            "doc_id",
            ta.tokens(F.lower(F.col("text"))).alias("toks"))
        top = (
            toked.where(F.size("toks") >= 8)
            .select("doc_id", F.explode(F.transform(
                F.sequence(F.lit(1), F.size("toks") - 7),
                lambda i: F.concat_ws(
                    " ", F.slice("toks", i, 8)))).alias("g"))
            .groupBy("g").agg(F.count_distinct("doc_id").alias("nd"))
            .orderBy(F.desc("nd")).limit(1).collect()[0]
        )
        hot_share[factor] = f"{top['nd']}/{total} docs share one 8-gram"
        for name, fn in ops.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(corpus).count()
                best = min(best, time.perf_counter() - t0)
            results[name][factor] = best
        corpus.unpersist()
        release_plan_caches()

    print(f"\nSkew profile: {hot_share}")
    print("\n| operator | 1x | 3x | 10x | 10x/1x |")
    print("|---|---|---|---|---|")
    for name, times in results.items():
        r = times[10] / times[1] if times[1] else float("inf")
        print(f"| {name} | {times[1]:.2f} s | {times[3]:.2f} s "
              f"| {times[10]:.2f} s | {r:.1f}x |")


if __name__ == "__main__":
    main()
