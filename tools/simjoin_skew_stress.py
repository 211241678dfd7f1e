"""Zipf-head resilience stress for set_similarity_join: append the SAME
boilerplate sentence to half the corpus (the scraped-web shape -- nav
bars, cookie banners) and compare candidate-pair counts for a naive
distinct-shingle equi-join vs the prefix(+positional) join. The naive
join must blow up toward |half|^2 on the shared shingles; the prefix
join must not, because boilerplate shingles have the HIGHEST document
frequency and are excluded from every prefix.

Usage: python tools/simjoin_skew_stress.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    dedup as dd,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

BOILER = ("accept all cookies to continue reading this site uses "
          "cookies subscribe to our newsletter all rights reserved")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = 0.5
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(" " + BOILER)))
        .otherwise(F.col("text")).alias("text"))
    n = docs.count()

    toks = (docs.select(F.col("doc_id").alias("id"), "text")
            .withColumn("__toks", dd.shingle_tokens(F.col("text")))
            .select("id", F.explode(
                dd.word_shingles_from_tokens(F.col("__toks"), 3))
                .alias("tok")))
    naive = (toks.alias("x").join(toks.alias("y"), "tok")
             .where(F.col("x.id") < F.col("y.id"))
             .select("x.id", "y.id").distinct().count())

    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("id").orderBy("df", "tok")
    ranked = (toks.join(freq, "tok").select("id", "tok", "df")
              .withColumn("pos", F.row_number().over(w_doc)))
    sizes = ranked.groupBy("id").agg(F.max("pos").alias("sz"))
    pref = (ranked.join(sizes, "id")
            .where(F.col("pos") <=
                   F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
            .select("id", "tok", "pos", "sz"))
    n_cand = dd._positional_candidates(pref, pref, t,
                                       self_join=True).count()
    t0 = time.time()
    n_pairs = dd.set_similarity_join(docs, threshold=t).count()
    wall = time.time() - t0
    print(f"| docs | naive shingle-join pairs | prefix+positional cands "
          f"| verified | wall s |")
    print(f"|---|---|---|---|---|")
    print(f"| {n} (half boilerplated) | {naive} | {n_cand} | {n_pairs} "
          f"| {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
