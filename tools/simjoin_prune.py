"""Prefix-filter pruning measurement for set_similarity_join: how many
candidate pairs the prefix join generates vs the all-pairs count, and
the verified survivor count, at a given sf. The prune factor is the
whole point of the operator -- record it in PERF.md.

Usage: python tools/simjoin_prune.py [sf_dir] [threshold]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()

    toks = (docs.select(F.col("doc_id").alias("id"), "text")
            .withColumn("__toks", dd.shingle_tokens(F.col("text")))
            .select("id", F.explode(
                dd.word_shingles_from_tokens(F.col("__toks"), 3))
                .alias("tok")))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("id").orderBy("df", "tok")
    ranked = (toks.join(freq, "tok").select("id", "tok", "df")
              .withColumn("pos", F.row_number().over(w_doc)))
    sizes = ranked.groupBy("id").agg(F.max("pos").alias("sz"))
    pref = (ranked.join(sizes, "id")
            .where(F.col("pos") <=
                   F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
            .select("id", "tok", "pos", "sz"))
    n_prefix_rows = pref.count()
    n_token_rows = toks.count()
    # size-filtered only (no positional filter) for the before/after
    cand_sz = (pref.alias("x").join(pref.alias("y"), "tok")
               .where(F.col("x.id") < F.col("y.id"))
               .where((F.col("y.sz") >= t * F.col("x.sz"))
                      & (F.col("x.sz") >= t * F.col("y.sz")))
               .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
               .distinct())
    n_cand_size = cand_sz.count()
    n_cand = dd._positional_candidates(pref, pref, t,
                                       self_join=True).count()

    t0 = time.time()
    n_pairs = dd.set_similarity_join(docs, threshold=t).count()
    wall = time.time() - t0

    all_pairs = n * (n - 1) // 2
    print(f"sf_dir={sf_dir} t={t}")
    print(f"| docs | shingle rows | prefix rows | all pairs "
          f"| size-filtered cands | +positional cands | verified pairs "
          f"| wall s |")
    print(f"|---|---|---|---|---|---|---|---|")
    print(f"| {n} | {n_token_rows} | {n_prefix_rows} | {all_pairs} "
          f"| {n_cand_size} | {n_cand} | {n_pairs} | {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
