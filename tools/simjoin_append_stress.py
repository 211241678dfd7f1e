"""Per-append cost of the persisted exact-simjoin store as it GROWS --
the round-13 scale fix under test: with /prefix bucketed by tok, each
delta append probes the accumulated store WITHOUT re-shuffling it (the
store side of the candidate join carries no Exchange), so per-append
wall should stay ~flat as the store grows; the legacy plain-parquet
layout re-shuffles the whole store every append, so its per-append
wall climbs with store size.

Builds a base store from a slice of documents, then appends equal-size
deltas while the store grows, for BOTH layouts, and prints a
markdown table of per-append walls plus the exchange count on the
store side of the candidate join.

Usage: python tools/simjoin_append_stress.py [sf_dir] [n_appends] [mult]

``mult`` > 1 amplifies the corpus: copy c of doc i keeps the first
half of its words and splices the second half of doc (i+c) mod n --
distinct documents whose cross-copy Jaccard sits well under the 0.5
threshold, so the PAIR table stays sane while the STORE (the thing the
legacy layout re-shuffles every append) grows mult-fold.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark import fsio  # noqa: E402
from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    dedup as dd,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)


def build_legacy(spark, docs, store_dir: str, threshold: float, k: int):
    """The pre-round-13 layout: plain-parquet prefix, no n_buckets in
    meta -- simjoin_append's documented fallback path."""
    toks = (docs.select(F.col("doc_id").alias("id"), "text")
            .withColumn("__toks", dd.shingle_tokens(F.col("text")))
            .select("id", F.explode(
                dd.word_shingles_from_tokens(F.col("__toks"), k))
                .alias("tok")))
    toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df")) \
        .write.mode("overwrite").parquet(store_dir + "/dfreq")
    arrs = toks.groupBy("id").agg(
        F.sort_array(F.collect_list("tok")).alias("toks"),
        F.count(F.lit(1)).alias("sz"))
    arrs.write.mode("overwrite").parquet(store_dir + "/docs")
    dd._simjoin_prefix(toks, spark.read.parquet(store_dir + "/dfreq"),
                       threshold) \
        .write.mode("overwrite").parquet(store_dir + "/prefix")
    prefix = spark.read.parquet(store_dir + "/prefix")
    dd._simjoin_verify(dd._simjoin_candidates(prefix, prefix, threshold),
                       spark.read.parquet(store_dir + "/docs"), threshold) \
        .write.mode("overwrite").parquet(store_dir + "/pairs")
    fsio.write_json(spark, fsio.join(store_dir, "meta.json"),
                    {"threshold": threshold, "k": k})


def main() -> None:
    import shutil

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if mult > 1:
        n0 = docs.count()
        w = F.split(F.col("text"), " ")
        head = F.concat_ws(" ", F.slice(w, 1, (F.size(w) / 2).cast("int")))
        tail_ = F.concat_ws(
            " ", F.slice(w, (F.size(w) / 2).cast("int") + 1,
                         F.size(w).cast("int")))
        h = docs.select(F.col("doc_id").alias("hid"), head.alias("h"))
        t = docs.select(F.col("doc_id").alias("tid"), tail_.alias("t"))
        parts = []
        for c in range(mult):
            parts.append(
                h.withColumn("tid", (F.col("hid") + c) % n0)
                .join(t, "tid")
                .select((F.col("hid") + c * n0).alias("doc_id"),
                        F.concat_ws(" ", "h", "t").alias("text")))
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        docs = big.localCheckpoint(eager=True)
    n = docs.count()
    slices = n_appends + 2  # base gets 2 slices' worth

    walls: dict[str, list[float]] = {}
    pair_counts: dict[str, int] = {}
    for layout in ("bucketed", "legacy"):
        store = f"/tmp/arap_sj_stress/{layout}"
        shutil.rmtree("/tmp/arap_sj_stress/" + layout, ignore_errors=True)
        base = docs.where(F.col("doc_id") % slices <= 1)
        if layout == "bucketed":
            dd.build_simjoin_index(base, store, threshold=0.5)
        else:
            build_legacy(spark, base, store, 0.5, 3)
        ws = []
        for i in range(2, slices):
            delta = docs.where(F.col("doc_id") % slices == i)
            t0 = time.time()
            dd.simjoin_append(spark, store, delta)
            ws.append(time.time() - t0)
        walls[layout] = ws
        pair_counts[layout] = spark.read.parquet(store + "/pairs").count()

    assert pair_counts["bucketed"] == pair_counts["legacy"], pair_counts
    print(f"\n{n} docs, base=2/{slices}, {n_appends} appends of "
          f"1/{slices} each; accumulated pair sets identical "
          f"({pair_counts['bucketed']} pairs)\n")
    print("| append # | store grows | bucketed wall s | legacy wall s |")
    print("|---|---|---|---|")
    for i, (wb, wl) in enumerate(zip(walls["bucketed"], walls["legacy"])):
        print(f"| {i + 1} | {(i + 2)}/{slices} -> {(i + 3)}/{slices} "
              f"| {wb:.2f} | {wl:.2f} |")
    fb, lb = walls["bucketed"], walls["legacy"]
    print(f"\nfirst->last growth: bucketed {fb[-1] / fb[0]:.2f}x, "
          f"legacy {lb[-1] / lb[0]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
