"""Round-15 scale stress for the CLOSED maintenance loops: drive the
streaming_components per-batch body (simjoin fold -> pair-delta
components fold -> inline refreeze/compaction triggers) through a
multiplied corpus, timing every batch -- the evidence that per-batch
wall stays ~flat while the store grows ~10x and that the inline
maintenance amortizes instead of stacking.

Batches run through EXACTLY the calls streaming_components' foreachBatch
makes (simjoin_append with batch_id, folded-files watermark diff,
components_append with the auto_compact_deltas bound, _maybe_refreeze,
_maybe_compact_simjoin) -- driven directly so each batch can be timed
and labeled with which maintenance fired; Structured Streaming adds
only fixed trigger overhead on top.

Usage: python tools/streaming_components_stress.py [sf_dir] [n_batches] [mult]
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
from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    similarity as sim,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)
from automated_review_analysis_pipeline_spark.streaming.docs_stream import (  # noqa: E402
    _maybe_compact_simjoin,
    _maybe_refreeze,
)


def amplify(spark, docs, mult: int):
    """The simjoin_append_stress corpus amplifier: copy c of doc i
    splices half of doc (i+c) mod n -- distinct docs, bounded
    cross-copy Jaccard, store grows mult-fold."""
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
    return big.localCheckpoint(eager=True)


def main() -> None:
    import shutil

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if mult > 1:
        docs = amplify(spark, docs, mult)
    n = docs.count()

    work = "/tmp/arap_streamcomp_stress"
    shutil.rmtree(work, ignore_errors=True)
    store = work + "/simjoin_store"
    comp = work + "/comp_store"
    folded_p = work + "/folded_pairs.json"
    dd.build_simjoin_index(docs.limit(0), store, threshold=0.5)
    pairs_dir = store + "/pairs"

    rows = []
    for b in range(n_batches):
        batch = docs.where(F.col("doc_id") % n_batches == b)
        t0 = time.time()
        dd.simjoin_append(spark, store, batch, batch_id=b)
        folded = set(fsio.read_json(spark, folded_p)) \
            if fsio.exists(spark, folded_p) else set()
        listing = [f for f in fsio.list_files(spark, pairs_dir)
                   if f.endswith(".parquet")]
        new_files = [pairs_dir + "/" + f for f in listing
                     if f not in folded]
        if new_files:
            new_pairs = spark.read.parquet(*new_files)
            if not fsio.exists(spark, fsio.join(comp, "meta.json")):
                sim.build_components_store(new_pairs, comp,
                                           a_col="a_id", b_col="b_id")
            else:
                sim.components_append(spark, comp, new_pairs,
                                      a_col="a_id", b_col="b_id",
                                      auto_compact_every=3)
        fsio.write_json(spark, folded_p, sorted(listing))
        refroze = _maybe_refreeze(spark, store, 8.0)
        compacted = _maybe_compact_simjoin(spark, store, 3)
        if compacted:
            fsio.write_json(
                spark, folded_p,
                sorted(f for f in fsio.list_files(spark, pairs_dir)
                       if f.endswith(".parquet")))
        wall = time.time() - t0
        n_store = fsio.read_json(
            spark, store + "/meta.json").get("n_docs_total", 0)
        rows.append((b, n_store, wall, refroze, compacted))

    labels = sim.components_read(spark, comp).count()
    pairs_n = dd.simjoin_pairs(spark, store).count()
    comp_meta = fsio.read_json(spark, comp + "/meta.json")
    print(f"\n{n} docs ({mult}x amplified), {n_batches} batches; final "
          f"store {rows[-1][1]} docs, {pairs_n} pairs, {labels} labeled "
          f"nodes; components chain length "
          f"{comp_meta['version'] - comp_meta['base']} (bound 3)\n")
    print("| batch | store docs after | wall s | refreeze | compact |")
    print("|---|---|---|---|---|")
    for b, n_store, wall, r, c in rows:
        print(f"| {b + 1} | {n_store} | {wall:.2f} "
              f"| {'Y' if r else ''} | {'Y' if c else ''} |")
    plain = [w for _, _, w, r, c in rows if not (r or c)]
    if len(plain) >= 2:
        print(f"\nplain-batch first->last: {plain[0]:.2f}s -> "
              f"{plain[-1]:.2f}s ({plain[-1] / plain[0]:.2f}x) at "
              f"{rows[0][1]} -> {rows[-1][1]} store docs")
    spark.stop()


if __name__ == "__main__":
    main()
