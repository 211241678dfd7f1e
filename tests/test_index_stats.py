"""index_stats: one metadata-only operational report across all
persisted store families -- what the store is, layout health (files
per bucket, version-chain length), epochs/counters, and the
maintenance trigger columns."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.operators import (
    textanalysis as ta,
)
from automated_review_analysis_pipeline_spark.operators.partitioning import (
    index_compact,
    index_stats,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _kv(df):
    return {(r["part"], r["metric"]): r["value"] for r in df.collect()}


def test_index_stats_simjoin(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 4 == 0),
                              store, threshold=0.5, n_buckets=4)
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1))
    kv = _kv(index_stats(spark, store))
    assert kv[("store", "family")] == "simjoin"
    assert kv[("store", "pending_intent")] == "false"
    assert kv[("meta", "append_epoch")] == "1"
    assert kv[("store", "refreeze_recommended")] in ("true", "false")
    assert int(kv[("prefix", "n_files")]) > 0
    assert int(kv[("docs", "bytes")]) > 0
    # 1 build + 1 append, <= 1 file per bucket each
    assert int(kv[("prefix", "max_files_per_bucket")]) == 2
    # compaction restores 1 file per bucket -- the metric IS the
    # compaction trigger
    index_compact(spark, store)
    kv = _kv(index_stats(spark, store))
    assert int(kv[("prefix", "max_files_per_bucket")]) == 1


def test_index_stats_report_is_one_partition(spark, sf_dir, tmp_path):
    """The report is a few dozen driver-built rows; it must ship as ONE
    partition (round 16: a defaultParallelism-sliced tiny frame makes
    any take()/first() walk empty slices through sequential mini-jobs)
    and the simjoin drift dict must agree with the DataFrame wrapper."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 4 == 0),
                              store, threshold=0.5, n_buckets=4)
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1))
    report = index_stats(spark, store)
    assert report.rdd.getNumPartitions() == 1
    stats_df = dedup.simjoin_store_stats(spark, store)
    assert stats_df.rdd.getNumPartitions() == 1
    assert (stats_df.first().asDict()
            == dedup.simjoin_store_stats_row(spark, store))


def test_index_stats_bm25(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "bm25")
    ta.build_bm25_index(docs.where(F.col("doc_id") % 2 == 0), store,
                        n_buckets=4)
    ta.bm25_index_append(spark, store,
                         docs.where(F.col("doc_id") % 2 == 1),
                         batch_id=5)
    kv = _kv(index_stats(spark, store))
    assert kv[("store", "family")] == "bm25_index"
    assert kv[("meta", "last_batch_id")] == "5"
    assert int(kv[("meta", "n_docs")]) == docs.count()
    assert int(kv[("postings", "max_files_per_bucket")]) == 2
    assert int(kv[("doclen", "n_files")]) > 0


def test_index_stats_components_and_profile(spark, tmp_path):
    from automated_review_analysis_pipeline_spark.operators.quality import (
        build_profile_store,
        profile_append,
    )
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_components_store,
        components_append,
    )

    comp = str(tmp_path / "comp")
    build_components_store(
        spark.createDataFrame([(2, 1)], "a long, b long"), comp)
    for i in (3, 4):
        components_append(
            spark, comp,
            spark.createDataFrame([(i, i - 1)], "a long, b long"))
    kv = _kv(index_stats(spark, comp))
    assert kv[("store", "family")] == "components"
    assert kv[("meta", "version")] == "2"
    assert kv[("meta", "base")] == "0"
    assert kv[("store", "versions_live")] == "3"

    prof = str(tmp_path / "prof")
    d = spark.createDataFrame([(1, "aa"), (2, "bb")],
                              "doc_id long, text string")
    build_profile_store(d.where(F.col("doc_id") == 1), prof)
    profile_append(spark, prof, d.where(F.col("doc_id") == 2))
    kv = _kv(index_stats(spark, prof))
    assert kv[("store", "family")] == "profile"
    assert kv[("meta", "version")] == "1"
    assert int(kv[("registers", "bytes")]) > 0


def test_index_stats_ivfpq_and_pending(spark, sf_dir, tmp_path,
                                       monkeypatch):
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_ivfpq_index,
    )

    e = load_table(spark, sf_dir, "embeddings") \
        .where(F.col("vec_id") < 80)
    store = str(tmp_path / "ivfpq")
    build_ivfpq_index(e, store, n_centroids=4, train_iterations=1,
                      m=8, ksub=8)
    kv = _kv(index_stats(spark, store))
    assert kv[("store", "family")] == "ivfpq"
    assert int(kv[("codes", "n_files")]) > 0
    assert int(kv[("codebooks", "bytes")]) > 0

    # a crashed append's unresolved intent is surfaced
    sj = str(tmp_path / "sj2")
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").where(F.col("doc_id") < 40)
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 2 == 0),
                              sj, threshold=0.5, n_buckets=2)
    real = dedup._write_prefix_bucketed
    monkeypatch.setattr(
        dedup, "_write_prefix_bucketed",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError):
        dedup.simjoin_append(spark, sj,
                             docs.where(F.col("doc_id") % 2 == 1))
    monkeypatch.setattr(dedup, "_write_prefix_bucketed", real)
    kv = _kv(index_stats(spark, sj))
    assert kv[("store", "pending_intent")] == "true"


def test_index_stats_unknown_layout_raises(spark, tmp_path):
    (tmp_path / "x").mkdir()
    with pytest.raises(ValueError, match="not a recognized"):
        index_stats(spark, str(tmp_path / "x"))


def test_index_compact_and_stats_bare_signature_store(spark, tmp_path):
    """The MinHash signature store is a bare parquet dataset (no
    sidecar): index_compact coalesces it, index_stats reports it --
    every persisted store family has an OPTIMIZE + introspection
    path."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        build_signature_table,
    )

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with words") for i in range(40)],
        "doc_id long, text string")
    store = str(tmp_path / "sigs")
    build_signature_table(docs.where(F.col("doc_id") < 20), store)
    build_signature_table(docs.where(F.col("doc_id") >= 20), store,
                          mode="append")
    kv = _kv(index_stats(spark, store))
    assert kv[("store", "family")] == "parquet"
    before = int(kv[("data", "n_files")])
    rows = sorted(tuple(r) for r in
                  spark.read.parquet(store).collect())
    b, a = index_compact(spark, store)["data"]
    assert b == before
    assert a < b
    assert sorted(tuple(r) for r in
                  spark.read.parquet(store).collect()) == rows
