"""Store compaction: repeated appends accumulate small parquet files
inside every persisted index; index_compact rewrites each part to its
densest layout WITHOUT changing any result -- pairs, probes, and
further appends are equal before and after, and the layout invariants
(cell partitioning, prefix bucketing) survive."""
from __future__ import annotations

from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators import (
    dedup,
    similarity as sim,
)
from automated_review_analysis_pipeline_spark.operators.partitioning import (
    index_compact,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_simjoin_store_compaction_preserves_everything(
        spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 4 == 0),
                              store, threshold=0.5)
    for m in (1, 2):
        dedup.simjoin_append(spark, store,
                             docs.where(F.col("doc_id") % 4 == m))
    before_pairs = _rows(spark.read.parquet(store + "/pairs"))
    before_prefix = _rows(spark.read.parquet(store + "/prefix"))
    report = index_compact(spark, store)
    # every part compacted, none grew
    assert set(report) == {"pairs", "docs", "dfreq", "prefix"}
    for part, (b, a) in report.items():
        assert a <= b and a >= 1, (part, b, a)
    assert report["prefix"][1] <= 8  # one file per bucket
    # results identical
    assert _rows(spark.read.parquet(store + "/pairs")) == before_pairs
    assert _rows(spark.read.parquet(store + "/prefix")) == before_prefix
    # the store still appends correctly after compaction, and the
    # accumulated pair set still equals the one-shot recompute
    dedup.simjoin_append(spark, store, docs.where(F.col("doc_id") % 4 == 3))
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    want = _rows(dedup.set_similarity_join(docs, threshold=0.5))
    assert got == want


def test_ivfpq_store_compaction_preserves_probes(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(emb.where(F.col("vec_id") % 3 == 0), store,
                          n_centroids=4, m=4, ksub=8, train_n=128)
    for m in (1, 2):
        sim.ivfpq_index_append(spark, store,
                               emb.where(F.col("vec_id") % 3 == m))
    queries = emb.where(F.col("vec_id") < 5)
    before = _rows(sim.ivfpq_probe(spark, store, queries, k=3, n_probe=2))
    n_before = fsio.count_files(spark, store + "/codes")
    report = index_compact(spark, store)
    assert report["codes"][0] == n_before
    assert report["codes"][1] < n_before
    # one file per cell directory
    after = _rows(sim.ivfpq_probe(spark, store, queries, k=3, n_probe=2))
    assert after == before
    # appends still encode against the same store post-compaction
    sim.ivfpq_index_append(spark, store, emb.where(F.col("vec_id") < 0))
    assert _rows(sim.ivfpq_probe(spark, store, queries, k=3,
                                 n_probe=2)) == before


def test_ivf_store_compaction_preserves_probes(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "ivf")
    sim.build_ivf_index(emb.where(F.col("vec_id") % 2 == 0), store,
                        n_centroids=4)
    sim.ivf_index_append(spark, store, emb.where(F.col("vec_id") % 2 == 1))
    queries = emb.where(F.col("vec_id") < 5)
    before = _rows(sim.ivf_probe(spark, store, queries, k=3, n_probe=2))
    report = index_compact(spark, store)
    b, a = report["corpus"]
    assert a <= b
    assert _rows(sim.ivf_probe(spark, store, queries, k=3,
                               n_probe=2)) == before


def test_index_compact_rejects_unknown_layout(spark, tmp_path):
    import pytest

    d = str(tmp_path / "not_a_store")
    spark.createDataFrame([(1,)], "x int").write.parquet(d + "/misc")
    with pytest.raises(ValueError, match="not a recognized"):
        index_compact(spark, d)


def test_simjoin_append_writes_bounded_files_per_bucket(
        spark, sf_dir, tmp_path):
    """Each bucketed prefix write (build or append) pre-shuffles onto
    the bucket hash, so it emits at most n_buckets files -- the
    small-file budget that makes a year of micro-batch appends
    livable: files <= n_buckets x (1 build + n appends)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 3 == 0),
                              store, threshold=0.5, n_buckets=4)
    for m in (1, 2):
        dedup.simjoin_append(spark, store,
                             docs.where(F.col("doc_id") % 3 == m))
    n = fsio.count_files(spark, store + "/prefix")
    assert n <= 4 * 3, n


def test_simjoin_refreeze_restores_selectivity_pairs_unchanged(
        spark, sf_dir, tmp_path):
    """Corpus-drift maintenance: build on clean docs, append a
    boilerplate-heavy delta (its shared token was UNSEEN at build time,
    so it ranks df=0 = rarest and floods every delta prefix). After
    simjoin_refreeze the candidate count must not increase -- on this
    fixture it strictly drops -- while the PAIR table is byte-identical
    and post-refreeze appends still accumulate the exact one-shot pair
    set."""
    from pyspark.sql import functions as F

    boiler = (" accept cookies subscribe newsletter rights reserved"
              " terms conditions apply privacy policy banner")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    drift = docs.where(F.col("doc_id") % 4 == 1).select(
        "doc_id", F.concat(F.col("text"), F.lit(boiler)).alias("text"))
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)
    dedup.simjoin_append(spark, store, drift)

    def n_candidates() -> int:
        pref = dedup._register_prefix_table(spark, store, 4)
        return dedup._simjoin_candidates(pref, pref, 0.5).count()

    pairs_before = _rows(spark.read.parquet(store + "/pairs"))
    cand_before = n_candidates()
    dedup.simjoin_refreeze(spark, store)
    cand_after = n_candidates()
    assert cand_after < cand_before, (cand_before, cand_after)
    assert _rows(spark.read.parquet(store + "/pairs")) == pairs_before
    # the refrozen store still appends exactly
    rest = docs.where(F.col("doc_id") % 4 == 2)
    dedup.simjoin_append(spark, store, rest)
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    full = base.unionByName(drift).unionByName(rest)
    want = _rows(dedup.set_similarity_join(full, threshold=0.5))
    assert got == want
