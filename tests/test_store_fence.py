"""Round-15 writer fencing: the single-writer contract becomes a
checked lease instead of a convention. A fenced store rejects any
mutator not holding the CURRENT token; handoff instantly stales the
old token; release returns the store to unfenced operation; unfenced
stores behave exactly as before (all pre-round-15 tests unchanged)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import store_fence
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.operators import (
    textanalysis as ta,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table

FencedStoreError = store_fence.FencedStoreError


def _sj_store(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)
    return docs, store


def test_unfenced_store_mutates_as_before(spark, sf_dir, tmp_path):
    docs, store = _sj_store(spark, sf_dir, tmp_path)
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1))


def test_fenced_store_rejects_unfenced_mutators(
        spark, sf_dir, tmp_path):
    """The VERDICT's scenario: a stream owns the store; a concurrent
    batch append without the token must fail fast instead of
    interleaving staged commits."""
    docs, store = _sj_store(spark, sf_dir, tmp_path)
    token = store_fence.fence_acquire(spark, store, "stream-1")
    delta = docs.where(F.col("doc_id") % 4 == 1)
    with pytest.raises(FencedStoreError, match="fenced by writer"):
        dedup.simjoin_append(spark, store, delta)
    with pytest.raises(FencedStoreError, match="fenced by writer"):
        dedup.simjoin_delete(spark, store, [0])
    with pytest.raises(FencedStoreError, match="fenced by writer"):
        dedup.simjoin_refreeze(spark, store)
    from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E501
        index_compact,
    )
    with pytest.raises(FencedStoreError, match="fenced by writer"):
        index_compact(spark, store)
    # the owner proceeds normally
    dedup.simjoin_append(spark, store, delta, fence=token)
    index_compact(spark, store, fence=token)


def test_handoff_stales_old_token(spark, sf_dir, tmp_path):
    docs, store = _sj_store(spark, sf_dir, tmp_path)
    t1 = store_fence.fence_acquire(spark, store, "stream-1")
    t2 = store_fence.fence_acquire(spark, store, "stream-2")
    assert t2["epoch"] > t1["epoch"]
    delta = docs.where(F.col("doc_id") % 4 == 1)
    with pytest.raises(FencedStoreError, match="stale fence token"):
        dedup.simjoin_append(spark, store, delta, fence=t1)
    dedup.simjoin_append(spark, store, delta, fence=t2)
    # same owner name re-acquiring also stales the previous epoch
    t3 = store_fence.fence_acquire(spark, store, "stream-2")
    with pytest.raises(FencedStoreError, match="stale fence token"):
        dedup.simjoin_refreeze(spark, store, fence=t2)
    dedup.simjoin_refreeze(spark, store, fence=t3)


def test_release_returns_store_to_unfenced(spark, sf_dir, tmp_path):
    docs, store = _sj_store(spark, sf_dir, tmp_path)
    token = store_fence.fence_acquire(spark, store, "stream-1")
    store_fence.fence_release(spark, store, token)
    # unfenced again: plain mutators work, the released token is dead
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1))
    with pytest.raises(FencedStoreError, match="stale fence token"):
        dedup.simjoin_append(
            spark, store, docs.where(F.col("doc_id") % 4 == 2),
            fence=token)
    # a releases-twice / foreign release is rejected
    with pytest.raises(FencedStoreError):
        store_fence.fence_release(spark, store, token)


def test_fence_guards_bm25_and_components(spark, sf_dir, tmp_path):
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_components_store,
        components_append,
        components_compact,
        components_delete,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bm = str(tmp_path / "bm25")
    ta.build_bm25_index(docs.where(F.col("doc_id") % 2 == 0), bm)
    tok = store_fence.fence_acquire(spark, bm, "owner")
    with pytest.raises(FencedStoreError):
        ta.bm25_index_append(spark, bm,
                             docs.where(F.col("doc_id") % 2 == 1))
    with pytest.raises(FencedStoreError):
        ta.bm25_index_delete(spark, bm, [0])
    ta.bm25_index_append(spark, bm,
                         docs.where(F.col("doc_id") % 2 == 1),
                         fence=tok)

    comp = str(tmp_path / "comp")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    build_components_store(edges, comp)
    ctok = store_fence.fence_acquire(spark, comp, "owner")
    more = spark.createDataFrame([(3, 4)], "a long, b long")
    with pytest.raises(FencedStoreError):
        components_append(spark, comp, more)
    with pytest.raises(FencedStoreError):
        components_delete(spark, comp, [1], edges)
    with pytest.raises(FencedStoreError):
        components_compact(spark, comp)
    components_append(spark, comp, more, fence=ctok)
