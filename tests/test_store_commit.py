"""Staged-append commit protocol: a crash in the MIDDLE of a
multi-part in-place append (simjoin pairs/prefix/docs, BM25
postings/doclen) rolls back on the next touch, and the retried batch
folds exactly once -- closing the window that batch_id alone (which
only guards COMPLETED appends) left open."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio, store_commit
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.operators import (
    textanalysis as ta,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "entirely different words live here today now"),
    (4, "pack my box with five dozen liquor jugs tonight"),
]
DELTA = [
    (5, "the quick brown fox jumps over the lazy dog today"),
    (6, "pack my box with five dozen liquor jugs tonight friend"),
]


def _pairs(df):
    return sorted((r["a_id"], r["b_id"], r["n_common"], r["jaccard"])
                  for r in df.collect())


def test_simjoin_kill_mid_append_rolls_back_and_refolds(
        spark, tmp_path, monkeypatch):
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA, "doc_id long, text string")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5)
    docs_before = spark.read.parquet(store + "/docs").count()
    pairs_before = spark.read.parquet(store + "/pairs").count()

    # crash AFTER the pairs append, BEFORE prefix/docs (the worst
    # window: a replay without rollback would duplicate pairs)
    real = dedup._write_prefix_bucketed

    def boom(*a, **kw):
        raise RuntimeError("injected crash between part appends")

    monkeypatch.setattr(dedup, "_write_prefix_bucketed", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        dedup.simjoin_append(spark, store, delta, batch_id=7)
    monkeypatch.setattr(dedup, "_write_prefix_bucketed", real)

    # partial state IS on disk (pairs appended, docs not), and the
    # intent records it
    assert fsio.exists(spark, store + "/pending.json")
    assert spark.read.parquet(store + "/pairs").count() > pairs_before
    assert spark.read.parquet(store + "/docs").count() == docs_before
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta.get("append_epoch", 0) == 0  # commit never happened

    # the replayed batch repairs, then folds EXACTLY once: the
    # accumulated store equals the one-shot join over the full corpus
    got = dedup.simjoin_append(spark, store, delta, batch_id=7)
    want = dedup.set_similarity_join(
        base.unionByName(delta), threshold=0.5)
    assert _pairs(got) == _pairs(want)
    assert got.count() == got.distinct().count()
    assert not fsio.exists(spark, store + "/pending.json")
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta["append_epoch"] == 1 and meta["last_batch_id"] == 7
    # store parts are exactly one clean append past the build
    assert (spark.read.parquet(store + "/docs").count()
            == docs_before + len(DELTA))
    pref = spark.read.parquet(store + "/prefix")
    assert pref.count() == pref.select("id", "tok").distinct().count()


def test_simjoin_intent_of_committed_append_is_dropped_not_rolled_back(
        spark, tmp_path):
    """Crash between the meta flip (commit point) and the intent
    cleanup: repair must DROP the intent, not delete the committed
    append's files."""
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA, "doc_id long, text string")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5)
    # snapshot pre-append listings, as begin_append would have
    snap = {p: fsio.list_files(spark, store + "/" + p)
            for p in ("pairs", "prefix", "docs")}
    got = dedup.simjoin_append(spark, store, delta, batch_id=1)
    after = _pairs(got)
    # re-create the intent as if cleanup was lost (epoch == committed)
    fsio.write_json(spark, store + "/pending.json",
                    {"epoch": 1, "parts": snap})
    assert store_commit.repair(spark, store, 1) is False
    assert not fsio.exists(spark, store + "/pending.json")
    assert _pairs(spark.read.parquet(store + "/pairs")) == after


def test_bm25_kill_mid_append_rolls_back_and_refolds(
        spark, tmp_path, monkeypatch):
    docs = spark.createDataFrame(DOCS + DELTA, "doc_id long, text string")
    base = docs.where(F.col("doc_id") <= 4)
    delta = docs.where(F.col("doc_id") > 4)
    store = str(tmp_path / "bm25")
    ta.build_bm25_index(base, store, n_buckets=2)
    postings_before = spark.read.parquet(store + "/postings").count()

    # crash AFTER both data appends, BEFORE the meta flip: without
    # rollback the replay re-appends postings, doubling tf and df
    real_write_json = fsio.write_json

    def boom(spark_, path, obj, **kw):
        if path.endswith("meta.json"):
            raise RuntimeError("injected crash before commit point")
        return real_write_json(spark_, path, obj, **kw)

    monkeypatch.setattr(fsio, "write_json", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ta.bm25_index_append(spark, store, delta, batch_id=3)
    monkeypatch.setattr(fsio, "write_json", real_write_json)

    assert fsio.exists(spark, store + "/pending.json")
    assert (spark.read.parquet(store + "/postings").count()
            > postings_before)

    ta.bm25_index_append(spark, store, delta, batch_id=3)
    q = ("the", "quick", "box", "today")
    got = [tuple(r) for r in
           ta.bm25_index_search(spark, store, q, k=10).collect()]
    want = [tuple(r) for r in ta.bm25_search(docs, q, k=10).collect()]
    assert got == want and got
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta["append_epoch"] == 1 and meta["last_batch_id"] == 3
    post = spark.read.parquet(store + "/postings")
    assert post.count() == post.select("doc_id", "word").distinct().count()


def test_compact_killed_mid_swap_heals_on_next_append(
        spark, tmp_path, monkeypatch):
    """Review finding: a compaction dying between its two swap renames
    used to leave the live part dir MISSING -- the next append would
    silently re-register an EMPTY location and serve truncated scores.
    The swap is now rename-aside and every appender heals it."""
    from automated_review_analysis_pipeline_spark.operators import (
        partitioning as pt,
    )

    docs = spark.createDataFrame(DOCS + DELTA, "doc_id long, text string")
    store = str(tmp_path / "bm25")
    ta.build_bm25_index(docs.where(F.col("doc_id") <= 4), store,
                        n_buckets=2)
    q = ("the", "quick", "box", "today")

    real = fsio.rename
    calls = {"n": 0}

    def boom(spark_, src, dst):
        calls["n"] += 1
        if calls["n"] >= 2:  # postings renamed aside; kill tmp->live
            raise IOError("injected crash mid compaction swap")
        return real(spark_, src, dst)

    monkeypatch.setattr(fsio, "rename", boom)
    with pytest.raises(IOError, match="injected"):
        pt.index_compact(spark, store)
    monkeypatch.undo()
    # live postings dir is gone; the previous bytes sit renamed aside
    assert not fsio.exists(spark, store + "/postings")
    assert fsio.exists(spark, store + "/postings.__old__")

    # next append HEALS, then folds -- scores equal one-shot exactly
    ta.bm25_index_append(spark, store,
                         docs.where(F.col("doc_id") > 4), batch_id=1)
    got = [tuple(r) for r in
           ta.bm25_index_search(spark, store, q, k=10).collect()]
    want = [tuple(r) for r in ta.bm25_search(docs, q, k=10).collect()]
    assert got == want and got
    assert not fsio.exists(spark, store + "/postings.__old__")
    # and a re-run compaction completes cleanly
    report = pt.index_compact(spark, store)
    assert report["postings"][1] <= report["postings"][0]
    got2 = [tuple(r) for r in
            ta.bm25_index_search(spark, store, q, k=10).collect()]
    assert got2 == want
