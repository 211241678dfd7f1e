"""Round-14 simjoin store guarantees:

* the append VERIFY stage never scans/shuffles the full accumulated
  /docs (bounded-candidate static IN with bucket pruning; bucketed
  exchange-free store side in the flood lane) -- plan-gated;
* simjoin_refreeze is crash-safe: an interrupted refreeze leaves the
  old order serving, and the one mixed state a crash between the two
  part swaps can produce is DETECTED (epoch stamps) and fails fast
  instead of silently voiding the prefix filter's completeness;
* simjoin_store_stats is the auto-drift trigger for refreeze.
"""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.sources.tables import load_table

BOILER = (" accept cookies subscribe newsletter rights reserved"
          " terms conditions apply privacy policy banner")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _append_inputs(spark, store, delta, threshold=0.5, k=3):
    """Replicate simjoin_append's delta preprocessing (checkpointed
    prefix/arrs + candidate set) so tests can gate the verify plan."""
    dfreq = spark.read.parquet(store + "/dfreq")
    toks = (delta.select(F.col("doc_id").alias("id"), "text")
            .withColumn("__toks", dedup.shingle_tokens(F.col("text")))
            .select("id", F.explode(dedup.word_shingles_from_tokens(
                F.col("__toks"), k)).alias("tok")))
    new_arrs = toks.groupBy("id").agg(
        F.sort_array(F.collect_list("tok")).alias("toks"),
        F.count(F.lit(1)).alias("sz")).localCheckpoint(eager=True)
    new_prefix = dedup._simjoin_prefix(toks, dfreq, threshold) \
        .localCheckpoint(eager=True)
    nb = fsio.read_json(spark, store + "/meta.json")["n_buckets"]
    store_prefix = dedup._register_prefix_table(spark, store, nb)
    cand = (dedup._cross_candidates_canonical(new_prefix, store_prefix,
                                              threshold)
            .unionByName(dedup._simjoin_candidates(
                new_prefix, new_prefix, threshold))
            .distinct().localCheckpoint(eager=True))
    return cand, new_arrs


def test_verify_stage_never_scans_full_docs(spark, sf_dir, tmp_path):
    """Plan gates for both verify lanes, with broadcast disabled (the
    round-13 plan degraded to a full /docs shuffle exactly when
    candidates exceeded the broadcast threshold)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "text")
        store = str(tmp_path / "sj")
        dedup.build_simjoin_index(docs.where(F.col("doc_id") % 2 == 0),
                                  store, threshold=0.5)
        meta = fsio.read_json(spark, store + "/meta.json")
        docs_tbl = dedup._register_docs_table(spark, store,
                                              meta["docs_buckets"])
        cand, new_arrs = _append_inputs(
            spark, store, docs.where(F.col("doc_id") % 16 == 1))

        # bounded lane: the store scan is pruned to the candidate
        # ids' buckets -- SelectedBucketsCount strictly below total
        pruned = dedup._simjoin_verify_store(cand, docs_tbl, new_arrs,
                                             0.5)
        p = pruned._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", p)
        assert m and int(m.group(1)) < int(m.group(2)), p

        # SEMI lane (forced): the old-id table broadcasts onto the
        # store scan -- one pass over /docs, ZERO store-side shuffle
        semi = dedup._simjoin_verify_store(cand, docs_tbl, new_arrs,
                                           0.5, max_in_ids=0)
        p = semi._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p, p

        # flood lane (forced): verify joins run against the BUCKETED
        # docs table -- store side reads pre-partitioned, the only
        # hash exchanges are the candidate side's (a_id, then b_id)
        flood = dedup._simjoin_verify_store(cand, docs_tbl, new_arrs,
                                            0.5, max_in_ids=0,
                                            max_semi_ids=0)
        p = flood._jdf.queryExecution().executedPlan().toString()
        assert p.count("Bucketed: true") == 2, p
        assert p.count("Exchange hashpartitioning") == 2, p

        # all three lanes compute the same exact pairs as plain verify
        all_arrs = spark.read.parquet(store + "/docs") \
            .unionByName(new_arrs)
        want = _rows(dedup._simjoin_verify(cand, all_arrs, 0.5))
        assert _rows(pruned) == want
        assert _rows(semi) == want
        assert _rows(flood) == want and want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_refreeze_staging_crash_leaves_old_order_serving(
        spark, sf_dir, tmp_path, monkeypatch):
    """A refreeze that dies before (or during) its first swap changes
    nothing: the live parts still carry the old order, epochs agree,
    and appends keep accumulating the exact pair set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)
    pairs0 = _rows(spark.read.parquet(store + "/pairs"))

    def boom(spark_, src, dst):
        raise IOError("injected rename failure")

    monkeypatch.setattr(fsio, "rename", boom)
    with pytest.raises(IOError, match="injected"):
        dedup.simjoin_refreeze(spark, store)
    monkeypatch.undo()

    assert _rows(spark.read.parquet(store + "/pairs")) == pairs0
    assert dedup._check_order_epoch(spark, store) == 0
    delta = docs.where(F.col("doc_id") % 4 == 1)
    dedup.simjoin_append(spark, store, delta)
    want = _rows(dedup.set_similarity_join(base.unionByName(delta),
                                           threshold=0.5))
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    assert got == want


def test_refreeze_crash_between_swaps_detected_and_repaired(
        spark, sf_dir, tmp_path, monkeypatch):
    """The one mixed state: prefix swapped to the new order, dfreq
    still old. Appends FAIL FAST (epoch stamps disagree) instead of
    ranking deltas under a different order than the store; re-running
    the refreeze repairs, after which appends are exact again."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)

    real = fsio.rename
    calls = {"n": 0}

    def boom(spark_, src, dst):
        calls["n"] += 1
        if calls["n"] >= 3:  # prefix swap done (2 renames); kill dfreq's
            raise IOError("injected crash between part swaps")
        return real(spark_, src, dst)

    monkeypatch.setattr(fsio, "rename", boom)
    with pytest.raises(IOError, match="injected"):
        dedup.simjoin_refreeze(spark, store)
    monkeypatch.undo()

    delta = docs.where(F.col("doc_id") % 4 == 1)
    with pytest.raises(RuntimeError, match="MIXED token order"):
        dedup.simjoin_append(spark, store, delta)
    dedup.simjoin_refreeze(spark, store)  # repair
    assert dedup._check_order_epoch(spark, store) == 2
    dedup.simjoin_append(spark, store, delta)
    want = _rows(dedup.set_similarity_join(base.unionByName(delta),
                                           threshold=0.5))
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    assert got == want


def test_refreeze_crash_mid_swap_restores_part(
        spark, sf_dir, tmp_path, monkeypatch):
    """Death INSIDE a part swap (live renamed aside, replacement not
    in): the next append heals by renaming the old part back."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)

    real = fsio.rename
    calls = {"n": 0}

    def boom(spark_, src, dst):
        calls["n"] += 1
        if calls["n"] >= 2:  # prefix renamed aside; kill tmp->live
            raise IOError("injected crash mid swap")
        return real(spark_, src, dst)

    monkeypatch.setattr(fsio, "rename", boom)
    with pytest.raises(IOError, match="injected"):
        dedup.simjoin_refreeze(spark, store)
    monkeypatch.undo()
    assert not fsio.exists(spark, store + "/prefix")
    assert fsio.exists(spark, store + "/prefix.__old__")

    delta = docs.where(F.col("doc_id") % 4 == 1)
    dedup.simjoin_append(spark, store, delta)  # heals, then appends
    assert fsio.exists(spark, store + "/prefix")
    assert not fsio.exists(spark, store + "/prefix.__old__")
    want = _rows(dedup.set_similarity_join(base.unionByName(delta),
                                           threshold=0.5))
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    assert got == want


def test_simjoin_store_stats_drift_trigger(spark, sf_dir, tmp_path):
    """The refreeze trigger: a clean append stays under the drift
    threshold; a boilerplate-flooded append trips it; the refreeze
    resets the records (they measured the old order)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(docs.where(F.col("doc_id") % 4 == 0),
                              store, threshold=0.5, n_buckets=4)
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1))
    clean = dedup.simjoin_store_stats(spark, store).first()
    assert clean["n_appends_recorded"] == 1
    assert clean["drift_ratio"] is not None
    assert not clean["refreeze_recommended"], clean

    drift = docs.where(F.col("doc_id") % 4 == 2).select(
        "doc_id", F.concat(F.col("text"), F.lit(BOILER)).alias("text"))
    dedup.simjoin_append(spark, store, drift)
    tripped = dedup.simjoin_store_stats(spark, store).first()
    assert tripped["refreeze_recommended"], tripped
    assert tripped["drift_ratio"] > clean["drift_ratio"]

    dedup.simjoin_refreeze(spark, store)
    reset = dedup.simjoin_store_stats(spark, store).first()
    assert reset["n_appends_recorded"] == 0
    assert reset["drift_ratio"] is None
    assert not reset["refreeze_recommended"]
    assert reset["order_epoch"] == 1


def test_streaming_auto_refreeze_fires_and_pairs_stay_exact(
        spark, sf_dir, tmp_path):
    """The CLOSED maintenance loop: a stream whose later batches carry
    post-build boilerplate trips the drift trigger mid-drain and
    simjoin_refreeze runs inline (order_epoch advances); the drained
    pair set is refreeze-invariant and still equals the one-shot
    recompute. Batch order is pinned via file modification times
    (FileStreamSource drains oldest-first)."""
    import glob
    import os
    import shutil

    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_set_similarity,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clean = docs.where(F.col("doc_id") % 2 == 0)
    drifted = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.concat(F.col("text"), F.lit(BOILER)).alias("text"))
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_file(df, name, mtime):
        tmp = str(tmp_path / ("w_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = os.path.join(src, name + ".parquet")
        shutil.move(part, dst)
        os.utime(dst, (mtime, mtime))

    add_file(clean, "a_clean", 1_000_000_000)
    add_file(drifted, "b_drift", 1_000_000_100)

    work = str(tmp_path / "work")
    got = streaming_set_similarity(spark, src, work,
                                   max_files_per_trigger=1,
                                   threshold=0.5,
                                   auto_refreeze_ratio=3.0)
    store = work + "/simjoin_store"
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta.get("order_epoch", 0) >= 1, meta  # maintenance fired
    assert meta["append_stats"] == []  # trigger re-armed
    want = dedup.set_similarity_join(clean.unionByName(drifted),
                                     threshold=0.5)
    assert _rows(got.select("a_id", "b_id", "n_common", "jaccard")) \
        == _rows(want)
