"""Round-15 ADVICE fixes:

* index_compact restamps each simjoin part's _order_epoch.json
  immediately after that part's swap, and _check_order_epoch heals
  the one clerical mismatch a compaction crash can leave (one stamp
  lost, other == meta) instead of demanding a full refreeze;
* a zero-candidate FIRST append no longer freezes as the drift
  baseline -- the first candidate-bearing append does;
* simjoin_append's replayed-batch early return heals a crashed
  compaction's half-swap before reading /pairs;
* components_append's inline auto-compact vacuums with keep=2 (one
  pre-base rollback snapshot retained);
* fsio's private-FS cache keys on the Hadoop configuration identity
  and exposes an invalidation hook.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _refrozen_store(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)
    dedup.simjoin_refreeze(spark, store)  # epoch 1 on both parts
    return docs, base, store


def test_compact_restamps_each_part_inline(spark, sf_dir, tmp_path):
    """After index_compact, BOTH epoch-bearing parts carry the stamp
    again -- and the restamp happens per-part (dfreq's stamp is back
    even if the later prefix compaction were to die)."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        index_compact,
    )

    docs, base, store = _refrozen_store(spark, sf_dir, tmp_path)
    index_compact(spark, store)
    assert dedup._part_order_epoch(spark, store + "/dfreq") == 1
    assert dedup._part_order_epoch(spark, store + "/prefix") == 1
    assert dedup._check_order_epoch(spark, store) == 1


def test_lost_stamp_heals_from_meta_when_other_matches(
        spark, sf_dir, tmp_path):
    """The compaction-crash shape: one part's stamp gone (epoch 0),
    the other still == meta's order_epoch. _check_order_epoch restamps
    from meta and appends proceed exactly -- no refreeze needed."""
    docs, base, store = _refrozen_store(spark, sf_dir, tmp_path)
    fsio.delete(spark, store + "/dfreq/_order_epoch.json")
    assert dedup._part_order_epoch(spark, store + "/dfreq") == 0
    # heals instead of raising, restamping dfreq
    assert dedup._check_order_epoch(spark, store) == 1
    assert dedup._part_order_epoch(spark, store + "/dfreq") == 1
    delta = docs.where(F.col("doc_id") % 4 == 1)
    dedup.simjoin_append(spark, store, delta)
    want = _rows(dedup.set_similarity_join(base.unionByName(delta),
                                           threshold=0.5))
    got = _rows(spark.read.parquet(store + "/pairs")
                .select("a_id", "b_id", "n_common", "jaccard"))
    assert got == want


def test_genuine_mixed_refreeze_state_still_raises(
        spark, sf_dir, tmp_path):
    """A half-swapped refreeze (one part at meta+1, other at meta)
    must NOT be confused with the healable lost-stamp shape."""
    docs, base, store = _refrozen_store(spark, sf_dir, tmp_path)
    fsio.write_json(spark, store + "/prefix/_order_epoch.json",
                    {"order_epoch": 2})
    with pytest.raises(RuntimeError, match="MIXED token order"):
        dedup._check_order_epoch(spark, store)


def test_zero_candidate_first_append_does_not_freeze_baseline(
        spark, tmp_path):
    """A stream-start store whose first micro-batch generates no
    candidates must still arm the drift trigger once candidate-bearing
    appends arrive (round-15 ADVICE: baseline was frozen at stats[0]
    forever, density 0 -> None -> trigger permanently disarmed)."""
    store = str(tmp_path / "sj")
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup.build_simjoin_index(empty, store, threshold=0.5, n_buckets=4)
    # batch 1: two totally dissimilar docs -> zero candidates
    dedup.simjoin_append(spark, store, spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string"))
    meta = fsio.read_json(spark, store + "/meta.json")
    assert not (meta.get("baseline_append") or {}).get("n_candidates")
    # batch 2: near-duplicates -> candidates recorded
    dedup.simjoin_append(spark, store, spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta eta"),
         (4, "alpha beta gamma delta epsilon zeta theta")],
        "doc_id long, text string"))
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta["baseline_append"]["n_candidates"] > 0
    st = dedup.simjoin_store_stats(spark, store).first()
    assert st["build_cand_density"] is not None


def test_replayed_batch_heals_half_swapped_pairs_dir(
        spark, sf_dir, tmp_path):
    """A compaction that died between its pairs-dir renames leaves
    /pairs renamed aside; a REPLAYED batch (batch_id <= recorded) must
    heal the swap before its early-return read, like the non-replay
    path (round-15 ADVICE: it crashed on the missing path instead)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sj")
    dedup.build_simjoin_index(base, store, threshold=0.5, n_buckets=4)
    dedup.simjoin_append(spark, store,
                         docs.where(F.col("doc_id") % 4 == 1),
                         batch_id=7)
    want = _rows(spark.read.parquet(store + "/pairs"))
    # simulate the compaction crash window: live dir renamed aside
    fsio.rename(spark, store + "/pairs", store + "/pairs.__old__")
    got = dedup.simjoin_append(
        spark, store, docs.where(F.col("doc_id") % 4 == 1), batch_id=7)
    assert _rows(got) == want  # healed AND replay stayed a no-op


def test_inline_auto_compact_keeps_one_prebase_version(spark, tmp_path):
    """components_append's inline re-base retains one pre-base
    snapshot (keep=2): the manual-rollback margin and mid-fold reader
    grace the bare keep=1 vacuum removed (round-15 ADVICE)."""
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_components_store,
        components_append,
        components_read,
    )

    store = str(tmp_path / "comp")
    build_components_store(
        spark.createDataFrame([(2, 1)], "a long, b long"), store)
    for i in (3, 4, 5, 6, 7):
        components_append(
            spark, store,
            spark.createDataFrame([(i, i - 1)], "a long, b long"),
            auto_compact_every=3)
    meta = fsio.read_json(spark, store + "/meta.json")
    assert meta["base"] > 0  # at least one inline re-base happened
    live = sorted(int(d[1:]) for d in
                  fsio.list_dirs(spark, store + "/labels"))
    below_base = [v for v in live if v < meta["base"]]
    assert len(below_base) == 1, (live, meta)  # exactly one kept
    assert _rows(components_read(spark, store)) == [
        (n, 1) for n in range(1, 8)]


def test_fs_cache_keys_on_conf_identity(spark, tmp_path):
    """Same conf object -> same cached instance; invalidate_fs_cache
    -> a NEW private instance (the explicit hook for in-place
    hadoopConfiguration mutation)."""
    p = str(tmp_path / "probe.json")
    fsio.write_json(spark, p, {"x": 1})
    fs1, _, _ = fsio._new_fs(spark, p)
    fs2, _, _ = fsio._new_fs(spark, p)
    assert fs1.hashCode() == fs2.hashCode()
    fsio.invalidate_fs_cache()
    fs3, _, _ = fsio._new_fs(spark, p)
    assert fs3.hashCode() != fs1.hashCode()
    assert fsio.read_json(spark, p) == {"x": 1}
