"""Incremental profile store: the persisted mergeable ANALYZE state.
The law under test: build(half A) + append(half B) + append(half C)
finalizes to EXACTLY the one-shot column_stats of A ∪ B ∪ C -- register
max-merge, count sums, bound min/max merges, same Flajolet estimate to
the last rounded digit."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.quality import (
    build_profile_store,
    column_stats,
    profile_append,
    profile_stats,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_two_appends_equal_oneshot(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    build_profile_store(d.where(F.col("doc_id") % 3 == 0), store)
    profile_append(spark, store, d.where(F.col("doc_id") % 3 == 1))
    got = profile_append(spark, store, d.where(F.col("doc_id") % 3 == 2))
    assert _rows(got) == _rows(column_stats(d))
    # finalizing from the store alone reproduces the same stats
    assert _rows(profile_stats(spark, store)) == _rows(column_stats(d))


def test_append_empty_delta_is_identity(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    base = build_profile_store(d, store)
    after = profile_append(spark, store, d.where(F.lit(False)))
    assert _rows(after) == _rows(base)


def test_append_schema_drift_raises(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    build_profile_store(d, store)
    with pytest.raises(ValueError, match="profiled schema"):
        profile_append(spark, store, d.drop("lang"))


def test_interrupted_append_leaves_previous_version_current(
        spark, sf_dir, tmp_path):
    """The meta.json flip is the commit point: a version directory
    written without the flip (a crash mid-append) must be invisible --
    profile_stats keeps serving the last committed version."""
    import os

    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    base = build_profile_store(d.where(F.col("doc_id") % 2 == 0), store)
    # simulate the crash: orphan v1 directory, meta still at v0
    os.makedirs(os.path.join(store, "registers", "v1"))
    assert _rows(profile_stats(spark, store)) == _rows(base)


def test_profile_vacuum_keeps_current_versions(spark, sf_dir, tmp_path):
    import os

    from automated_review_analysis_pipeline_spark.operators.quality import (
        profile_vacuum,
    )

    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    build_profile_store(d.where(F.col("doc_id") % 4 == 0), store)
    for m in (1, 2, 3):
        profile_append(spark, store, d.where(F.col("doc_id") % 4 == m))
    before = _rows(profile_stats(spark, store))
    removed = profile_vacuum(spark, store, keep=2)
    assert removed == [0, 1]
    kept = sorted(os.listdir(os.path.join(store, "registers")))
    assert kept == ["v2", "v3"]
    # current stats unaffected; vacuum is idempotent
    assert _rows(profile_stats(spark, store)) == before
    assert profile_vacuum(spark, store, keep=2) == []


def test_key_skew_report_hand_checked(spark):
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        key_skew_report,
    )

    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "user_id int")
    got = {r["key_rank"]: r for r in
           key_skew_report(df, ["user_id"], top_n=2).collect()}
    assert got[1]["key"] == "1" and got[1]["n_rows"] == 6
    assert got[1]["share"] == 0.5 and got[1]["cum_share"] == 0.5
    assert got[2]["key"] == "NULL" or got[2]["n_rows"] == 3
    assert got[1]["n_keys"] == 4 and got[1]["max_rows"] == 6
    # avg group = 3 -> skew_ratio = 2
    assert got[1]["skew_ratio"] == 2.0


def test_join_size_estimate_equals_actual_join(spark):
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        join_size_estimate,
    )

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k int")
    right = spark.createDataFrame(
        [(1,), (1,), (2,), (4,), (None,)], "k int")
    got = join_size_estimate(left, right, ["k"], top_n=2).collect()
    actual = left.join(right, "k").count()
    assert got[0]["total_rows"] == actual == 7  # 3*2 + 1*1
    assert got[0]["key_rank"] == 1 and got[0]["key"] == "1"
    assert got[0]["pair_rows"] == 6 and got[0]["n_matching_keys"] == 2
    # NULL keys are excluded, matching inner-equi-join semantics
    assert all(r["key"] != "NULL" for r in got)


def test_profile_merge_law_hypothesis(spark, sf_dir):
    """Property: ANY partition of the corpus into parts, appended in
    ANY order, finalizes to the one-shot profile exactly -- the
    associativity/commutativity the incremental store (and its
    streaming lane) rests on."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    d = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    want = _rows(column_stats(d))

    @settings(max_examples=5, deadline=None)
    @given(n_parts=st.integers(2, 4), salt=st.integers(0, 10**6),
           order=st.permutations(range(4)))
    def check(n_parts, salt, order):
        store = tempfile.mkdtemp(prefix="arap_prof_hyp_")
        part = F.pmod(F.xxhash64(F.col("doc_id") + salt),
                      F.lit(n_parts))
        parts = [d.where(part == i) for i in range(n_parts)]
        seq = [parts[i] for i in order if i < n_parts]
        build_profile_store(seq[0], store)
        for p in seq[1:]:
            profile_append(spark, store, p)
        assert _rows(profile_stats(spark, store)) == want

    check()


def test_profile_append_batch_id_replay_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: folding the SAME batch_id twice
    must leave the store (version and stats) unchanged -- the
    exactly-once guard of the streaming ANALYZE lane. A fresh, larger
    batch_id still folds."""
    from automated_review_analysis_pipeline_spark import fsio

    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "prof")
    build_profile_store(d.where(F.col("doc_id") % 2 == 0), store)
    profile_append(spark, store, d.where(F.col("doc_id") % 2 == 1),
                   batch_id=0)
    v1 = fsio.read_json(spark, store + "/meta.json")
    once = _rows(profile_stats(spark, store))
    # replay of batch 0: no-op (same stats, same version, same marker)
    profile_append(spark, store, d.where(F.col("doc_id") % 2 == 1),
                   batch_id=0)
    assert fsio.read_json(spark, store + "/meta.json") == v1
    assert _rows(profile_stats(spark, store)) == once
    assert once == _rows(column_stats(d))
    # a NEW batch id folds normally
    got = profile_append(spark, store, d.limit(0), batch_id=1)
    assert fsio.read_json(spark, store + "/meta.json")["last_batch_id"] == 1
    assert _rows(got) == once


def test_simjoin_append_batch_id_replay_is_noop(spark, tmp_path):
    """Replaying a completed simjoin_append with the same batch_id must
    not duplicate prefixes or pairs."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        build_simjoin_index,
        simjoin_append,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat")],
        "doc_id long, text string")
    store = str(tmp_path / "sj")
    build_simjoin_index(docs, store, threshold=0.5)
    delta = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    first = simjoin_append(spark, store, delta, batch_id=0).collect()
    n_prefix = spark.read.parquet(store + "/prefix").count()
    replay = simjoin_append(spark, store, delta, batch_id=0).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, replay))
    assert spark.read.parquet(store + "/prefix").count() == n_prefix


def test_key_skew_report_approx_percentile_bound(spark):
    """percentiles='approx' (the billion-key lane): p50/p99 come from
    Greenwald-Khanna -- an ELEMENT of the per-key count table within
    the documented rank error -- and every other column of the report
    is identical to the exact mode."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        key_skew_report,
    )

    # key i has i+1 rows -> per-key counts are exactly 1..200
    rows = [(f"k{i:03d}",) for i in range(200) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    exact = key_skew_report(df, ["k"], top_n=1).first()
    approx = key_skew_report(df, ["k"], top_n=1,
                             percentiles="approx").first()
    counts = list(range(1, 201))
    n = len(counts)
    for col, q in (("p50_rows", 0.5), ("p99_rows", 0.99)):
        v = approx[col]
        assert v in counts, (col, v)           # element, not interpolated
        rank = counts.index(int(v))            # 0-based rank
        assert abs(rank - q * (n - 1)) <= max(1.0, n / 10000 + 1), (col, v)
    for col in ("key_rank", "key", "n_rows", "share", "cum_share",
                "n_keys", "max_rows", "skew_ratio"):
        assert approx[col] == exact[col], col
    import pytest as _pytest
    with _pytest.raises(ValueError, match="percentiles"):
        key_skew_report(df, ["k"], percentiles="bogus")
