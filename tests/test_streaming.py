"""Structured Streaming: batch/stream parity for tumbling windows and
session windows (trigger=availableNow into a memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.events import (
    session_stats,
    tumbling_window_agg,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table
from automated_review_analysis_pipeline_spark.streaming.events_stream import (
    read_events_stream,
    run_available_now,
    streaming_session_stats,
    streaming_tumbling_counts,
)

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def stream(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_events_stream(spark, EVENTS_PATH)


def test_watermark_drops_late_batch(spark, tmp_path):
    """Late-data semantics, demonstrated rather than assumed: batch 1
    advances the watermark past a cutoff; batch 2 delivers events OLDER
    than the watermark; with append output the late rows must be dropped
    (their windows already finalized) -- the state-eviction contract that
    bounds memory on an endless stream."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_tumbling_counts,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "late_events")
    cols = ("event_id long, ts string, user_id long, event_type string, "
            "value double, props string")

    def mk(rows):
        return spark.createDataFrame(
            [(i, t, 1, "click", 1.0, "{}") for i, t in rows], cols
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    import os

    os.makedirs(src)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    out_dir = str(tmp_path / "out")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = streaming_tumbling_counts(stream, "1 hour",
                                        watermark="10 minutes")
        # file sink: supports append + checkpoint recovery (memory does
        # not), so run 2 resumes run 1's persisted watermark
        q = (agg.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "chk"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out_dir).collect()

    # run 1: recent events -> watermark persists at 12:00:30 - 10min
    mk([(1, "2024-01-02 12:00:00"), (2, "2024-01-02 12:00:30")]) \
        .coalesce(1).write.mode("append").parquet(src)
    drain()
    # run 2 (same checkpoint): a day-old event, far behind the watermark
    mk([(3, "2024-01-01 00:00:00")]) \
        .coalesce(1).write.mode("append").parquet(src)
    rows = drain()
    got_windows = {r["window_start_us"] for r in rows}
    jan1_window = 1704067200000000  # 2024-01-01 00:00 UTC in micros
    assert jan1_window not in got_windows, rows
    total = sum(r["n_events"] for r in rows)
    assert total <= 2  # the late event's count never surfaces


def test_streaming_minhash_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """Split the corpus into 4 files, stream ONE per micro-batch: the
    incremental pair stream (batch-vs-batch + batch-vs-store, never
    store-vs-store) must accumulate to EXACTLY the one-shot batch
    recompute -- each pair found once, when its later member arrives."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_minhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)

    out = streaming_minhash_pairs(
        spark, src, str(tmp_path / "work"), max_files_per_trigger=1,
        num_hashes=16, bands=4, threshold=0.0)
    full = minhash_near_dup_pairs(
        docs, num_hashes=16, bands=4, threshold=0.0)
    assert [tuple(r) for r in out.collect()] == \
           [tuple(r) for r in full.collect()]
    # >=2 store generations prove the cross-batch path actually ran
    import os
    parts = [f for f in os.listdir(str(tmp_path / "work" / "sig_store"))
             if f.endswith(".parquet")]
    assert len(parts) >= 2


def test_streaming_dedup_multi_batch_each_key_once(spark, sf_dir, tmp_path):
    """Split events into 4 files, one micro-batch each: the watermarked
    streaming dedup must emit every (user_id, event_type) key EXACTLY
    once across batches (the state store carries seen keys between
    micro-batches) and the key set must equal batch DISTINCT."""
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_dedup_keys,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_split")
    events.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_available_now(streaming_dedup_keys(stream), "t_dedup",
                            output_mode="append").collect()
    keys = [(r["user_id"], r["event_type"]) for r in out]
    assert len(keys) == len(set(keys))  # exactly once across batches
    expected = {(r["user_id"], r["event_type"])
                for r in events.select("user_id", "event_type")
                .distinct().collect()}
    assert set(keys) == expected


def test_streaming_sliding_matches_batch(spark, stream, sf_dir):
    from automated_review_analysis_pipeline_spark.operators.events import (
        sliding_window_agg,
    )
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_sliding_counts,
    )

    out = run_available_now(streaming_sliding_counts(stream, 60, 30), "slide")
    batch = sliding_window_agg(load_table(spark, sf_dir, "events"), 60, 30)
    key = ("window_start_us", "event_type", "n_events")
    assert sorted(tuple(r[c] for c in key) for r in out.collect()) \
        == sorted(tuple(r[c] for c in key) for r in batch.collect())


def test_streaming_static_enrich_matches_batch_join(spark, stream, sf_dir):
    """Stream-static broadcast join + tumbling agg == the same plan run
    in batch; the static side never builds join state."""
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_static_enrich,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"))
    out = run_available_now(streaming_static_enrich(stream, dim), "enrich")
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("double"), 4).alias("sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "segment", "n_events", "sum_value"))
    key = ("window_start_us", "segment", "n_events", "sum_value")
    assert sorted(tuple(r[c] for c in key) for r in out.collect()) \
        == sorted(tuple(r[c] for c in key) for r in batch.collect())


def test_streaming_tumbling_matches_batch(spark, stream, sf_dir):
    out = run_available_now(
        streaming_tumbling_counts(stream, "1 hour"), "tumble")
    batch = tumbling_window_agg(load_table(spark, sf_dir, "events"), "1 hour")
    s_rows = sorted(
        (r["window_start_us"], r["event_type"], r["n_events"], r["sum_value"])
        for r in out.collect())
    b_rows = sorted(
        (r["window_start_us"], r["event_type"], r["n_events"], r["sum_value"])
        for r in batch.collect())
    assert s_rows == b_rows


def test_streaming_sessions_cover_all_events(spark, stream, sf_dir):
    """session_window(gap) and the lag/cumsum batch idiom define sessions
    identically; compare per-user event totals and session counts."""
    out = run_available_now(
        streaming_session_stats(stream, "30 minutes"), "sess")
    batch = session_stats(load_table(spark, sf_dir, "events"), 30)
    s = {(r["user_id"]): 0 for r in out.collect()}
    stream_counts = {}
    for r in out.collect():
        stream_counts[r["user_id"]] = stream_counts.get(r["user_id"], 0) + r["n_events"]
    batch_counts = {}
    batch_sessions = {}
    for r in batch.collect():
        batch_counts[r["user_id"]] = batch_counts.get(r["user_id"], 0) + r["n_events"]
        batch_sessions[r["user_id"]] = max(
            batch_sessions.get(r["user_id"], 0), r["session_id"])
    assert stream_counts == batch_counts
    stream_sessions = {}
    for r in out.collect():
        stream_sessions[r["user_id"]] = stream_sessions.get(r["user_id"], 0) + 1
    assert stream_sessions == {u: int(n) for u, n in batch_sessions.items()}


def test_streaming_incremental_rollup_multi_batch(spark, sf_dir, tmp_path):
    """Split the events into 4 files and stream ONE file per micro-batch:
    the foreachBatch state must merge across genuinely separate batches
    and the final view must equal the full batch recompute."""
    from automated_review_analysis_pipeline_spark.operators.events import (
        daily_rollup_partials,
        finalize_rollup,
        merge_partials,
    )
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_incremental_rollup,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # keep ts as raw nanos (the stream reader does its own conversion)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(EVENTS_PATH)
    src = str(tmp_path / "events_split")
    raw.repartition(4).write.parquet(src)

    state = str(tmp_path / "state")
    out = streaming_incremental_rollup(
        spark, src, state, max_files_per_trigger=1)

    e = load_table(spark, sf_dir, "events")
    full = finalize_rollup(
        merge_partials(daily_rollup_partials(e),
                       daily_rollup_partials(e.limit(0))))
    assert [tuple(r) for r in out.collect()] == \
           [tuple(r) for r in full.collect()]

    # 4 merge rounds ran (v0..v3); retention keeps only the newest 2
    # (vacuum_state_versions per batch), so unbounded per-batch
    # snapshots cannot accumulate
    import os
    versions = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert versions == ["v2", "v3"], versions

    # RESTART with the same checkpoint + state dir: the file-source
    # checkpoint remembers every processed file, so no batch re-runs, no
    # partials double-merge, and the view is unchanged -- the
    # exactly-once recovery contract of the foreachBatch pattern.
    n_versions = len(versions)
    again = streaming_incremental_rollup(
        spark, src, state, max_files_per_trigger=1)
    assert [tuple(r) for r in again.collect()] == \
           [tuple(r) for r in full.collect()]
    versions_after = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions_after) == n_versions


def test_streaming_dedup_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The bounded-state streaming ops must run unchanged on the
    DISK-BACKED RocksDB state store -- the provider that carries
    100 TB-scale key state where the default in-memory HDFS-backed
    store OOMs an executor. Same exactly-once key set as the default
    provider, and the checkpoint's state dir must hold RocksDB snapshot
    artifacts (.zip / changelog -- the default provider writes .delta),
    proving the provider was engaged rather than silently defaulted."""
    import pathlib

    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_dedup_keys,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(provider_key)
    except Exception:
        old = None
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        events = load_table(spark, sf_dir, "events")
        src = str(tmp_path / "events_split")
        events.repartition(4).write.parquet(src)
        stream_df = read_events_stream(spark, src, max_files_per_trigger=1)
        ckpt = str(tmp_path / "ckpt")
        q = (streaming_dedup_keys(stream_df)
             .writeStream.format("memory").queryName("rocksdb_dedup")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        keys = [(r["user_id"], r["event_type"])
                for r in spark.table("rocksdb_dedup").collect()]
        assert len(keys) == len(set(keys))  # exactly once across batches
        expected = {(r["user_id"], r["event_type"])
                    for r in events.select("user_id", "event_type")
                    .distinct().collect()}
        assert set(keys) == expected
        state_files = [p.name for p in
                       pathlib.Path(ckpt, "state").rglob("*") if p.is_file()]
        assert any(f.endswith(".zip") or "changelog" in f
                   for f in state_files), state_files[:20]
        assert not any(f.endswith(".delta") for f in state_files)
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def test_streaming_kmv_merges_across_micro_batches(spark, sf_dir, tmp_path):
    """KMV register state merged over REAL micro-batches (one file per
    trigger, 3 files) equals the one-shot batch sketch over the full
    corpus -- bottom-k of unions of bottom-ks is the global bottom-k --
    and the state table holds at most k rows per group at every
    version."""
    import glob
    import os

    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators.sketches import (
        kmv_distinct_report,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_kmv_distinct,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 3

    state = str(tmp_path / "state")
    got = streaming_kmv_distinct(spark, src, state,
                                 max_files_per_trigger=1).collect()
    want = kmv_distinct_report(events, "event_type", "user_id") \
        .select("event_type", "n_regs", "est_distinct").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # 3 micro-batches wrote v0..v2, retention kept only the newest 2
    # (vacuum_state_versions runs per batch); every surviving version
    # holds <= k rows per group
    versions = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert versions == ["v1", "v2"], versions
    for v in versions:
        per_g = (spark.read.parquet(os.path.join(state, v))
                 .groupBy("g").count().collect())
        assert all(r["count"] <= 64 for r in per_g)


def test_vacuum_state_versions_contract(tmp_path):
    """Retention drops exactly the versions older than the newest
    `keep`, tolerates missing dirs, and refuses keep < 1."""
    import os

    import pytest

    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        vacuum_state_versions,
    )

    state = str(tmp_path / "state")
    assert vacuum_state_versions(state) == []  # missing dir: no-op
    os.makedirs(state)
    for v in (0, 1, 2, 5, 7):  # gaps allowed (crash between batches)
        os.makedirs(os.path.join(state, f"v{v}"))
    open(os.path.join(state, "_chk"), "w").close()  # non-version entry
    dropped = vacuum_state_versions(state, keep=2)
    assert dropped == [0, 1, 2]
    assert sorted(os.listdir(state)) == ["_chk", "v5", "v7"]
    assert vacuum_state_versions(state, keep=2) == []  # idempotent
    with pytest.raises(ValueError):
        vacuum_state_versions(state, keep=0)


def test_streaming_kmv_no_batch_fallback_schema_from_source(spark, sf_dir,
                                                            tmp_path):
    """When NO micro-batch runs (checkpoint already consumed the source)
    and no state version exists, the empty-result register schema must
    derive from the SOURCE -- a long group_col yields a long group
    column, not the old hardcoded string."""
    import shutil

    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )
    from automated_review_analysis_pipeline_spark.streaming.events_stream import (
        streaming_kmv_distinct,
    )

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").limit(50).coalesce(1) \
        .write.parquet(src)
    state = str(tmp_path / "state")
    first = streaming_kmv_distinct(spark, src, state,
                                   group_col="user_id",
                                   key_col="event_type")
    assert first.schema["user_id"].dataType.simpleString() == "bigint"
    assert first.count() > 0
    # wipe the state versions but KEEP the checkpoint: the second run
    # sees no new files, runs zero batches, and must hit the fallback
    import os

    for d in os.listdir(state):
        if d.startswith("v") and d[1:].isdigit():
            shutil.rmtree(os.path.join(state, d))
    again = streaming_kmv_distinct(spark, src, state,
                                   group_col="user_id",
                                   key_col="event_type")
    assert again.schema["user_id"].dataType.simpleString() == "bigint"
    assert again.count() == 0


def test_streaming_embedding_drift_alarm_and_exactness(spark, tmp_path):
    """The staleness alarm wired to the IVF-PQ index: identity batches
    score cos ~ 1 against the training snapshot; a SHIFTED batch drops
    its per-batch cosine. And the drained accumulated report equals the
    one-shot embedding_drift(training snapshot, whole streamed corpus)
    exactly (decimal merge law)."""
    import random

    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators import (
        similarity as sim,
    )
    from automated_review_analysis_pipeline_spark.operators.quality import (
        embedding_drift,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_embedding_drift,
    )

    rnd = random.Random(3)
    dim = 8

    def vecs(n, start, shift=0.0):
        # shift only the first half of the dimensions: a DIRECTIONAL
        # move of the mean vector (a uniform shift would barely change
        # the cosine of two all-positive means)
        return [(start + i,
                 [rnd.uniform(0.1, 1.0) + (shift if d < dim // 2 else 0.0)
                  for d in range(dim)])
                for i in range(n)]

    train = spark.createDataFrame(vecs(64, 0),
                                  "vec_id long, embedding array<double>")
    store = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(train, store, n_centroids=2, m=4, ksub=4,
                          train_n=64)
    src = str(tmp_path / "stream_src")
    # batch of the SAME distribution, then a strongly shifted batch
    spark.createDataFrame(vecs(64, 1000),
                          "vec_id long, embedding array<double>") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(vecs(64, 2000, shift=5.0),
                          "vec_id long, embedding array<double>") \
        .coalesce(1).write.mode("append").parquet(src)
    work = str(tmp_path / "work")
    report = streaming_embedding_drift(spark, src, store, work,
                                       max_files_per_trigger=1)
    got = sorted(tuple(r) for r in report.collect())
    want = sorted(tuple(r) for r in embedding_drift(
        train, spark.read.parquet(src)).collect())
    assert got == want
    alerts = {r["batch_id"]: r["cos_means"]
              for r in spark.read.parquet(work + "/alerts").collect()}
    assert len(alerts) == 2
    benign, shifted = max(alerts.values()), min(alerts.values())
    assert benign > 0.999
    assert shifted < 0.98, alerts


def test_streaming_embedding_drift_vacuums_state(spark, tmp_path):
    """The drift state store must not keep one version dir per
    micro-batch: after a multi-batch drain at most 2 survive."""
    import os

    from automated_review_analysis_pipeline_spark.operators import (
        similarity as sim,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_embedding_drift,
    )

    train = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(32)],
        "vec_id long, embedding array<double>")
    store = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(train, store, n_centroids=2, m=2, ksub=4,
                          train_n=32)
    src = str(tmp_path / "src")
    for s in (100, 200, 300):
        spark.createDataFrame(
            [(s + i, [float(i % 5), 2.0]) for i in range(16)],
            "vec_id long, embedding array<double>") \
            .coalesce(1).write.mode("append").parquet(src)
    work = str(tmp_path / "work")
    streaming_embedding_drift(spark, src, store, work,
                              max_files_per_trigger=1)
    versions = sorted(os.listdir(os.path.join(work, "drift_state",
                                              "stats")))
    assert versions == ["v1", "v2"], versions


def test_streaming_bm25_index_multi_batch_equals_batch(spark, sf_dir,
                                                       tmp_path):
    """Split the corpus into 4 files, one micro-batch each: the drained
    BM25 index search must equal the one-shot scorer over the whole
    corpus exactly (idf/avgdl derive from accumulated exact counters,
    so batch boundaries cannot move any score)."""
    from automated_review_analysis_pipeline_spark.operators import (
        textanalysis as ta,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)
    terms = ("the", "of", "data", "model")
    out = streaming_bm25_index(spark, src, str(tmp_path / "work"), terms,
                               max_files_per_trigger=1, k=12)
    want = ta.bm25_search(docs, terms, k=12)
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]


def test_streaming_set_similarity_multi_batch_equals_batch(
        spark, sf_dir, tmp_path):
    """4 files, one micro-batch each, against the BUCKETED simjoin
    store: the drained pair set equals the one-shot exact recompute.
    This is the cross-session visibility pin -- foreachBatch appends
    run on a CLONED session, so a stale relation cache in the outer
    session would silently drop earlier batches' prefixes from the
    candidate store side (round-13 regression caught by the BM25
    twin)."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_set_similarity,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)
    out = streaming_set_similarity(spark, src, str(tmp_path / "work"),
                                   max_files_per_trigger=1, threshold=0.5)
    want = set_similarity_join(docs, threshold=0.5)
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]


def test_streaming_components_multi_batch_equals_oneshot(
        spark, sf_dir, tmp_path):
    """The full streaming dedup lifecycle: docs drain in 4 micro-
    batches, each folding into the simjoin store AND its new pairs
    into the components store -- drained labels equal the one-shot
    (pairs -> star components) recompute exactly, and the label store
    saw multiple incremental folds (not one big one)."""
    from automated_review_analysis_pipeline_spark import fsio
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        star_connected_components,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_components,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)
    work = str(tmp_path / "work")

    got = streaming_components(spark, src, work,
                               max_files_per_trigger=1, threshold=0.5)
    pairs = set_similarity_join(docs, threshold=0.5)
    want, _ = star_connected_components(pairs, a_col="a_id",
                                        b_col="b_id")
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted((r["node"], r["component"]) for r in want.collect())
    # the components store really folded incrementally: version > 0
    meta = fsio.read_json(spark, work + "/comp_store/meta.json")
    assert meta["version"] >= 1
    # the folded-files watermark covers every pairs part file
    folded = set(fsio.read_json(spark, work + "/folded_pairs.json"))
    on_disk = {f for f in
               fsio.list_files(spark, work + "/simjoin_store/pairs")
               if f.endswith(".parquet")}
    assert on_disk <= folded


def test_streaming_components_refold_is_label_noop(spark, tmp_path):
    """The cross-store crash window: if the watermark write is lost
    AFTER the components fold committed, the replay re-folds the same
    pairs files -- contraction collapses already-merged edges, so the
    labels are unchanged (idempotent by construction)."""
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        components_append,
        components_read,
    )

    store = str(tmp_path / "comp")
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_components_store,
    )

    edges = spark.createDataFrame([(2, 1), (4, 3), (3, 2)],
                                  "a_id long, b_id long")
    build_components_store(edges, store, a_col="a_id", b_col="b_id")
    before = sorted(tuple(r) for r in
                    components_read(spark, store).collect())
    # re-fold the SAME edges (a lost watermark replays them)
    components_append(spark, store, edges, a_col="a_id", b_col="b_id")
    after = sorted(tuple(r) for r in
                   components_read(spark, store).collect())
    assert after == before


def test_streaming_components_auto_compact_keeps_labels_and_watermark(
        spark, sf_dir, tmp_path):
    """Both closed loops on the full streaming dedup lifecycle:
    draining with auto_compact_files_per_bucket=2 keeps the prefix
    buckets compact, re-anchors the folded-pairs watermark to the
    rewritten pairs files (no refold debt left behind), and the
    drained labels still equal the one-shot recompute."""
    from automated_review_analysis_pipeline_spark import fsio
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        bucket_file_counts,
    )
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        star_connected_components,
    )
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
        streaming_components,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)
    work = str(tmp_path / "work")

    got = streaming_components(spark, src, work,
                               max_files_per_trigger=1, threshold=0.5,
                               auto_compact_files_per_bucket=2)
    pairs = set_similarity_join(docs, threshold=0.5)
    want, _ = star_connected_components(pairs, a_col="a_id",
                                        b_col="b_id")
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted((r["node"], r["component"]) for r in want.collect())
    store = work + "/simjoin_store"
    buckets = bucket_file_counts(spark, store + "/prefix")
    assert buckets and max(buckets.values()) <= 2, buckets
    # the watermark tracks the REWRITTEN pairs files exactly
    folded = set(fsio.read_json(spark, work + "/folded_pairs.json"))
    on_disk = {f for f in fsio.list_files(spark, store + "/pairs")
               if f.endswith(".parquet")}
    assert on_disk <= folded
