"""applyInPandasWithState: per-user running profiles must accumulate
across MULTIPLE micro-batches (state store round-trips), converging to the
batch-mode totals."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.sources.tables import load_table
from automated_review_analysis_pipeline_spark.streaming.events_stream import (
    read_events_stream,
)
from automated_review_analysis_pipeline_spark.streaming.stateful import (
    running_user_profiles,
)


def test_running_profiles_across_batches(spark, sf_dir, tmp_path):
    # split events into 3 files so availableNow + maxFilesPerTrigger=1
    # processes 3 micro-batches -> state must survive batch boundaries
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parts")
    # write WITHOUT the ts conversion: the stream reader applies it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartition(3).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = running_user_profiles(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    updates = spark.table("profiles").collect()
    # more update rows than users => at least one user updated in >1 batch
    n_users = events.select("user_id").distinct().count()
    assert len(updates) > n_users

    # last update per user == batch-mode totals
    final = {}
    for r in updates:
        final[r["user_id"]] = r  # memory sink appends in batch order
    batch = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("s"),
             F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert f["n_events"] == b["n"], uid
        assert abs(f["sum_value"] - b["s"]) < 1e-6, uid
        assert f["last_event_us"] == b["last"], uid
