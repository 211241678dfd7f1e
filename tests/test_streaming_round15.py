"""Round-15 streaming lanes: end-to-end streaming curation
(streaming_curate == one-shot curate_corpus), the components
auto-compaction knob exposed on streaming_components, and whole-stream
replay idempotence."""
from __future__ import annotations

from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators.curation import (
    curate_corpus,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table
from automated_review_analysis_pipeline_spark.streaming.docs_stream import (
    streaming_components,
    streaming_curate,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _multi_file_docs(spark, sf_dir, tmp_path, n_files=3):
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_stream")
    docs.repartition(n_files).write.parquet(path)
    return docs, path


def test_streaming_curate_equals_one_shot(spark, sf_dir, tmp_path):
    docs, path = _multi_file_docs(spark, sf_dir, tmp_path)
    work = str(tmp_path / "work")
    got = streaming_curate(spark, path, work, max_files_per_trigger=1)
    want = curate_corpus(load_table(spark, sf_dir, "documents"))
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_streaming_curate_whole_stream_replay_is_noop(
        spark, sf_dir, tmp_path):
    """The at-least-once extreme: replay EVERY batch (fresh checkpoint
    over the same files, batch ids restart at 0) -- the state guard
    makes each a no-op and the manifest is unchanged."""
    import shutil

    docs, path = _multi_file_docs(spark, sf_dir, tmp_path)
    work = str(tmp_path / "work")
    first = _rows(streaming_curate(spark, path, work,
                                   max_files_per_trigger=1))
    gated_files = fsio.count_files(spark,
                                   work + "/curate_store/gated")
    shutil.rmtree(work + "/_chk")  # forget progress; state stays
    second = _rows(streaming_curate(spark, path, work,
                                    max_files_per_trigger=1))
    assert second == first
    assert fsio.count_files(spark, work + "/curate_store/gated") \
        == gated_files  # nothing re-appended


def test_streaming_curate_crash_mid_batch_heals(
        spark, sf_dir, tmp_path, monkeypatch):
    """Kill the FIRST drain before any commit point: state rolls back
    on the retry and the final manifest still equals one-shot."""
    import pytest

    docs, path = _multi_file_docs(spark, sf_dir, tmp_path)
    work = str(tmp_path / "work")

    real = fsio.write_json
    state = {"armed": True}

    def boom(spark_, p, obj, **kw):
        if state["armed"] and p.endswith("curate_store/meta.json"):
            raise IOError("injected crash before commit point")
        return real(spark_, p, obj, **kw)

    monkeypatch.setattr(fsio, "write_json", boom)
    with pytest.raises(Exception):
        streaming_curate(spark, path, work, max_files_per_trigger=1)
    monkeypatch.undo()
    state["armed"] = False
    # intent left behind; the retry repairs + refolds exactly once
    assert fsio.exists(spark, work + "/curate_store/pending.json")
    import shutil
    shutil.rmtree(work + "/_chk", ignore_errors=True)
    got = streaming_curate(spark, path, work, max_files_per_trigger=1)
    want = curate_corpus(load_table(spark, sf_dir, "documents"))
    assert _rows(got) == _rows(want)


def test_streaming_curate_export_manifest_validates(
        spark, sf_dir, tmp_path):
    from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E501
        manifest_from_footers,
    )

    docs, path = _multi_file_docs(spark, sf_dir, tmp_path)
    work = str(tmp_path / "work")
    exp = str(tmp_path / "export")
    got = streaming_curate(spark, path, work,
                           max_files_per_trigger=1, export_dir=exp)
    want = curate_corpus(load_table(spark, sf_dir, "documents"))
    assert _rows(got) == _rows(want)
    # the shipped manifest validates against the actual file footers
    scan_manifest = spark.read.parquet(exp + "/manifest")
    footer_manifest = manifest_from_footers(spark, exp)
    assert _rows(scan_manifest.select("file_id", "n_rows")) \
        == _rows(footer_manifest.select("file_id", "n_rows"))


def test_streaming_components_auto_compact_deltas(
        spark, sf_dir, tmp_path):
    """The round-15 lane knob: a 4-batch drain at bound 2 keeps the
    components label fold chain <= 2 AND the labels stay one-shot
    exact (compaction is value-invisible)."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    path = str(tmp_path / "docs4")
    docs.repartition(4).write.parquet(path)
    work = str(tmp_path / "work")
    got = streaming_components(spark, path, work,
                               max_files_per_trigger=1,
                               auto_compact_deltas=2)
    meta = fsio.read_json(spark,
                          work + "/comp_store/meta.json")
    assert meta["version"] - meta["base"] < 2, meta
    # one-shot exactness (the streaming_components contract)
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        star_connected_components,
    )

    pairs = set_similarity_join(docs, threshold=0.5)
    want, _ = star_connected_components(pairs, a_col="a_id",
                                        b_col="b_id")
    assert _rows(got) == _rows(
        want.select(F.col("node").alias("doc_id"), "component")
        .orderBy("doc_id"))
