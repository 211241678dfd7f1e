"""Round-15 ANN maintenance loop: staged-commit appends, tombstone
deletes, and the drift-triggered rebuild (the simjoin-refreeze analog
for the IVF-PQ index)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio
from automated_review_analysis_pipeline_spark.operators import (
    similarity as sim,
)

DIM, M, KSUB = 8, 4, 8


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def _corpus(seed, n, center, start_id):
    rng = np.random.default_rng(seed)
    base = rng.normal(0.0, 0.3, size=(n, DIM)) + np.array(center)
    return [(start_id + i, base[i]) for i in range(n)]


def _center(sign):
    c = np.zeros(DIM)
    c[0] = 3.0 * sign
    return c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build(spark, tmp_path, corpus, name="ivfpq"):
    store = str(tmp_path / name)
    sim.build_ivfpq_index(_vecs(spark, corpus), store, n_centroids=4,
                          m=M, ksub=KSUB, encode="residual")
    return store


def test_append_replay_guard_and_staged_commit(spark, tmp_path,
                                               monkeypatch):
    base = _corpus(1, 40, _center(+1), 0)
    delta = _corpus(2, 10, _center(+1), 100)
    store = _build(spark, tmp_path, base)
    sim.ivfpq_index_append(spark, store, _vecs(spark, delta),
                           batch_id=1)
    n1 = spark.read.parquet(store + "/codes").count()
    # replay is a no-op
    sim.ivfpq_index_append(spark, store, _vecs(spark, delta),
                           batch_id=1)
    assert spark.read.parquet(store + "/codes").count() == n1

    # kill BEFORE the commit point: orphan code files roll back
    real = fsio.write_json

    def boom(spark_, path, obj, **kw):
        if path.endswith("meta.json"):
            raise IOError("injected")
        return real(spark_, path, obj, **kw)

    delta2 = _corpus(3, 10, _center(+1), 200)
    monkeypatch.setattr(fsio, "write_json", boom)
    with pytest.raises(IOError, match="injected"):
        sim.ivfpq_index_append(spark, store, _vecs(spark, delta2),
                               batch_id=2)
    monkeypatch.undo()
    assert fsio.exists(spark, store + "/pending.json")
    # retry folds exactly once (repair drops the orphans first)
    sim.ivfpq_index_append(spark, store, _vecs(spark, delta2),
                           batch_id=2)
    assert spark.read.parquet(store + "/codes").count() == n1 + 10


def test_delete_probe_and_purge(spark, tmp_path):
    base = _corpus(4, 60, _center(+1), 0)
    store = _build(spark, tmp_path, base)
    queries = _vecs(spark, base[:3])
    pre = sim.ivfpq_probe(spark, store, queries, k=5, n_probe=2)
    victims = sorted({r["neighbor_id"] for r in pre.collect()})[:3]
    sim.ivfpq_index_delete(spark, store, victims)
    post = sim.ivfpq_probe(spark, store, queries, k=5, n_probe=2)
    got_ids = {r["neighbor_id"] for r in post.collect()}
    assert not (got_ids & set(victims))
    post_rows = _rows(post)
    # physical purge is value-invisible and reclaims the rows
    from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E501
        index_compact,
        index_stats,
    )
    st = {(r["part"], r["metric"]): r["value"]
          for r in index_stats(spark, store).collect()}
    assert st[("meta", "n_tombstoned")] == str(len(victims))
    report = index_compact(spark, store)
    assert report.get("tombstones") == "purged"
    assert spark.read.parquet(store + "/codes") \
        .where(F.col("c_id").isin(victims)).count() == 0
    assert _rows(sim.ivfpq_probe(spark, store, queries, k=5,
                                 n_probe=2)) == post_rows
    # re-append of a tombstoned id fails fast until purged
    sim.ivfpq_index_append(
        spark, store, _vecs(spark, [b for b in base
                                    if b[0] in victims]))


def test_delete_reappend_guard(spark, tmp_path):
    base = _corpus(5, 30, _center(+1), 0)
    store = _build(spark, tmp_path, base)
    sim.ivfpq_index_delete(spark, store, [0, 1])
    with pytest.raises(ValueError, match="TOMBSTONED"):
        sim.ivfpq_index_append(spark, store, _vecs(spark, base[:2]))


def test_rebuild_equals_fresh_build(spark, tmp_path):
    """Deterministic training: subset-build + append + rebuild ==
    fresh build over the full corpus, probe-for-probe."""
    full = _corpus(6, 80, _center(+1), 0) \
        + _corpus(7, 40, _center(-1), 1000)
    part = [v for v in full if v[0] < 1000]
    rest = [v for v in full if v[0] >= 1000]
    store = _build(spark, tmp_path, part, "grown")
    sim.ivfpq_index_append(spark, store, _vecs(spark, rest),
                           batch_id=7)
    sim.ivfpq_rebuild(spark, store, _vecs(spark, full))
    fresh = _build(spark, tmp_path, full, "fresh")
    queries = _vecs(spark, full[:5] + rest[:5])
    got = _rows(sim.ivfpq_probe(spark, store, queries, k=5, n_probe=2))
    want = _rows(sim.ivfpq_probe(spark, fresh, queries, k=5,
                                 n_probe=2))
    assert got == want
    # replay bookkeeping carried across the swap: batch 7's vectors
    # are inside the rebuilt corpus, so its replay must stay a no-op
    before = spark.read.parquet(store + "/codes").count()
    sim.ivfpq_index_append(spark, store, _vecs(spark, rest),
                           batch_id=7)
    assert spark.read.parquet(store + "/codes").count() == before


def test_rebuild_restores_recall_on_drifted_corpus(spark, tmp_path):
    """The maintenance loop's justification: appends encoded against
    stale geometry lose recall in the drifted region; the rebuild
    restores it."""
    old = _corpus(8, 80, _center(+1), 0)
    drift = _corpus(9, 80, _center(-1), 1000)
    store = _build(spark, tmp_path, old)
    sim.ivfpq_index_append(spark, store, _vecs(spark, drift))
    queries = _vecs(spark, drift[:8])
    full = _vecs(spark, old + drift)

    def recall(probe):
        rep = sim.ann_recall_report(full, queries, k=5, approx=probe)
        return rep.agg(F.avg("recall").alias("r")).first()["r"]

    stale = recall(sim.ivfpq_probe(spark, store, queries, k=5,
                                   n_probe=2))
    sim.ivfpq_rebuild(spark, store, full)
    rebuilt = recall(sim.ivfpq_probe(spark, store, queries, k=5,
                                     n_probe=2))
    assert rebuilt > stale, (stale, rebuilt)


def test_streaming_maintain_auto_rebuild(spark, tmp_path):
    """streaming_ivfpq_maintain: drifted batches trip the inline
    rebuild; the lake accumulates seed + stream; alarms log it."""
    from automated_review_analysis_pipeline_spark.streaming.docs_stream import (  # noqa: E501
        streaming_ivfpq_maintain,
    )

    seed_rows = _corpus(10, 60, _center(+1), 0)
    drift_rows = _corpus(11, 60, _center(-1), 1000)
    store = _build(spark, tmp_path, seed_rows)
    vec_dir = str(tmp_path / "stream")
    _vecs(spark, drift_rows).repartition(2).write.parquet(vec_dir)
    work = str(tmp_path / "work")
    alerts = streaming_ivfpq_maintain(
        spark, vec_dir, store, work,
        seed_corpus=_vecs(spark, seed_rows),
        max_files_per_trigger=1,
        auto_rebuild_cos=0.5)
    rows = alerts.collect()
    assert rows and any(r["rebuilt"] for r in rows)
    lake = spark.read.parquet(work + "/corpus")
    assert lake.count() == len(seed_rows) + len(drift_rows)
    # post-drain, the index covers the whole corpus and serves the
    # drifted region with rebuilt geometry
    assert spark.read.parquet(store + "/codes").count() \
        == len(seed_rows) + len(drift_rows)
    probe = sim.ivfpq_probe(
        spark, store, _vecs(spark, drift_rows[:3]), k=3, n_probe=2)
    assert probe.count() > 0


def test_rebuild_requires_recorded_recipe(spark, tmp_path):
    base = _corpus(12, 30, _center(+1), 0)
    store = _build(spark, tmp_path, base)
    meta = fsio.read_json(spark, store + "/meta.json")
    del meta["n_centroids"]
    fsio.write_json(spark, store + "/meta.json", meta)
    with pytest.raises(ValueError, match="self-describing"):
        sim.ivfpq_rebuild(spark, store, _vecs(spark, base))
