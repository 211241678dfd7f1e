"""Hand-checked behavior for the round-12 additions: BM25 retrieval
(the DuckDB oracle does the value-for-value check; these pin the
semantics a human can eyeball) and the two-snapshot PSI drift report."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.quality import (
    drift_report,
)
from automated_review_analysis_pipeline_spark.operators.textanalysis import (
    bm25_topk,
)


def test_bm25_rare_term_wins_and_dl_normalizes(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"),
         (2, "apple banana banana banana apple banana apple banana"),
         (3, "zebra quokka"),
         (4, "apple")],
        "doc_id long, text string")
    qs = spark.createDataFrame(
        [(100, "zebra"), (200, "apple")], "query_id long, query_text string")
    got = {(r["query_id"], r["rank"]): r["doc_id"]
           for r in bm25_topk(docs, qs, k=3).collect()}
    # 'zebra' appears only in doc 3
    assert got[(100, 1)] == 3 and (100, 2) not in got
    # 'apple': doc 4 (the whole doc is the term) beats the long doc 2
    # and the 3-word doc 1 under length normalization
    assert got[(200, 1)] == 4


def test_bm25_score_matches_hand_formula(spark):
    # one query term, two docs -> check the exact Robertson score
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x x y y y y")], "doc_id long, text string")
    qs = spark.createDataFrame([(9, "x")], "query_id long, query_text string")
    rows = {r["doc_id"]: r["bm25"]
            for r in bm25_topk(docs, qs, k=5).collect()}
    n_docs, avgdl, k1, b = 2.0, 4.0, 1.2, 0.75
    df = 2.0
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    for doc_id, tf, dl in ((1, 1.0, 2.0), (2, 2.0, 6.0)):
        want = round(round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
            9), 6)
        assert rows[doc_id] == pytest.approx(want, abs=1e-9)


def test_drift_report_zero_on_identical_and_large_on_shift(spark):
    old = spark.range(1, 101).select(
        (F.col("id") % 10).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("c"))
    same = drift_report(old, old, numeric_cols=["v"],
                        categorical_cols=["c"])
    assert {r["column"]: r["psi"] for r in same.collect()} \
        == {"v": 0.0, "c": 0.0}
    # new snapshot collapses onto one category and the top numeric bin
    new = old.where((F.col("v") >= 8) & (F.col("c") == "a"))
    drifted = {r["column"]: r["psi"]
               for r in drift_report(old, new, numeric_cols=["v"],
                                     categorical_cols=["c"]).collect()}
    assert drifted["c"] > 0.25 and drifted["v"] > 0.25


def test_drift_report_nulls_and_constant_column(spark):
    old = spark.createDataFrame(
        [(1.0, "x"), (2.0, None), (None, "x")], "v double, c string")
    new = spark.createDataFrame(
        [(1.5, None), (None, None), (None, None)], "v double, c string")
    got = {r["column"]: r["psi"]
           for r in drift_report(old, new, numeric_cols=["v"],
                                 categorical_cols=["c"]).collect()}
    assert set(got) == {"v", "c"} and all(v is not None
                                          for v in got.values())
    with pytest.raises(ValueError, match="at least one column"):
        drift_report(old, new)


def test_drift_report_depth_mode(spark):
    old = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    # identical snapshots -> exactly 0 under depth binning too
    same = drift_report(old, old, numeric_cols=["v"], binning="depth")
    assert [r["psi"] for r in same.collect()] == [0.0]
    # shift everything into the top decile -> large PSI
    top = old.where(F.col("v") > 90)
    psi = drift_report(old, top, numeric_cols=["v"],
                       binning="depth").first()["psi"]
    assert psi > 1.0
    with pytest.raises(ValueError, match="binning must be"):
        drift_report(old, old, numeric_cols=["v"], binning="bogus")


def test_drift_depth_sensitive_where_width_is_numb(spark):
    """The motivating case: a heavy-tailed column whose mass parks in
    one equi-width bin. A within-tail shift that equi-width PSI barely
    sees moves several deciles under equi-depth binning."""
    # old: 1000 small values in [1, 10] + one outlier at 10_000 that
    # stretches the equi-width range
    small = spark.range(0, 1000).select(
        (1.0 + (F.col("id") % 10).cast("double")).alias("v"))
    outlier = spark.createDataFrame([(10_000.0,)], "v double")
    old = small.unionByName(outlier)
    # new: the small mass shifts from [1,10] to [6,10] -- invisible to
    # width bins (all of it stays in bin 0 of the stretched range)
    new = old.where(F.col("v") >= 6.0)
    w = drift_report(old, new, numeric_cols=["v"],
                     binning="width").first()["psi"]
    d = drift_report(old, new, numeric_cols=["v"],
                     binning="depth").first()["psi"]
    assert d > 10 * max(w, 1e-9) and d > 0.25 and w < 0.1


def test_embedding_drift_identity_and_shift(spark):
    from automated_review_analysis_pipeline_spark.operators.quality import (
        embedding_drift,
    )

    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    same = embedding_drift(e, e).collect()
    assert len(same) == 2
    assert all(r["shift"] == 0.0 and r["cos_means"] == 1.0 for r in same)
    # drop the y-heavy rows -> dim-1 mean falls, cosine drops below 1
    moved = embedding_drift(e, e.where("vec_id = 1")).collect()
    by_dim = {r["dim"]: r for r in moved}
    assert by_dim[1]["mean_new"] == 0.0 and by_dim[1]["shift"] > 0.6
    assert by_dim[0]["cos_means"] < 0.9
