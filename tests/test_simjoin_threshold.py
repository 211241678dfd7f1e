"""Float-boundary regression for the exact set-similarity family: the
contract is EXACT, NO false negatives, for ARBITRARY thresholds -- not
just ones whose double representation is exact. 0.9 rounds UP in
binary (0.9000000000000000222...), so without downward slack
``ceil(t*|d|)`` computes one too large (prefix one token short) and
the size filter ``|x| >= t*|y|`` rejects |x| == t*|y| exactly -- both
prune pairs whose true Jaccard EQUALS the threshold."""
from __future__ import annotations

from automated_review_analysis_pipeline_spark.operators.dedup import (
    set_similarity_join,
    set_similarity_join_rs,
)


def _docs(spark):
    words = [f"w{i:02d}" for i in range(1, 11)]
    return spark.createDataFrame(
        [(1, " ".join(words[:9])),     # 9 tokens, subset of doc 2
         (2, " ".join(words)),         # 10 tokens
         (3, "x1 x2 x3 x4 x5")],       # disjoint
        "doc_id long, text string")


def test_exact_boundary_threshold_09(spark):
    # J(1,2) = 9/10 = 0.9 exactly; t=0.9 is the upward-rounding double
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in set_similarity_join(
                 _docs(spark), threshold=0.9, k=1).collect()}
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - 0.9) < 1e-12


def test_exact_boundary_threshold_09_rs(spark):
    d = _docs(spark)
    pairs = {(r["l_doc_id"], r["r_doc_id"])
             for r in set_similarity_join_rs(
                 d.where("doc_id = 1"), d.where("doc_id > 1"),
                 threshold=0.9, k=1).collect()}
    assert (1, 2) in pairs


def test_exact_boundary_threshold_055(spark):
    # J = 11/20 = 0.55 exactly (x: 11 tokens subset of y: 20 tokens);
    # 0.55 also rounds up in binary
    xw = [f"w{i:02d}" for i in range(1, 12)]
    yw = [f"w{i:02d}" for i in range(1, 21)]
    d = spark.createDataFrame(
        [(1, " ".join(xw)), (2, " ".join(yw))], "doc_id long, text string")
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in set_similarity_join(d, threshold=0.55, k=1).collect()}
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - 0.55) < 1e-12
