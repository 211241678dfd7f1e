"""Realistic-merge-count BPE paths: batched training, the Arrow kernel
encoder, and the strategy-equivalence + rank-monotone-semantics pins.

SURVEY.md §2B extension operators (no reference citation possible);
trained-table exactness at batch=1 stays pinned by the DuckDB oracle
(`bpe_train` registry entry) and tests/test_properties.py.
"""
from __future__ import annotations

from automated_review_analysis_pipeline_spark.operators.textanalysis import (
    LITERAL_MERGE_LIMIT,
    _select_disjoint,
    _train_merges,
    bpe_encode,
)


def test_select_disjoint_filters_and_always_progresses():
    # top-1 always kept even if everything collides with it
    cands = [("e", "r", 10), ("r", "e", 9), ("er", "x", 8), ("a", "b", 7)]
    kept = _select_disjoint(cands, 4)
    # ("r","e") shares both symbols, ("er","x") collides with merged
    # "er"; ("a","b") is disjoint
    assert kept == [("e", "r", 10), ("a", "b", 7)]
    # batch truncation
    assert _select_disjoint(cands, 1) == [("e", "r", 10)]
    # merged-token collision in the other direction: a later pair whose
    # MERGED equals an earlier component
    assert _select_disjoint([("a", "b", 5), ("x", "a", 4)], 2) == [
        ("a", "b", 5)]


def test_batched_training_closure_and_lossless_encode(spark):
    """Batched merges may rank-interleave differently from exact
    Sennrich, but the artifact must still be a valid BPE table: every
    merged token concatenates its parts, parts are chars/'</w>'/earlier
    merges (closure), and encoding with it is lossless (symbols
    re-concatenate to the original words)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    learned = _train_merges(docs, 24, "text", batch=8)
    assert len(learned) == 24
    known = {"</w>"}
    for rank, left, right, merged, n in learned:
        assert merged == left + right
        for part in (left, right):
            assert part in known or len(part) == 1 or part.endswith("</w>")
        known.add(merged)
        assert n > 0
    # ranks are 1..n dense
    assert [m[0] for m in learned] == list(range(1, 25))

    enc = bpe_encode(docs.limit(50), merges=learned).collect()
    assert enc
    for r in enc:
        toks = r["bpe_tokens"].split(" ")
        assert len(toks) == r["n_bpe_tokens"]
        # '</w>' terminates words: joining symbols and splitting on the
        # marker reconstructs the cleaned word stream
        words = "".join(toks).split("</w>")
        assert words[-1] == ""
        assert all(w for w in words[:-1])


def test_kernel_strategy_equals_literal(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    learned = _train_merges(docs, 20, "text", batch=4)
    lit = bpe_encode(docs, merges=learned, strategy="literal").collect()
    ker = bpe_encode(docs, merges=learned, strategy="kernel").collect()
    assert lit == ker
    assert len(lit) > 0


def test_auto_strategy_flips_to_kernel_past_literal_limit(spark):
    """auto == literal at small n (no Python in the plan), kernel past
    LITERAL_MERGE_LIMIT (ArrowEvalPython present) -- and a table just
    past the limit still encodes identically under both strategies."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    small = _train_merges(docs, 3, "text")
    plan_small = bpe_encode(
        docs, merges=small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_small
    assert "BatchEvalPython" not in plan_small

    # the sf0.001 pair vocabulary exhausts at ~112 merges, short of the
    # literal limit -- pad with never-applicable merges (valid table
    # rows that match no symbol) to push len(merges) past the threshold
    # without changing any encoding
    trained = _train_merges(docs, LITERAL_MERGE_LIMIT, "text", batch=16)
    pad = [(len(trained) + i + 1, f"zzq{i}", f"qzz{i}", f"zzq{i}qzz{i}", 1)
           for i in range(LITERAL_MERGE_LIMIT + 4 - len(trained))]
    big = trained + pad
    assert len(big) == LITERAL_MERGE_LIMIT + 4
    auto_df = bpe_encode(docs, merges=big)
    plan_big = auto_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_big
    assert auto_df.collect() == bpe_encode(
        docs, merges=big, strategy="literal").collect()


def test_rank_monotone_semantics_pinned_across_strategies(spark):
    """The engine's canon (the fold + the DuckDB CTEs) applies merges in
    strictly increasing rank order: an adjacency CREATED by a later rank
    never re-triggers an earlier rank. 'abc' under rank1=(a,bc),
    rank2=(b,c) stays [a, bc, </w>] -- a re-visiting encoder (GPT-2
    style) would emit [abc, </w>]. Both strategies must pin the former."""
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    merges = [(1, "a", "bc", "abc", 1), (2, "b", "c", "bc", 1)]
    for strategy in ("literal", "kernel"):
        rows = bpe_encode(docs, merges=merges, strategy=strategy).collect()
        assert rows[0]["bpe_tokens"] == "a bc </w>", strategy


def test_bpe_encode_ids_decode_back_to_tokens(spark):
    """ids are exactly bpe_vocab's vocab_id: mapping each document's
    token_ids back through the vocabulary reproduces bpe_encode's token
    string, and n_bpe_tokens agrees."""
    from automated_review_analysis_pipeline_spark.operators.textanalysis import (
        bpe_encode_ids,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2)),
         (2, " ".join(["newest"] * 6 + ["widest"] * 3)),
         (3, "newest low")],
        "doc_id long, text string")
    from automated_review_analysis_pipeline_spark.operators.textanalysis import (
        _train_merges,
        bpe_encode,
    )
    merges = _train_merges(docs, 3, "text")
    id2tok = {r["vocab_id"]: r["token"]
              for r in bpe_vocab(docs, merges=merges).collect()}
    enc_str = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_tokens"])
               for r in bpe_encode(docs, merges=merges).collect()}
    for r in bpe_encode_ids(docs, merges=merges).collect():
        n, toks = enc_str[r["doc_id"]]
        assert r["n_bpe_tokens"] == n == len(r["token_ids"])
        assert " ".join(id2tok[i] for i in r["token_ids"]) == toks
