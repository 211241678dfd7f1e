"""Semantics tests for the training-data curation operators
(operators/curation.py): split determinism and balance, redaction
completeness, decontamination containment, quota bounds.

The value-level cross-engine checks live in test_oracle_parity.py; these
pin the properties the oracle comparison can't express (fractions within
tolerance, idempotence, post-conditions).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators import curation as cur
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_split_partitions_every_doc_and_is_balanced(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.deterministic_split(docs)
    n = docs.count()
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == n
    # 500 docs: binomial(500, .8) is within +/-0.06 of the mean w.h.p.
    assert abs(counts.get("train", 0) / n - 0.80) < 0.06
    assert abs(counts.get("val", 0) / n - 0.10) < 0.05
    assert abs(counts.get("test", 0) / n - 0.10) < 0.05


def test_split_is_deterministic_and_row_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = cur.deterministic_split(docs).collect()
    b = cur.deterministic_split(docs.repartition(7)).collect()
    assert a == b


def test_redaction_removes_every_match(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit(" ping a.b@x.io or https://x.io/p?q=1 or 555-123-4567")))
    out = cur.redact_pii(docs)
    for pat in (cur.EMAIL_RE, cur.URL_RE, cur.PHONE_RE):
        leftover = out.where(
            F.regexp_count(F.col("redacted_text"), F.lit(pat)) > 0).count()
        assert leftover == 0, pat
    row = out.first()
    assert row["n_emails"] == 1 and row["n_urls"] == 1 and row["n_phones"] == 1
    assert "<EMAIL>" in row["redacted_text"]
    assert "<URL>" in row["redacted_text"]
    assert "<PHONE>" in row["redacted_text"]


def test_redaction_patterns_match_expected_shapes():
    assert re.fullmatch(cur.EMAIL_RE, "user42@example.com")
    assert re.fullmatch(cur.URL_RE, "https://example.org/d/42")
    assert re.fullmatch(cur.PHONE_RE, "555-010-0042")
    assert not re.fullmatch(cur.EMAIL_RE, "not-an-email")


def test_decontaminate_returns_only_train_docs_with_overlap(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.decontaminate(docs)
    splits = {r["doc_id"]: r["split"]
              for r in cur.deterministic_split(docs).collect()}
    rows = out.collect()
    assert rows, "synthetic corpus has tiny vocab; overlap must exist"
    for r in rows:
        assert splits[r["doc_id"]] == "train"
        assert r["n_shared_shingles"] >= 1


def test_lang_quota_sample_bounds_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.lang_quota_sample(docs, quota=30)
    per_lang = {r["lang"]: r["cnt"] for r in
                out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    avail = {r["lang"]: r["cnt"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, cnt in per_lang.items():
        assert cnt == min(30, avail[lang])
    assert (cur.lang_quota_sample(docs, quota=30).collect()
            == cur.lang_quota_sample(docs.repartition(5), quota=30).collect())
