"""Golden-parity: run the engine in demo mode on the reference's bundled
survey CSV (/root/reference/example_survey_large.csv -- used as INPUT DATA
only) and check the structural invariants documented in SURVEY.md §5 from
the reference's artifacts. The classifiers differ only where the reference
would use VADER (not installed there either for the lexicon path), so
structure, filler handling, explode arithmetic, and enum closure must hold
exactly.
"""

from __future__ import annotations

import csv

import pytest

from automated_review_analysis_pipeline_spark.functions.classify import SENTIMENT_ORDER
from automated_review_analysis_pipeline_spark.operators.reshape import summary_from_wide
from automated_review_analysis_pipeline_spark.plans.survey_pipeline import analyze_wide
from automated_review_analysis_pipeline_spark.sources.survey import read_survey_csv

CSV_PATH = "/root/reference/example_survey_large.csv"


@pytest.fixture(scope="module")
def golden(spark):
    survey = read_survey_csv(spark, CSV_PATH)
    wide, b2d = analyze_wide(survey)
    return survey, wide.collect(), b2d


def _csv_rows():
    with open(CSV_PATH, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def test_row_count_matches_product_arithmetic(golden):
    """|wide rows| = sum over responses of max(1, #parsed products)."""
    _, rows, _ = golden
    expected = 0
    for r in _csv_rows():
        toks = [t.strip() for t in (r["Products"] or "").split(",") if t.strip()]
        expected += max(1, len(toks))
    assert len(rows) == expected


def test_500_responses_and_question_columns(golden):
    survey, rows, b2d = golden
    assert len(survey.columns) == 8  # Email, Name, Products + 5 questions
    assert len(b2d) == 5
    assert len({r["ResponseID"] for r in rows}) == 500


def test_wide_schema_shape(golden):
    _, rows, b2d = golden
    cols = rows[0].asDict().keys()
    assert list(cols)[:2] == ["ResponseID", "Product"]
    for base in b2d:
        for suffix in ("_Answer", "_Sentiment", "_Category"):
            assert f"{base}{suffix}" in cols


def test_sentiment_enum_closed(golden):
    _, rows, b2d = golden
    allowed = set(SENTIMENT_ORDER)
    for r in rows:
        for base in b2d:
            assert r[f"{base}_Sentiment"] in allowed


def test_filler_cells_are_no_feedback_neutral(golden):
    """Every filler cell (per the reference's FILLER_VALUES) must come out
    (Neutral, No Feedback) -- the P3 short-circuit."""
    from automated_review_analysis_pipeline_spark.functions.text import FILLER_VALUES

    _, rows, b2d = golden
    fillers = set(FILLER_VALUES)
    n_filler_cells = 0
    for r in rows:
        for base in b2d:
            if (r[f"{base}_Answer"] or "").strip().lower() in fillers:
                n_filler_cells += 1
                assert r[f"{base}_Sentiment"] == "Neutral"
                assert r[f"{base}_Category"] == "No Feedback"
    # the bundled CSV is known to carry a large filler share (~17% of cells)
    assert n_filler_cells > 500


def test_no_astral_codepoints_survive(golden):
    _, rows, b2d = golden
    for r in rows:
        for base in b2d:
            ans = r[f"{base}_Answer"] or ""
            assert all(ord(ch) < 0x10000 for ch in ans), ans


def test_products_match_reference_domain(golden):
    _, rows, _ = golden
    products = {r["Product"] for r in rows}
    expected = {"Alpha Jacket", "Beta Sneakers", "Gamma Backpack",
                "Delta Watch", "Zeta Headphones", "Epsilon Hat"}
    # reference CSV uses a 6-product domain; empty cells explode to
    # Unspecified only if present in the data
    assert expected <= products <= expected | {"Unspecified"}


def test_summary_total_equals_wide_times_questions(spark, golden):
    survey, rows, b2d = golden
    wide, _ = analyze_wide(read_survey_csv(spark, CSV_PATH))
    summary = summary_from_wide(wide).collect()
    total = sum(
        r["Positive"] + r["Neutral"] + r["Negative"] + r["Mixed"]
        for r in summary
    )
    assert total == len(rows) * len(b2d)
    # summary covers exactly the observed (product, question) combinations
    assert {r["Product"] for r in summary} == {r["Product"] for r in rows}


def test_keyword_category_matches_reference_cache(spark):
    """Cell-exact kernel parity: the reference's golden memo cache
    (/root/reference/.analysis_cache.json, 278 entries produced by its
    demo run) records the category its first-match keyword taxonomy
    assigned to every distinct classified answer. Our C3 column
    expression must reproduce ALL of them exactly. (The cached
    sentiments came from VADER -- reference C1, a different kernel than
    our deterministic C2 lexicon -- so only categories are comparable.)
    """
    import json

    with open("/root/reference/.analysis_cache.json", encoding="utf-8") as f:
        cache = json.load(f)
    rows = [
        (key.split("|||", 2)[2], sent_cat[1])
        for key, sent_cat in cache.items()
    ]
    assert len(rows) == 278

    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.functions.classify import (
        keyword_category,
    )

    df = spark.createDataFrame(rows, "answer string, golden_category string")
    got = df.select(
        "answer", "golden_category",
        keyword_category(F.col("answer")).alias("our_category"),
    ).collect()
    mismatches = [
        (r["answer"], r["golden_category"], r["our_category"])
        for r in got if r["golden_category"] != r["our_category"]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:5]}"
