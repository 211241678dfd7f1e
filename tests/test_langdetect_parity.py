"""P8 language-detection parity vs the real langdetect 1.0.9 (imported
from the reference's bundled venv, seeded for determinism).

The reference's P8 (survey_analysis.py:95-103, :241-249) is a LOG-ONLY
diagnostic: take the first non-null sample per question column, clean it,
and print the first language langdetect can assign. Our engine substitutes
a deterministic stopword-evidence heuristic (textanalysis.language_id).
These tests pin exactly where the two agree and diverge on the bundled
CSV:

* END-TO-END the diagnostic MATCHES: both pipelines print 'en' for the
  bundled survey, because the FIRST sample is unambiguous English.
* PER-SAMPLE the heuristic is more conservative: short texts without
  stopword evidence return 'und' where langdetect's trained Naive Bayes
  still guesses (sample #3, 'Arrived late but in good condition.'
  -> langdetect 'en', ours 'und'). The exact divergence table lives in
  OPERATORS.md (P8) and is pinned here so any drift is caught.
"""

from __future__ import annotations

import csv
import os
import re
import sys
from contextlib import contextmanager

import pytest

REF_SITE_PACKAGES = "/root/reference/.venv/lib/python3.9/site-packages"
CSV_PATH = "/root/reference/example_survey_large.csv"

needs_langdetect = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_SITE_PACKAGES, "langdetect")),
    reason="reference venv with langdetect not present",
)


@contextmanager
def real_langdetect():
    """Seeded langdetect from the reference venv; path APPENDED so the
    interpreter's own numpy/pandas keep precedence, modules scrubbed on
    exit."""
    before = set(sys.modules)
    sys.path.append(REF_SITE_PACKAGES)
    try:
        from langdetect import DetectorFactory, detect

        DetectorFactory.seed = 0
        yield detect
    finally:
        sys.path.remove(REF_SITE_PACKAGES)
        for name, mod in list(sys.modules.items()):
            if name in before:
                continue
            if (getattr(mod, "__file__", "") or "").startswith(
                    REF_SITE_PACKAGES):
                del sys.modules[name]


def _clean(s: str) -> str:
    s = re.sub(r"[\U00010000-\U0010ffff]", "", str(s))
    return re.sub(r"\s+", " ", s).strip()


def _samples() -> list[str]:
    """The reference's exact sample pick (survey_analysis.py:241-246):
    first non-null value of each question column, cleaned."""
    with open(CSV_PATH, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    qcols = [c for c in rows[0] if c not in ("Email", "Name", "Products")]
    out = []
    for q in qcols:
        for r in rows:
            if (r[q] or "").strip():
                out.append(_clean(r[q]))
                break
    return out


@needs_langdetect
def test_survey_language_diagnostic_matches_reference_end_to_end(spark):
    """detect_survey_language must return the SAME language the reference
    prints for the bundled CSV: the first sample the detector can assign.
    Both land on 'en'."""
    from automated_review_analysis_pipeline_spark.api import (
        detect_survey_language,
    )
    from automated_review_analysis_pipeline_spark.sources.survey import (
        read_survey_csv,
    )

    with real_langdetect() as detect:
        ref_lang = None
        for s in _samples():
            try:
                ref_lang = detect(s)
                break
            except Exception:
                continue
    ours = detect_survey_language(read_survey_csv(spark, CSV_PATH))
    assert ref_lang == "en"
    assert ours == ref_lang


@needs_langdetect
def test_per_sample_divergence_is_exactly_as_documented(spark):
    """Pin the per-sample comparison on the reference's 5 question
    samples: with the character-n-gram profiles (LANG_TRIGRAMS) the
    table is now IDENTICAL on all 5 -- sample #3 ('Arrived late but in
    good condition.'), where the stopword-only heuristic used to
    abstain, is decided 'en' by its '-tion'/'oo' n-grams. Any change to
    LANG_MARKERS/LANG_TRIGRAMS that shifts this table must update
    OPERATORS.md (P8) and this pin together."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators.textanalysis import (
        language_id,
    )

    samples = _samples()
    assert len(samples) == 5
    with real_langdetect() as detect:
        ld = []
        for s in samples:
            try:
                ld.append(detect(s))
            except Exception:
                ld.append(None)
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    ours = {r["t"]: r["l"] for r in df.select(
        "t", language_id(F.col("t")).alias("l")).collect()}
    table = [(ld[i], ours[s]) for i, s in enumerate(samples)]
    assert table == [
        ("en", "en"),
        ("en", "en"),
        ("en", "en"),    # decided by n-gram evidence ('tio', 'oo ')
        ("en", "en"),
        ("es", "es"),
    ], table


@needs_langdetect
def test_corpus_agreement_rate_floor(spark):
    """Broad-corpus guard: over all 277 distinct cleaned answers, the
    stopword + character-n-gram heuristic agrees with seeded langdetect
    on >= 220 (the exact count this round: 222 -- 'und' abstentions are
    down to 8); remaining disagreements are dominated by en/es
    code-switched sentences where the two models weight different
    halves (recorded in OPERATORS.md P8)."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators.textanalysis import (
        language_id,
    )

    with open(CSV_PATH, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    qcols = [c for c in rows[0] if c not in ("Email", "Name", "Products")]
    answers = sorted({_clean(r[q]) for r in rows for q in qcols
                      if (r[q] or "").strip()})
    df = spark.createDataFrame([(a,) for a in answers], "t string")
    ours = {r["t"]: r["l"] for r in df.select(
        "t", language_id(F.col("t")).alias("l")).collect()}
    same = und_abstain = diff_other = 0
    with real_langdetect() as detect:
        for a in answers:
            try:
                ld = detect(a)
            except Exception:
                ld = None
            if ld == ours[a]:
                same += 1
            elif ours[a] == "und":
                und_abstain += 1
            else:
                diff_other += 1
    assert same >= 220
    # abstention is now rare (n-grams decide most short texts)
    assert und_abstain <= 15
    # hard disagreements (both assign, different language) stay a small
    # minority -- they are en/es code-switched sentences where the two
    # models weight different halves
    assert diff_other / len(answers) <= 0.20