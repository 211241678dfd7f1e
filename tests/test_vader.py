"""In-engine VADER (functions/vader.py) parity gates.

Ground truth is the REAL vaderSentiment 3.3.2 package, imported from the
reference's bundled virtualenv site-packages (pure-Python, so it runs
fine under this interpreter) -- plus the reference's committed demo-run
artifacts (.analysis_cache.json), which pin the exact sentiment cells its
VADER branch produced. Our scorer must match polarity_scores dicts
EXACTLY (all four keys, post-rounding) and the kernel rule must reproduce
every cached sentiment.
"""

from __future__ import annotations

import json
import os
import sys
from contextlib import contextmanager

import pytest

from automated_review_analysis_pipeline_spark.functions.vader import (
    VaderScorer,
    build_scorer,
    discover_lexicon_dir,
    load_emoji_lexicon,
    load_lexicon,
)

REF_SITE_PACKAGES = "/root/reference/.venv/lib/python3.9/site-packages"
REF_VADER_DIR = os.path.join(REF_SITE_PACKAGES, "vaderSentiment")

needs_ref_vader = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_VADER_DIR, "vader_lexicon.txt")),
    reason="reference venv with vaderSentiment lexicon not present",
)


@contextmanager
def real_vader_analyzer():
    """Import the real SentimentIntensityAnalyzer from the reference venv,
    then scrub sys.path/sys.modules so the rest of the suite still sees a
    vaderSentiment-free interpreter (test_golden_parity's ref_mod fixture
    asserts the ANALYZER-ABSENT state)."""
    before = set(sys.modules)
    sys.path.insert(0, REF_SITE_PACKAGES)
    try:
        from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

        yield SentimentIntensityAnalyzer()
    finally:
        sys.path.remove(REF_SITE_PACKAGES)
        for name, mod in list(sys.modules.items()):
            if name in before:
                continue
            mod_file = getattr(mod, "__file__", "") or ""
            if mod_file.startswith(REF_SITE_PACKAGES):
                del sys.modules[name]


CANONICAL = [
    "VADER is smart, handsome, and funny.",
    "VADER is smart, handsome, and funny!",
    "VADER is very smart, handsome, and funny.",
    "VADER is VERY SMART, handsome, and FUNNY.",
    "VADER is VERY SMART, handsome, and FUNNY!!!",
    "VADER is VERY SMART, uber handsome, and FRIGGIN FUNNY!!!",
    "VADER is not smart, handsome, nor funny.",
    "The book was good.",
    "At least it isn't a horrible book.",
    "The book was only kind of good.",
    "The plot was good, but the characters are uncompelling and the "
    "dialog is not great.",
    "Today SUX!",
    "Today only kinda sux! But I'll get by, lol",
    "Make sure you :) or :D today!",
    "Catch utf-8 emoji such as \U0001f498 and \U0001f48b and \U0001f601",
    "Not bad at all",
]

ADVERSARIAL = [
    "", "   ", "no good", "no good or bad", "never so good",
    "never this great", "was so good", "without doubt excellent",
    "the shit", "to die for!!", "least favorite", "at least it works",
    "very least happy", "sort of ok", "kind of bad", "NOT GOOD at all",
    # duplicate-value but-rescan quirk
    "good good but good", "happy happy but sad sad",
    # BMP emoji/emoticon handling + description fusion quirk
    "a ☺ day", "love❤you",
    "good?? really??", "why????? bad?????",
    "this is so good", "never so this good", "isn't isn't good",
    "no", "no no no", "kind of", "but", "so", "least",
]


@pytest.fixture(scope="module")
def scorer() -> VaderScorer:
    s = build_scorer(REF_VADER_DIR)
    assert s is not None
    return s


@needs_ref_vader
def test_polarity_scores_exact_on_canonical_and_adversarial(scorer):
    with real_vader_analyzer() as real:
        for text in CANONICAL + ADVERSARIAL:
            assert scorer.polarity_scores(text) == \
                real.polarity_scores(text), repr(text)


@needs_ref_vader
def test_polarity_scores_exact_on_survey_corpus(scorer):
    """Every distinct answer in the bundled 500-response CSV scores
    identically, raw and lowercased."""
    import csv

    with open("/root/reference/example_survey_large.csv", newline="",
              encoding="utf-8") as f:
        answers = sorted({
            (r[c] or "").strip()
            for r in csv.DictReader(f)
            for c in r if c not in ("Email", "Name", "Products")
        })
    assert len(answers) > 100
    with real_vader_analyzer() as real:
        for a in answers:
            assert scorer.polarity_scores(a) == real.polarity_scores(a), a
            assert scorer.polarity_scores(a.lower()) == \
                real.polarity_scores(a.lower())


@needs_ref_vader
def test_polarity_scores_exact_under_fuzz(scorer):
    """Seeded structured fuzz: random compositions of lexicon words,
    boosters, negators, idiom fragments, caps and punctuation -- the
    constructions that exercise every rule branch."""
    import random

    rng = random.Random(20260814)
    lex_words = sorted(scorer.lexicon)[::41][:250]
    pool = lex_words + [
        "not", "never", "no", "so", "this", "but", "at", "least", "very",
        "kind", "of", "sort", "really", "friggin", "kinda", "barely",
        "without", "doubt", "or", "nor", "the", "shit", "bomb", "bad",
        "ass", "yeah", "right", "to", "die", "for", "uh-uh", "isn't",
        "don't", ":)", ":D", "!!!", "??", "!?", "\U0001f498", "\U0001f601",
        "☺", "LOVE", "GOOD", "BAD", "TERRIBLE", "dog", "table",
    ]
    with real_vader_analyzer() as real:
        for _ in range(1500):
            words = []
            for _ in range(rng.randint(0, 12)):
                w = rng.choice(pool)
                if rng.random() < 0.15:
                    w = w.upper()
                if rng.random() < 0.1:
                    w += rng.choice(["!", "!!", "?", "...", ",", "."])
                if rng.random() < 0.05:
                    w = rng.choice(["(", '"', "'"]) + w
                words.append(w)
            text = " ".join(words)
            assert scorer.polarity_scores(text) == \
                real.polarity_scores(text), repr(text)


@needs_ref_vader
def test_polarity_scores_exact_on_hypothesis_unicode(scorer):
    """Property: on ARBITRARY unicode (astral emoji, exotic whitespace,
    random codepoints mixed with sentiment/negation/punctuation tokens),
    our scorer returns the identical dict. Hypothesis shrinks any
    divergence to a minimal reproducer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.one_of(
        st.sampled_from(["good", "bad", "love", "hate", "not", "but",
                         "so", "very", "kind", "of", "at", "least",
                         "GOOD", "BAD", ":)", "!!!", "??"]),
        st.text(min_size=1, max_size=8),
        st.text(alphabet=st.characters(min_codepoint=0x1F300,
                                       max_codepoint=0x1F9FF),
                min_size=1, max_size=2),
    )
    texts = st.lists(token, max_size=12).map(" ".join)

    with real_vader_analyzer() as real:

        @settings(max_examples=300, deadline=None)
        @given(texts)
        def check(text):
            assert scorer.polarity_scores(text) == \
                real.polarity_scores(text), repr(text)

        check()


@needs_ref_vader
def test_golden_cache_sentiments_reproduced(scorer):
    """The reference's committed demo-run cache (278 entries,
    .analysis_cache.json) pins the sentiment its VADER branch
    (survey_analysis.py:118-129) assigned to every distinct classified
    answer. The in-engine scorer + threshold rule reproduces ALL of them."""
    with open("/root/reference/.analysis_cache.json", encoding="utf-8") as f:
        cache = json.load(f)
    assert len(cache) == 278
    contrast = ("but", "aunque", "pero")
    diffs = []
    for key, (want_sent, _cat) in cache.items():
        ans = key.split("|||", 2)[2]
        low = ans.lower()
        sc = scorer.polarity_scores(ans)["compound"]
        if sc >= 0.35:
            got = "Positive"
        elif sc <= -0.35:
            got = "Negative"
        elif any(w in low for w in contrast) and abs(sc) < 0.35:
            got = "Mixed"
        else:
            got = "Neutral"
        if got != want_sent:
            diffs.append((ans, want_sent, got, sc))
    assert not diffs, f"{len(diffs)} sentiment diffs: {diffs[:5]}"


@needs_ref_vader
def test_lexicon_loaders_match_package_parsers():
    lex = load_lexicon(os.path.join(REF_VADER_DIR, "vader_lexicon.txt"))
    emo = load_emoji_lexicon(
        os.path.join(REF_VADER_DIR, "emoji_utf8_lexicon.txt"))
    with real_vader_analyzer() as real:
        assert lex == real.lexicon
        assert emo == real.emojis


def test_discovery_env_var(monkeypatch, tmp_path):
    import importlib.util

    monkeypatch.delenv("ARAP_VADER_LEXICON_DIR", raising=False)
    if importlib.util.find_spec("vaderSentiment") is None:
        assert discover_lexicon_dir() is None
    # env var pointing at a dir without the lexicon file -> not discovered
    monkeypatch.setenv("ARAP_VADER_LEXICON_DIR", str(tmp_path))
    assert discover_lexicon_dir() != str(tmp_path)
    # a dir containing vader_lexicon.txt IS discovered
    (tmp_path / "vader_lexicon.txt").write_text("ok\t1.0\n")
    assert discover_lexicon_dir() == str(tmp_path)


def test_build_scorer_none_without_lexicon(monkeypatch, tmp_path):
    monkeypatch.delenv("ARAP_VADER_LEXICON_DIR", raising=False)
    assert build_scorer(str(tmp_path)) is None


def test_scorer_minimal_lexicon_behaviour():
    """Sanity floor that needs no external data: scoring with a 2-word
    lexicon exercises normalization, negation and but-rescaling."""
    s = VaderScorer({"good": 1.9, "bad": -2.5})
    assert s.polarity_scores("")["compound"] == 0.0
    assert s.polarity_scores("good")["compound"] > 0.3
    assert s.polarity_scores("not good")["compound"] < 0
    assert s.polarity_scores("bad")["compound"] < -0.4
    ok = s.polarity_scores("good but bad")
    assert ok["compound"] < 0  # post-but side outweighs


@needs_ref_vader
def test_vader_kernel_uses_engine_scorer(spark):
    """C1 kernel: with a lexicon dir the kernel scores with in-engine
    VADER (uses_vader True) and matches the reference thresholds on
    known-polarity rows."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators.classify import (
        vader_kernel,
    )

    k = vader_kernel(lexicon_dir=REF_VADER_DIR)
    assert k.uses_vader
    rows = [
        ("I love it, absolutely excellent!", "Positive"),
        ("terrible, awful, hate it", "Negative"),
        ("Refund was easy and fast. pero Return process was confusing.",
         "Mixed"),
        ("It is a jacket", "Neutral"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "answer string")
    got = {r["answer"]: r["res"]["sentiment"]
           for r in df.select("answer",
                              k("q", F.col("answer")).alias("res")).collect()}
    for text, want in rows:
        assert got[text] == want, (text, got[text])


def test_vader_kernel_fallback_without_lexicon(spark, monkeypatch, tmp_path):
    """No lexicon discoverable -> the kernel silently takes the
    tiny-lexicon branch (reference survey_analysis.py:131-137)."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark.operators.classify import (
        vader_kernel,
    )

    monkeypatch.delenv("ARAP_VADER_LEXICON_DIR", raising=False)
    k = vader_kernel(lexicon_dir=str(tmp_path))
    assert not k.uses_vader
    df = spark.createDataFrame([("i love it",), ("bad and late",)],
                               "answer string")
    got = [r["res"]["sentiment"]
           for r in df.select(k("q", F.col("answer")).alias("res"))
           .collect()]
    assert got == ["Positive", "Negative"]
