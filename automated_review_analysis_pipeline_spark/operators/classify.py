"""Pluggable classification kernels (reference C1, C4, C5, C6).

Three interchangeable engines, same contract as the deterministic column
kernels in functions/classify.py but running as Arrow-batched pandas UDFs
(the slow path -- used only when the semantics genuinely need Python or an
API call):

- vader_kernel     : C1, VADER compound score with contrast-word Mixed rule
                     (survey_analysis.py:118-129); falls back to the
                     lexicon automatically when vaderSentiment is absent,
                     exactly like the reference (:131-136).
- llm_kernel       : C5+C6, OpenAI-compatible chat completion with 5-try
                     exponential backoff (1s doubling, 8s cap) and the
                     (Neutral, No Feedback) failure default
                     (survey_analysis.py:171-217). Builds its client INSIDE
                     the UDF (per executor); prompt text preserved.
- stub_kernel      : deterministic fake with the same plumbing -- tests and
                     demo runs exercise batching/retry paths at zero cost.

All kernels return a struct<sentiment string, category string> column and
plug into plans/survey_pipeline.analyze_wide or operators/cache.

Scale: Arrow batch size rides spark.sql.execution.arrow.maxRecordsPerBatch;
API-mode concurrency is bounded by partition count (`repartition(n)` before
the classify stage = n concurrent API streams, the engine's replacement for
the reference's single sequential request loop).
"""

from __future__ import annotations

import sys
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from automated_review_analysis_pipeline_spark.functions.classify import (
    CONTRAST_WORDS,
    DEMO_KEYWORDS,
    NEG_LEXICON,
    POS_LEXICON,
)
from automated_review_analysis_pipeline_spark.functions.text import FILLER_VALUES

_FILLER = set(FILLER_VALUES)

RESULT_TYPE = "sentiment string, category string"

# C5 prompt text, byte-identical to the reference's literals
# (survey_analysis.py:182-187) -- with a real key, classifications must
# match the reference's, so the wording cannot drift. Pinned by
# tests/test_llm_kernel.py::test_prompt_text_matches_reference_verbatim.
SYS_PROMPT = ("You are an expert CRM assistant that analyzes online "
              "customer feedback.")


def build_user_prompt(industry: str, question_text: str, answer: str) -> str:
    return (
        "Respond ONLY as JSON with keys 'sentiment' and 'category'.\n"
        f"Industry: {industry}\nQuestion: {question_text}\nAnswer: {answer}\n"
        "Sentiment must be one of: Positive, Neutral, Negative, Mixed. "
        "Category should be 1 to 3 words."
    )

_NORMALIZE = {"positive": "Positive", "neutral": "Neutral",
              "negative": "Negative", "mixed": "Mixed"}


def _normalize_sentiment(s: str) -> str:
    return _NORMALIZE.get((s or "").strip().lower(), "Neutral")


def _demo_category(low: str) -> str:
    for cat, kws in DEMO_KEYWORDS:
        if any(k in low for k in kws):
            return cat
    return "General"


def _lexicon_sentiment(low: str) -> str:
    p = any(w in low for w in POS_LEXICON)
    n = any(w in low for w in NEG_LEXICON)
    return "Mixed" if (p and n) else (
        "Positive" if p else ("Negative" if n else "Neutral"))


def vader_kernel(
    lexicon_dir: str | None = None,
) -> Callable[[str, Column], Column]:
    """C1: VADER compound >= 0.35 -> Positive; <= -0.35 -> Negative;
    |score| < 0.35 with a contrast conjunction -> Mixed; else Neutral
    (survey_analysis.py:118-129).

    The scorer is the ENGINE'S OWN implementation of the published VADER
    algorithm (functions/vader.py, score-exact vs vaderSentiment 3.3.2);
    the word/emoji lexicons load once on the driver -- from
    ``lexicon_dir``, the ``ARAP_VADER_LEXICON_DIR`` env var, or an
    installed vaderSentiment package -- and ride the UDF closure to the
    executors. No lexicon discoverable -> tiny-lexicon fallback, exactly
    like the reference when its optional import fails (:131-137)."""
    from automated_review_analysis_pipeline_spark.functions.vader import (
        build_scorer,
    )

    scorer = build_scorer(lexicon_dir)

    @pandas_udf(RESULT_TYPE)
    def _vader(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in texts:
            sents, cats = [], []
            for t in batch.fillna(""):
                txt = str(t).strip()
                low = txt.lower()
                if scorer is not None:
                    sc = scorer.polarity_scores(txt)["compound"]
                    if sc >= 0.35:
                        s = "Positive"
                    elif sc <= -0.35:
                        s = "Negative"
                    elif any(w in low for w in CONTRAST_WORDS) \
                            and abs(sc) < 0.35:
                        s = "Mixed"
                    else:
                        s = "Neutral"
                else:
                    s = _lexicon_sentiment(low)
                sents.append(s)
                cats.append(_demo_category(low))
            yield pd.DataFrame({"sentiment": sents, "category": cats})

    def classifier(question_text: str, answer: Column) -> Column:
        return _vader(answer)

    classifier.uses_vader = scorer is not None
    return classifier


def stub_kernel(tag: str = "Stub") -> Callable[[str, Column], Column]:
    """Deterministic fake LLM: same UDF plumbing (Arrow batches, struct
    result), zero cost. sentiment = lexicon; category = first token
    capitalized or ``tag``."""

    @pandas_udf(RESULT_TYPE)
    def _stub(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in texts:
            low = batch.fillna("").astype(str).str.strip().str.lower()
            sents = low.map(_lexicon_sentiment)
            cats = low.str.split().str[0].fillna("").str.capitalize()
            cats = cats.where(cats != "", tag)
            yield pd.DataFrame({"sentiment": sents, "category": cats})

    def classifier(question_text: str, answer: Column) -> Column:
        return _stub(answer)

    return classifier


def llm_kernel(
    industry: str,
    model: str = "gpt-4o-mini",
    max_tokens: int = 40,
    max_retries: int = 5,
    api_base: str | None = None,
    client_factory: Callable[[], object] | None = None,
    base_delay: float = 1.0,
) -> Callable[[str, Column], Column]:
    """C5+C6: LLM classification via an OpenAI-compatible endpoint.

    Reference-parity details (survey_analysis.py:171-217):
    - system prompt: expert CRM assistant; user prompt embeds Industry,
      Question (raw header text), Answer; JSON response format
    - temperature 0.1, max_tokens 40
    - retry with exponential backoff: 5 tries, 1s doubling, 8s cap
    - terminal failure -> ("Neutral", "No Feedback") + stderr warning
    - empty category -> "No Feedback"

    The question text is embedded per-column at plan time (each question
    column gets its own UDF closure), matching how the reference sends the
    header text with every request.

    ``client_factory`` injects an OpenAI-compatible client builder (tests
    pass a fake; production default constructs the real one per executor);
    ``base_delay`` scales the backoff (tests set ~0 to avoid sleeping).
    """

    def classifier(question_text: str, answer: Column) -> Column:
        @pandas_udf(RESULT_TYPE)
        def _llm(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            import json

            try:
                if client_factory is not None:
                    client = client_factory()
                else:
                    from openai import OpenAI  # type: ignore
                    kwargs = {"base_url": api_base} if api_base else {}
                    client = OpenAI(**kwargs)
            except Exception:
                client = None

            def classify_one(ans: str) -> tuple[str, str]:
                # In-UDF filler guard: the plan's when/otherwise picks the
                # right OUTPUT for filler rows, but Spark hoists Python
                # UDFs into an ArrowEvalPython stage that runs for ALL
                # rows -- without this check filler rows would still cost
                # an API call (the reference's P3 saved ~17% of calls).
                if (ans or "").strip().lower() in _FILLER:
                    return "Neutral", "No Feedback"
                if client is None:
                    return "Neutral", "No Feedback"
                delay = base_delay
                for attempt in range(max_retries):
                    try:
                        resp = client.chat.completions.create(
                            model=model,
                            temperature=0.1,
                            max_tokens=max_tokens,
                            response_format={"type": "json_object"},
                            messages=[
                                {"role": "system", "content": SYS_PROMPT},
                                {"role": "user", "content":
                                 build_user_prompt(industry, question_text,
                                                   ans)},
                            ],
                        )
                        content = resp.choices[0].message.content or "{}"
                        data = json.loads(content)
                        sentiment = _normalize_sentiment(
                            str(data.get("sentiment", "Neutral")))
                        category = (data.get("category")
                                    or "No Feedback").strip()
                        if not category:
                            category = "No Feedback"
                        return sentiment, category
                    except Exception as e:
                        if attempt == max_retries - 1:
                            print(f"LLM classify failed after {max_retries} "
                                  f"tries: {e}", file=sys.stderr)
                            return "Neutral", "No Feedback"
                        time.sleep(delay)
                        delay = min(delay * 2, 8.0 * base_delay)
                return "Neutral", "No Feedback"

            for batch in texts:
                pairs = [classify_one(str(t)) for t in batch.fillna("")]
                yield pd.DataFrame(pairs, columns=["sentiment", "category"])

        return _llm(answer)

    # P6: only API-bound text is truncated to max_chars
    # (survey_analysis.py:264-265); analyze_wide reads this flag
    classifier.truncate_input = True
    return classifier
