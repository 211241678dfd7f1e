"""Deterministic classification kernels (reference C2, C3, P4).

These are the demo-mode fallback classifiers of the reference
(survey_analysis.py:112-141), expressed as pure Spark column expressions:

- lexicon_sentiment: EN+ES positive/negative lexicon hits -> Mixed/Positive/
  Negative/Neutral (survey_analysis.py:131-136, the VADER-unavailable branch)
- keyword_category: FIRST-match over the ordered 6-category taxonomy
  (survey_analysis.py:63-70, 112-116); no match -> "General"

Implementation note (scale): the reference tests substring membership per
word (`any(k in low for k in kws)`). Only EXISTENCE of a hit matters to the
output, so each lexicon compiles to ONE regex alternation -> one rlike scan
per lexicon (2 for sentiment, 6 for the taxonomy) instead of ~90 substring
probes per row. Same truth table, ~10x less work per row, and a vastly
smaller Catalyst expression tree (plan-compile time matters when a survey
has dozens of question columns).

Each kernel also emits its exact ANSI-SQL twin (``*_sql``) generated from
the SAME constant lists, so the DuckDB oracle can never drift from the
Spark plan.

The probabilistic variants (C1 VADER, C5 LLM) live in operators/classify.py
as pandas-UDF kernels -- not SQL-expressible, rows-only oracle checks.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# survey_analysis.py:57
SENTIMENT_ORDER: tuple[str, ...] = ("Positive", "Neutral", "Negative", "Mixed")

# survey_analysis.py:132-133 (fallback lexicon, EN+ES). Substring match.
POS_LEXICON: tuple[str, ...] = (
    "love", "loved", "great", "liked it", "like it", "good", "so good",
    "excellent", "amazing", "encanta", "muy bueno", "bueno", "me gustó",
    "gustaron", "genial", "excelente",
)
NEG_LEXICON: tuple[str, ...] = (
    "bad", "poor", "terrible", "awful", "hate", "malo", "expensive",
    "too expensive", "caro", "carísimo", "tarde", "defecto", "delay",
    "delayed", "late",
)

# survey_analysis.py:126 -- contrast conjunctions that flip low-confidence
# VADER scores to Mixed. Used only by the VADER pandas-UDF kernel.
CONTRAST_WORDS: tuple[str, ...] = ("but", "aunque", "pero")

# survey_analysis.py:63-70 -- ordered taxonomy; FIRST category with any
# keyword hit wins, so evaluation order is semantic, not cosmetic.
DEMO_KEYWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("Price", ("price", "expensive", "too expensive", "cheap", "cost",
               "pricing", "value", "caro", "barato", "precio")),
    ("Shipping", ("ship", "shipping", "delivery", "arrive", "delay",
                  "delayed", "late", "envío", "envio", "tarde", "demor",
                  "entrega")),
    ("Quality", ("quality", "material", "durable", "break", "defect",
                 "defecto", "calidad")),
    ("Fit", ("fit", "size", "sizing", "tight", "loose", "talla", "ajuste",
             "grande", "chico")),
    ("Design", ("design", "style", "color", "look", "diseño", "estilo",
                "colores")),
    ("Support", ("support", "help", "service", "refund", "return", "soporte",
                 "atención", "atencion", "reembolso", "devolución",
                 "devolucion")),
)


def _alternation(words: tuple[str, ...]) -> str:
    """Literal alternation regex: `w in low` for any w  <=>  one rlike.
    re.escape only escapes ASCII specials, which is valid in both Java
    regex (Spark) and RE2 (DuckDB)."""
    return "|".join(re.escape(w) for w in words)


POS_PATTERN = _alternation(POS_LEXICON)
NEG_PATTERN = _alternation(NEG_LEXICON)
CATEGORY_PATTERNS: tuple[tuple[str, str], ...] = tuple(
    (cat, _alternation(kws)) for cat, kws in DEMO_KEYWORDS
)


def _low(text: Column) -> Column:
    return F.lower(F.trim(F.coalesce(text, F.lit(""))))


def lexicon_sentiment(text: Column) -> Column:
    """Deterministic sentiment (survey_analysis.py:131-136).

    pos-hit and neg-hit -> Mixed; pos -> Positive; neg -> Negative; else
    Neutral. (The reference counts hits, but only >0 is ever used.)
    """
    low = _low(text)
    p = low.rlike(POS_PATTERN)
    n = low.rlike(NEG_PATTERN)
    return (
        F.when(p & n, "Mixed")
        .when(p, "Positive")
        .when(n, "Negative")
        .otherwise("Neutral")
    )


def keyword_category(text: Column) -> Column:
    """Deterministic category: first taxonomy match wins
    (survey_analysis.py:112-116)."""
    low = _low(text)
    expr = None
    for cat, pat in CATEGORY_PATTERNS:
        cond = low.rlike(pat)
        expr = F.when(cond, cat) if expr is None else expr.when(cond, cat)
    return expr.otherwise("General")


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB oracle) -- generated from the same constants
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_low(text_expr: str) -> str:
    return f"lower(trim(coalesce({text_expr}, '')))"


def lexicon_sentiment_sql(text_expr: str) -> str:
    """DuckDB CASE expression equivalent to :func:`lexicon_sentiment`."""
    low = _sql_low(text_expr)
    p = f"regexp_matches({low}, {_sql_quote(POS_PATTERN)})"
    n = f"regexp_matches({low}, {_sql_quote(NEG_PATTERN)})"
    return (
        f"CASE WHEN {p} AND {n} THEN 'Mixed' "
        f"WHEN {p} THEN 'Positive' "
        f"WHEN {n} THEN 'Negative' ELSE 'Neutral' END"
    )


def keyword_category_sql(text_expr: str) -> str:
    """DuckDB CASE expression equivalent to :func:`keyword_category`."""
    low = _sql_low(text_expr)
    whens = " ".join(
        f"WHEN regexp_matches({low}, {_sql_quote(pat)}) THEN {_sql_quote(cat)}"
        for cat, pat in CATEGORY_PATTERNS
    )
    return f"CASE {whens} ELSE 'General' END"


def clean_text_sql(text_expr: str) -> str:
    """DuckDB twin of functions.text.clean_text."""
    s = f"trim(coalesce(CAST({text_expr} AS VARCHAR), ''))"
    s = f"regexp_replace({s}, '[\\x{{10000}}-\\x{{10FFFF}}]', '', 'g')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def is_filler_sql(text_expr: str) -> str:
    """DuckDB twin of functions.text.is_filler."""
    from automated_review_analysis_pipeline_spark.functions.text import FILLER_VALUES

    vals = ", ".join(_sql_quote(v) for v in FILLER_VALUES)
    return f"lower(trim(coalesce(CAST({text_expr} AS VARCHAR), ''))) IN ({vals})"
