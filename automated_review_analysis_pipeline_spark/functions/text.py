"""Text-cleaning kernels (reference P1-P9).

Semantics match survey_analysis.py exactly; implementation is pure Spark
column expressions so Catalyst keeps them inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# survey_analysis.py:60 -- values meaning "no feedback". The " " entry is
# dead after trim (covered by ""), kept for documentation parity.
FILLER_VALUES: tuple[str, ...] = (
    "", "n/a", "na", "no", "none", "null", "nan",
    "sin comentarios", "ninguno", "-", " ",
)

# survey_analysis.py:80 -- astral-plane codepoints only (emoji etc.).
# BMP symbols such as U+2639 are deliberately NOT stripped; do not widen.
_ASTRAL_RE = r"[\x{10000}-\x{10FFFF}]"


def clean_text(c: Column) -> Column:
    """strip -> drop astral codepoints -> collapse whitespace -> strip.

    Mirror of clean_text (survey_analysis.py:76-81). Nulls (Spark CSV reads
    empty cells as null; pandas turned them into the string "nan") normalize
    to "" so filler semantics stay aligned with the reference.
    """
    s = F.trim(F.coalesce(c.cast("string"), F.lit("")))
    s = F.regexp_replace(s, _ASTRAL_RE, "")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def is_filler(c: Column) -> Column:
    """lower(trim(s)) in FILLER_VALUES (survey_analysis.py:83-84)."""
    return F.lower(F.trim(F.coalesce(c.cast("string"), F.lit("")))).isin(
        list(FILLER_VALUES)
    )


def normalize_sentiment(c: Column) -> Column:
    """Canonicalize to the 4-value enum; unknown -> Neutral
    (survey_analysis.py:90-93)."""
    low = F.lower(F.trim(F.coalesce(c, F.lit(""))))
    return (
        F.when(low == "positive", "Positive")
        .when(low == "negative", "Negative")
        .when(low == "mixed", "Mixed")
        .otherwise("Neutral")
    )


def sanitize_base(header: str) -> str:
    """Question header -> output-column base: whitespace runs -> "_"
    (survey_analysis.py:105-106). Driver-side: runs while building the
    select list, never on data."""
    return re.sub(r"\s+", "_", str(header).strip())


def sanitize_sheet_name(name: str) -> str:
    """Excel sheet-name rules (survey_analysis.py:367-368): replace
    [:\\/?*\\[\\]] with space, cap at 31 chars, empty -> "Sheet"."""
    cleaned = re.sub(r"[:\\/?*\[\]]", " ", str(name))[:31].strip()
    return cleaned or "Sheet"
