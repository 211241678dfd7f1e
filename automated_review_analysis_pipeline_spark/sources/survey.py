"""Survey CSV source (reference S1-S3).

Positional schema contract (survey_analysis.py:6-11, 86-88): columns are
``Email, Name, Products, <question 1>, <question 2>, ...`` -- every column
after index 2 is a free-text question whose header string IS the question
text. Schema is dynamic; all survey columns are strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class SurveySchemaError(ValueError):
    """Raised when the input violates the >=4-column survey contract
    (survey_analysis.py:471-473, which exits(1))."""


# pandas.read_csv's documented default NA token set: the reference loads
# with bare pd.read_csv (survey_analysis.py:465), so a question cell
# holding any of these strings becomes NaN, which str() later renders as
# the literal "nan" (deliberately swallowed by FILLER_VALUES). Spark's CSV
# reader keeps them as strings; mapping them to null here reproduces the
# reference's parse exactly.
PANDAS_NA_TOKENS: tuple[str, ...] = (
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
)


def read_survey_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load a survey CSV. multiLine+escape because free-text answers carry
    embedded commas, quotes, and newlines (pandas' default parser handles
    these; Spark needs the options). Question columns get pandas'
    NA-token parse (see PANDAS_NA_TOKENS) so downstream cells match the
    reference byte-for-byte; Email/Name/Products are left verbatim --
    they are never NA in practice and our product parser's explicit
    "Unspecified" beats the reference's accidental "nan" product."""
    from pyspark.sql import functions as F

    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    validate_survey_schema(df)
    head = df.columns[:3]
    return df.select(
        *head,
        *[
            F.when(F.col(q).isin(*PANDAS_NA_TOKENS), F.lit(None))
            .otherwise(F.col(q)).alias(q)
            for q in df.columns[3:]
        ],
    )


def validate_survey_schema(df: DataFrame) -> None:
    if len(df.columns) < 4:
        raise SurveySchemaError(
            "survey input needs >= 4 columns: Email, Name, Products, "
            f"and at least one question column; got {df.columns}"
        )


def question_columns(df: DataFrame) -> list[str]:
    """All columns after index 2 (survey_analysis.py:86-88)."""
    return list(df.columns[3:]) if len(df.columns) > 3 else []
