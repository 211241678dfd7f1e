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


def read_survey_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load a survey CSV. multiLine+escape because free-text answers carry
    embedded commas, quotes, and newlines (pandas' default parser handles
    these; Spark needs the options)."""
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    validate_survey_schema(df)
    return df


def validate_survey_schema(df: DataFrame) -> None:
    if len(df.columns) < 4:
        raise SurveySchemaError(
            "survey input needs >= 4 columns: Email, Name, Products, "
            f"and at least one question column; got {df.columns}"
        )


def question_columns(df: DataFrame) -> list[str]:
    """All columns after index 2 (survey_analysis.py:86-88)."""
    return list(df.columns[3:]) if len(df.columns) > 3 else []
