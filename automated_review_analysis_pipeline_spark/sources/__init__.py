"""Input readers: the survey CSV contract and the star-schema parquet loader."""

from automated_review_analysis_pipeline_spark.sources.survey import read_survey_csv, question_columns  # noqa: F401
from automated_review_analysis_pipeline_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
