"""End-to-end lazy plans composed from the operator library."""

from automated_review_analysis_pipeline_spark.plans.survey_pipeline import (  # noqa: F401
    analyze_wide,
    demo_classifier,
)
