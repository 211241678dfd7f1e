"""Pure Column-expression kernels.

Everything here is a composition of built-in pyspark.sql.functions -- JVM
side, inside whole-stage codegen, no Python in the hot path. Each kernel has
a matching ANSI-SQL form (see __spark_entry__.oracle_sql) so the DuckDB
oracle can verify it value-for-value.
"""

from automated_review_analysis_pipeline_spark.functions.text import (  # noqa: F401
    FILLER_VALUES,
    clean_text,
    is_filler,
    normalize_sentiment,
    sanitize_base,
    sanitize_sheet_name,
)
from automated_review_analysis_pipeline_spark.functions.classify import (  # noqa: F401
    CONTRAST_WORDS,
    DEMO_KEYWORDS,
    NEG_LEXICON,
    POS_LEXICON,
    SENTIMENT_ORDER,
    keyword_category,
    lexicon_sentiment,
)
from automated_review_analysis_pipeline_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
