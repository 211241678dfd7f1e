"""PySpark-native analytics engine with the capabilities of
SylviaZam/Automated-Review-Analysis-Pipeline, rebuilt Spark-first.

The reference (survey_analysis.py, 499 lines of single-process pandas) is a
survey-review ETL: CSV -> clean -> per-answer classification -> multi-product
explode -> wide pivot -> summary pivot -> Excel. This package re-expresses
every one of those operators as declarative Spark DataFrame plans (Catalyst
optimizes; no hand-rolled planner), and extends the surface with the
large-scale training-data-pipeline operators the driver contract mandates:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language ID, quality scoring, token counting, fingerprinting), multimodal
column plumbing, a relational core over a TPC-H-ish star schema, and
event-time windowing in both batch and Structured Streaming forms.

Layout:
    functions/   pure Column-expression kernels (clean, filler, sentiment,
                 category, vector math) -- JVM-side, whole-stage-codegen
    operators/   composable DataFrame -> DataFrame operators (reshape, cache,
                 dedup, similarity, text analysis, relational, events)
    sources/     readers (survey CSV contract, star-schema parquet loader)
    plans/       end-to-end pipelines (the survey wide/summary plan)
    streaming/   Structured Streaming variants of the event operators
    sinks/       Excel workbook writer (driver-side) + scalable alternatives
"""

__version__ = "0.1.0"
