"""clusterforge_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``kunalsinghdadhwal/clusterforge`` (a single-node Rust CLI doing
RFM feature engineering + K-means customer segmentation; see SURVEY.md),
re-expressed idiomatically on Spark DataFrames, built-in SQL expressions and
MLlib — plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Design stance (SURVEY.md §7):
  * DataFrame/SQL first — declarative plans, Catalyst optimizes.
  * No driver-side row data: ``collect()`` only on k-row results.
  * Explicit schemas (no inference pass at scale), Parquet-first.
  * AQE on; broadcast small dims; exact + approx variants of heavy aggs.
  * Python UDFs only where built-ins genuinely can't express the op
    (multimodal decode), and then Arrow-batched via mapInPandas.
"""

from clusterforge_spark.session import get_spark, configure_runtime

__all__ = ["get_spark", "configure_runtime"]
__version__ = "0.1.0"
