"""parq_tools_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing capabilities of
elphick/parq-tools (reference, read-only at ``/root/reference/``),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
distributed Parquet IO, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference does not have.
"""

__version__ = "0.1.0"

from parq_tools_spark.session import get_spark  # noqa: F401
