"""A PySpark-native distributed analytics engine.

Re-expresses the query surface of ``dias-hbp-sp8/Distributed-Query-Engine``
(reference: ``/root/reference/DistributedQueryEngine.diff`` — a Hive/JDBC
federation patch over the RAW staged-compiler engine) as an idiomatic
Spark SQL / DataFrame library, plus large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md §7): the reference spends its complexity on a
staged compiler, a rewrite framework, federation pushdown, and schema
inference — all of which are Spark built-ins (Catalyst, DSv2 pushdown,
DataFrameReader inference). This package therefore contains no parser, IR,
or optimizer: it is a thin, well-tested operator library declared through
the DataFrame API so Catalyst/Tungsten/AQE pick the physical strategy.
"""

__version__ = "0.1.0"

from distributed_query_engine_spark.session import get_spark  # noqa: F401
from distributed_query_engine_spark.catalog import SourceCatalog, Tables  # noqa: F401
