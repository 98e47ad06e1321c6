"""Query/operator definitions (the SURVEY.md §2.3 inventory).

Importing this package populates the registry in
:mod:`distributed_query_engine_spark.registry`.
"""

from distributed_query_engine_spark.plans import analytic  # noqa: F401
from distributed_query_engine_spark.plans import llm  # noqa: F401
from distributed_query_engine_spark.plans import relational  # noqa: F401
from distributed_query_engine_spark.plans import retrieval  # noqa: F401
from distributed_query_engine_spark.plans import scalar  # noqa: F401
from distributed_query_engine_spark.plans import sources  # noqa: F401
from distributed_query_engine_spark.plans import streaming  # noqa: F401
from distributed_query_engine_spark.plans import tpch  # noqa: F401
from distributed_query_engine_spark.plans import udf  # noqa: F401
from distributed_query_engine_spark.plans import windows  # noqa: F401
