"""Query/operator definitions (the SURVEY.md §2.3 inventory).

Importing this package populates the registry in
:mod:`distributed_query_engine_spark.registry`.
"""

from distributed_query_engine_spark.plans import relational  # noqa: F401
