"""Query inventory. Importing this package registers every query."""

from etl_expenses_spark.plans.registry import REGISTRY, Query, query  # noqa: F401

# Registration side-effects — each module fills REGISTRY.
from etl_expenses_spark.plans import core  # noqa: F401,E402
from etl_expenses_spark.plans import functions_demo  # noqa: F401,E402
from etl_expenses_spark.plans import text_ops  # noqa: F401,E402
from etl_expenses_spark.plans import dedup_ops  # noqa: F401,E402
from etl_expenses_spark.plans import similarity_ops  # noqa: F401,E402
from etl_expenses_spark.plans import temporal_ops  # noqa: F401,E402
from etl_expenses_spark.plans import advanced  # noqa: F401,E402
from etl_expenses_spark.plans import schema_ops  # noqa: F401,E402
from etl_expenses_spark.plans import relational_ext  # noqa: F401,E402
from etl_expenses_spark.plans import tpch_more  # noqa: F401,E402
from etl_expenses_spark.plans import behavior_ops  # noqa: F401,E402
