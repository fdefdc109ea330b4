"""Query plan registry: every engine operator exposed as a named query.

Importing this package registers all query modules. ``REGISTRY`` maps the
stable ``q_*`` names from SURVEY.md §2 to (Spark builder, DuckDB oracle)
pairs consumed by ``__spark_entry__``.
"""

from news_categorization_big_data_spark.plans.registry import REGISTRY, QuerySpec, register

# Import for side effect: populate REGISTRY.
from news_categorization_big_data_spark.plans import (  # noqa: E402,F401
    relational,
    scalar_functions,
    timeseries,
    text,
    dedup,
    similarity,
    ml,
)

__all__ = ["REGISTRY", "QuerySpec", "register"]
