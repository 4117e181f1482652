"""Query catalog: every operator from SURVEY.md §2 (plus the scale
extensions) exposed as a named (spark, sf_dir) -> DataFrame callable with a
matching DuckDB oracle SQL string where the semantics are SQL-expressible.

``__spark_entry__.py`` and ``bench.py`` both consume this registry.
"""

from nexgap_spark.plans.registry import ORACLES, QUERIES  # noqa: F401

# Importing the modules populates the registry.
from nexgap_spark.plans import relational  # noqa: F401, E402
from nexgap_spark.plans import spans_rel  # noqa: F401, E402
from nexgap_spark.plans import textops  # noqa: F401, E402
from nexgap_spark.plans import similarity  # noqa: F401, E402
from nexgap_spark.plans import document_pipeline  # noqa: F401, E402
from nexgap_spark.plans import temporal  # noqa: F401, E402
from nexgap_spark.plans import analytics  # noqa: F401, E402
from nexgap_spark.plans import curation  # noqa: F401, E402
from nexgap_spark.plans import advanced  # noqa: F401, E402
