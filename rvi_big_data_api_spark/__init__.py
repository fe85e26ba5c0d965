"""PySpark-native analytics engine with the query/data-processing
capabilities of PDXostc/rvi_big-data_api, re-expressed Spark-first.

Importing this package populates the query registry (each operator module
registers its SURVEY.md §2 entries on import).
"""

from __future__ import annotations

from .registry import REGISTRY, oracles, queries  # noqa: F401
from .session import get_spark  # noqa: F401

# Operator modules register queries on import; keep this list in sync with
# SURVEY.md §2's sections.
from .functions import scalars, udfs  # noqa: F401,E402
from .sources import formats  # noqa: F401,E402
from .streaming import streams  # noqa: F401,E402
from .operators import (  # noqa: F401
    aggregates,
    filters,
    joins,
    llm_dedup,
    llm_sim,
    llm_text,
    multimodal,
    setops,
    sorts,
    telemetry,
    windows,
)  # noqa: F401,E402

__all__ = ["REGISTRY", "queries", "oracles", "get_spark"]
