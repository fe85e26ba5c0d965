"""Cross-dialect expression helpers (SURVEY.md §1 gotchas, mechanized).

Oracle-checked queries must produce byte-identical values in Spark and DuckDB.
These helpers pin the three fragile spots:

- temporal outputs → formatted strings (`ts_str`) — Spark emits µs timestamps,
  DuckDB ns; strings remove the precision/ dtype ambiguity from the hash;
- float aggregates → `round` in BOTH dialects (callers use F.round + SQL round);
- division → `safe_div` (NULL on zero denominator in both dialects).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"


def ts_str(col: Column | str, unit: str = "second") -> Column:
    """Truncate a timestamp to `unit` and render as 'yyyy-MM-dd HH:mm:ss'.

    DuckDB twin: ``strftime(date_trunc('<unit>', col), '%Y-%m-%d %H:%M:%S')``.
    """
    return F.date_format(F.date_trunc(unit, col), SPARK_TS_FMT)


def duck_ts_str(expr: str, unit: str = "second") -> str:
    """The DuckDB-side twin of ``ts_str`` as a SQL fragment."""
    return f"strftime(date_trunc('{unit}', {expr}), '{DUCK_TS_FMT}')"


def date_str(col: Column | str) -> Column:
    """Render a timestamp's date part as 'yyyy-MM-dd' (DuckDB twin:
    ``strftime(col, '%Y-%m-%d')``)."""
    return F.date_format(col, "yyyy-MM-dd")


def safe_div(num: Column, den: Column) -> Column:
    """NULL-guarded division; DuckDB twin: ``num / nullif(den, 0)``."""
    return num / F.nullif(den, F.lit(0))
