"""Local replica of the driver's Spark-vs-DuckDB compare.

Canonicalization: sort columns by name, normalize cell values to hashable
canonical Python forms (timestamps → ISO strings, floats kept exact, lists →
tuples), sort rows, then require exact multiset equality. This is at least as
strict as the driver's order-insensitive value-hash, so passing here should
imply passing t2.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar / array
        return _canon_cell(v.tolist())
    if isinstance(v, pd.Interval):
        return str(v)
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column names differ\n spark={s_cols}\n duck ={d_cols}"
    # Type-strictness: int-vs-float dtype drift (e.g. DuckDB epoch() → DOUBLE
    # vs Spark unix_timestamp → BIGINT) would pass a value compare (300 ==
    # 300.0) but fail the driver's hash. Require matching dtype *kinds*.
    for c in s_cols:
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        # nullable ints surface as 'f' (NaN) or 'O' in either engine; allow
        # i/u/f/O to cross-match only when one side has nulls.
        if sk != dk and not (spark_pdf[c].isna().any() or duck_pdf[c].isna().any()):
            assert sk == dk, f"{name}: column {c!r} dtype kind differs: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count differs spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canon_rows(spark_pdf)
    d_rows = canon_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        msg = "\n".join(f"  row {i}:\n    spark={a}\n    duck ={b}" for i, a, b in diffs[:5])
        raise AssertionError(f"{name}: {len(diffs)} mismatched rows (of {len(s_rows)}):\n{msg}")
