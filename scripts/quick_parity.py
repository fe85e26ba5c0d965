"""Quick parity harness for a subset of queries — the inner loop while
developing a new operator (full replica: scripts/replica_drive.py if present,
else tests/test_parity.py).

Usage: python scripts/quick_parity.py name1 name2 ... [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from rvi_big_data_api_spark.registry import REGISTRY
from rvi_big_data_api_spark.schemas import TABLES
from rvi_big_data_api_spark.session import get_spark


def main() -> int:
    sf = "/root/testdata/sf0.01"
    argv = sys.argv[1:]
    if "--sf" in argv:
        idx = argv.index("--sf")
        sf = argv[idx + 1]
        del argv[idx : idx + 2]  # drop the flag AND its value (else the
        # directory is looked up as a query name — ADVICE r7)
    args = [a for a in argv if not a.startswith("--")]
    from parity import assert_frames_match, canon_rows

    spark = get_spark("quick-parity")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{os.path.join(sf, name + '.parquet')}')"
        )
    failed = []
    for name in args:
        spec = REGISTRY.get(name)
        if spec is None:
            failed.append(name)
            print(f"{name}: FAIL — unknown query (not in REGISTRY)")
            continue
        try:
            spark_pdf = spec.fn(spark, sf).toPandas()
            if spec.oracle is None:
                pdf2 = spec.fn(spark, sf).toPandas()
                assert canon_rows(spark_pdf) == canon_rows(pdf2), "nondeterministic"
                print(f"{name}: ROWS-ONLY OK ({len(spark_pdf)} rows)")
                continue
            duck_pdf = con.execute(spec.oracle).df()
            assert_frames_match(spark_pdf, duck_pdf, name)
            print(f"{name}: MATCH ({len(spark_pdf)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:500]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
