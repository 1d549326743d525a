"""Driver-parity sweep: run EVERY oracle-bearing catalog query against
DuckDB at a given scale factor with the driver-style compare (row
count + sorted-column schema + canonicalized value hash), plus a
rows-only smoke for the non-SQL entries.

This is the same gate the external driver applies per round, runnable
locally at any SF before shipping:

    python tools/check_all.py [/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamprocessing_kafka_finlight_news_dashboard_spark import get_spark, plans
from tests.oracle_compare import compare, duckdb_conn


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check-all")
    con = duckdb_conn(sf_dir)
    bad: list[str] = []
    n_oracle = n_rows_only = 0
    t0 = time.perf_counter()
    for name, q in plans.CATALOG.items():
        try:
            if q.oracle is None:
                n = q.builder(spark, sf_dir).count()
                status = f"rows-only ({n} rows)" + (" DEGENERATE" if n == 0 else "")
                if n == 0:
                    bad.append(name)
                n_rows_only += 1
            else:
                issues = compare(q.builder(spark, sf_dir), con.execute(q.oracle).df())
                status = "OK" if not issues else f"MISMATCH {issues}"
                if issues:
                    bad.append(name)
                n_oracle += 1
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            status = f"ERROR {type(e).__name__}: {str(e)[:160]}"
            bad.append(name)
        print(f"{name}: {status}", flush=True)
    print(
        f"\n{n_oracle} oracle-checked + {n_rows_only} rows-only in "
        f"{time.perf_counter() - t0:.0f}s | FAILURES: {bad or 'none'}"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
