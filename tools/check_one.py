"""Single-query oracle check for fast iteration:

    python tools/check_one.py NAME [NAME...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamprocessing_kafka_finlight_news_dashboard_spark import get_spark, plans
from tests.oracle_compare import compare, duckdb_conn


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    spark = get_spark(app_name="check-one")
    con = duckdb_conn(sf_dir)
    rc = 0
    for name in args:
        q = plans.CATALOG[name]
        t0 = time.perf_counter()
        try:
            if q.oracle is None:
                n = q.builder(spark, sf_dir).count()
                status = f"rows-only ({n} rows)"
                rc |= int(n == 0)
            else:
                issues = compare(q.builder(spark, sf_dir), con.execute(q.oracle).df())
                status = "OK" if not issues else f"MISMATCH {issues}"
                rc |= int(bool(issues))
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {type(e).__name__}: {str(e)[:300]}"
            rc = 1
        print(f"{name}: {status} [{time.perf_counter() - t0:.1f}s]", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
