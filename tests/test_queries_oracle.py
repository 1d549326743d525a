"""Every catalog query with an oracle must hash-match DuckDB at
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from streamprocessing_kafka_finlight_news_dashboard_spark import plans
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duckdb_conn

ORACLE_QUERIES = sorted(n for n, q in plans.CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in plans.CATALOG.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, con, name):
    q = plans.CATALOG[name]
    spark_df = q.builder(spark, SF_SMOKE)
    oracle_df = con.execute(q.oracle).fetchdf()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = plans.CATALOG[name]
    df = q.builder(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
