"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(streamprocessing_kafka_finlight_news_dashboard_spark.plans): every
implemented operator from SURVEY.md §2 is registered there with a
builder + (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamprocessing_kafka_finlight_news_dashboard_spark import plans  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the point-in-time lookback range join + min-count
    gate — the reference's core sentiment-feature semantics
    (SURVEY §2.3 J1) — on sf0.001."""
    return plans.CATALOG["pit_lookback_join"].builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; entries
    absent here (stateful backtest, xxhash-based sketches) take the
    driver's rows-only check."""
    return plans.oracle_map()
