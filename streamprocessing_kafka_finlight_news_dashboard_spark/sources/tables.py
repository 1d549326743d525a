"""Batch sources over the driver's parquet tables.

The reference loads every table as whole-file pandas parquet scans
(reference scripts/03_add_sentiment.py:20, 04_correlation_analysis.py:19,32,
06_strategy_signals.py:41,49, 07_backtest.py:170,179 — SURVEY §2.1 S1).
Here every scan is a lazy ``spark.read.parquet`` so Catalyst pushes
filters and prunes columns down to the parquet reader; callers should
``select``/``filter`` immediately after load and let pushdown do the
I/O reduction (verified in tests via ``explain``: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's TPC-H-ish star schema + stream/text/vector tables
# (TESTDATA.md). One parquet file per table per scale factor.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one driver table (SURVEY §2.1 S1).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; we read nanos as long
    (runtime-settable legacy conf) and floor-divide to microseconds —
    the exact truncation DuckDB applies when it loads the same file
    into its microsecond TIMESTAMP, so oracle comparisons line up.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Must be set BEFORE the scan: Spark defers the
        # PARQUET_TYPE_ILLEGAL failure to task execution, so a
        # read-then-retry can pass planning and still blow up later.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so plans can be written in
    ``spark.sql`` — same Catalyst plan either way (SURVEY §3.1
    mapping)."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
