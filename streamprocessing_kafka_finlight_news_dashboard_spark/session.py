"""SparkSession factory.

The reference is strict about tz-aware UTC timestamps
(reference scripts/04_correlation_analysis.py:20, 07_backtest.py:180-182),
so the session timezone is pinned to UTC — this also makes results
comparable against a UTC-naive DuckDB oracle.

Scale posture: AQE on (runtime partition coalescing + skew-join
handling), Arrow on (vectorized pandas-UDF exchange), shuffle
partitions sized by env for local runs but meant to be overridden to
~2-3x total cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "streamprocessing-finlight-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the driver's
    bench harness controls sizing.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # MIN/MAX/COUNT answered from parquet footer statistics without
        # scanning row groups — free on a lake-scale table scan.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_partitions(spark: SparkSession, default: int = 32) -> int:
    """Current shuffle parallelism as an int, for explicit repartition
    sizing inside operators. ``spark.sql.shuffle.partitions`` may hold a
    non-numeric value ('auto' on some distributions, or an AQE-managed
    sentinel), so fall back to the cluster's default parallelism rather
    than raising mid-plan-build."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        try:
            return spark.sparkContext.defaultParallelism or default
        except Exception:  # pragma: no cover - no active context
            return default
