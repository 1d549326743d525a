"""Writers / readers for every at-rest format the reference touches
(SURVEY §2.1): parquet (S1/S2), ticker-partitioned parquet (S3),
header CSV (S4/S5), JSON incl. nested summaries (S6/S7).

The reference writes one parquet file per ticker by hand
(scripts/02_fetch_news.py:140-144, 01_fetch_prices.py:29) — manual
hash partitioning. Here that's ``partitionBy``: readers prune
partitions automatically from an equality filter on the partition
column (asserted in tests/test_io.py).

Scale notes: writers never coalesce(1) — output parallelism follows
the upstream partitioning. ``write_bucketed`` is the lake-layout
co-location path: both sides of a repeated join bucketed on the join
key join WITHOUT any shuffle (asserted in tests/test_io_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2 — plain parquet persist."""
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], mode: str = "overwrite"
) -> None:
    """S3 — hive-layout partitioned write (the per-ticker file pattern,
    generalized). Equality predicates on ``partition_cols`` prune at
    the directory level on read."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table write (saveAsTable — bucket metadata
    lives in the catalog, so a plain path write can't carry it).

    Two tables bucketed on their join key with the SAME bucket count
    sort-merge-join with ZERO exchanges: the shuffle was paid once at
    write time and amortizes over every subsequent join — the right
    layout for the repeated orders⋈lineitem joins at 100 TB.
    ``sort_col`` additionally pre-sorts within buckets, removing the
    per-query Sort when it matches the join key."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 — header CSV (trade log / daily equity outputs,
    reference scripts/07_backtest.py:434-441)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S5 — schema-explicit CSV scan (never inferSchema in the engine)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6 — JSON-lines write (flat or nested rows)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S7 — JSON scan; pass a schema for production paths."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def nested_summary_json(df: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """S6 nested form — the reference's lag_analysis.json is a dict of
    dicts (scripts/05_lag_analysis.py:220-229); the engine's equivalent
    is one JSON row per group with a struct payload built via
    to_json(struct(*)) so any consumer can parse it back."""
    payload = F.to_json(F.struct(*[c for c in df.columns if c not in group_cols]))
    return df.select(*group_cols, payload.alias("summary_json"))


def read_parquet_evolving(spark, paths: list[str]):
    """Schema-evolution scan: union the schemas of parquet drops
    written at different pipeline versions (``mergeSchema`` — columns
    added later read as NULL in older files). The lake-scale caveat is
    cost: schema merging reads EVERY file footer at planning time, so
    production tables should keep evolved schemas in a catalog
    (metastore/lakehouse) and reserve this reader for ad-hoc unions of
    heterogeneous drops."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def with_observed_gate(df, name: str = "gate"):
    """Attach free pipeline-health metrics to a plan via ``observe``:
    row count and null-text/empty-text counters are accumulated DURING
    whatever action consumes the DataFrame — no second scan, unlike a
    separate quality-gate query. Returns (df, Observation); read
    ``observation.get`` after an action completes. The streaming twin
    is the same call surfaced through each progress event's
    observedMetrics."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum((F.trim(F.coalesce("text", F.lit("x"))) == "").cast("long")).alias(
            "empty_text"
        ),
    )
    return observed, obs
