"""Round-5 extension of the time-series catalog: OHLC candle resample
(the finance-dashboard view the reference's equity/price panels draw
from — reference app/experiment.py price charts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


@query(
    "events_ohlc_daily",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               event_type,
               arg_min(value, ts)    AS open,
               max(value)            AS high,
               min(value)            AS low,
               arg_max(value, ts)    AS close,
               count(*)              AS volume,
               round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE), 6)
                                     AS total_value
        FROM events
        GROUP BY date_trunc('day', ts), event_type
    """,
    survey_ops="A1/A2/W7 — OHLC candle resample (reference domain: the "
    "price-candle aggregation a market dashboard draws; min_by/max_by "
    "argmin family)",
    doc="Daily OHLC candles per event type: open/close are the values "
    "at the bucket's first/last timestamp (min_by/max_by — ts is "
    "verified unique at every SF; a production feed would key by "
    "(ts, event_id)), high/low the extremes, volume the event count, "
    "total_value the order-independent decimal sum. ONE partial-"
    "aggregated shuffle keyed by (day, type) — the canonical "
    "map-side-combine resample that survives any corpus size.",
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(
            F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), 6
        ).alias("total_value"),
    )
