"""Signal generation (reference scripts/06_strategy_signals.py,
SURVEY P7). Each ticker trades its best lag config when |correlation|
clears the threshold; the BUY/SELL ladder on ±SENTIMENT_THRESHOLD is
direction-flipped for inverse (negative-correlation) tickers
(scripts/06_strategy_signals.py:114-132)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.pipeline.features import (
    sentiment_features,
)


def generate_signals(
    prices: DataFrame,
    news_scored: DataFrame,
    best: DataFrame,
    sentiment_threshold: float = 0.4,
    min_news_count: int = 7,
    min_correlation: float = 0.25,
    lookbacks: tuple[int, ...] = (6, 12, 24, 48, 72),
) -> DataFrame:
    """Signal table per FIXTURES.md §4.

    ``best`` is the per-ticker best-config table (best_configs()).
    Tickers with |corr| < min_correlation emit nothing
    (scripts/06_strategy_signals.py:92-96). Features are computed per
    LOOKBACK (not per ticker) and joined to each ticker's chosen
    config — so the range join still runs once per distinct lookback
    actually in use, not once per ticker.
    """
    chosen = best.filter(F.abs(F.col("correlation")) >= min_correlation).select(
        "ticker",
        F.col("lookback_hours").alias("cfg_lookback"),
        F.col("lead_days").alias("cfg_lead"),
        F.col("correlation").alias("cfg_corr"),
    )
    used_lookbacks = [
        r.cfg_lookback for r in chosen.select("cfg_lookback").distinct().collect()
    ]
    parts = []
    for lb in used_lookbacks:
        feats = sentiment_features(prices, news_scored, int(lb), min_news_count)
        parts.append(feats.withColumn("cfg_lookback", F.lit(int(lb))))
    if not parts:
        empty = prices.sparkSession.createDataFrame(
            [],
            "date timestamp, ticker string, signal string, sentiment double, "
            "news_count long, close_price double, lookback_hours int, "
            "lead_days int, correlation double, signal_type string",
        )
        return empty
    feats_all = parts[0]
    for p in parts[1:]:
        feats_all = feats_all.unionByName(p)
    joined = feats_all.join(F.broadcast(chosen), ["ticker", "cfg_lookback"])
    thr = sentiment_threshold
    inverse = F.col("cfg_corr") < 0
    signal = (
        F.when(F.col("avg_sentiment") > thr, F.when(inverse, "SELL").otherwise("BUY"))
        .when(F.col("avg_sentiment") < -thr, F.when(inverse, "BUY").otherwise("SELL"))
        .otherwise("HOLD")
    )
    return joined.select(
        "date",
        "ticker",
        signal.alias("signal"),
        F.col("avg_sentiment").alias("sentiment"),
        "news_count",
        F.col("close").alias("close_price"),
        F.col("cfg_lookback").cast("int").alias("lookback_hours"),
        F.col("cfg_lead").cast("int").alias("lead_days"),
        F.col("cfg_corr").alias("correlation"),
        F.when(inverse, "inverse").otherwise("direct").alias("signal_type"),
    )


def signal_distribution(signals: DataFrame) -> DataFrame:
    """value_counts of the signal column, descending (reference
    scripts/06_strategy_signals.py:181-184, SURVEY A4)."""
    return signals.groupBy("signal").count().orderBy(F.desc("count"), "signal")
