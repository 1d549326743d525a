"""Reference-domain semantics (signals, lag sweep, backtest) mapped
onto the driver's ``events`` table so the oracle can check them.

Role mapping: user_id ≈ ticker, daily avg 'purchase' value ≈ close
price, 'click' activity in a lookback window ≈ news sentiment. The
operators are EXACTLY the reference's (SURVEY §2): point-in-time
lookback aggregate (J1), forward trading-row return (J2/W2), per-entity
correlation with min-obs gate (A7/P9), threshold+sign CASE signal (P7),
and the sequential portfolio simulation (T8/F5) as applyInPandas.

The full news/prices-shaped domain pipeline (VADER sentiment, the
5×4 lag-config sweep, 34-metric report) lives in pipeline/ and is
exercised by pytest fixtures; these catalog entries prove the same
plan shapes against the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.plans.timeseries import daily_user_values
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table

_THR_HI = 30.0
_THR_LO = 20.0
# Gates sized to the driver's events density (~13 purchase days and
# ~1-3 lookback clicks per user-day at sf0.01) so the signal table is
# non-degenerate at every scale factor.
_MIN_OBS = 2
_MIN_LOOKBACK_N = 1


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) rows: lookback click stats + close + forward return.

    One equi+range hash join (user_id) + two windows — the reference's
    triple-nested Python loop (scripts/05_lag_analysis.py:45-109)
    collapsed into a single declarative plan.
    """
    e = load_table(spark, sf_dir, "events")
    prices = daily_user_values(e, "purchase").withColumnRenamed("avg_value", "close_value")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), "ts", "value", "event_id"
    )
    joined = prices.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("day") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("ts") < F.col("day")),
        "left",
    )
    feats = joined.groupBy("user_id", "day", "close_value").agg(
        F.round(F.try_divide(F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), F.count(F.col("value"))), 6).alias("lookback_avg"),
        F.count("event_id").alias("lookback_n"),
    )
    w = W.partitionBy("user_id").orderBy("day")
    return feats.withColumn(
        "fwd_ret_1",
        F.round(F.lead("close_value").over(w) / F.col("close_value") - 1, 6),
    )


# Shared CTE block: the full signal table (prices → lookback feats →
# forward return → per-user corr gate → CASE ladder). Reused verbatim
# by the signal_generation oracle and the buy-and-hold benchmark's
# BUY-universe selection so the two stay definitionally in lockstep.
_SIGNALS_CTES = f"""
        prices AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS close_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        ), feats AS (
            SELECT p.user_id, p.day, p.close_value,
                   round(CAST(sum(CAST(c.value AS DECIMAL(20,8))) AS DOUBLE) / count(c.value), 6) AS lookback_avg,
                   count(c.event_id)      AS lookback_n
            FROM prices p
            LEFT JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts >= p.day - INTERVAL 24 HOUR AND c.ts < p.day
            GROUP BY p.user_id, p.day, p.close_value
        ), with_fwd AS (
            SELECT *,
                   round(lead(close_value) OVER (PARTITION BY user_id ORDER BY day)
                         / close_value - 1, 6) AS fwd_ret_1
            FROM feats
        ), corrs AS (
            SELECT user_id,
                   round(corr(lookback_avg, fwd_ret_1), 6) AS correlation,
                   count(*) FILTER (WHERE lookback_avg IS NOT NULL
                                      AND fwd_ret_1 IS NOT NULL) AS n_obs
            FROM with_fwd
            WHERE lookback_n >= {_MIN_LOOKBACK_N}
            GROUP BY user_id
        ), signals AS (
            SELECT f.user_id, f.day, f.close_value, f.lookback_avg, f.lookback_n,
                   c.correlation,
                   CASE WHEN c.correlation >= 0 THEN 'direct' ELSE 'inverse' END AS signal_type,
                   CASE
                       WHEN f.lookback_avg > {_THR_HI}
                            THEN CASE WHEN c.correlation >= 0 THEN 'BUY' ELSE 'SELL' END
                       WHEN f.lookback_avg < {_THR_LO}
                            THEN CASE WHEN c.correlation >= 0 THEN 'SELL' ELSE 'BUY' END
                       ELSE 'HOLD'
                   END AS signal
            FROM with_fwd f
            JOIN corrs c ON c.user_id = f.user_id
            WHERE c.n_obs >= {_MIN_OBS}
              AND abs(c.correlation) >= 0.05
              AND f.lookback_n >= {_MIN_LOOKBACK_N}
              AND f.lookback_avg IS NOT NULL
        )
"""


@query(
    "signal_generation",
    oracle=f"""
        WITH {_SIGNALS_CTES}
        SELECT user_id, day, close_value, lookback_avg, lookback_n,
               correlation, signal_type, signal
        FROM signals
    """,
    survey_ops="P7,A7,P9,J1,J2,W2 (reference scripts/06_strategy_signals.py:114-132)",
    doc="BUY/SELL/HOLD signal generation: lookback feature vs "
    "thresholds, direction flipped when the per-entity correlation is "
    "negative — the reference's CASE ladder "
    "(scripts/06_strategy_signals.py:114-132) with its |corr| and "
    "min-observation gates (scripts/06_strategy_signals.py:27, "
    "05_lag_analysis.py:22-23).",
)
def signal_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _features(spark, sf_dir)
    gated = feats.filter(F.col("lookback_n") >= _MIN_LOOKBACK_N)
    corrs = gated.groupBy("user_id").agg(
        F.round(F.corr("lookback_avg", "fwd_ret_1"), 6).alias("correlation"),
        F.count(
            F.when(
                F.col("lookback_avg").isNotNull() & F.col("fwd_ret_1").isNotNull(), 1
            )
        ).alias("n_obs"),
    )
    sig_dir = F.when(F.col("correlation") >= 0, "direct").otherwise("inverse")
    buy_if = F.when(F.col("correlation") >= 0, "BUY").otherwise("SELL")
    sell_if = F.when(F.col("correlation") >= 0, "SELL").otherwise("BUY")
    signal = (
        F.when(F.col("lookback_avg") > _THR_HI, buy_if)
        .when(F.col("lookback_avg") < _THR_LO, sell_if)
        .otherwise("HOLD")
    )
    return (
        gated.join(corrs, "user_id")
        .filter(
            (F.col("n_obs") >= _MIN_OBS)
            & (F.abs(F.col("correlation")) >= 0.05)
            & F.col("lookback_avg").isNotNull()
        )
        .select(
            "user_id",
            "day",
            "close_value",
            "lookback_avg",
            "lookback_n",
            "correlation",
            sig_dir.alias("signal_type"),
            signal.alias("signal"),
        )
    )


# Backtest constants — the reference's (scripts/07_backtest.py:26-35),
# money scaled down to the events value range.
_INITIAL_CAPITAL = 100_000.0
_POSITION_SIZE = 0.8
_TRANSACTION_COST = 0.001
_SLIPPAGE = 0.0005
_STOP_LOSS = 0.05
_TAKE_PROFIT = 0.20
_MAX_HOLD_DAYS = 5

_TRADE_SCHEMA = (
    "user_id long, entry_day timestamp, exit_day timestamp, "
    "entry_price double, exit_price double, shares double, "
    "pnl double, pnl_pct double, exit_reason string, days_held long"
)


def _simulate_user(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential long-only portfolio per user — the reference's
    Portfolio state machine (scripts/07_backtest.py:37-164): open on
    BUY (one position at a time), exit on stop-loss / take-profit /
    max-hold / end-of-data, slippage on both sides, fees on notional.

    Inherently order-dependent (cash/position state), hence
    applyInPandas over day-ordered rows per user (SURVEY §2.9 T8) —
    parallel ACROSS users, sequential within."""
    pdf = pdf.sort_values("day").reset_index(drop=True)
    trades = []
    cash = _INITIAL_CAPITAL
    pos = None  # (entry_day, entry_price, shares)
    for row in pdf.itertuples():
        price = row.close_value
        if pos is not None:
            entry_day, entry_price, shares = pos
            held = (row.day - entry_day).days
            ret = price / entry_price - 1
            reason = None
            if ret <= -_STOP_LOSS:
                reason = "stop_loss"
            elif ret >= _TAKE_PROFIT:
                reason = "take_profit"
            elif held >= _MAX_HOLD_DAYS:
                reason = "hold_period"
            if reason is not None:
                exit_price = price * (1 - _SLIPPAGE)
                proceeds = shares * exit_price * (1 - _TRANSACTION_COST)
                cost = shares * entry_price
                trades.append(
                    (
                        row.user_id, entry_day, row.day, entry_price, exit_price,
                        shares, proceeds - cost, proceeds / cost - 1, reason, held,
                    )
                )
                cash += proceeds
                pos = None
        if pos is None and row.signal == "BUY":
            entry_price = price * (1 + _SLIPPAGE)
            budget = cash * _POSITION_SIZE
            shares = budget / (entry_price * (1 + _TRANSACTION_COST))
            if shares > 0:
                cash -= shares * entry_price * (1 + _TRANSACTION_COST)
                pos = (row.day, entry_price, shares)
    if pos is not None and len(pdf):
        last = pdf.iloc[-1]
        entry_day, entry_price, shares = pos
        exit_price = last.close_value * (1 - _SLIPPAGE)
        proceeds = shares * exit_price * (1 - _TRANSACTION_COST)
        cost = shares * entry_price
        trades.append(
            (
                last.user_id, entry_day, last.day, entry_price, exit_price, shares,
                proceeds - cost, proceeds / cost - 1, "end_of_backtest",
                (last.day - entry_day).days,
            )
        )
    return pd.DataFrame(
        trades,
        columns=[
            "user_id", "entry_day", "exit_day", "entry_price", "exit_price",
            "shares", "pnl", "pnl_pct", "exit_reason", "days_held",
        ],
    )


@query(
    "portfolio_backtest_trades",
    oracle=None,  # sequential state machine — not SQL-expressible (T8)
    survey_ops="T8,F5 (reference scripts/07_backtest.py:37-264)",
    doc="Per-user sequential portfolio simulation via applyInPandas "
    "over day-ordered signals. The reference runs ONE global portfolio "
    "(single Python loop); the scalable reframing is per-entity "
    "portfolios — parallel across users, sequential within, state "
    "bounded to one group.",
)
def portfolio_backtest_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    signals = signal_generation(spark, sf_dir).select(
        "user_id", "day", "close_value", "signal"
    )
    return signals.groupBy("user_id").applyInPandas(_simulate_user, _TRADE_SCHEMA)


@query(
    "backtest_summary_metrics",
    oracle=None,  # downstream of the non-SQL backtest
    survey_ops="A9,A14,A6 (reference scripts/07_backtest.py:266-418)",
    doc="Trade-log metrics block: win rate, profit factor, expectancy, "
    "avg/largest win/loss — one wide conditional aggregate per user "
    "instead of the reference's dict-of-scalars loop.",
)
def backtest_summary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    trades = portfolio_backtest_trades(spark, sf_dir)
    win = F.col("pnl") > 0
    return trades.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.avg(win.cast("double")), 6).alias("win_rate"),
        F.round(F.sum("pnl"), 6).alias("total_pnl"),
        F.round(F.avg(F.when(win, F.col("pnl"))), 6).alias("avg_win"),
        F.round(F.avg(F.when(~win, F.col("pnl"))), 6).alias("avg_loss"),
        F.round(F.max("pnl"), 6).alias("largest_win"),
        F.round(F.min("pnl"), 6).alias("largest_loss"),
        # try_divide: a user whose trades are all winners has zero gross
        # loss — ANSI mode would raise DIVIDE_BY_ZERO; NULL is the
        # conventional "undefined profit factor" answer.
        F.round(
            F.try_divide(
                F.sum(F.when(win, F.col("pnl")).otherwise(0.0)),
                F.abs(F.sum(F.when(~win, F.col("pnl")).otherwise(0.0))),
            ),
            6,
        ).alias("profit_factor"),
        F.round(F.avg("days_held"), 6).alias("avg_days_held"),
    )


@query(
    "portfolio_buy_hold_equity",
    oracle=f"""
        WITH {_SIGNALS_CTES}
        , buyers AS (
            SELECT DISTINCT user_id FROM signals WHERE signal = 'BUY'
        ), spine AS (
            SELECT DISTINCT day FROM prices
        ), panel AS (
            SELECT b.user_id, s.day, p.close_value
            FROM buyers b CROSS JOIN spine s
            LEFT JOIN prices p ON p.user_id = b.user_id AND p.day = s.day
        ), filled AS (
            SELECT user_id, day,
                   last_value(close_value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS close_ff,
                   first_value(close_value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS start_price
            FROM panel
        )
        SELECT user_id, day,
               CASE WHEN close_ff IS NULL THEN {_INITIAL_CAPITAL}
                    ELSE round({_INITIAL_CAPITAL} / start_price * close_ff, 6)
               END AS bh_equity
        FROM filled
    """,
    survey_ops="J5,W8,A10 (reference scripts/08_visualize_equity.py:24-66 — "
    "buy-and-hold benchmark equity via as-of last-known price)",
    doc="Buy-and-hold benchmark equity curve per BUY-signal entity — the "
    "reference's comparison portfolio (scripts/08_visualize_equity.py:"
    "24-66): full initial capital buys at the entity's first available "
    "close (shares = capital / start_price), then each spine date is "
    "marked to the LAST KNOWN close ≤ that date (the as-of forward-fill "
    "operator); dates before the first price carry the initial capital, "
    "exactly the reference's fallback. Composes the W8 forward-fill "
    "window with the signal universe over the shared global day spine.",
)
def portfolio_buy_hold_equity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    prices = daily_user_values(e, "purchase").withColumnRenamed(
        "avg_value", "close_value"
    )
    buyers = (
        signal_generation(spark, sf_dir)
        .filter(F.col("signal") == "BUY")
        .select("user_id")
        .distinct()
    )
    spine = prices.select("day").distinct()
    # buyers × spine is bounded (BUY entities × trading days), both
    # sides tiny relative to events — broadcast the day spine.
    panel = buyers.crossJoin(F.broadcast(spine)).join(
        prices, ["user_id", "day"], "left"
    )
    w_ff = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_full = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    filled = panel.select(
        "user_id",
        "day",
        F.last("close_value", ignorenulls=True).over(w_ff).alias("close_ff"),
        F.first("close_value", ignorenulls=True).over(w_full).alias("start_price"),
    )
    return filled.select(
        "user_id",
        "day",
        F.when(F.col("close_ff").isNull(), F.lit(_INITIAL_CAPITAL))
        .otherwise(
            F.round(F.lit(_INITIAL_CAPITAL) / F.col("start_price") * F.col("close_ff"), 6)
        )
        .alias("bh_equity"),
    )
