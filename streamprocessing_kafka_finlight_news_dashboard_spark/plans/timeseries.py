"""Time-series / window operator coverage (SURVEY.md §2.3 J1/J2/J5, §2.5).

These are the reference's load-bearing semantics — the point-in-time
lookback join (reference scripts/05_lag_analysis.py:45-76, copy-pasted
into 04_correlation_analysis.py:46-62 and 06_strategy_signals.py:55-72),
forward trading-row returns (scripts/05_lag_analysis.py:78-109),
running-max drawdown (scripts/07_backtest.py:326-327), and win/loss
streak detection (scripts/07_backtest.py:308-314) — re-expressed over
the driver's ``events`` table (ts/user_id/event_type/value), with
user_id playing the ticker role and value the price/sentiment role.

Scale notes:
- Every window partitions by user_id: one shuffle on the entity key,
  then in-partition sort. No global sorts anywhere.
- The point-in-time join is an equi join on user_id with a range
  post-filter — Spark executes it as a hash/sort-merge join on the
  equi key (NOT a nested-loop cross product); at 100 TB you'd
  additionally bucket both sides by user_id to make it shuffle-free.
- Half-open interval semantics [t-24h, t) match the reference exactly
  (scripts/05_lag_analysis.py:66-69) — SURVEY §7.3 flags the
  off-by-one as silently corrupting every downstream number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


def daily_user_values(events: DataFrame, event_type: str) -> DataFrame:
    """Daily per-user average of one event type — the 'price bar' analog."""
    return (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.try_divide(F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), F.count(F.col("value"))), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Daily grouped agg + HAVING min-count gate (A1/A2/P9)
# ---------------------------------------------------------------------------
@query(
    "events_daily_user_activity",
    oracle="""
        SELECT user_id, date_trunc('day', ts) AS day,
               round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value,
               count(*)             AS n_events
        FROM events
        WHERE event_type = 'view'
        GROUP BY user_id, date_trunc('day', ts)
        HAVING count(*) >= 3
    """,
    survey_ops="A1,A2,P9,P3",
    doc="Grouped daily mean + min-count gate — the reference's "
    "MIN_NEWS_COUNT filter (scripts/05_lag_analysis.py:71-73): "
    "aggregate-then-HAVING, not a row filter.",
)
def events_daily_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return daily_user_values(e, "view").filter(F.col("n_events") >= 3)


# ---------------------------------------------------------------------------
# lag / pct_change (W1)
# ---------------------------------------------------------------------------
@query(
    "events_daily_returns",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value,
                   count(*)             AS n_events
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        )
        SELECT user_id, day, avg_value,
               round(avg_value / lag(avg_value) OVER (
                   PARTITION BY user_id ORDER BY day) - 1, 6) AS ret_1d
        FROM daily
        QUALIFY lag(avg_value) OVER (PARTITION BY user_id ORDER BY day) IS NOT NULL
    """,
    survey_ops="W1,A1",
    doc="pct_change as lag-window — equity.pct_change() "
    "(scripts/11_visualize_heatmap.py:19; 07_backtest.py:247-250). "
    "Rows before the first lag are dropped, matching pandas dropna.",
)
def events_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "purchase")
    w = W.partitionBy("user_id").orderBy("day")
    return (
        daily.withColumn("prev_value", F.lag("avg_value").over(w))
        .filter(F.col("prev_value").isNotNull())
        .select(
            "user_id",
            "day",
            "avg_value",
            F.round(F.col("avg_value") / F.col("prev_value") - 1, 6).alias("ret_1d"),
        )
    )


# ---------------------------------------------------------------------------
# lead / forward returns over trading rows, not calendar days (W2/J2)
# ---------------------------------------------------------------------------
@query(
    "events_forward_returns",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        )
        SELECT user_id, day, avg_value,
               round(lead(avg_value, 3) OVER (
                   PARTITION BY user_id ORDER BY day) / avg_value - 1, 6) AS fwd_ret_3
        FROM daily
        QUALIFY lead(avg_value, 3) OVER (PARTITION BY user_id ORDER BY day) IS NOT NULL
    """,
    survey_ops="W2,J2",
    doc="Forward n-row return via lead() — the reference's n-th *next "
    "trading row* semantics (scripts/05_lag_analysis.py:94-106), "
    "explicitly NOT day+n calendar arithmetic (SURVEY §7.3).",
)
def events_forward_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "purchase").drop("n_events")
    w = W.partitionBy("user_id").orderBy("day")
    return (
        daily.withColumn("next3", F.lead("avg_value", 3).over(w))
        .filter(F.col("next3").isNotNull())
        .select(
            "user_id",
            "day",
            "avg_value",
            F.round(F.col("next3") / F.col("avg_value") - 1, 6).alias("fwd_ret_3"),
        )
    )


# ---------------------------------------------------------------------------
# Running max + drawdown (W3/W4)
# ---------------------------------------------------------------------------
@query(
    "events_running_drawdown",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        )
        SELECT user_id, day, avg_value,
               max(avg_value) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
               round(avg_value / max(avg_value) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 6) AS drawdown
        FROM daily
    """,
    survey_ops="W3,W4",
    doc="cummax + drawdown — equity.cummax() and (equity/peak)-1 "
    "(scripts/07_backtest.py:326-327; 09_visualize_drawdown.py:17-19).",
)
def events_running_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "purchase").drop("n_events")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        "avg_value",
        F.max("avg_value").over(w).alias("peak"),
        F.round(F.col("avg_value") / F.max("avg_value").over(w) - 1, 6).alias("drawdown"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands streaks (W5/A14)
# ---------------------------------------------------------------------------
@query(
    "events_win_streaks",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        ), flagged AS (
            SELECT user_id, day, avg_value >= 25.0 AS win,
                   CASE WHEN (avg_value >= 25.0) IS DISTINCT FROM
                             lag(avg_value >= 25.0) OVER (PARTITION BY user_id ORDER BY day)
                        THEN 1 ELSE 0 END AS is_new_streak
            FROM daily
        ), streaked AS (
            SELECT user_id, day, win,
                   sum(is_new_streak) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
            FROM flagged
        )
        SELECT user_id, win, max(streak_len) AS max_streak
        FROM (
            SELECT user_id, win, streak_id, count(*) AS streak_len
            FROM streaked GROUP BY user_id, win, streak_id
        ) s
        GROUP BY user_id, win
    """,
    survey_ops="W5,A14",
    doc="Max win/loss streak via gaps-and-islands — the reference's "
    "(win != win.shift()).cumsum() trick (scripts/07_backtest.py:308-314)"
    " as change-flag → running-sum streak ids → per-streak count → max.",
)
def events_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "purchase").drop("n_events")
    w = W.partitionBy("user_id").orderBy("day")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = daily.withColumn("win", F.col("avg_value") >= 25.0).withColumn(
        "is_new_streak",
        F.when(~F.col("win").eqNullSafe(F.lag("win").over(w)), 1).otherwise(0),
    )
    streaked = flagged.withColumn("streak_id", F.sum("is_new_streak").over(wrun))
    return (
        streaked.groupBy("user_id", "win", "streak_id")
        .agg(F.count(F.lit(1)).alias("streak_len"))
        .groupBy("user_id", "win")
        .agg(F.max("streak_len").alias("max_streak"))
    )


# ---------------------------------------------------------------------------
# Sessionization via time-gap islands (T7 batch analog)
# ---------------------------------------------------------------------------
@query(
    "events_sessionization",
    oracle="""
        WITH gapped AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                     + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events
        ), sessions AS (
            SELECT user_id,
                   sum(is_new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gapped
        )
        SELECT user_id,
               count(DISTINCT session_id)               AS n_sessions,
               round(count(*) * 1.0 / count(DISTINCT session_id), 6) AS avg_events_per_session
        FROM sessions
        GROUP BY user_id
    """,
    survey_ops="W5,T7,A5",
    doc="Batch sessionization (30-min inactivity gap) — the batch analog "
    "of streaming session_window; same gaps-and-islands machinery the "
    "reference uses for streaks.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    gapped = e.withColumn(
        "is_new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sessions = gapped.withColumn("session_id", F.sum("is_new_session").over(wrun))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.round(
            F.count(F.lit(1)) * F.lit(1.0) / F.countDistinct("session_id"), 6
        ).alias("avg_events_per_session"),
    )


# ---------------------------------------------------------------------------
# Tumbling event-time window (T7) — batch form of the streaming agg
# ---------------------------------------------------------------------------
@query(
    "events_hourly_tumbling",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*)               AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE), 6)
                                      AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    survey_ops="T7,A1,A2",
    doc="Tumbling 1-hour event-time window — F.window() produces "
    "epoch-aligned buckets identical to date_trunc('hour'); the exact "
    "agg the streaming plane runs with a watermark (streaming/pipeline.py). "
    "The sum runs over per-value decimal(20,8) casts so it is "
    "shuffle-order-independent — the round-half-boundary hardening the "
    "T7 sliding twin needed at sf0.1.",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), 6
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time lookback range join — THE flagship (J1/W6)
# ---------------------------------------------------------------------------
@query(
    "pit_lookback_join",
    oracle="""
        WITH spine AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'
        )
        SELECT s.user_id, s.day,
               round(CAST(sum(CAST(e.value AS DECIMAL(20,8))) AS DOUBLE) / count(e.value), 6) AS lookback_avg,
               count(e.event_id)      AS lookback_n
        FROM spine s
        JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'click'
         AND e.ts >= s.day - INTERVAL 24 HOUR
         AND e.ts <  s.day
        GROUP BY s.user_id, s.day
        HAVING count(e.event_id) >= 2
    """,
    survey_ops="J1,W6,A1,A2,P9",
    doc="Point-in-time half-open lookback join [day-24h, day) + min-count"
    " gate — the reference's aggregate_sentiment nested loop "
    "(scripts/05_lag_analysis.py:45-76, O(dates×articles)) as ONE "
    "equi+range hash join and grouped aggregate. The equi key "
    "(user_id) keeps it a hash join, not a nested-loop product.",
)
def pit_lookback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    spine = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    joined = spine.join(
        clicks,
        (clicks.user_id == spine.user_id)
        & (clicks.ts >= spine.day - F.expr("INTERVAL 24 HOURS"))
        & (clicks.ts < spine.day),
    )
    return (
        joined.groupBy(spine.user_id.alias("user_id"), "day")
        .agg(
            F.round(F.try_divide(F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), F.count(F.col("value"))), 6).alias("lookback_avg"),
            F.count("event_id").alias("lookback_n"),
        )
        .filter(F.col("lookback_n") >= 2)
    )


# ---------------------------------------------------------------------------
# As-of forward-fill over a calendar spine (J5/W8)
# ---------------------------------------------------------------------------
@query(
    "events_asof_forward_fill",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id, date_trunc('day', ts)
        ), calendar AS (
            SELECT DISTINCT date_trunc('day', ts) AS day FROM events
        ), users AS (
            SELECT DISTINCT user_id FROM daily
        )
        SELECT u.user_id, c.day,
               last_value(d.avg_value IGNORE NULLS) OVER (
                   PARTITION BY u.user_id ORDER BY c.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        FROM users u
        CROSS JOIN calendar c
        LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    """,
    survey_ops="J5,W8,U4",
    doc="As-of join / forward-fill: calendar spine × entities, left join"
    " observed values, last-non-null window — the reference's "
    "last-known-price lookup (scripts/08_visualize_equity.py:51-66).",
)
def events_asof_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "signup").drop("n_events")
    calendar = e.select(F.date_trunc("day", "ts").alias("day")).distinct()
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(calendar)
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# Top-k per group (O3)
# ---------------------------------------------------------------------------
@query(
    "events_top3_per_user",
    oracle="""
        SELECT user_id, event_id, event_type, value,
               rn AS value_rank
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rn
            FROM events
        ) t WHERE rn <= 3
    """,
    survey_ops="O3,A13",
    doc="Top-3 events per user by value, deterministic tie-break on id.",
)
def events_top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "value", F.col("rn").alias("value_rank"))
    )


# ---------------------------------------------------------------------------
# Compound return via log-sum — resample('M').prod() analog (A10)
# ---------------------------------------------------------------------------
@query(
    "events_weekly_compound",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        ), raw AS (
            SELECT user_id, day, date_trunc('week', day) AS week,
                   avg_value / lag(avg_value) OVER (
                       PARTITION BY user_id ORDER BY day) - 1 AS r
            FROM daily
        ), rets AS (
            -- explicit NULL guard: least/greatest SKIP nulls on both
            -- engines, so clamping a NULL first-day return would turn
            -- it into +0.5 instead of dropping it
            SELECT user_id, day, week,
                   CASE WHEN r IS NULL THEN NULL
                        ELSE greatest(least(r, 0.5), -0.5) END AS ret
            FROM raw
        )
        SELECT user_id, week,
               round(exp(sum(ln(1.0 + ret))) - 1, 6) AS compound_ret,
               count(*)                              AS n_days
        FROM rets
        WHERE ret IS NOT NULL
        GROUP BY user_id, week
    """,
    survey_ops="A10,A12,W1",
    doc="Weekly compound return via exp(sum(log1p)) — the reference's "
    "resample('M').apply((1+x).prod()-1) (scripts/11_visualize_heatmap"
    ".py:22-24) as a distributive aggregate (product-as-log-sum keeps "
    "map-side partial aggregation, unlike an ordered product).",
)
def events_weekly_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = daily_user_values(e, "purchase").drop("n_events")
    w = W.partitionBy("user_id").orderBy("day")
    raw = F.col("avg_value") / F.lag("avg_value").over(w) - 1
    # Explicit NULL guard: F.least/F.greatest SKIP nulls (return the
    # non-null argument), so clamping the first day's NULL return would
    # fabricate +0.5 instead of leaving a NULL for the filter below.
    rets = daily.select(
        "user_id",
        "day",
        F.date_trunc("week", "day").alias("week"),
        F.when(
            raw.isNotNull(),
            F.greatest(F.least(raw, F.lit(0.5)), F.lit(-0.5)),
        ).alias("ret"),
    )
    return (
        rets.filter(F.col("ret").isNotNull())
        .groupBy("user_id", "week")
        .agg(
            F.round(F.exp(F.sum(F.log1p("ret"))) - 1, 6).alias("compound_ret"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Year × month compound-return pivot — the heatmap matrix (A10/A11/A12)
# ---------------------------------------------------------------------------
@query(
    "events_monthly_heatmap_pivot",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day,
                   round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY date_trunc('day', ts)
        ), raw AS (
            SELECT day,
                   avg_value / lag(avg_value) OVER (ORDER BY day) - 1 AS r
            FROM daily
        ), rets AS (
            -- NULL guard: see events_weekly_compound
            SELECT day, CASE WHEN r IS NULL THEN NULL
                             ELSE greatest(least(r, 0.5), -0.5) END AS ret
            FROM raw
        ), monthly AS (
            SELECT CAST(year(day) AS BIGINT) AS yr, month(day) AS mo,
                   round(exp(sum(ln(1.0 + ret))) - 1, 6) AS compound_ret
            FROM rets WHERE ret IS NOT NULL
            GROUP BY year(day), month(day)
        )
        SELECT yr,
               """
    + ",\n               ".join(
        f"round(max(CASE WHEN mo = {m} THEN compound_ret END), 6) AS m{m:02d}"
        for m in range(1, 13)
    )
    + """
        FROM monthly GROUP BY yr
    """,
    survey_ops="A10,A11,A12,W1",
    doc="Year × month compound-return matrix — the reference's monthly "
    "heatmap layout (scripts/11_visualize_heatmap.py:22-33): global "
    "daily equity analog → monthly compound via exp(sum(log1p)) → "
    "pivot months into 12 explicit columns. The explicit pivot value "
    "list keeps the column set deterministic (no extra distinct pass "
    "and schema independent of which months have data).",
)
def events_monthly_heatmap_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.try_divide(F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), F.count(F.col("value"))), 6).alias("avg_value"))
    )
    # Unpartitioned window BY DESIGN: it runs over the daily aggregate
    # (≤ 366 rows/year — bounded by the calendar, not by data volume),
    # and the return series genuinely needs a sequential lag across
    # the whole curve. The corpus-sized shuffle happened in the
    # groupBy above; this single-partition stage sees only its output.
    w = W.orderBy("day")
    raw = F.col("avg_value") / F.lag("avg_value").over(w) - 1
    # NULL guard (see events_weekly_compound): least/greatest skip
    # nulls, so the first day's undefined return must stay NULL rather
    # than clamp to +0.5.
    rets = daily.select(
        "day",
        F.when(
            raw.isNotNull(),
            F.greatest(F.least(raw, F.lit(0.5)), F.lit(-0.5)),
        ).alias("ret"),
    )
    monthly = (
        rets.filter(F.col("ret").isNotNull())
        .groupBy(F.year("day").alias("yr"), F.month("day").alias("mo"))
        .agg(F.round(F.exp(F.sum(F.log1p("ret"))) - 1, 6).alias("compound_ret"))
    )
    pivoted = (
        monthly.groupBy("yr")
        .pivot("mo", list(range(1, 13)))
        .agg(F.round(F.first("compound_ret"), 6))
    )
    renamed = pivoted.select(
        "yr", *[F.col(str(m)).alias(f"m{m:02d}") for m in range(1, 13)]
    )
    return renamed


# ---------------------------------------------------------------------------
# Purchase←view attribution range join — batch twin of the streaming
# stream-stream join (streaming/pipeline.py::stream_stream_attribution_join)
# ---------------------------------------------------------------------------
@query(
    "events_view_purchase_attribution",
    oracle="""
        SELECT p.user_id,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               v.event_id AS view_id,     v.ts AS view_ts
        FROM events p
        JOIN events v
          ON v.user_id = p.user_id
         AND v.ts <= p.ts
         AND v.ts >= p.ts - INTERVAL 120 MINUTES
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
    survey_ops="J1-family time-range join (attribution); batch twin of "
    "the streaming stream-stream join",
    doc="Every purchase joined to the same user's views in the "
    "preceding 2 hours — equi key user_id carries the shuffle, the "
    "time range is a post-filter (same hash-join-not-nested-loop "
    "shape as pit_lookback_join). Identical semantics to the "
    "watermarked streaming join, so the batch oracle certifies the "
    "streaming operator's logic.",
)
def events_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 120 MINUTES")),
    ).select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")


@query(
    "events_attribution_left_outer",
    oracle="""
        SELECT p.user_id,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               v.event_id AS view_id,     v.ts AS view_ts
        FROM events p
        LEFT JOIN events v
          ON v.event_type = 'view'
         AND v.user_id = p.user_id
         AND v.ts <= p.ts
         AND v.ts >= p.ts - INTERVAL 120 MINUTES
        WHERE p.event_type = 'purchase'
    """,
    survey_ops="J3-family left-outer time-range join; batch twin of the "
    "streaming leftOuter stream-stream join",
    doc="Left-outer attribution: every purchase with its prior-2h views "
    "OR a null-extended row when no view qualifies — the batch twin "
    "certifying streaming/pipeline.py::stream_stream_attribution_join"
    "(join_type='leftOuter') (which additionally delays null-extended "
    "emission until the watermark passes the purchase — the streaming-"
    "only semantics a batch oracle cannot express; that part is "
    "covered by tests/test_streaming.py::"
    "test_stream_stream_left_outer_attribution). Same user_id-keyed "
    "hash join shape as the inner twin.",
)
def events_attribution_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return p.join(
        v,
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 120 MINUTES")),
        "left",
    ).select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")


@query(
    "events_value_histogram",
    oracle="""
        WITH b AS (
            SELECT event_type, value,
                   CASE WHEN value < 0.0 THEN 0
                        WHEN value >= 500.0 THEN 21
                        ELSE CAST(floor(value / 25.0) AS BIGINT) + 1
                   END AS bucket
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(min(value), 6) AS lo,
               round(max(value), 6) AS hi
        FROM b GROUP BY event_type, bucket
    """,
    survey_ops="A-family distribution binning — fixed-width histogram "
    "per group (width_bucket semantics spelled out portably)",
    doc="Fixed-width 20-bin histogram of event values per type over "
    "[0, 500) — SQL-standard width_bucket semantics (underflow bucket "
    "0, overflow 21) written as explicit CASE/floor arithmetic so both "
    "engines compute identical bins (DuckDB has no width_bucket). One "
    "shuffle on (type, bucket); the binning is a pure projection, so "
    "at lake scale partial aggregation collapses each task to ≤ "
    "types×22 rows before the exchange.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = (
        F.when(F.col("value") < 0.0, F.lit(0))
        .when(F.col("value") >= 500.0, F.lit(21))
        .otherwise(F.floor(F.col("value") / 25.0) + 1)
        .cast("long")
    )
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type", b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )
