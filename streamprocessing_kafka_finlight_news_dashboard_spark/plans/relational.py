"""Relational operator coverage (SURVEY.md §2.2, §2.3, §2.4, §2.6, §2.7).

The reference hand-rolls all of this in single-process pandas — filters
(reference scripts/05_lag_analysis.py:59-69), nested-loop joins
(scripts/05_lag_analysis.py:45-76), dict-accumulated aggregations
(scripts/07_backtest.py:284-323). Here each one is a declarative
DataFrame plan: Catalyst pushes predicates into the parquet scan,
prunes columns, picks broadcast-hash joins for the small dimension
sides, and runs partial (map-side) aggregation before the shuffle.

Scale notes (100 TB posture):
- Dimension tables (region/nation/supplier/customer at TPC-H ratios)
  are broadcast — no shuffle of the fact table for those joins.
- Fact-fact joins (orders⋈lineitem) hash-shuffle on the join key;
  AQE coalesces post-shuffle partitions and splits skewed ones.
- Aggregations use hash partial aggregation (free via Catalyst);
  HAVING-style gates are post-agg filters, not row filters.
- Top-k-per-group uses window row_number, which shuffles once on the
  partition key and sorts within partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Aggregation over a filtered fact table — TPC-H Q1 shape (A1, A2, A3, P4/P5)
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                       AS sum_qty,
               sum(l_extendedprice)                                  AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity)                                       AS avg_qty,
               avg(l_extendedprice)                                  AS avg_price,
               avg(l_discount)                                       AS avg_disc,
               count(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    survey_ops="A1,A2,A3,P4,S1",
    doc="Wide grouped aggregation with an arithmetic measure chain; "
    "mirrors the reference's grouped sentiment stats "
    "(scripts/05_lag_analysis.py:71-76) generalized to TPC-H Q1.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 3-way fact join + top-k with deterministic tie-break — TPC-H Q3 shape (J3/J4, O2)
# ---------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
        SELECT o.o_orderkey, o.o_orderdate,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    survey_ops="J3,J4,A1,O1,O4",
    doc="Equi joins (customer broadcast) + grouped revenue + global "
    "top-10 with deterministic tie-break; generalizes the reference's "
    "keyed signal×price lookup join (scripts/07_backtest.py:217-235).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Snowflake join chain through dimensions (broadcast) — TPC-H Q5 shape
# ---------------------------------------------------------------------------
@query(
    "q5_nation_revenue",
    oracle="""
        SELECT n.n_name,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
        JOIN customer c  ON o.o_custkey  = c.c_custkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n    ON s.s_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    survey_ops="J3,J4,A1,P4",
    doc="Five-way snowflake join; nation/region/supplier broadcast so "
    "the fact table only shuffles for orders⋈lineitem and the final agg.",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        # decimal-addend discipline: per-nation revenue is a LARGE
        # accumulation over join output, whose row order is engine- and
        # run-dependent (the q19 flake class) — exact decimal sum, one
        # double cast, round 6, lockstep with the oracle
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                6,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Top-1 per group via window row_number — reference's best-config pick (A13/O3)
# ---------------------------------------------------------------------------
@query(
    "top_order_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        ) t WHERE rn = 1
    """,
    survey_ops="A13,O3",
    doc="Top-1 per group with deterministic tie-break — the reference's "
    "best-lag-config argmax (scripts/05_lag_analysis.py:177-198) as a "
    "single shuffle-and-rank instead of a Python loop over groups.",
)
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Anti join — reference's published-ids exclusion (J6/U3)
# ---------------------------------------------------------------------------
@query(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
    """,
    survey_ops="J6,U3",
    doc="left_anti join — the reference's seen-ids exclusion "
    "(ingestion/producer.py:184-197) as a distributed anti join. The "
    "probe side is date-restricted (customers idle since 2000) so the "
    "result is non-degenerate at every SF — every customer has SOME "
    "order in the synthetic data.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# Semi join + grouped count — EXISTS then value_counts (A4)
# ---------------------------------------------------------------------------
@query(
    "segment_customers_with_big_orders",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
        )
        GROUP BY c_mktsegment
    """,
    survey_ops="J6,A4,P6",
    doc="left_semi join (EXISTS) + grouped count ordered distribution — "
    "the reference's value_counts (scripts/06_strategy_signals.py:181).",
)
def segment_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# ROLLUP — grouping-sets surface (declared in SURVEY §2.4 closing note)
# ---------------------------------------------------------------------------
@query(
    "nation_priority_rollup",
    oracle="""
        SELECT n.n_name, o.o_orderpriority,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,2)))
                          AS DOUBLE), 6) AS total_price,
               count(*)            AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
    """,
    survey_ops="A1,A2 (+rollup surface)",
    doc="Hierarchical subtotals via ROLLUP; Catalyst expands to "
    "grouping sets with a single Expand + hash aggregate.",
)
def nation_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        # decimal-addend discipline: the rollup's grand-total row is a
        # whole-table accumulation over join output (q19 flake class)
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,2)")).cast("double"), 6
            ).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE — full grouping-sets cross
# ---------------------------------------------------------------------------
@query(
    "status_priority_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*)           AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2)))
                          AS DOUBLE), 6) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey_ops="A1,A2 (+cube surface)",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # same decimal discipline as the rollup: the cube's grand-total
        # row accumulates the whole table
        F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,2)")).cast("double"), 6
            ).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Pivot as conditional aggregation — reference's year×month heatmap (A11)
# ---------------------------------------------------------------------------
@query(
    "brand_size_pivot",
    oracle="""
        SELECT p_brand,
               sum(CASE WHEN p_size < 15 THEN p_retailprice END)                  AS small_price,
               sum(CASE WHEN p_size >= 15 AND p_size < 35 THEN p_retailprice END) AS mid_price,
               sum(CASE WHEN p_size >= 35 THEN p_retailprice END)                 AS large_price,
               count(*) AS n_parts
        FROM part
        GROUP BY p_brand
    """,
    survey_ops="A11,A6",
    doc="Pivot expressed as conditional aggregation (same physical plan "
    "as .pivot() with explicit values, but oracle-portable); mirrors "
    "the reference's year×month return matrix "
    "(scripts/11_visualize_heatmap.py:27-33).",
)
def brand_size_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.sum(F.when(F.col("p_size") < 15, F.col("p_retailprice"))).alias("small_price"),
        F.sum(
            F.when((F.col("p_size") >= 15) & (F.col("p_size") < 35), F.col("p_retailprice"))
        ).alias("mid_price"),
        F.sum(F.when(F.col("p_size") >= 35, F.col("p_retailprice"))).alias("large_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# Global/grouped stats incl. stddev — reference's sentiment stats (A3)
# ---------------------------------------------------------------------------
@query(
    "supplier_balance_stats",
    oracle="""
        SELECT n.n_name,
               min(s.s_acctbal)                  AS min_bal,
               max(s.s_acctbal)                  AS max_bal,
               round(avg(s.s_acctbal), 6)        AS avg_bal,
               round(stddev_samp(s.s_acctbal), 6) AS std_bal,
               count(*)                          AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    survey_ops="A3",
    doc="min/max/avg/stddev block — the reference's sentiment stats "
    "(scripts/03_add_sentiment.py:36-38). stddev_samp (ddof=1) declared "
    "explicitly on both sides (SURVEY §7.3 float-reproducibility note).",
)
def supplier_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.min("s_acctbal").alias("min_bal"),
            F.max("s_acctbal").alias("max_bal"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_bal"),
            F.round(F.stddev_samp("s_acctbal"), 6).alias("std_bal"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# countDistinct — reference's nunique (A5) + conditional agg (A6)
# ---------------------------------------------------------------------------
@query(
    "segment_order_profile",
    oracle="""
        SELECT c.c_mktsegment,
               count(DISTINCT c.c_nationkey)                        AS n_nations,
               count(DISTINCT o.o_orderpriority)                    AS n_priorities,
               CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               round(avg(o.o_totalprice), 6)                        AS avg_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    survey_ops="A5,A6",
    doc="countDistinct + win/loss-style conditional sums — the "
    "reference's wins/losses split (scripts/07_backtest.py:285-303).",
)
def segment_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Pearson correlation per group — reference's sentiment↔return corr (A7)
# ---------------------------------------------------------------------------
@query(
    "lineitem_price_qty_corr",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    survey_ops="A7",
    doc="Grouped Pearson correlation — scripts/04_correlation_analysis.py"
    ":125-133 (Series.corr) as a distributed co-moment aggregate.",
)
def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Set ops: INTERSECT / EXCEPT on derived key sets (U1-U4)
# ---------------------------------------------------------------------------
@query(
    "repeat_buyers_intersect",
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
    survey_ops="U1,U4",
    doc="Distinct-set intersection across two year slices of the same "
    "fact table (customers active in both years).",
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y95.intersect(y96)


@query(
    "churned_buyers_except",
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
    survey_ops="U3",
    doc="Distinct-set difference (active in 1995, gone in 1996).",
)
def churned_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT (distinct) — not exceptAll: any 1996 buyer is removed


# ---------------------------------------------------------------------------
# Union + keep-last dedup — reference's merge/upsert load (S13, U2)
# ---------------------------------------------------------------------------
@query(
    "events_dedup_keep_last",
    oracle="""
        SELECT event_id, user_id, event_type, ts, value
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) t WHERE rn = 1
    """,
    survey_ops="S13,U2,J6",
    doc="Order-sensitive keep-last dedup — the reference's "
    "drop_duplicates(keep='last') merge (scripts/02_fetch_news.py:109-131)"
    " made deterministic with an explicit (ts, event_id) order "
    "(SURVEY §7.3: row order is not stable in a distributed engine).",
)
def events_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ---------------------------------------------------------------------------
# Scalar-function surface: string/date/math in one projection (§2.8)
# ---------------------------------------------------------------------------
@query(
    "order_scalar_functions",
    oracle="""
        SELECT o_orderkey,
               upper(o_orderstatus)                                   AS status_uc,
               concat(o_orderpriority, ':', o_orderstatus)            AS pri_status,
               year(o_orderdate)                                      AS order_year,
               month(o_orderdate)                                     AS order_month,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)  AS days_since_epoch_start,
               round(sqrt(o_totalprice), 6)                           AS sqrt_price,
               round(pow(1.0 + o_totalprice / 1000000000.0, 252.0), 6)   AS compounded,
               abs(o_totalprice - 100000.0)                           AS abs_dev
        FROM orders
        WHERE o_orderkey % 7 = 0
    """,
    survey_ops="§2.8 scalar families,P3",
    doc="String/date/math scalar families in one projection — concat/"
    "upper (ingestion/massive_api.py:73), year/month extraction "
    "(scripts/11_visualize_heatmap.py:28-30), datediff "
    "(scripts/07_backtest.py:338), sqrt/**252 annualization "
    "(scripts/07_backtest.py:348-349).",
)
def order_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_uc"),
        F.concat(F.col("o_orderpriority"), F.lit(":"), F.col("o_orderstatus")).alias(
            "pri_status"
        ),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.pow(F.lit(1.0) + F.col("o_totalprice") / 1000000000.0, F.lit(252.0)), 6).alias(
            "compounded"
        ),
        F.abs(F.col("o_totalprice") - 100000.0).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# Argmax per group with deterministic tie-break (W7/A13 variant on events)
# ---------------------------------------------------------------------------
@query(
    "peak_event_per_type",
    oracle="""
        SELECT event_type, event_id AS peak_event_id, ts AS peak_ts, value AS peak_value
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS rn
            FROM events
        ) t WHERE rn = 1
    """,
    survey_ops="W7,A13",
    doc="Global argmax row per group — the reference's idxmin/idxmax "
    "(scripts/07_backtest.py:333-338) with explicit tie-break.",
)
def peak_event_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("peak_event_id"),
            F.col("ts").alias("peak_ts"),
            F.col("value").alias("peak_value"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-salted join demo — deterministic salting as the manual skew path
# ---------------------------------------------------------------------------
@query(
    "orders_salted_skew_join",
    oracle="""
        SELECT c.c_mktsegment,
               count(*)                     AS n_orders,
               round(sum(o.o_totalprice), 4) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    survey_ops="J4 + skew salting (operators/skew.py; SURVEY §4.2 "
    "skew note, AQE fallback)",
    doc="orders ⋈ customer executed through the manual skew-salting "
    "path: fact rows carry pmod(xxhash64(row), 8) and the dimension is "
    "replicated per salt, so a hot customer key spreads over 8 "
    "reducers. The oracle is the PLAIN join — salting must be "
    "semantically invisible; the aggregate hash-checks that.",
)
def orders_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c, "o_custkey", "c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )
