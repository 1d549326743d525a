"""Second relational batch: TPC-H shapes Q10/Q12/Q14/Q18/Q19/Q22-ish,
ranking family, grouping sets via SQL, percentiles, JSON extraction,
token explode, sliding windows, unpivot (SURVEY §2 continued)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item losses per customer, top 20
# ---------------------------------------------------------------------------
@query(
    "q10_returned_item_losses",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    survey_ops="J3,J4,A1,O2,O4",
)
def q10_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: two-bucket conditional counts by date-window filter
# ---------------------------------------------------------------------------
@query(
    "q12_priority_shipping_buckets",
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
    """,
    survey_ops="A6,P4,P6",
)
def q12_priority_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-share ratio (promo revenue %)
# ---------------------------------------------------------------------------
@query(
    "q14_brand_revenue_share",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_brand = 'Brand#1'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS brand1_share_pct,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    survey_ops="A6,A1 (ratio-of-sums global agg)",
)
def q14_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_brand") == "Brand#1", rev).otherwise(0.0)) / F.sum(rev),
            6,
        ).alias("brand1_share_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large orders via HAVING-gated semi join
# ---------------------------------------------------------------------------
@query(
    "q18_large_volume_orders",
    oracle="""
        SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               sum(l.l_quantity) AS total_qty
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    survey_ops="J6(semi),A1,P9",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 120)
    ).select("l_orderkey")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-clause predicate
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_predicates",
    # revenue uses the decimal-addend discipline (round-5 gotcha): this
    # is the catalog's largest single-group float accumulation, and a
    # raw double sum flipped by ~8 ulps between engines once at sf0.1
    # (SWEEP r9: 672113356.2518 vs .251801). Per-row products are
    # IEEE-identical across engines; the decimal cast makes the SUM
    # order-independent, one double cast + round(6) at the end.
    # SCALE MATTERS: the cast scale must satisfy |v|*10^scale << 2^53
    # — DuckDB converts double->decimal by multiplying IN DOUBLE, so a
    # too-fine scale rounds at the double's ulp and diverges from
    # Spark's shortest-repr route (measured on o_totalprice at scale
    # 10). price*(1-disc) is an exact 4-dp value <= 1.05e5, so scale 6
    # gives identical per-row decimals in both engines with 2^53/1e11
    # margin.
    oracle="""
        SELECT round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 10 AND l.l_quantity <= 30)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 20 AND l.l_quantity <= 40)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 25 AND l.l_quantity <= 45)
    """,
    survey_ops="P6 (disjunctive), J4",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(10, 30)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(25, 45)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).cast("double"),
            6,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-subquery threshold + anti join
# ---------------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    oracle="""
        SELECT c_mktsegment,
               count(*)            AS n_customers,
               round(sum(c_acctbal), 6) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_mktsegment
    """,
    survey_ops="J6(anti),A3 (scalar subquery threshold; anti side "
    "date-restricted so the result is non-degenerate — every customer "
    "has some order in the synthetic data)",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Ranking family: rank / dense_rank / percent_rank / ntile (SURVEY §2.5 note)
# ---------------------------------------------------------------------------
@query(
    "supplier_rank_family",
    oracle="""
        SELECT s_suppkey, s_nationkey, s_acctbal,
               rank()         OVER w AS bal_rank,
               dense_rank()   OVER w AS bal_dense_rank,
               round(percent_rank() OVER w, 6) AS bal_pct_rank,
               ntile(4)       OVER w AS bal_quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    survey_ops="§2.5 ranking family (rank/dense_rank/percent_rank/ntile)",
)
def supplier_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS via the SQL API (Catalyst parity with the DF API)
# ---------------------------------------------------------------------------
@query(
    "orders_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 6) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    survey_ops="grouping sets (SURVEY §2.4 closing note); SQL entry point",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 6) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median per group (quantile surface)
# ---------------------------------------------------------------------------
@query(
    "order_price_quantiles",
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 6)  AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 6)  AS p90_price,
               round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    survey_ops="quantiles (approx_percentile's exact sibling); A3",
    doc="Exact interpolated percentiles per group — matches DuckDB "
    "quantile_cont. approx_percentile/approx_count_distinct are the "
    "scale path (rows-only entry: approx_distinct_stats).",
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "approx_distinct_stats",
    oracle=None,  # HLL/KLL sketches are engine-specific → rows-only
    survey_ops="approx_count_distinct + approx_percentile (scale-path sketches)",
    doc="Sketch-based aggregates for 100 TB cardinalities: HLL distinct "
    "counts and KLL percentiles. Not bit-comparable across engines by "
    "nature; accuracy is asserted against exact values in pytest.",
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
    )


# ---------------------------------------------------------------------------
# JSON extraction from the events.props payload (§2.8 map/json)
# ---------------------------------------------------------------------------
@query(
    "events_json_props",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*)             AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE) / count(value), 6) AS avg_value
        FROM events
        GROUP BY CAST(json_extract(props, '$.k') AS BIGINT) % 10
    """,
    survey_ops="§2.8 map/json: get_json_object/from_json (reference to_json/json.loads "
    "ingestion/producer.py:60, consumer/consumer.py:9)",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.try_divide(F.sum(F.col("value").cast("decimal(20,8)")).cast("double"), F.count(F.col("value"))), 6).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Explode / UDTF-shaped token frequency (§2.10 note: explode is the UDTF need)
# ---------------------------------------------------------------------------
@query(
    "doc_token_frequency_top20",
    oracle=r"""
        SELECT tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents
        ) t
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 20
    """,
    survey_ops="explode (UDTF-shaped), A4, O3",
)
def doc_token_frequency_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) event-time window — batch form (T7)
# ---------------------------------------------------------------------------
@query(
    "events_sliding_window",
    oracle="""
        WITH shifted AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type, value FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, event_type, value
            FROM events
        )
        SELECT window_start, event_type,
               count(*)             AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(20,8))) AS DOUBLE)
                     / count(*), 6) AS avg_value
        FROM shifted
        GROUP BY window_start, event_type
    """,
    survey_ops="T7 sliding window (batch form of streaming hop)",
    doc="2-hour window sliding by 1 hour: every event lands in two "
    "windows keyed by window START. F.window(ts, '2 hours', '1 hour') "
    "in Spark; the oracle materializes the same assignment as a "
    "two-way shifted union. avg is computed as an EXACT decimal sum "
    "over the count: double summation is shuffle-order-dependent, and "
    "at sf0.1 eight groups landed exactly on a round-half boundary at "
    "the 6th decimal (39.1246875), splitting Spark and DuckDB by one "
    "ulp of the rounded digit. The per-value double→decimal(20,8) "
    "cast is deterministic and engine-identical (verified over the "
    "full sf0.1 column), so the sum — and therefore the rounded "
    "average — is order-independent at every SF.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(20,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value"
        )
    )


# ---------------------------------------------------------------------------
# Unpivot via stack (SURVEY pivot/unpivot surface)
# ---------------------------------------------------------------------------
@query(
    "part_measures_unpivot",
    oracle="""
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS measure_value
        FROM part WHERE p_partkey % 10 = 0
        UNION ALL
        SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS measure_value
        FROM part WHERE p_partkey % 10 = 0
    """,
    survey_ops="unpivot/stack (inverse of A11)",
)
def part_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) "
        "AS (measure, measure_value)",
    )
