"""Third relational batch: the remaining TPC-H query shapes
(Q2/Q4/Q6/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21), adapted to the
driver's tables — there is no ``partsupp`` and ``lineitem`` has no
commit/receipt dates, so cost/wait semantics are re-expressed on
``lineitem`` itself (per-part avg sale price as the cost proxy,
ship-lag vs order date as the wait proxy).

Together with relational.py / relational2.py this completes all 22
TPC-H access-path shapes: correlated min-subquery (Q2), EXISTS
semi-join (Q4), full-scan agg with tight pushdown (Q6), nation-pair
theta semantics (Q7), ratio-of-conditional-sums share (Q8/Q14),
multi-way join profit rollup (Q9), scalar-subquery HAVING (Q11),
outer-join count distribution (Q13), view+global-max (Q15), distinct
counting with exclusions (Q16), avg-quantity correlated filter (Q17),
qty-threshold semi-join (Q20), and last-blocking-supplier window
(Q21).

Scale notes: every small side (nation/region/part aggregates,
per-part averages, global scalars) is explicitly ``broadcast()`` so
the big lineitem scan never shuffles for a dimension; the only wide
shuffles are the final groupBys on their natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import query
from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q2 shape: correlated min-subquery — cheapest supplier per part
# ---------------------------------------------------------------------------
@query(
    "q2_min_price_supplier",
    oracle="""
        WITH cost AS (
            SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                   round(avg(l.l_extendedprice / l.l_quantity), 6) AS unit_price
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_type = 'STANDARD' AND p.p_size < 10
            GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT c.partkey, c.suppkey, s.s_name, n.n_name, c.unit_price
        FROM cost c
        JOIN supplier s ON s.s_suppkey = c.suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE c.unit_price = (
            SELECT min(c2.unit_price) FROM cost c2 WHERE c2.partkey = c.partkey
        )
        ORDER BY c.partkey, c.suppkey
    """,
    survey_ops="J4,A1,A13 (TPC-H Q2 correlated-min shape; reference has no "
    "equivalent — generalized surface)",
    doc="Cheapest supplier per STANDARD/small part, unit price proxied by "
    "avg(extendedprice/quantity) per (part, supplier). The correlated "
    "min-subquery is a per-part min window with tie-KEEPING semantics "
    "(all suppliers at the min survive), not row_number.",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(
            F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
                "unit_price"
            )
        )
    )
    w = W.partitionBy("partkey")
    return (
        cost.withColumn("min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_price"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("partkey", "suppkey", "s_name", "n_name", "unit_price")
        .orderBy("partkey", "suppkey")
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join — orders with a late-shipped line
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority_checking",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    survey_ops="J6-dual (left_semi), P4, A2 (TPC-H Q4 shape)",
    doc="Orders in a quarter having at least one line shipped more than "
    "60 days after the order date — EXISTS as a left_semi join so the "
    "probe side deduplicates for free; counts per priority.",
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6 shape: pure scan-aggregate; every predicate must reach the parquet scan
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    survey_ops="P4,P6,A1 (TPC-H Q6 shape; pushdown showcase)",
    doc="Revenue-increase forecast: single scan, no join, no shuffle "
    "beyond the final 1-row agg. All four predicates are "
    "scan-pushable (PushedFilters in .explain) and the scan reads "
    "only 4 columns of 11.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: nation-pair volume shipping (disjunctive pair predicate)
# ---------------------------------------------------------------------------
@query(
    "q7_nation_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, ship_year,
               round(sum(volume), 4) AS revenue
        FROM (
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   year(l.l_shipdate) AS ship_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
            JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
            WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, ship_year
        ORDER BY supp_nation, cust_nation, ship_year
    """,
    survey_ops="J4,A1,P6 (TPC-H Q7 shape)",
    doc="Bilateral trade volume between two nations per ship-year. The "
    "nation-pair disjunction is applied after two broadcast nation "
    "joins; the fact-side joins stay key-equi so AQE can pick "
    "broadcast for supplier/customer too.",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share — ratio of conditional sum to total per year
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
        SELECT order_year,
               round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
            SELECT year(o.o_orderdate) AS order_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   ns.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = nc.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
            JOIN part p     ON p.p_partkey = l.l_partkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        ) all_sales
        GROUP BY order_year
        ORDER BY order_year
    """,
    survey_ops="J4,A6 (TPC-H Q8 shape)",
    doc="National market share inside one region's ECONOMY-part market "
    "per order-year: conditional-sum / total-sum after a 7-table "
    "join in which every dimension is broadcast and only "
    "lineitem-orders shuffles.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi"
    ).select(F.col("n_nationkey").alias("nc_key"))
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit rollup by supplier nation × year
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, year(o.o_orderdate)
        ORDER BY nation, order_year
    """,
    survey_ops="J4,A1 (TPC-H Q9 shape, partsupp cost omitted — table absent)",
    doc="Profit by supplier nation and order-year over a part-name "
    "pattern filter. Part filter applied as a broadcast semi-join "
    "BEFORE the orders join so the expensive shuffle only carries "
    "matching lines.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit")
        )
        .orderBy("nation", "order_year")
    )


# ---------------------------------------------------------------------------
# Q11 shape: groups above a global-scalar threshold (scalar subquery HAVING)
# ---------------------------------------------------------------------------
@query(
    "q11_important_nation_balances",
    oracle="""
        WITH per_nation AS (
            SELECT n.n_name, round(sum(s.s_acctbal), 4) AS total_bal
            FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name
        )
        SELECT n_name, total_bal
        FROM per_nation
        WHERE total_bal > (SELECT sum(total_bal) * 0.05 FROM per_nation)
        ORDER BY total_bal DESC, n_name
    """,
    survey_ops="A1,P9 (TPC-H Q11 scalar-subquery shape; partsupp absent)",
    doc="Nations holding more than 5% of global supplier balance: "
    "grouped agg, then a 1-row global agg cross-joined back as the "
    "HAVING threshold (broadcast of a scalar).",
)
def q11_important_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("s_acctbal"), 4).alias("total_bal"))
    )
    threshold = per_nation.agg(
        (F.sum("total_bal") * 0.05).alias("threshold")
    )
    return (
        per_nation.join(F.broadcast(threshold))
        .filter(F.col("total_bal") > F.col("threshold"))
        .select("n_name", "total_bal")
        .orderBy(F.desc("total_bal"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer-join count distribution (custdist)
# ---------------------------------------------------------------------------
@query(
    "q13_customer_order_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    survey_ops="J3 (left outer), A2, A4 (TPC-H Q13 shape)",
    doc="Distribution of per-customer order counts excluding one "
    "priority class — the left join keeps order-less customers so "
    "the c_count=0 bucket is real; two-level aggregation.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier(s) by quarterly revenue via global-max join
# ---------------------------------------------------------------------------
@query(
    "q15_top_revenue_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    survey_ops="A1,W7,O2 (TPC-H Q15 view + global-max shape)",
    doc="Supplier(s) achieving the maximum quarterly revenue: grouped "
    "revenue 'view', its 1-row max broadcast back as an equi filter — "
    "keeps ties, unlike LIMIT 1.",
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-supplier variety count with NOT-IN exclusions
# ---------------------------------------------------------------------------
@query(
    "q16_part_supplier_variety",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#21'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    survey_ops="A5,P6 (TPC-H Q16 shape via lineitem; partsupp absent)",
    doc="How many distinct suppliers serve each surviving "
    "(brand, type, size) combination — countDistinct after a "
    "broadcast join with NOT-equal and IN-list exclusions pushed to "
    "the part scan.",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated avg-quantity filter (small-order revenue)
# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
               count(*) AS n_small_lines
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN part_avg a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < a.half_avg_qty
    """,
    survey_ops="A1,J4 (TPC-H Q17 correlated-avg shape)",
    doc="Average yearly revenue lost if sub-half-average-quantity "
    "orders for one brand were dropped. The correlated subquery is a "
    "per-part avg computed once and broadcast back — one extra scan, "
    "zero per-row subquery execution.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: qty-threshold semi-join — suppliers who shipped heavily
# ---------------------------------------------------------------------------
@query(
    "q20_heavy_part_shippers",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_name LIKE '%red%'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l.l_suppkey
            HAVING sum(l.l_quantity) > 100
        )
        ORDER BY s.s_suppkey
    """,
    survey_ops="J6-dual (semi), P9, A1 (TPC-H Q20 shape; partsupp absent)",
    doc="Suppliers who shipped over 1000 units of pattern-matching "
    "parts (>100 units) in a year: HAVING-gated aggregate as the IN-list, applied "
    "to supplier as a left_semi join.",
)
def q20_heavy_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# UNION ALL with provenance column (SURVEY §2.7 U1 — the pd.concat load)
# ---------------------------------------------------------------------------
@query(
    "order_slices_union_all",
    oracle="""
        SELECT slice_label, o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total_price
        FROM (
            SELECT 'y1995' AS slice_label, o_orderstatus, o_totalprice
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1996-01-01'
            UNION ALL
            SELECT 'y1996' AS slice_label, o_orderstatus, o_totalprice
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        ) u
        GROUP BY slice_label, o_orderstatus
        ORDER BY slice_label, o_orderstatus
    """,
    survey_ops="U1 (unionByName — the reference's pd.concat batch merge, "
    "scripts/02_fetch_news.py:97-114), A1, A2",
    doc="UNION ALL of two labeled year slices with per-slice aggregates "
    "— bag semantics (no implicit distinct), schema aligned by NAME "
    "(unionByName), provenance kept as a column. The union is free at "
    "execution (extra scan partitions, no shuffle); only the final "
    "groupBy shuffles.",
)
def order_slices_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year_slice(label: str, start: str, end: str) -> DataFrame:
        return (
            o.filter((F.col("o_orderdate") >= _ts(start)) & (F.col("o_orderdate") < _ts(end)))
            .select(
                F.lit(label).alias("slice_label"), "o_orderstatus", "o_totalprice"
            )
        )

    u = year_slice("y1995", "1995-01-01", "1996-01-01").unionByName(
        year_slice("y1996", "1996-01-01", "1997-01-01")
    )
    return (
        u.groupBy("slice_label", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy("slice_label", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Q21 shape: last-blocking-supplier detection via order-level windows
# ---------------------------------------------------------------------------
@query(
    "q21_blocking_suppliers",
    oracle="""
        WITH marked AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate,
                   max(l.l_shipdate) OVER (PARTITION BY l.l_orderkey) AS order_last_ship,
                   count(DISTINCT l.l_suppkey) OVER (PARTITION BY l.l_orderkey) AS n_supps
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, count(DISTINCT m.l_orderkey) AS numwait
        FROM marked m
        JOIN supplier s ON s.s_suppkey = m.l_suppkey
        WHERE m.n_supps > 1 AND m.l_shipdate = m.order_last_ship
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    survey_ops="W3,J6-dual,A2 (TPC-H Q21 shape: exists + not-exists "
    "re-expressed as order-level windows; commit/receipt dates absent)",
    doc="Suppliers most often the LAST to ship in multi-supplier "
    "finished orders (the wait-blocking proxy): per-order max-shipdate "
    "and distinct-supplier windows replace Q21's EXISTS/NOT EXISTS "
    "pair — one shuffle by orderkey instead of two self-joins.",
)
def q21_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("l_orderkey")
    marked = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .withColumn("order_last_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
    )
    return (
        marked.filter(
            (F.col("n_supps") > 1)
            & (F.col("l_shipdate") == F.col("order_last_ship"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "part_name_regex_parse",
    oracle=r"""
        SELECT regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(CASE WHEN regexp_matches(p_name, 'red|blue|green')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_colored,
               round(avg(p_retailprice), 6) AS avg_price
        FROM part
        GROUP BY regexp_extract(p_name, '^(\w+)', 1)
    """,
    survey_ops="§2.8 string/regex: regexp_extract + regexp matching "
    "(the reference's keyword/url parsing analog)",
    doc="Regex parsing over part names: first word extracted with "
    "regexp_extract (identical \\w semantics in Java regex and RE2 for "
    "ASCII word chars), color-mention flag via pattern alternation — "
    "the §2.8 regex surface as grouped aggregates so the result is "
    "compact and hash-stable.",
)
def part_name_regex_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    first = F.regexp_extract("p_name", r"^(\w+)", 1)
    colored = F.col("p_name").rlike("red|blue|green")
    return p.groupBy(first.alias("first_word")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(colored.cast("long")).alias("n_colored"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )
