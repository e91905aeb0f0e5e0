"""Relational breadth: the 22 TPC-H shapes plus classic SQL forms.

Split out of the monolithic queries.py (r7); registry assembly lives in
``dataproc_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

from dataproc_spark.queries._tables import _t, rev_cents, register_tables  # noqa: F401


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan-heavy group-by with exact-cents aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-31").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_c"
            ),
            F.sum(F.round(disc * 100).cast("long")).alias("sum_disc_c"),
            F.sum(F.round(disc * (1 + F.col("l_tax")) * 100).cast("long")).alias(
                "sum_charge_c"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + top-10 by exact revenue."""
    cu = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey).join(
        cu, od.o_custkey == cu.c_custkey
    )
    g = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(rev_cents()).alias("revenue_c")
    )
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            F.col("l_orderkey").alias("okey"),
            "revenue_c",
            F.col("o_orderdate").cast("date").cast("string").alias("odate"),
            "o_orderpriority",
            "rnk",
        )
    )


SQL_TPCH_Q3 = """
WITH g AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT CAST(l_orderkey AS BIGINT) AS okey, revenue_c,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate, o_orderpriority,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_c DESC, l_orderkey) AS rnk
    FROM g
)
WHERE rnk <= 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join, small dims broadcast."""
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(rev_cents()).alias("revenue_c")
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (returnflag, linestatus) with subtotal
    and grand-total rows, tagged by grouping level."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_c"
            ),
            F.grouping_id().alias("gid"),
        )
    )


SQL_ROLLUP_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-3 customers by account balance within each nation."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    j = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).select(
        "n_name",
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("acctbal_c").desc(), F.col("custkey").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)
    )


SQL_TOP_CUSTOMERS = """
SELECT n_name, custkey, acctbal_c, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT n_name, CAST(c_custkey AS BIGINT) AS custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
           ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC, c_custkey
           ) AS rnk
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rnk <= 3
"""


def q_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / semi-join shape: orders having at least one heavy line
    item (quantity > 45), counted per priority."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        od.join(li.select("l_orderkey"), od.o_orderkey == li.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_EXISTS_ORDERS = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: parts priced above their brand's average
    (decorrelated as a window aggregate — the Spark-native plan)."""
    pa = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("p_retailprice") * 100).cast("long")
    w = Window.partitionBy("p_brand")
    return (
        pa.withColumn("price_c", price_c)
        .withColumn("brand_sum_c", F.sum("price_c").over(w))
        .withColumn("brand_n", F.count(F.lit(1)).over(w))
        # integer cross-multiplication: price > sum/n <=> price*n > sum
        .where(F.col("price_c") * F.col("brand_n") > F.col("brand_sum_c"))
        .select(
            F.col("p_partkey").alias("partkey"), "p_brand", "price_c"
        )
    )


SQL_PARTS_ABOVE_BRAND_AVG = """
WITH priced AS (
    SELECT CAST(p_partkey AS BIGINT) AS partkey, p_brand,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
    FROM part
),
stats AS (
    SELECT partkey, p_brand, price_c,
           SUM(price_c) OVER (PARTITION BY p_brand) AS brand_sum_c,
           COUNT(*) OVER (PARTITION BY p_brand) AS brand_n
    FROM priced
)
SELECT partkey, p_brand, price_c
FROM stats WHERE price_c * brand_n > brand_sum_c
"""


def q_nations_above_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + scalar-subquery shape: nations whose supplier revenue
    exceeds the all-nation average (exact integer comparison)."""
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    rev_c = rev_cents()
    per_nation = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev_c).alias("revenue_c"))
    )
    totals = per_nation.agg(
        F.sum("revenue_c").alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_nation.crossJoin(F.broadcast(totals))
        .where(F.col("revenue_c") * F.col("_n") > F.col("_tot"))
        .select("n_name", "revenue_c")
    )


SQL_NATIONS_ABOVE_AVG_REVENUE = """
WITH per_nation AS (
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name, revenue_c
FROM per_nation
WHERE revenue_c * (SELECT COUNT(*) FROM per_nation)
      > (SELECT SUM(revenue_c) FROM per_nation)
"""


def q_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-pivot aggregation: per linestatus, line counts and exact cents
    revenue split by return flag."""
    li = _t(spark, sf_dir, "lineitem")
    rev_c = rev_cents()
    def flag(f):
        return F.when(F.col("l_returnflag") == f, 1).otherwise(0)
    return li.groupBy("l_linestatus").agg(
        F.sum(flag("R")).alias("n_returned"),
        F.sum(flag("A")).alias("n_accepted"),
        F.sum(flag("N")).alias("n_none"),
        F.sum(F.when(F.col("l_returnflag") == "R", rev_c).otherwise(0)).alias(
            "returned_rev_c"
        ),
    )


SQL_RETURNFLAG_PIVOT = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_none,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_rev_c
FROM lineitem GROUP BY l_linestatus
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_left_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null handling: every customer with their order
    count and total (0-filled for customers without orders)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_c"),
    )
    return (
        cu.join(per_cust, cu.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_c", F.lit(0)).alias("total_c"),
        )
    )


SQL_LEFT_JOIN_FILL = """
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_mktsegment,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(total_c, 0) AS BIGINT) AS total_c
FROM customer
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_c
    FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction on the tz-free timestamp: orders and revenue
    per (year, month)."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").alias("yy"),
            F.month("o_orderdate").alias("mm"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_c"
            ),
        )
    )


SQL_ORDERS_BY_MONTH = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yy,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mm,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders GROUP BY 1, 2
"""


def q_union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit UNION ALL of heterogeneous sources normalized to one
    schema: customer and supplier account balances as one ledger."""
    cu = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    return cu.unionByName(su).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("acctbal_c").alias("sum_acctbal_c"),
        F.min("acctbal_c").alias("min_acctbal_c"),
        F.max("acctbal_c").alias("max_acctbal_c"),
    )


SQL_UNION_ALL_SOURCES = """
WITH ledger AS (
    SELECT 'customer' AS kind,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
    FROM customer
    UNION ALL
    SELECT 'supplier' AS kind,
           CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c
    FROM supplier
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(acctbal_c) AS BIGINT) AS sum_acctbal_c,
       CAST(MIN(acctbal_c) AS BIGINT) AS min_acctbal_c,
       CAST(MAX(acctbal_c) AS BIGINT) AS max_acctbal_c
FROM ledger GROUP BY kind
"""


def q_priority_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with both URGENT and LOW priority orders."""
    od = _t(spark, sf_dir, "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = od.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


SQL_PRIORITY_INTERSECT = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


def q_priority_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with URGENT orders but no LOW orders."""
    od = _t(spark, sf_dir, "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = od.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract = SQL EXCEPT (set semantics): any customer appearing in
    # `low` is removed entirely, unlike exceptAll's multiset difference
    return urgent.subtract(low)


SQL_PRIORITY_EXCEPT = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


# ---------------------------------------------------------------------------
# events (time-series / streaming shapes)
# ---------------------------------------------------------------------------


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value model: per-user
    Recency (latest event ts), Frequency (event count), Monetary (value
    cents), each quartiled WITHIN the population via the integer
    permille rank (``analytics.group_percentile`` with a constant
    group), then composed into a 111..444 segment code. One per-user
    aggregate + three single-partition-spec windows over the user-level
    frame (population-sized, far smaller than events)."""
    from dataproc_spark.extensions.analytics import group_percentile

    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max("ts").alias("recency_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary_c"),
    )
    out = users.withColumn("_g", F.lit(1))
    for col, name in [("recency_ts", "r_m"), ("frequency", "f_m"),
                      ("monetary_c", "m_m")]:
        out = group_percentile(out, ["_g"], col, ["user_id"], out_col=name)
    quart = lambda c: F.expr(f"CAST({c} * 4 div 1001 AS INT) + 1")
    return out.select(
        "user_id", "frequency", "monetary_c",
        quart("r_m").alias("r_q"),
        quart("f_m").alias("f_q"),
        quart("m_m").alias("m_q"),
        (quart("r_m") * 100 + quart("f_m") * 10 + quart("m_m"))
        .alias("segment"),
    )


SQL_RFM_SEGMENTS = """
WITH users AS (
    SELECT user_id, MAX(epoch_ns(ts)) AS recency_ts,
           COUNT(*) AS frequency,
           SUM(CAST(round(value * 100) AS BIGINT)) AS monetary_c
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT user_id, frequency, monetary_c,
           ((ROW_NUMBER() OVER (ORDER BY recency_ts, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS r_m,
           ((ROW_NUMBER() OVER (ORDER BY frequency, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS f_m,
           ((ROW_NUMBER() OVER (ORDER BY monetary_c, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS m_m
    FROM users
)
SELECT user_id, CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_c AS BIGINT) AS monetary_c,
       CAST(r_m * 4 // 1001 + 1 AS INTEGER) AS r_q,
       CAST(f_m * 4 // 1001 + 1 AS INTEGER) AS f_q,
       CAST(m_m * 4 // 1001 + 1 AS INTEGER) AS m_q,
       CAST((r_m * 4 // 1001 + 1) * 100 + (f_m * 4 // 1001 + 1) * 10
            + (m_m * 4 // 1001 + 1) AS INTEGER) AS segment
FROM ranked
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) run through the ``spark.sql``
    SURFACE, not the DataFrame API: the table registers as a temp view and
    the query is a SQL string — proving the engine's second public API
    front-end produces gate-identical plans/results. Discount bounds
    compare on exact integer cents (`round(x*100)`), never raw float
    thresholds."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP_NTZ '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1995-01-01 00:00:00'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """)


SQL_TPCH_Q6 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style (order priority checking) through the ``spark.sql``
    front-end: a correlated EXISTS subquery with a NON-EQUI predicate
    referencing the outer row (``l_shipdate > o_orderdate + 200 days`` —
    the testdata carries no l_commitdate/l_receiptdate, so "late" is
    defined against the order date). Catalyst decorrelates the EXISTS
    into a left-semi join; the date literal shape follows ``tpch_q6``.
    Ref parity: exercises the SQL-string API surface (reference
    `selectivesearch.py` exposes a query front-end; the SQL surface is
    this engine's second public API)."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders_v
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem_v
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL '200' DAY
          )
        GROUP BY o_orderpriority
    """)


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 200 DAY)
GROUP BY o_orderpriority
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) through the ``spark.sql`` front-end:
    six-table join with a symmetric two-nation disjunction and a
    per-year rollup. Revenue is summed as exact integer cents
    (per-item ROUND(x*100)) so the result hash-matches across engines.
    The nation pair keeps both join directions live (neither side can
    be pre-filtered away), exercising join reordering over the
    disjunction."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume_c) AS BIGINT) AS revenue_c
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS volume_c
            FROM supplier_v, lineitem_v, orders_v, customer_v,
                 nation_v n1, nation_v n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """)


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume_c) AS BIGINT) AS revenue_c
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_c
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
      OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping GROUP BY 1, 2, 3
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) through the ``spark.sql``
    front-end: eight-table join, nation twice in different roles
    (customer region membership vs supplier nationality), and a
    conditional-aggregate ratio. The share is exact integer permille —
    ``sum(case…)*1000 div sum(all)`` over integer cents — because a
    float ratio could not hash-match across engines."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_c
                             ELSE 0 END) * 1000 div SUM(volume_c)
                    AS BIGINT) AS mkt_share_m
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS volume_c,
                   n2.n_name AS nation
            FROM part_v, supplier_v, lineitem_v, orders_v, customer_v,
                 nation_v n1, nation_v n2, region_v
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
              AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
    """)


SQL_TPCH_Q8 = """
SELECT o_year, CAST(SUM(CASE WHEN nation='NATION_3' THEN volume_c ELSE 0 END) * 1000
                // SUM(volume_c) AS BIGINT) AS mkt_share_m
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_c,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
    AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations GROUP BY o_year
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution) through the
    ``spark.sql`` front-end: LEFT OUTER JOIN with an extra non-key join
    predicate (the outer-join aggregate shape the prior SQL set didn't
    exercise), then a distribution-of-counts double aggregate.
    Customers with zero qualifying orders land in the c_count=0 bucket
    via the preserved null side."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer_v LEFT OUTER JOIN orders_v
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """)


SQL_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders GROUP BY c_count
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style (small-quantity-order revenue) through the
    ``spark.sql`` front-end: TWO correlated scalar subqueries against
    the same inner table (sum and count of the part's lineitems) —
    Catalyst decorrelates each into an aggregate + join. The threshold
    ``q < 0.2 * avg(q)`` is cross-multiplied to exact integers
    (``5*q*cnt < sum``; l_quantity is integral) so no float average is
    ever compared."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    div 7 AS BIGINT) AS avg_yearly_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v, part_v
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#4' AND p_type = 'PROMO'
          AND CAST(l_quantity AS BIGINT) * 5 *
              (SELECT COUNT(*) FROM lineitem_v l2
               WHERE l2.l_partkey = p_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
                 FROM lineitem_v l2 WHERE l2.l_partkey = p_partkey)
    """)


SQL_TPCH_Q17 = """
WITH agg AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_q, COUNT(*) AS cnt_q
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) // 7 AS BIGINT)
           AS avg_yearly_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey JOIN agg USING (l_partkey)
WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
  AND CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style (suppliers who kept orders waiting) through the
    ``spark.sql`` front-end: the EXISTS + NOT EXISTS pair over the same
    inner table with correlated NON-EQUI predicates referencing TWO
    outer tables (l1 and orders) — the hardest decorrelation shape in
    the set. "Late" is ``l_shipdate > o_orderdate + 200 days`` (no
    commit/receipt dates in the testdata); the answer is each suspect
    nation's suppliers who were the ONLY late supplier on a finished
    multi-supplier order."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier_v, lineitem_v l1, orders_v, nation_v
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '200' DAY
          AND EXISTS (
              SELECT 1 FROM lineitem_v l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem_v l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL '200' DAY
          )
          AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_3', 'NATION_5', 'NATION_7')
        GROUP BY s_name
    """)


SQL_TPCH_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 200 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o_orderdate + INTERVAL 200 DAY)
  AND s_nationkey = n_nationkey AND n_name IN ('NATION_3','NATION_5','NATION_7')
GROUP BY s_name
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style (global sales opportunity) through the
    ``spark.sql`` front-end: two uncorrelated scalar subqueries (the
    positive-balance sum and count, cross-multiplied so no float
    average is compared) plus a NOT EXISTS anti-join against recent
    orders. Country code is ``c_nationkey % 10`` (the testdata has no
    phone column); "no recent orders" replaces "no orders" because
    every testdata customer has at least one order."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
        FROM (
            SELECT c_nationkey % 10 AS cntrycode,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
                   c_custkey
            FROM customer_v
            WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7)
        ) c
        WHERE bal_c * (SELECT COUNT(*) FROM customer_v WHERE c_acctbal > 0.0)
              > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                 FROM customer_v WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
              SELECT 1 FROM orders_v o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP_NTZ '1999-01-01 00:00:00'
          )
        GROUP BY cntrycode
    """)


SQL_TPCH_Q22 = """
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
FROM (
  SELECT c_nationkey % 10 AS cntrycode,
         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c, c_custkey
  FROM customer WHERE c_nationkey % 10 IN (1,2,3,4,5,6,7)
) c
WHERE bal_c * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style (returned item reporting) through the ``spark.sql``
    front-end: four-table join, quarter filter, returned-item revenue per
    customer, top-20 with a DETERMINISTIC total order (revenue desc, then
    custkey — a bare LIMIT over a float sort could not hash-match across
    engines). Revenue is exact integer cents; address/phone/comment
    columns do not exist in the testdata and are dropped from the
    projection."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
               n_name
        FROM customer_v, orders_v, lineitem_v, nation_v
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue_c DESC, c_custkey
        LIMIT 20
    """)


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_c DESC, c_custkey
LIMIT 20
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (shipping mode / priority) through the
    ``spark.sql`` front-end: the join + dual conditional-count shape.
    The testdata has no l_shipmode/l_commitdate/l_receiptdate, so the
    grouping key is ``l_returnflag`` and "late" is
    ``l_shipdate > o_orderdate + 150 days`` (same adaptation as
    ``tpch_q4``); high/low priority is the URGENT+HIGH split of the
    original."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders_v, lineitem_v
        WHERE o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate + INTERVAL '150' DAY
          AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
        GROUP BY l_returnflag
    """)


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 150 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) through the ``spark.sql`` front-end:
    lineitem⋈part with a one-month shipdate window and a conditional
    revenue ratio. The share is exact integer permille
    (``sum(case…)*1000 div sum(all)`` over integer cents, the
    ``tpch_q8`` device) because a float percentage could not hash-match
    across engines; the testdata's p_type carries the bare 'PROMO'
    token, so equality replaces the LIKE 'PROMO%%' prefix test."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
                    * 1000 div SUM(rev_c) AS BIGINT) AS promo_share_m,
               CAST(SUM(rev_c) AS BIGINT) AS revenue_c
        FROM (
            SELECT p_type,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS rev_c
            FROM lineitem_v, part_v
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP_NTZ '1996-09-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1996-10-01 00:00:00'
        ) promo
    """)


SQL_TPCH_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type='PROMO' THEN rev_c ELSE 0 END) * 1000
            // SUM(rev_c) AS BIGINT) AS promo_share_m,
       CAST(SUM(rev_c) AS BIGINT) AS revenue_c
FROM (
  SELECT p_type, CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS rev_c
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate <  TIMESTAMP '1996-10-01'
) promo
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier) through the ``spark.sql`` front-end: the
    original's revenue VIEW becomes a CTE referenced twice — once joined
    to supplier, once inside the scalar MAX subquery (Catalyst evaluates
    the aggregate subtree twice; at cluster scale the CTE is cheap
    relative to a cache round-trip). Revenue is exact integer cents so
    the MAX comparison is never a float equality."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS total_revenue_c
            FROM lineitem_v
            WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_c
        FROM supplier_v, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
    """)


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
              AS BIGINT) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer) through the ``spark.sql``
    front-end: IN over a grouped-HAVING subquery on the same fact table
    that is also re-joined and re-aggregated outside — Catalyst plans
    the subquery as a left-semi join against the aggregate. Threshold
    300 sits near the testdata's 99.9th percentile of per-order
    quantity (the original's 300-of-~350 proportion). Quantities are
    integral doubles, summed then cast."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_c,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM customer_v, orders_v, lineitem_v
        WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem_v
                GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
            )
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    """)


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue) through the ``spark.sql``
    front-end: the three-branch disjunction of conjunctive brand ×
    size × quantity ranges over lineitem⋈part. Only ``p_partkey =
    l_partkey`` is common to all branches, so Catalyst must keep the
    equi-join and evaluate the disjunction as a residual filter —
    the shape that breaks naive predicate pushdown. Shipmode /
    shipinstruct conjuncts don't exist in the testdata and are
    dropped; brands map onto the testdata's Brand#N domain."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v, part_v
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))
    """)


SQL_TPCH_Q19 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand='Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand='Brand#7'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand='Brand#12' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
"""


#: Derived partsupp: the testdata ships no partsupp table, so the five
#: TPC-H queries that need one (Q2/Q9/Q11/Q16/Q20) run over a
#: DETERMINISTIC derivation — 4 suppliers per part, availqty and
#: supplycost as integer formulas of (partkey, k) — built identically
#: as a Spark temp view and as a DuckDB CTE, so the oracle checks the
#: full query shape over the same rows.
_PARTSUPP_BODY = """
SELECT p_partkey AS ps_partkey,
       CAST((p_partkey + k * 7 + 1) %% (SELECT COUNT(*) FROM supplier{sfx})
            AS BIGINT) AS ps_suppkey,
       CAST((p_partkey * 7 + k * 13) %% 9999 + 1 AS BIGINT) AS ps_availqty,
       CAST((p_partkey * 31 + k * 17) %% 100000 + 1 AS BIGINT)
           AS ps_supplycost_c
FROM ({exploded})
"""

# the 4-way expansion is a LATERAL explode in the projection, not a
# cross join against a 4-row relation — the latter plans as a
# BroadcastNestedLoopJoin, which the registry's plan guard forbids


SPARK_PARTSUPP = _PARTSUPP_BODY.format(
    sfx="_v",
    exploded="SELECT p_partkey, explode(sequence(0, 3)) AS k FROM part_v",
).replace("%%", "%")


DUCK_PARTSUPP_CTE = "partsupp AS (" + _PARTSUPP_BODY.format(
    sfx="",
    exploded="SELECT p_partkey, unnest(range(0, 4)) AS k FROM part",
).replace("%%", "%") + ")"


def register_partsupp(spark: SparkSession, sf_dir: str) -> None:
    """`register_tables` + the derived ``partsupp_v`` view (see
    :data:`_PARTSUPP_BODY`)."""
    register_tables(spark, sf_dir)
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW partsupp_v AS {SPARK_PARTSUPP}")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) through the ``spark.sql``
    front-end over the derived partsupp: the correlated scalar MIN
    subquery re-joins four tables inside the correlation — the widest
    decorrelation in the set. Deterministic top-100 (acctbal desc,
    nation, supplier, part); mfgr/address/phone/comment columns do not
    exist in the testdata and LIKE '%BRASS' becomes p_type equality."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c,
               s_name, n_name, p_partkey
        FROM part_v, supplier_v, partsupp_v, nation_v, region_v
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15 AND p_type = 'PROMO'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost_c = (
              SELECT MIN(ps2.ps_supplycost_c)
              FROM partsupp_v ps2, supplier_v s2, nation_v n2, region_v r2
              WHERE p_partkey = ps2.ps_partkey
                AND s2.s_suppkey = ps2.ps_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'EUROPE')
        ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
        LIMIT 100
    """)


SQL_TPCH_Q2 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c,
       s_name, n_name, p_partkey
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'PROMO'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost_c = (
      SELECT MIN(ps2.ps_supplycost_c)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) through the ``spark.sql``
    front-end: six-table join with partsupp on the COMPOSITE
    (partkey, suppkey) key and profit as exact integer cents
    (revenue minus supplycost×quantity). '%green%' becomes '%red%'
    (the testdata's p_name vocabulary)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT nation, o_year, CAST(SUM(amount_c) AS BIGINT) AS sum_profit_c
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)
                   - ps_supplycost_c * CAST(l_quantity AS BIGINT) AS amount_c
            FROM part_v, supplier_v, lineitem_v, partsupp_v, orders_v,
                 nation_v
            WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
              AND ps_partkey = l_partkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """)


SQL_TPCH_Q9 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT nation, o_year, CAST(SUM(amount_c) AS BIGINT) AS sum_profit_c
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         - ps_supplycost_c * CAST(l_quantity AS BIGINT) AS amount_c
  FROM part, supplier, lineitem, partsupp, orders, nation
  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
    AND ps_partkey = l_partkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) through the ``spark.sql`` front-end:
    grouped HAVING compared against an uncorrelated scalar aggregate of
    the SAME three-table join — integer cross-multiply (×1000) replaces
    the float fraction so the comparison hash-matches."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT ps_partkey,
               CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        FROM partsupp_v, supplier_v, nation_v
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_1'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost_c * ps_availqty) * 1000 > (
            SELECT SUM(ps_supplycost_c * ps_availqty)
            FROM partsupp_v, supplier_v, nation_v
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_1')
    """)


SQL_TPCH_Q11 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT ps_partkey,
       CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_1'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost_c * ps_availqty) * 1000 > (
    SELECT SUM(ps_supplycost_c * ps_availqty)
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1')
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) through the ``spark.sql``
    front-end: COUNT(DISTINCT) per 3-column group with a NOT IN
    anti-subquery. The comment-based supplier exclusion becomes
    negative-balance standing (no comment column in the testdata)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp_v, part_v
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """)


SQL_TPCH_Q16 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) through the ``spark.sql``
    front-end: nested IN subqueries with a correlated scalar aggregate
    at the innermost level (availqty vs half the year's shipped
    quantity, integer cross-multiplied; parts with no shipments
    COALESCE to 0, so unexercised stock qualifies)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, s_suppkey
        FROM supplier_v, nation_v
        WHERE s_suppkey IN (
                SELECT ps_suppkey FROM partsupp_v
                WHERE ps_partkey IN (
                        SELECT p_partkey FROM part_v WHERE p_type = 'PROMO')
                  AND ps_availqty * 2 > (
                      SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)
                      FROM lineitem_v
                      WHERE l_partkey = ps_partkey
                        AND l_suppkey = ps_suppkey
                        AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
                        AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    """)


SQL_TPCH_Q20 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT s_name, s_suppkey
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND ps_availqty * 2 > (
          SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)
          FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
"""


def q_co_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top-50 part pairs ordered together
    in ≥3 orders (support desc, then part ids — a deterministic total
    order). Per-order pair fan-out is bounded by basket size squared,
    never |parts|²; the top-50 plans as TakeOrderedAndProject."""
    from dataproc_spark.extensions.analytics import co_occurrence

    li = _t(spark, sf_dir, "lineitem")
    return co_occurrence(
        li, "l_orderkey", "l_partkey", min_support=3, top_n=50
    ).select(
        "item_a", "item_b", F.col("support").cast("long").alias("support")
    )


SQL_CO_OCCURRENCE = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
),
pairs AS (
    SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS support
    FROM baskets a JOIN baskets b ON a.g = b.g AND a.i < b.i
    GROUP BY a.i, b.i
    HAVING COUNT(*) >= 3
)
SELECT item_a, item_b, CAST(support AS BIGINT) AS support
FROM pairs
ORDER BY support DESC, item_a, item_b
LIMIT 50
"""
