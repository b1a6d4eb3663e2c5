"""Composed analytical queries — SURVEY.md §2 capstones (round 4).

Classic TPC-H-shaped decision-support queries run end-to-end through the
engine's relational core: multi-join star plans with selective date
predicates, grouped decimal-exact revenue aggregation, and deterministic
top-k. These are the workload shapes the reference's deployed engine
(MySQL 5.6, mysql-persistent-template.json:68) serves for surveillance
analytics dashboards — each one composes 5+ §2 operator keys into a single
plan, so a correctness hash here certifies the interactions (join
reordering, pushdown through joins, agg-under-topk), not just the operators
in isolation.

Scale notes: all three queries keep dimension sides broadcast-able
(customer/nation filters reduce them far below the broadcast threshold at
any sf), shuffle the fact ONCE on its join key, push every date predicate
to the parquet scan, and end in TakeOrderedAndProject (top-k without a
global sort). This is the plan shape a 1000-executor run wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.functions.num import DEC, dsum, sql_dsum
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.14 analytical queries"

_Q3_CUTOFF = "1998-06-01"


@register(
    "query_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    section=_SEC,
)
def query_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment.
    Plan: segment filter shrinks customer to ~1/5 (broadcast), orders date
    filter pushes to parquet, ONE shuffle on orderkey for the lineitem
    join+agg, TakeOrderedAndProject for the limit. Deterministic tie-break
    on l_orderkey (revenue alone can collide)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUTOFF).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUTOFF).cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "query_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS lost_revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
    section=_SEC,
)
def query_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.
    Plan: returnflag filter pushes to the lineitem scan (cuts ~2/3 of the
    fact before any join), nation broadcasts, one orderkey shuffle + one
    custkey shuffle for the final agg, top-k without global sort."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "query_late_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    section=_SEC,
)
def query_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with at least one late
    lineitem (shipped >60 days after order). EXISTS becomes a LEFT SEMI
    join — the fact side is deduplicated by the join itself, no DISTINCT
    pass. Date window pushes to the orders scan; the semi join shuffles on
    orderkey once."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "query_cust_order_counts",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    section=_SEC,
)
def query_cust_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): outer join
    with an ON-clause filter (customers with zero qualifying orders must
    appear with count 0 — the LEFT JOIN + conditional-count semantics this
    capstone certifies), then an aggregate OF the aggregate.

    Plan: this is the rare capstone where the dim side CANNOT broadcast at
    scale (every customer must survive, so customer is a full outer input)
    → one custkey shuffle joins the two tables (AQE splits skewed
    customers), the first count collapses to |customers| rows, and the
    second groupBy shuffles only |distinct counts| rows (metadata-scale).
    The priority filter sits in the JOIN CONDITION, not a WHERE — pushing
    it to WHERE would wrongly drop zero-order customers."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q18_QTY = 150


@register(
    "query_large_volume_cust",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_dsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,8))) > {_Q18_QTY}
    )
    GROUP BY 1, 2, 3
    """,
    section=_SEC,
)
def query_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over an AGGREGATED
    subquery — the order keys whose total quantity clears a threshold —
    then re-join facts to report per-order totals. Certifies the
    semi-join-on-aggregate pattern (Catalyst plans the IN as a LEFT SEMI
    against the HAVING-filtered agg, no decorrelation needed).

    Plan: lineitem aggregates once by orderkey (partial+final, DECIMAL
    sums); the qualifying-keys side is small after HAVING → broadcast
    semi; the final join+agg reuses the orderkey shuffle. At 100 TB the
    only full-fact shuffles are the two orderkey hash exchanges — customer
    attaches via its own key join (broadcast-able per AQE stats)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(dsum("l_quantity").alias("total_qty"))
    )
