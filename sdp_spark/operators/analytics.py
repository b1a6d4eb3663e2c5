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
from pyspark.sql.window import Window

from sdp_spark.functions.num import (
    DEC,
    davg,
    dround,
    dsum,
    sql_davg,
    sql_dround,
    sql_dsum,
)
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


@register(
    "query_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    section=_SEC,
)
def query_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per nation where the
    customer and the supplier sit in the SAME nation of one region — the
    6-table star join with a cross-dimension equality (s_nationkey ==
    c_nationkey) that join reordering must keep out of a cartesian.

    Plan: region+nation broadcast (25/5 rows), supplier broadcasts after
    its nation filter, orders' date window pushes to parquet; the fact
    shuffles once on orderkey to meet orders, then the same-nation equality
    evaluates as a residual on already-joined rows. Final agg is 25 groups
    — metadata-scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "query_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
        OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    section=_SEC,
)
def query_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by year — the capstone that joins the SAME dimension twice
    under two aliases (supplier's nation vs customer's nation) with a
    disjunctive cross-alias predicate.

    Plan: both nation aliases broadcast; the pair disjunction evaluates as
    a residual after the dim joins (it references both sides, so it cannot
    push below either); shipdate window pushes to the fact scan. Fact
    shuffles once on orderkey, once on custkey — the two fact⋈dim-key
    exchanges any formulation needs."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_3")
    ) | ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "query_promo_effect",
    oracle=f"""
    SELECT {sql_dround(
        "100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' "
        "THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8)) "
        "ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE) "
        "/ CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8))) AS DOUBLE)",
        4,
    )} AS promo_share,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    section=_SEC,
)
def query_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's revenue
    earned by PROMO-type parts — a conditional-aggregate ratio in a single
    global agg (no GROUP BY), certifying CASE-inside-SUM over a dim join.

    Plan: one month of shipdate pushes to the fact scan; part broadcasts;
    both sums are DECIMAL partials (order-independent) and the ratio is a
    single driver-side division of two exact sums — deterministic under
    any partitioning, which is what makes a ratio-of-sums hashable at all."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    raw = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = raw.cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            dround(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_share"),
            dsum(raw).alias("total_revenue"),
        )
    )


@register(
    "query_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    section=_SEC,
)
def query_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): supplier(s) with the maximum quarter
    revenue — a scalar-MAX subquery over a derived aggregate, reusing the
    aggregate on both sides (the classic CTE-reuse plan).

    Plan: one suppkey shuffle builds the revenue aggregate (|suppliers|
    rows); the scalar max is a 1-row broadcast crossed into the filter; the
    name lookup broadcasts supplier. DECIMAL revenue makes the equality
    against MAX exact — a float sum here could drop the winner on a ulp."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    # the CTE is referenced twice (scores + scalar max); materialize it ONCE
    # (localCheckpoint = explicit CTE materialization — without it Spark
    # plans two full lineitem scans and two aggregations)
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "query_disjunctive_parts",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#5'  AND p.p_size BETWEEN 1  AND 15
           AND l.l_quantity BETWEEN 1  AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 25 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    section=_SEC,
)
def query_disjunctive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-ANDs mixing both join sides — the shape that defeats naive
    pushdown. Catalyst extracts the common single-side implications
    (p_brand IN (...), l_quantity <= 40) below the join while the full
    disjunction stays as a join residual.

    Plan: part broadcasts; the extracted IN-list prunes part before the
    broadcast build and the quantity bound prunes the fact scan
    (PushedFilters), so the residual OR runs over a pre-shrunk join — at
    100 TB the difference between scanning 3 brands' worth and all parts."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(25, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


_Q22_NATIONS = (1, 3, 5, 7, 9)
_Q22_DORMANT_SINCE = "2000-01-01"


@register(
    "query_dormant_customers",
    oracle=f"""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN {_Q22_NATIONS}
      AND c.c_acctbal > (
        SELECT {sql_davg('c2.c_acctbal')}
        FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN {_Q22_NATIONS}
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_DORMANT_SINCE}'
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    section=_SEC,
)
def query_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): wealthy-but-dormant
    customers per nation — a scalar AVG subquery feeding a filter PLUS a
    NOT EXISTS anti-join in one plan. (The fixture has no c_phone, so the
    country-code substring becomes the nationkey set directly; 'no orders
    at all' becomes 'no orders since {_Q22_DORMANT_SINCE}' — every fixture
    customer has early orders.)

    Plan: the scalar average is a 1-row broadcast cross; the anti-join
    shuffles the date-pruned orders (PushedFilters) against the
    nation-filtered customers on custkey; final agg is ≤5 groups.
    The average uses davg (exact decimal sum / count) so the threshold —
    and therefore the row SET, not just values — is engine-independent."""
    nats = list(_Q22_NATIONS)
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nats))
    avg_bal = (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 0.0) & F.col("c_nationkey").isin(nats))
        .agg(davg("c_acctbal").alias("_avg"))
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_DORMANT_SINCE).cast("timestamp")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


@register(
    "query_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS potential_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    section=_SEC,
)
def query_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-predicate-aggregate query — no join at all — that benchmarks the
    raw scan path: every predicate (date window, discount band, quantity
    bound) must reach the parquet reader as PushedFilters so row groups
    and pages skip, and the single global aggregate is one partial+final
    DECIMAL sum. At 100 TB Q6 is bandwidth-bound by design; the engine's
    job is to never touch a column or row group it doesn't need."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "potential_revenue"
        ),
        F.count("*").alias("n_lines"),
    )


_EARS_Z = 2.0  # alert threshold (EARS C2 commonly uses 2-3 sigma)

# Shared EARS C2 core (batch capstone + streaming twin build on this
# SINGLE definition, SQL and Spark sides alike — the stream==batch
# invariant is structural, not copy-paste):
EARS_SCORED_SQL = f"""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, n,
             AVG(CAST(n AS DOUBLE)) OVER w AS mu,
             stddev_samp(CAST(n AS DOUBLE)) OVER w AS sd,
             COUNT(*) OVER w AS n_base
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 9 PRECEDING AND 3 PRECEDING)
    )
    SELECT event_type, day_s, n,
           {sql_dround('(n - mu) / sd', 4)} AS c2_score
    FROM scored
    WHERE n_base = 7 AND sd > 0
"""


# THE shared data-scale pass of every batch aberration detector: the
# per-(event_type, day) count of raw events. Ten registry keys built it
# independently (EARS, EARS family, CUSUM, EWMA, Serfling, Farrington,
# excess burden, epidemic onset, Holt, historical limits) — in the
# detector-concordance panel that meant EIGHT redundant event scans +
# groupBys inside one job. Memoized per (app, sf_dir) as a LAZY
# localCheckpoint (guide §1.2): |types × days| rows, bounded by calendar
# not data volume; released by sdp_spark.unpersist_all.
_EVENTS_DAILY_CACHE: dict[tuple[str, str], DataFrame] = {}


def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day DATE, n BIGINT) daily rollup of events. The key
    carries the events file's fingerprint so a rewrite of the same path
    (tests plant outbreaks in place) retires the checkpointed rollup."""
    from sdp_spark.sources.fixtures import table_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        table_fingerprint(sf_dir, "events"),
    )
    if key not in _EVENTS_DAILY_CACHE:
        e = table(spark, sf_dir, "events")
        _EVENTS_DAILY_CACHE[key] = (
            e.groupBy(
                "event_type",
                F.col("ts").cast("timestamp").cast("date").alias("day"),
            )
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=False)
        )
    return _EVENTS_DAILY_CACHE[key]


def events_daily_dc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, d TIMESTAMP, c DOUBLE) view of the same rollup — the
    frame shape the SPC detectors (CUSUM/EWMA/Serfling/Farrington and
    their rollup capstones) consume. day→timestamp is midnight in the
    UTC-pinned session, exactly date_trunc('day', ts); the bigint count
    casts to double losslessly — bit-identical to the per-key rollups
    it replaces (oracle-swept at sf0.01 and sf0.1)."""
    return events_daily(spark, sf_dir).select(
        "event_type",
        F.col("day").cast("timestamp").alias("d"),
        F.col("n").cast("double").alias("c"),
    )


def ears_c2_scored(daily: DataFrame) -> DataFrame:
    """EARS C2 scoring over a (event_type, day, n) daily-count frame:
    7-day baseline lagged 2 days, rounded z-score, applicability filter
    (complete baseline, nonzero variance). Shared by the batch capstone
    and the streaming twin."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-9, -3)
    nd = F.col("n").cast("double")
    scored = daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "n",
        F.avg(nd).over(w).alias("mu"),
        F.stddev_samp(nd).over(w).alias("sd"),
        F.count("*").over(w).alias("n_base"),
    )
    # ROUNDED score: the raw z differs in the last ulp across engines'
    # stddev algorithms, and downstream alert bits must not flip on it
    z = dround((F.col("n") - F.col("mu")) / F.col("sd"), 4)
    return scored.filter((F.col("n_base") == 7) & (F.col("sd") > 0)).select(
        "event_type", "day_s", "n", z.alias("c2_score")
    )


@register(
    "query_outbreak_ears",
    oracle=f"""
    SELECT event_type, day_s, n, c2_score, c2_score > {_EARS_Z} AS alert
    FROM ({EARS_SCORED_SQL}) t
    ORDER BY event_type, day_s
    """,
    section=_SEC,
)
def query_outbreak_ears(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC EARS C2 aberration detection — the surveillance analytics the
    reference platform exists to serve (README.md:2,4: SDP ingests
    public-health surveillance data; EARS is CDC's Early Aberration
    Reporting System). C2: today's event count vs a 7-day moving baseline
    LAGGED 2 days (the lag keeps an emerging outbreak out of its own
    baseline); alert when the z-score clears {_EARS_Z}σ. Rows with an
    incomplete baseline or zero variance are excluded (the published
    method's applicability condition).

    Plan: one (type, day) partial+final count collapses the stream to
    metadata scale, then a bounded 7-row frame per type — the window
    state is O(frame), and the heavy lifting (daily counts) shuffles
    grouped states, not events. The same plan incrementalizes: the
    streaming twin is `stream_tumbling` + this frame over its sink."""
    daily = events_daily(spark, sf_dir)
    return (
        ears_c2_scored(daily)
        .withColumn("alert", F.col("c2_score") > _EARS_Z)
        .orderBy("event_type", "day_s")
    )


def ears_family_scored(daily: DataFrame) -> DataFrame:
    """All three CDC EARS variants over a (event_type, day, n) daily-count
    frame, one row per (variant, event_type, day) that variant could
    score. Definitions (Hutwagner et al. 2003; Fricker/Hegler/Dunfee
    2008, the simplified published C3):

    - C1: z of today vs the 7 days IMMEDIATELY preceding (no gap) —
      fastest to arm, but a sustained outbreak enters its own baseline
      within a week and silences it.
    - C2: z vs a 7-day baseline LAGGED 2 days (the existing
      `query_outbreak_ears` statistic, recomputed here from the same
      frame definition so family rows share one plan).
    - C3: cumulative 2-day carryover — C3_t = Σ_{j=0..2} max(0,
      C2_{t-j} − 1); catches modest sustained shifts each individual
      C2 misses. Scored on days whose own C2 is applicable; missing
      carryover terms contribute 0.

    TWO alert columns (r13, VERDICT r12 next-round #6):
    - `alert`: the uniform family threshold (2.0σ — C2's existing
      threshold applied to all three variants, so firing-profile
      differences in the concordance panel reflect the STATISTICS, not
      mixed thresholds);
    - `alert_cdc`: CDC's published per-variant convention — 3σ for C1
      and C2, 2σ for C3 (Hutwagner et al. 2003) — the column a
      surveillance shop migrating its dashboards actually reads. The
      planted-spike pytest pins where the two conventions diverge: any
      C1/C2 score in (2, 3] fires `alert` but not `alert_cdc`; C3 fires
      both identically.
    Scores round at 4dp (dround) BEFORE the C3 carryover sum so the
    cumulative statistic composes engine-identical doubles — the same
    last-ulp discipline as ears_c2_scored.

    Plan: one (type, day) count collapse, then both 7-row frames and the
    3-row carryover frame ride ONE window partitioning (no extra
    shuffle); the three-variant union is a column relabel, not a
    recompute."""
    w1 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    w2 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-9, -3)
    w3 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    nd = F.col("n").cast("double")
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.avg(nd).over(w1).alias("mu1"),
        F.stddev_samp(nd).over(w1).alias("sd1"),
        F.count("*").over(w1).alias("nb1"),
        F.avg(nd).over(w2).alias("mu2"),
        F.stddev_samp(nd).over(w2).alias("sd2"),
        F.count("*").over(w2).alias("nb2"),
    )
    c12 = scored.select(
        "event_type",
        "day",
        "n",
        F.when(
            (F.col("nb1") == 7) & (F.col("sd1") > 0),
            dround((F.col("n") - F.col("mu1")) / F.col("sd1"), 4),
        ).alias("c1"),
        F.when(
            (F.col("nb2") == 7) & (F.col("sd2") > 0),
            dround((F.col("n") - F.col("mu2")) / F.col("sd2"), 4),
        ).alias("c2"),
    )
    c3raw = F.sum(
        F.greatest(F.lit(0.0), F.coalesce(F.col("c2"), F.lit(0.0)) - 1.0)
    ).over(w3)
    full = c12.withColumn(
        "c3", F.when(F.col("c2").isNotNull(), dround(c3raw, 4))
    )
    # stack(), not a 3-way union of filtered branches: a union would
    # re-plan (and re-shuffle) the daily-count + window chain once per
    # variant; stack explodes 3 labeled rows per scored day off the ONE
    # chain — the variant pivot is a Generate, not a recompute.
    out = full.selectExpr(
        "event_type",
        "date_format(day, 'yyyy-MM-dd') AS day_s",
        "n",
        "stack(3, 'c1', c1, 'c2', c2, 'c3', c3) AS (variant, score)",
    ).filter(F.col("score").isNotNull())
    cdc_thr = F.when(F.col("variant") == "c3", F.lit(2.0)).otherwise(
        F.lit(3.0)
    )
    return out.select(
        "variant",
        "event_type",
        "day_s",
        "n",
        "score",
        (F.col("score") > _EARS_Z).alias("alert"),
        (F.col("score") > cdc_thr).alias("alert_cdc"),
    )


# Shared EARS-family core SQL (batch capstone + streaming twin register
# off this SINGLE definition, mirroring the EARS_SCORED_SQL discipline):
EARS_FAMILY_SQL = f"""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, day, n,
             AVG(CAST(n AS DOUBLE)) OVER w1 AS mu1,
             stddev_samp(CAST(n AS DOUBLE)) OVER w1 AS sd1,
             COUNT(*) OVER w1 AS nb1,
             AVG(CAST(n AS DOUBLE)) OVER w2 AS mu2,
             stddev_samp(CAST(n AS DOUBLE)) OVER w2 AS sd2,
             COUNT(*) OVER w2 AS nb2
      FROM daily
      WINDOW w1 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
             w2 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 9 PRECEDING AND 3 PRECEDING)
    ), c12 AS (
      SELECT event_type, day, n,
             CASE WHEN nb1 = 7 AND sd1 > 0
                  THEN {sql_dround('(n - mu1) / sd1', 4)} END AS c1,
             CASE WHEN nb2 = 7 AND sd2 > 0
                  THEN {sql_dround('(n - mu2) / sd2', 4)} END AS c2
      FROM scored
    ), c3d AS (
      SELECT event_type, day, n, c1, c2,
             SUM(GREATEST(0.0, COALESCE(c2, 0.0) - 1.0))
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS c3raw
      FROM c12
    )
    SELECT variant, event_type, day_s, n, score,
           score > {_EARS_Z} AS alert,
           score > (CASE WHEN variant = 'c3' THEN 2.0 ELSE 3.0 END)
             AS alert_cdc
    FROM (
      SELECT 'c1' AS variant, event_type,
             strftime(day, '%Y-%m-%d') AS day_s, n, c1 AS score
      FROM c3d WHERE c1 IS NOT NULL
      UNION ALL
      SELECT 'c2', event_type, strftime(day, '%Y-%m-%d'), n, c2
      FROM c3d WHERE c2 IS NOT NULL
      UNION ALL
      SELECT 'c3', event_type, strftime(day, '%Y-%m-%d'), n,
             {sql_dround('c3raw', 4)}
      FROM c3d WHERE c2 IS NOT NULL
    ) t
"""


@register(
    "query_outbreak_ears_family",
    oracle=f"{EARS_FAMILY_SQL} ORDER BY variant, event_type, day_s",
    section=_SEC,
)
def query_outbreak_ears_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete CDC EARS aberration family — C1 (7-day baseline, no
    gap), C2 (2-day gap; the statistic `query_outbreak_ears` certifies
    standalone), C3 (cumulative 2-day carryover of C2 excess) — scored
    side by side over the same daily counts, one row per (variant,
    event_type, day). VERDICT r11 "What's missing" #4: C1 and C3 were
    the last members of the standard EARS panel a surveillance shop
    expects (reference serves CDC surveillance dashboards,
    README.md:2,4). Semantics, thresholds, determinism discipline:
    see ears_family_scored.

    Plan: daily counts shuffle once on event_type, then every window
    frame (both baselines + the C3 carryover) reuses that single
    partitioning — `.explain` shows one Exchange feeding one Window
    chain; the 3-way variant union is a zero-shuffle relabel. At 100 TB
    the daily-count collapse is the only event-scale stage."""
    daily = events_daily(spark, sf_dir)
    return ears_family_scored(daily).orderBy("variant", "event_type", "day_s")


@register(
    "query_small_qty_orders",
    oracle="""
    SELECT FLOOR(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
                 / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,8))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
    section=_SEC,
)
def query_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of one
    brand's parts whose quantity is below 20% of THAT PART's average — a
    correlated scalar aggregate in the WHERE clause, the decorrelation
    stress test: Catalyst rewrites the per-part AVG into one aggregate
    over lineitem grouped by partkey + a join (two scans + hash joins,
    never per-row re-execution — MySQL 5.6 runs the subquery per outer
    row). The per-part average is an exact-decimal-sum / count quotient
    on BOTH engines — a bare AVG(double) differs in the last ulp across
    aggregation orders and rows sitting on the 0.2×avg boundary would
    flip membership between engines. The outer avg_yearly division also
    casts the decimal sum to DOUBLE first: Spark divides DECIMAL/7.0
    exactly then HALF_UP-rounds while DuckDB promotes to double and
    binary-rounds — the one-cent divergence class num.py exists for."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT FLOOR(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
                     / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,8))) AS DOUBLE)
                          / COUNT(*))
            FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


# ---------------------------------------------------------------------------
# Round-5 batch: the remaining classic decision-support shapes. partsupp,
# l_shipmode and l_commitdate/l_receiptdate do not exist in the fixture
# star schema (TESTDATA.md), so Q9/Q12/Q16/Q21 keep their canonical plan
# shape (the thing being certified) with the missing column substituted by
# a documented stand-in — the same adaptation query_late_orders (Q4) uses.
# ---------------------------------------------------------------------------

_Q8_CASE = (
    "CASE WHEN n2.n_name = 'NATION_7' "
    "THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8)) "
    "ELSE CAST(0 AS DECIMAL(30,8)) END"
)


@register(
    "query_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dround(
               f"CAST(SUM({_Q8_CASE}) AS DOUBLE) / "
               "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)"
               " AS DECIMAL(30,8))) AS DOUBLE)",
               6,
           )} AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    ORDER BY o_year
    """,
    section=_SEC,
)
def query_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7's share of ECONOMY
    part revenue sold into EUROPE-region customers, by order year — the
    8-table star with the SAME dimension joined twice (customer's nation
    gates the market, supplier's nation is the share numerator) and a
    conditional-ratio aggregate.

    Plan: every dimension (part after its type filter, supplier, both
    nation aliases, region) broadcasts; the fact shuffles once on orderkey
    and once on custkey. The share is a quotient of two EXACT decimal CASE
    sums cast to double, then deterministically rounded — identical inputs
    on both engines, so the ratio cannot diverge in the last ulp (the Q14
    promo_share discipline). Output is ≤2 rows; the final agg is bytes."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    num = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dround(
                F.sum(num).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "query_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - 0.6 * p.p_retailprice * l.l_quantity'
           )} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    section=_SEC,
)
def query_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation, per
    order-year profit on parts whose name contains a color token. The
    fixture has no partsupp.ps_supplycost, so cost is the documented
    stand-in 0.6 x p_retailprice x l_quantity — per-row arithmetic over
    columns both engines read identically, so the decimal-sum discipline
    still certifies the plan exactly.

    Plan: the LIKE filter prunes part to ~1/4 then broadcasts; supplier
    and nation broadcast; the fact shuffles once on orderkey (no customer
    side at all — Q9 has no date predicate, it scans ALL years, which is
    what makes it a scan-bandwidth capstone at 100 TB). 25x6 output
    groups; final agg is metadata-scale."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "query_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
    section=_SEC,
)
def query_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): for lines
    shipped late (>45 days after order — the fixture's stand-in for
    l_receiptdate > l_commitdate) in one year, count critical- vs
    non-critical-priority orders per line status (stand-in for the absent
    l_shipmode). The signature Q12 feature survives intact: the pivot is
    two conditional COUNTs in ONE pass — not two queries, not a join.

    Plan: the shipdate year-window pushes to the fact scan; the late
    predicate is a join residual (it references both sides); one orderkey
    shuffle; 2-group final agg. Conditional sums partial-aggregate
    map-side, so the exchange carries 2 rows per task."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~crit, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_class")
    )


@register(
    "query_parts_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#03'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
    section=_SEC,
)
def query_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) bucket, excluding a blocklist
    of suppliers (negative balance — the fixture's stand-in for the
    '%Customer%Complaints%' list) via NOT IN. Supplier-part pairs come
    from lineitem (the fixture has no partsupp); the certified shape —
    dimension predicates + NOT IN anti-join + COUNT(DISTINCT) under
    GROUP BY + deterministic top-k — is Q16's.

    Plan: part's three predicates prune before a broadcast hash join; the
    blocklist subquery (6 rows) lowers to a BROADCAST null-aware anti
    join, not a shuffle; COUNT(DISTINCT suppkey) runs as the two-phase
    partial-distinct expand Spark plans for it; TakeOrderedAndProject
    caps the result without a global sort. s_suppkey is non-null by
    schema, so NOT IN's three-valued-logic trap (any NULL in the list
    empties the result) cannot fire here — but the query is expressed in
    SQL precisely so the NULL-AWARE anti join (BroadcastHashJoin LeftAnti
    with isNullAwareAntiJoin, reachable only from an authored NOT IN) is
    the plan actually certified, keeping Spark's semantics aligned with
    the oracle's three-valued logic if the blocklist ever admits NULLs."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#03'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        LIMIT 50
        """
    )


@register(
    "query_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    section=_SEC,
)
def query_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers in
    one region who were the SOLE late supplier on a finished
    multi-supplier order. Late = shipped >60 days after order date (the
    query_late_orders stand-in for the absent l_receiptdate >
    l_commitdate). This is the decorrelation torture test: the same fact
    table appears THREE times — once as the probe, once under EXISTS
    (some other supplier on the order), once under NOT EXISTS (no other
    LATE supplier) — and both correlated predicates also reference the
    outer ORDERS row (o_orderdate).

    Plan (expressed in SQL so Catalyst's subquery decorrelation is what's
    certified): EXISTS lowers to a left-semi and NOT EXISTS to a
    left-anti hash join, both keyed on l_orderkey with the
    suppkey-inequality and lateness conditions as join residuals — never
    a per-row re-execution (MySQL 5.6's DEPENDENT SUBQUERY) and never a
    cartesian. All three lineitem scans shuffle on the SAME key
    (orderkey), so AQE can pipeline them; supplier/nation/region
    broadcast; TakeOrderedAndProject caps at 20."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """
    )


@register(
    "query_min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           FLOOR(f.unit_price * 100 + 0.5) / 100 AS best_price
    FROM part p
    JOIN offer f    ON f.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = f.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15
      AND r.r_name = 'ASIA'
      AND f.unit_price = (
        SELECT MIN(f2.unit_price)
        FROM offer f2
        JOIN supplier s2 ON s2.s_suppkey = f2.suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE f2.partkey = p.p_partkey AND r2.r_name = 'ASIA'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    section=_SEC,
)
def query_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum cost supplier): for every size-15 part,
    the ASIA-region supplier whose unit price is the region-wide minimum
    for that part — the correlated scalar MIN subquery whose inner query
    is itself a multi-table join. The fixture has no partsupp, so the
    offer book is derived: unit price = MIN(l_extendedprice / l_quantity)
    per (part, supplier) from lineitem — a per-row IEEE quotient over
    columns both engines read identically, so the MIN and the equality
    comparison against it are bit-deterministic cross-engine (only the
    DISPLAYED price is rounded).

    Plan (SQL so Catalyst's rewrite is what's certified): the correlated
    = MIN(...) decorrelates into a per-partkey aggregate of the SAME
    offer relation joined back on (partkey, unit_price) — two scans of a
    CTE, no per-row re-execution. The offer aggregation shuffles lineitem
    once on (partkey, suppkey); supplier/nation/region broadcast under
    AQE; TakeOrderedAndProject caps at 100."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH offer AS (
          SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                 MIN(l.l_extendedprice / l.l_quantity) AS unit_price
          FROM lineitem l
          GROUP BY 1, 2
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               FLOOR(f.unit_price * 100 + 0.5) / 100 AS best_price
        FROM part p
        JOIN offer f    ON f.partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = f.suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size = 15
          AND r.r_name = 'ASIA'
          AND f.unit_price = (
            SELECT MIN(f2.unit_price)
            FROM offer f2
            JOIN supplier s2 ON s2.s_suppkey = f2.suppkey
            JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
            JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
            WHERE f2.partkey = p.p_partkey AND r2.r_name = 'ASIA'
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
        """
    )


@register(
    "query_important_stock",
    oracle="""
    WITH base AS (
      SELECT l.l_partkey AS partkey,
             CAST(l.l_extendedprice AS DECIMAL(30,8)) AS p
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT partkey,
           CAST(ROUND(SUM(p), 2) AS DOUBLE) AS part_value
    FROM base
    GROUP BY partkey
    HAVING CAST(SUM(p) AS DECIMAL(25,2))
             * CAST((SELECT COUNT(DISTINCT partkey) FROM base) AS INT)
           > 3 * CAST((SELECT SUM(p) FROM base) AS DECIMAL(25,2))
    ORDER BY part_value DESC, partkey
    """,
    section=_SEC,
)
def query_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose
    inventory value from NATION_3's suppliers exceeds a multiple of the
    nation's MEAN per-part value — a grouped HAVING whose threshold is
    built from uncorrelated scalar subqueries over the same join. Value
    is SUM(l_extendedprice) per part from lineitem (no partsupp in the
    fixture). The threshold is SCALE-FREE (value > 3 x mean ⇔ value x
    n_parts > 3 x total — TPC-H itself scales Q11's fraction by 1/SF;
    a fixed fraction returns an EMPTY result at 10x rows, caught by the
    sf0.1 sweep). Both comparison sides stay exact DECIMAL: values are
    2 dp so DECIMAL(25,2) sums are exact, and (25,2) x INT = (36,2)
    fits precision 38 on BOTH engines with no rounding — a boundary
    part cannot flip.

    Plan: the two scalar aggregates run once and broadcast; the main
    branch shuffles the nation-filtered fact once on partkey; supplier
    and nation broadcast. At 100 TB all branches share the same
    nation-pruned scan shape — an optimizer could CSE them; expressing
    them separately keeps each side's partial-agg pipeline intact."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    base = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey").alias("partkey"), F.col("l_extendedprice"))
    )
    exact = F.sum(F.col("l_extendedprice").cast(DEC))
    per_part = base.groupBy("partkey").agg(
        exact.cast("decimal(25,2)").alias("value_exact"),
        F.round(exact, 2).cast("double").alias("part_value"),
    )
    totals = base.agg(
        (F.lit(3) * exact.cast("decimal(25,2)")).alias("threshold3"),
        F.count_distinct("partkey").cast("int").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(totals))
        .filter(F.col("value_exact") * F.col("n_parts") > F.col("threshold3"))
        .select("partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@register(
    "query_dominant_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(30,8))) > 0.3 * (
        SELECT SUM(CAST(l2.l_quantity AS DECIMAL(30,8)))
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l2.l_shipdate <  TIMESTAMP '1998-01-01'
      )
    )
    ORDER BY s.s_name
    """,
    section=_SEC,
)
def query_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    more than 30% of a 'small%' part's total 1997 volume — an IN
    subquery whose HAVING clause contains a correlated scalar aggregate
    over the same fact (the stand-in for ps_availqty > 0.5 x shipped,
    partsupp being absent). Both quantity sums aggregate in exact
    DECIMAL; 0.3 x total is exact-decimal-times-literal on both engines,
    so the dominance boundary cannot flip cross-engine.

    Plan: the correlated per-part total decorrelates into a partkey
    aggregate joined back on partkey — the (part, supplier) and (part)
    aggregations share one shuffle key, so AQE plans them off the same
    exchange; the IN lowers to a left-semi hash join against the ~100-row
    supplier dim. Nation broadcasts. No per-row subquery execution
    anywhere — MySQL 5.6 runs this as DEPENDENT SUBQUERY per outer row."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'small%'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l.l_partkey, l.l_suppkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(30,8))) > 0.3 * (
            SELECT SUM(CAST(l2.l_quantity AS DECIMAL(30,8)))
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l2.l_shipdate <  TIMESTAMP '1998-01-01'
          )
        )
        ORDER BY s.s_name
        """
    )


_DQ_REFERENTIAL = """
SELECT 'lineitem.l_orderkey->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_partkey->part', CAST(COUNT(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', CAST(COUNT(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders.o_custkey->customer', CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
ORDER BY fk
"""


@register("dq_referential_check", oracle=_DQ_REFERENTIAL, section=_SEC)
def dq_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count for every foreign-key
    edge of the star schema in ONE statement. The reference's MySQL 5.6
    engine enforces FKs transactionally per row; a lakehouse cannot, so
    the equivalent guarantee is a declarative post-load audit — this is
    the constraint surface re-expressed for append-only storage, and at
    100 TB it's also the query you run BEFORE trusting any join result.

    Plan: each NOT EXISTS lowers to a left-anti hash join keyed on the
    FK (never a null-aware broadcast — the inner sides here are large
    keys, and NOT EXISTS stays shuffle-safe where NOT IN would demand a
    broadcast); counts partial-aggregate to one row per branch, and the
    4-row union is driver-trivial. Identical statement text runs on the
    oracle."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_DQ_REFERENTIAL)


# ---------------------------------------------------------------------------
# Data-quality: numeric outlier detection (Tukey IQR fences)
# ---------------------------------------------------------------------------

_DQ_IQR = """
    WITH q AS (
      SELECT o_orderpriority,
             {P25} AS q1,
             {P75} AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_outliers,
           FLOOR((q.q1 - 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS lo_fence,
           FLOOR((q.q3 + 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS hi_fence,
           MAX(o.o_totalprice) AS max_outlier
    FROM orders o JOIN q ON o.o_orderpriority = q.o_orderpriority
    WHERE o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1)
       OR o.o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1)
    GROUP BY o.o_orderpriority, q.q1, q.q3
    ORDER BY o.o_orderpriority
"""


@register(
    "dq_anomaly_iqr",
    oracle=_DQ_IQR.format(
        P25="quantile_disc(o_totalprice, 0.25)",
        P75="quantile_disc(o_totalprice, 0.75)",
    ),
    section=_SEC,
)
def dq_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality numeric outlier detection: Tukey IQR fences per group
    (outlier ⟺ value outside [q1 − 1.5·IQR, q3 + 1.5·IQR]) — the standard
    first-pass anomaly scan a load-validation pipeline runs per partition
    of every fact load. DISCRETE quartiles on purpose: PERCENTILE_DISC
    returns actual observed values (identical in both engines — same trick
    as agg_percentile_disc), so the fences are IEEE-deterministic
    expressions of identical doubles and the outlier row SET is exact
    cross-engine; fences are floor-form rounded only for display.

    Scale: one grouped quantile pass (at 100 TB swap PERCENTILE_DISC for
    approx_percentile — same plan shape, sketch-mergeable partials) + a
    broadcast join of the tiny per-group fence table back onto the fact
    scan — the outlier filter runs map-side."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        _DQ_IQR.format(
            P25="PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice)",
            P75="PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY o_totalprice)",
        )
    )


# ---------------------------------------------------------------------------
# Data-quality: one-pass column profiling
# ---------------------------------------------------------------------------

# (table, column, is_numeric) — the profile surface. Numeric min/max land in
# min_num/max_num, strings in min_str/max_str; the other pair is NULL.
_DQ_PROFILE_COLS = {
    "lineitem": [
        ("l_quantity", True),
        ("l_extendedprice", True),
        ("l_discount", True),
        ("l_tax", True),
        ("l_returnflag", False),
        ("l_linestatus", False),
    ],
    "orders": [("o_totalprice", True), ("o_orderpriority", False)],
    "events": [("value", True), ("event_type", False)],
    "documents": [("n_chars", True), ("lang", False)],
}


def _dq_profile_oracle() -> str:
    branches = []
    for tbl, cols in _DQ_PROFILE_COLS.items():
        for col, is_num in cols:
            if is_num:
                mins = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
                strs = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
            else:
                mins = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
                strs = f"MIN({col})", f"MAX({col})"
            branches.append(
                f"SELECT '{tbl}.{col}' AS col_name,"
                f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
                f" CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,"
                f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,"
                f" {mins[0]} AS min_num, {mins[1]} AS max_num,"
                f" {strs[0]} AS min_str, {strs[1]} AS max_str"
                f" FROM {tbl}"
            )
    return " UNION ALL ".join(branches) + " ORDER BY col_name"


@register("dq_profile_table", oracle=_dq_profile_oracle(), section=_SEC)
def dq_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile — row count, null count, exact distinct
    count, min/max — for the audited columns of four fixture tables, in a
    single long-format result (one row per column). This is the
    load-validation report every warehouse runs after ingest (the
    reference platform's per-row MySQL constraints, re-expressed as a
    declarative post-load audit, same rationale as dq_referential_check).

    Spark-first plan: ONE aggregate pass per table computes every metric
    for all of that table's columns simultaneously (multiple
    COUNT(DISTINCT) lower to a single Expand + two-phase agg — still one
    scan), then the 1-row wide agg explodes into per-column struct rows
    and the four tiny long tables union. The oracle replays it as
    per-column UNION ALL branches — same answer, DuckDB's planner's
    problem. At 100 TB swap the exact COUNT(DISTINCT) for
    approx_count_distinct (same plan minus the Expand multiplier); min/max
    /null-count partials are already sketch-cheap map-side aggregates."""
    parts = []
    for tbl, cols in _DQ_PROFILE_COLS.items():
        t = table(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for col, _ in cols:
            aggs.append((F.count(F.lit(1)) - F.count(col)).cast("bigint").alias(f"nn_{col}"))
            aggs.append(F.count_distinct(F.col(col)).cast("bigint").alias(f"nd_{col}"))
            aggs.append(F.min(col).alias(f"mn_{col}"))
            aggs.append(F.max(col).alias(f"mx_{col}"))
        wide = t.agg(*aggs)
        structs = []
        for col, is_num in cols:
            if is_num:
                mn = F.col(f"mn_{col}").cast("double")
                mx = F.col(f"mx_{col}").cast("double")
                ms, xs = F.lit(None).cast("string"), F.lit(None).cast("string")
            else:
                mn = F.lit(None).cast("double")
                mx = F.lit(None).cast("double")
                ms, xs = F.col(f"mn_{col}"), F.col(f"mx_{col}")
            structs.append(
                F.struct(
                    F.lit(f"{tbl}.{col}").alias("col_name"),
                    F.col("n_rows"),
                    F.col(f"nn_{col}").alias("n_nulls"),
                    F.col(f"nd_{col}").alias("n_distinct"),
                    mn.alias("min_num"),
                    mx.alias("max_num"),
                    ms.alias("min_str"),
                    xs.alias("max_str"),
                )
            )
        parts.append(
            wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


_DQ_WINSOR = """
    WITH q AS (
      SELECT o_orderpriority,
             {P05} AS p05,
             {P95} AS p95
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
      CAST(COUNT(*) FILTER (WHERE o_totalprice < p05) AS BIGINT) AS n_lo,
      CAST(COUNT(*) FILTER (WHERE o_totalprice > p95) AS BIGINT) AS n_hi,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_raw,
      CAST(ROUND(SUM(CAST(GREATEST(LEAST(o_totalprice, p95), p05) AS DECIMAL(30,8))), 2)
           AS DOUBLE) AS sum_wins
    FROM orders o JOIN q USING (o_orderpriority)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


@register(
    "dq_winsorize",
    oracle=_DQ_WINSOR.format(
        P05="quantile_disc(o_totalprice, 0.05)",
        P95="quantile_disc(o_totalprice, 0.95)",
    ),
    section=_SEC,
)
def dq_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation: clamp each group's o_totalprice into its
    own [p05, p95] band before summing — the robust-statistics companion
    to dq_anomaly_iqr (that one REPORTS outliers; this one bounds their
    influence so a fat-fingered load can't move the topline). Emits raw
    vs winsorized sums plus clamp counts per priority so the damping is
    auditable. PERCENTILE_DISC for the fences — observed values, exact
    cross-engine (same contract as dq_anomaly_iqr); decimal sums for
    order-independent totals (num.dsum rationale).

    Plan: one grouped discrete-quantile pass, then the 5-row fence table
    broadcast-joins back onto the scan and the clamp + both sums run
    map-side into a single partial agg. At 100 TB: approx_percentile
    fences, same shape."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        _DQ_WINSOR.format(
            P05="PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY o_totalprice)",
            P95="PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY o_totalprice)",
        )
    )


_DQ_MAD = """
    WITH med AS (
      SELECT o_orderpriority, {P50_RAW} AS med
      FROM orders GROUP BY o_orderpriority
    ), dev AS (
      SELECT o.o_orderpriority, ABS(o_totalprice - med) AS adev, med
      FROM orders o JOIN med USING (o_orderpriority)
    ), mad AS (
      SELECT o_orderpriority, {P50_DEV} AS mad, {ANYMED} AS med
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority, m.med, m.mad,
      CAST(COUNT(*) FILTER (WHERE d.adev > 2.0 * m.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY d.o_orderpriority, m.med, m.mad
    ORDER BY d.o_orderpriority
"""


@register(
    "dq_mad_outlier",
    oracle=_DQ_MAD.format(
        P50_RAW="quantile_disc(o_totalprice, 0.5)",
        P50_DEV="quantile_disc(adev, 0.5)",
        ANYMED="ANY_VALUE(med)",
    ),
    section=_SEC,
)
def dq_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier scan per group — the robust
    third member of the dq trio (IQR fences report tail points, winsorize
    bounds their influence, MAD flags them against a scale estimate that
    50% contamination cannot move, which is why monitoring systems prefer
    it when the data may ALREADY be corrupt). Outlier ⟺ |x − median| >
    k·MAD with k = 2.0, chosen so the fixture's bounded totalprice
    distribution (max deviation ≈ 2.9×MAD) exercises both sides of the
    fence; production monitors tune k (the classical modified-z cut is
    3.5·MAD/1.4826). Both medians are PERCENTILE_DISC — observed values,
    exact cross-engine (dq_anomaly_iqr contract).

    Plan: two grouped discrete-quantile passes (the second over the
    |x − med| projection of a broadcast-joined 5-row fence table) and a
    final map-side count — three scans today; at 100 TB the quantiles
    become approx_percentile sketches and it's one pass per level with
    mergeable state."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        _DQ_MAD.format(
            P50_RAW="PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice)",
            P50_DEV="PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev)",
            ANYMED="ANY_VALUE(med)",
        )
    )


# CUSUM surveillance: 10-day baseline, then score the rest of the month.
_CUSUM_SPLIT = "2024-01-11"
_CUSUM_K = 0.5  # slack, in sigmas
_CUSUM_H = 2.0  # decision threshold, in sigmas

_CUSUM_SQL = """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), base AS (
      SELECT event_type, SUM(c) / COUNT(*) AS mu,
             SQRT((COUNT(*) * SUM(c*c) - SUM(c) * SUM(c))
                  / (CAST(COUNT(*) AS DOUBLE) * COUNT(*))) AS sigma
      FROM daily WHERE d < DATE '{SPLIT}' GROUP BY event_type
    ), scored AS (
      SELECT daily.event_type, d, c,
             CAST(c - mu - {K} * sigma AS DECIMAL(20,8)) AS u, sigma
      FROM daily JOIN base USING (event_type)
      WHERE d >= DATE '{SPLIT}'
    ), cum AS (
      SELECT event_type, d, c, sigma,
        SUM(u) OVER (PARTITION BY event_type ORDER BY d) AS cu
      FROM scored
    ), lo AS (
      SELECT event_type, d, c, sigma, cu,
        LEAST(CAST(0 AS DECIMAL(38,8)),
              MIN(cu) OVER (PARTITION BY event_type ORDER BY d)) AS floor_cu
      FROM cum
    )
    SELECT event_type, {DAYFMT} AS day, CAST(c AS BIGINT) AS n_events,
      FLOOR(CAST(cu - floor_cu AS DOUBLE) * 10000 + 0.5) / 10000 AS cusum,
      CAST(cu - floor_cu AS DOUBLE) > {H} * sigma AS alert
    FROM lo
"""


@register(
    "query_outbreak_cusum",
    oracle=_CUSUM_SQL.format(
        SPLIT=_CUSUM_SPLIT, K=_CUSUM_K, H=_CUSUM_H,
        DAYFMT="strftime(d, '%Y-%m-%d')",
    ),
    section=_SEC,
)
def query_outbreak_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM aberration detection — the second classical surveillance
    method beside EARS C2 (query_outbreak_ears): S_t = max(0, S_{t-1} +
    (c_t − μ − kσ)), alarm when S_t > hσ, with (μ, σ) frozen from a
    10-day baseline (CDC practice: the detector never learns from the
    outbreak it is scoring). k=0.5σ slack / h=2σ threshold.

    The recurrence looks iterative but lowers to ONE declarative pass via
    the reflection identity S_t = cum_t − min(0, min_{j≤t} cum_j): a
    running sum and a running min over the same (type, day) window — no
    loop, no UDF, no recursion. The increments enter DECIMAL before the
    running sums, so both engines accumulate exactly (σ itself is exact:
    integer daily counts give exact Σc/Σc² in doubles below 2^53).

    Plan: baseline and scoring are two aggs over the same tiny daily
    table (one partial+final agg over raw events feeds both); the two
    window functions share one (event_type) partition sort. At 100 TB the
    raw-events agg is the only pass over data, identical to EARS — state
    is |types × days|. Scoring runs through `cusum_scored`, the SAME core
    the streaming twin (`stream_cusum_alerts`) calls — the stream==batch
    guarantee is structural, as with EARS."""
    daily = events_daily_dc(spark, sf_dir)
    return cusum_scored(daily)


def cusum_scored(daily: DataFrame) -> DataFrame:
    """CUSUM scoring over a (event_type, d, c) daily-count frame: frozen
    10-day baseline (μ, σ from exact integer moments), DECIMAL increments,
    and the reflection identity S_t = cum_t − min(0, running_min cum) in
    place of the recurrence. Shared by the batch capstone and the
    streaming twin."""
    from pyspark.sql.window import Window

    base = (
        daily.filter(F.col("d") < F.lit(_CUSUM_SPLIT).cast("date"))
        .groupBy("event_type")
        .agg(
            (F.sum("c") / F.count("*")).alias("mu"),
            F.sqrt(
                (F.count("*") * F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c"))
                / (F.count("*").cast("double") * F.count("*"))
            ).alias("sigma"),
        )
    )
    # daily feeds both join sides; rename the base's grouping key so the
    # aggregate side carries a fresh attribute — a memory-sink-backed frame
    # (the streaming twin) otherwise trips self-join ambiguity resolution
    base = base.withColumnRenamed("event_type", "base_type")
    scored = (
        daily.filter(F.col("d") >= F.lit(_CUSUM_SPLIT).cast("date"))
        .join(base, F.col("event_type") == F.col("base_type"))
        .select(
            "event_type",
            "d",
            "c",
            "sigma",
            (F.col("c") - F.col("mu") - _CUSUM_K * F.col("sigma"))
            .cast("decimal(20,8)")
            .alias("u"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cum = scored.withColumn("cu", F.sum("u").over(w))
    lo = cum.withColumn(
        "floor_cu",
        F.least(F.lit(0).cast("decimal(38,8)"), F.min("cu").over(w)),
    )
    s = (F.col("cu") - F.col("floor_cu")).cast("double")
    return lo.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("bigint").alias("n_events"),
        dround(s, 4).alias("cusum"),
        (s > _CUSUM_H * F.col("sigma")).alias("alert"),
    )


# EWMA control chart (Roberts 1959): the third classical detector beside
# EARS C2 and CUSUM — smoothing weight λ and a time-varying control limit
# that widens as the EWMA variance converges. Same 10-day frozen baseline
# as CUSUM (the detector never learns from the outbreak it scores).
_EWMACH_SPLIT = _CUSUM_SPLIT
_EWMACH_LAMBDA = 0.3
_EWMACH_L = 2.0

_EWMACH_SQL = f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), base AS (
      SELECT event_type, SUM(c) / COUNT(*) AS mu,
             SQRT((COUNT(*) * SUM(c*c) - SUM(c) * SUM(c))
                  / (CAST(COUNT(*) AS DOUBLE) * COUNT(*))) AS sigma
      FROM daily WHERE d < DATE '{_EWMACH_SPLIT}' GROUP BY event_type
    ), framed AS (
      SELECT daily.event_type, d, c, mu, sigma,
             list(c) OVER (PARTITION BY daily.event_type ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
      FROM daily JOIN base USING (event_type)
      WHERE d >= DATE '{_EWMACH_SPLIT}'
    ), scored AS (
      SELECT event_type, d, c,
             mu * pow(1.0 - {_EWMACH_LAMBDA}, len(arr))
               + {_EWMACH_LAMBDA} * list_sum(list_transform(
                   generate_series(1, len(arr)),
                   i -> arr[i] * pow(1.0 - {_EWMACH_LAMBDA}, len(arr) - i)))
               AS z,
             mu + {_EWMACH_L} * sigma
                * sqrt({_EWMACH_LAMBDA} / (2.0 - {_EWMACH_LAMBDA})
                       * (1.0 - pow(1.0 - {_EWMACH_LAMBDA}, 2 * len(arr))))
               AS ucl
      FROM framed
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(c AS BIGINT) AS n_events,
           FLOOR(z * 10000 + 0.5) / 10000 AS ewma,
           FLOOR(ucl * 10000 + 0.5) / 10000 AS ucl,
           FLOOR(z * 10000 + 0.5) / 10000
             > FLOOR(ucl * 10000 + 0.5) / 10000 AS alert
    FROM scored
"""


def ewma_scored(daily: DataFrame) -> DataFrame:
    """EWMA control-chart scoring over a (event_type, d, c) daily-count
    frame: z_t = λc_t + (1−λ)z_(t−1) with z_0 = μ, unrolled to the
    closed form z_t = μ(1−λ)^t + λ·Σ_i (1−λ)^(t−i) c_i over the
    per-type scored-day array (calendar-bounded, so the array is tiny),
    against the exact time-varying limit UCL_t = μ + L·σ·√(λ/(2−λ)·
    (1−(1−λ)^(2t))). The fold is the same left-to-right sum on both
    engines (win_ewma's contract), so the doubles agree bit-for-bit
    before rounding. Shared by the batch capstone and the streaming
    twin."""
    lam = _EWMACH_LAMBDA
    # baseline and scoring both consume the tiny (type, day) frame: pin it
    # so the events-scale rollup lineage executes once, not per branch
    daily = daily.localCheckpoint()
    base = (
        daily.filter(F.col("d") < F.lit(_EWMACH_SPLIT).cast("date"))
        .groupBy("event_type")
        .agg(
            (F.sum("c") / F.count("*")).alias("mu"),
            F.sqrt(
                (F.count("*") * F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c"))
                / (F.count("*").cast("double") * F.count("*"))
            ).alias("sigma"),
        )
        .withColumnRenamed("event_type", "base_type")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    framed = (
        daily.filter(F.col("d") >= F.lit(_EWMACH_SPLIT).cast("date"))
        .join(base, F.col("event_type") == F.col("base_type"))
        .select("event_type", "d", "c", "mu", "sigma")
        .withColumn("arr", F.collect_list("c").over(w))
        .withColumn("t", F.size("arr"))
    )
    z = F.col("mu") * F.expr(f"power(1.0 - {lam}, t)") + lam * F.expr(
        f"aggregate(sequence(1, t), cast(0.0 as double), "
        f"(s, i) -> s + element_at(arr, i) * power(1.0 - {lam}, t - i))"
    )
    ucl = F.col("mu") + _EWMACH_L * F.col("sigma") * F.sqrt(
        F.lit(lam / (2.0 - lam))
        * (1.0 - F.expr(f"power(1.0 - {lam}, 2 * t)"))
    )
    return framed.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("bigint").alias("n_events"),
        dround(z, 4).alias("ewma"),
        dround(ucl, 4).alias("ucl"),
        # alert compares the ROUNDED statistic to the ROUNDED limit (the
        # histlimits convention): both sides of the raw inequality contain
        # pow(1-λ, t), and pow is not correctly rounded — a 1-ulp libm
        # difference between JVM Math.pow and DuckDB pow could flip an
        # alert exactly at the boundary and break the hash oracle.
        (dround(z, 4) > dround(ucl, 4)).alias("alert"),
    )


@register(
    "query_outbreak_ewma",
    oracle=_EWMACH_SQL,
    section=_SEC,
)
def query_outbreak_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) — the THIRD classical
    surveillance detector beside EARS C2 (moving 7-day baseline, spike-
    sensitive) and CUSUM (accumulated excess, drift-sensitive): the
    exponentially weighted mean of daily counts against a limit that
    widens with √(1−(1−λ)^2t) as the statistic's variance converges —
    the small-sustained-shift detector of the SPC canon (between
    Shewhart's one-point rules and CUSUM's full memory). λ = 0.3,
    L = 2σ, 10-day frozen baseline shared with CUSUM.

    The recurrence z_t = λc_t + (1−λ)z_(t−1) lowers to ONE declarative
    pass via its closed form over the per-type scored array (see
    ewma_scored) — no loop, no UDF; the array is |scored days| per type,
    calendar-bounded regardless of event volume.

    Plan: identical shape to CUSUM — the raw-events daily rollup is the
    only data-scale pass; baseline and scoring are two aggs/windows over
    |types × days| metadata. Scoring runs through `ewma_scored`, the
    SAME core the streaming twin (`stream_ewma_alerts`) calls — the
    stream==batch guarantee is structural, as with EARS and CUSUM."""
    daily = events_daily_dc(spark, sf_dir)
    return ewma_scored(daily)


# Freshness reference instant: fixtures are static, so "now" is pinned —
# a live deployment passes the wall clock here.
_FRESH_ASOF = "2024-02-15 00:00:00"
_FRESH_SLA_DAYS = 30


@register(
    "dq_freshness_check",
    oracle=f"""
    SELECT 'events' AS tbl,
           strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS latest,
           CAST(date_diff('day', MAX(CAST(ts AS TIMESTAMP)),
                          TIMESTAMP '{_FRESH_ASOF}') AS BIGINT) AS staleness_days,
           date_diff('day', MAX(CAST(ts AS TIMESTAMP)),
                     TIMESTAMP '{_FRESH_ASOF}') <= {_FRESH_SLA_DAYS} AS within_sla
    FROM events
    UNION ALL
    SELECT 'orders',
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           CAST(date_diff('day', MAX(o_orderdate),
                          TIMESTAMP '{_FRESH_ASOF}') AS BIGINT),
           date_diff('day', MAX(o_orderdate),
                     TIMESTAMP '{_FRESH_ASOF}') <= {_FRESH_SLA_DAYS}
    FROM orders
    ORDER BY tbl
    """,
    section=_SEC,
)
def dq_freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit — latest watermark per fact table vs an SLA
    against a reference instant ("is yesterday's feed actually here?"),
    the first alarm any surveillance pipeline wires (a silent dead feed
    looks exactly like zero disease activity — the most dangerous failure
    mode the reference platform has). The reference instant is pinned
    because fixtures are static; production passes now().

    Plan: MAX over each table is a map-side partial reduced to one row —
    at 100 TB this reads parquet footer statistics when the scan supports
    it, and is otherwise one streaming pass with no shuffle beyond the
    1-row final."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    asof = F.lit(_FRESH_ASOF).cast("timestamp")

    def fresh(df: DataFrame, name: str, col: str) -> DataFrame:
        mx = F.max(F.col(col).cast("timestamp"))
        stale = F.datediff(asof.cast("date"), mx.cast("date")).cast("bigint")
        return df.agg(
            F.lit(name).alias("tbl"),
            F.date_format(mx, "yyyy-MM-dd HH:mm:ss").alias("latest"),
            stale.alias("staleness_days"),
            (stale <= _FRESH_SLA_DAYS).alias("within_sla"),
        ).select("tbl", "latest", "staleness_days", "within_sla")

    return fresh(e, "events", "ts").unionByName(fresh(o, "orders", "o_orderdate")).orderBy("tbl")


@register(
    "dq_duplicate_pk_check",
    oracle="""
    SELECT 'customer.c_custkey' AS pk, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_dup_rows
    FROM customer
    UNION ALL
    SELECT 'events.event_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT event_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT l_orderkey * 16 + l_linenumber) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 16 + l_linenumber) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_orderkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    ORDER BY pk
    """,
    section=_SEC,
)
def dq_duplicate_pk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit for every fact/dim PK, including the
    composite lineitem key (packed as orderkey·16+linenumber — linenumber
    ≤ 7 in TPC-H, so the packing is collision-free and keeps the distinct
    a fixed-width integer). The reference's MySQL engine enforces PKs
    transactionally; append-only storage can't, so — like
    dq_referential_check — the equivalent guarantee is this declarative
    post-load audit, and together with referential/profile/freshness/
    anomaly keys it completes the constraint surface re-expressed for a
    lakehouse.

    Plan: one exact COUNT(DISTINCT) pass per table (two-phase, Expand-
    free since each branch has a single distinct); at 100 TB swap in
    approx_count_distinct for a monitoring-grade answer or keep exact for
    a gating answer — same plan shape either way."""
    parts = []
    for name, tbl, expr in [
        ("customer.c_custkey", "customer", F.col("c_custkey")),
        ("events.event_id", "events", F.col("event_id")),
        (
            "lineitem.(l_orderkey,l_linenumber)",
            "lineitem",
            F.col("l_orderkey") * 16 + F.col("l_linenumber"),
        ),
        ("orders.o_orderkey", "orders", F.col("o_orderkey")),
    ]:
        t = table(spark, sf_dir, tbl)
        parts.append(
            t.agg(
                F.lit(name).alias("pk"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.count_distinct(expr).cast("bigint").alias("n_keys"),
                (F.count("*") - F.count_distinct(expr)).cast("bigint").alias("n_dup_rows"),
            ).select("pk", "n_rows", "n_keys", "n_dup_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("pk")


# Benford first-digit expectations log10(1 + 1/d), precomputed once in
# Python and injected as identical double literals into BOTH engines —
# cross-engine libm log10 could differ in the last ulp, a risk literals
# remove entirely.
_BENFORD_EXPECTED = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN {p!r}" for d, p in _BENFORD_EXPECTED.items()
) + " END"


@register(
    "dq_benford",
    oracle=f"""
    WITH digits AS (
      SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS digit
      FROM orders
    ), counted AS (
      SELECT digit, COUNT(*) AS n,
             CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS total
      FROM digits GROUP BY digit
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           FLOOR(CAST(n AS DOUBLE) / total * 1000000 + 0.5) / 1000000 AS observed_pct,
           FLOOR(CAST({_BENFORD_SQL_CASE} AS DOUBLE) * 1000000 + 0.5) / 1000000 AS expected_pct,
           FLOOR(ABS(CAST(n AS DOUBLE) / total - CAST({_BENFORD_SQL_CASE} AS DOUBLE)) * 1000000 + 0.5) / 1000000
             AS abs_dev
    FROM counted
    ORDER BY digit
    """,
    section=_SEC,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / corrupted-feed detector (organic multiplicative
    amounts follow P(d) = log10(1+1/d); synthetic or truncated feeds
    don't). Emits per digit: count, observed share, Benford expectation,
    absolute deviation — the table an ingest monitor thresholds on.

    First digit extracted via DECIMAL→string (digit-exact in any engine;
    a log10/floor derivation would hinge on libm ulps at exact powers of
    ten). Expectations are Python-computed literals on both sides. Pure
    scan→map→partial-agg over one digit per row: no join, one exchange of
    ≤9 groups, trivially 100 TB-safe."""
    o = table(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1).alias(
            "digit"
        )
    )
    counted = digits.groupBy("digit").agg(F.count("*").alias("n"))
    expected = F.coalesce(
        *[
            F.when(F.col("digit") == str(d), F.lit(p))
            for d, p in _BENFORD_EXPECTED.items()
        ]
    )
    from pyspark.sql.window import Window

    total = F.sum("n").over(Window.partitionBy())
    return (
        counted.select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            dround(F.col("n") * 1.0 / total, 6).alias("observed_pct"),
            dround(expected, 6).alias("expected_pct"),
            dround(F.abs(F.col("n") * 1.0 / total - expected), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Round 8: distribution drift, changepoint detection, market-basket affinity
# ---------------------------------------------------------------------------

# PSI bucket layout: 8 fixed-width price buckets. Fixed edges (not
# quantiles) so the bucket map is a pure codegen expression on both
# engines and historical PSI series stay comparable as data arrives.
_PSI_BUCKET_W = 62500
_PSI_SPLIT = "1998-01-01"


@register(
    "dq_drift_psi",
    oracle=f"""
    WITH bucketed AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / {_PSI_BUCKET_W}), 7) AS INTEGER) AS bucket,
             CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM orders
    ), counted AS (
      SELECT bucket,
             SUM(is_ref) AS ref_n,
             SUM(1 - is_ref) AS cur_n
      FROM bucketed GROUP BY bucket
    ), pct AS (
      SELECT bucket,
             GREATEST(CAST(ref_n AS DOUBLE) / SUM(ref_n) OVER (), 1e-6) AS ref_pct,
             GREATEST(CAST(cur_n AS DOUBLE) / SUM(cur_n) OVER (), 1e-6) AS cur_pct
      FROM counted
    )
    SELECT bucket,
           {sql_dround("ref_pct", 6)} AS ref_pct,
           {sql_dround("cur_pct", 6)} AS cur_pct,
           {sql_dround("(cur_pct - ref_pct) * LN(cur_pct / ref_pct)", 6)} AS psi_term
    FROM pct
    ORDER BY bucket
    """,
    section=_SEC,
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference period (orders before
    1998) and the current period, over fixed-width price buckets — the
    standard production monitor for 'has the input distribution shifted
    since the model/report was built'. Emits per-bucket shares and PSI
    terms (sum > 0.2 is the conventional alarm).

    One scan, conditional partial aggregation into <=8 groups, a single-row
    window for the totals: no join, one tiny exchange — the whole monitor
    is a map-side pass at any scale. Fixed bucket edges keep the bucket map
    a codegen expression (quantile edges would need a separate pass and
    make historical PSI series incomparable)."""
    o = table(spark, sf_dir, "orders")
    bucketed = o.select(
        F.least(F.floor(F.col("o_totalprice") / _PSI_BUCKET_W), F.lit(7))
        .cast("int")
        .alias("bucket"),
        F.when(F.col("o_orderdate") < _PSI_SPLIT, 1).otherwise(0).alias("is_ref"),
    )
    counted = bucketed.groupBy("bucket").agg(
        F.sum("is_ref").alias("ref_n"), F.sum(1 - F.col("is_ref")).alias("cur_n")
    )
    from pyspark.sql.window import Window

    all_w = Window.partitionBy()
    ref_pct = F.greatest(
        F.col("ref_n").cast("double") / F.sum("ref_n").over(all_w), F.lit(1e-6)
    )
    cur_pct = F.greatest(
        F.col("cur_n").cast("double") / F.sum("cur_n").over(all_w), F.lit(1e-6)
    )
    pct = counted.select("bucket", ref_pct.alias("ref_pct"), cur_pct.alias("cur_pct"))
    return pct.select(
        "bucket",
        dround("ref_pct", 6).alias("ref_pct"),
        dround("cur_pct", 6).alias("cur_pct"),
        dround(
            (F.col("cur_pct") - F.col("ref_pct"))
            * F.log(F.col("cur_pct") / F.col("ref_pct")),
            6,
        ).alias("psi_term"),
    ).orderBy("bucket")


_CP_W = 40  # changepoint window width (rows each side)


@register(
    "ts_changepoint_meanshift",
    oracle=f"""
    WITH framed AS (
      SELECT event_type, ts, event_id, value,
             SUM(CAST(value AS DECIMAL(30,8))) OVER w_b AS sum_b,
             SUM(CAST(value * value AS DECIMAL(30,8))) OVER w_b AS sumsq_b,
             COUNT(*) OVER w_b AS n_b,
             SUM(CAST(value AS DECIMAL(30,8))) OVER w_a AS sum_a,
             SUM(CAST(value * value AS DECIMAL(30,8))) OVER w_a AS sumsq_a,
             COUNT(*) OVER w_a AS n_a
      FROM events
      WINDOW
        w_b AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN {_CP_W} PRECEDING AND 1 PRECEDING),
        w_a AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND {_CP_W - 1} FOLLOWING)
    ), stats AS (
      SELECT event_type, ts, event_id,
             CAST(sum_b AS DOUBLE) / n_b AS mean_b,
             CAST(sum_a AS DOUBLE) / n_a AS mean_a,
             (CAST(sumsq_b AS DOUBLE) - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE) / n_b) / (n_b - 1) AS var_b,
             (CAST(sumsq_a AS DOUBLE) - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE) / n_a) / (n_a - 1) AS var_a,
             n_b, n_a
      FROM framed
      WHERE n_b = {_CP_W} AND n_a = {_CP_W}
    )
    SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
           {sql_dround("mean_b", 4)} AS mean_before,
           {sql_dround("mean_a", 4)} AS mean_after,
           {sql_dround("(mean_a - mean_b) / sqrt(var_b / n_b + var_a / n_a)", 4)} AS z
    FROM stats
    WHERE var_b / n_b + var_a / n_a > 0
      AND ABS((mean_a - mean_b) / sqrt(var_b / n_b + var_a / n_a)) >= 2.5
    """,
    section=_SEC,
)
def ts_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint detection (two-sample z over adjacent sliding
    windows): for every event, compare the mean of the 40 rows before it
    against the 40 rows from it onward within its event_type stream; emit
    points where the standardized shift |z| >= 2.5 — level changes a global
    mean or seasonal model would smear. The surveillance complement to the
    CUSUM/EARS detectors (those find sustained drifts; this localizes the
    jump row).

    Cross-engine determinism: window moments are DECIMAL-exact sums (value
    and value² cast to DECIMAL(30,8) before summation), so mean/variance
    are derived from identical inputs on both engines — no fp-association
    drift between Spark's streaming frames and DuckDB's segment trees.
    Scale: one hash-partition by event_type, two row frames over the same
    sort — a single window exchange; per-key state is the 81-row frame."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    order = [F.col("ts"), F.col("event_id")]
    # O(1)-per-row plan: ONE running cumulative DECIMAL sum per moment,
    # then both 40-row frames fall out as cumsum differences via lag/lead
    # over the SAME sort — instead of two O(w) sliding frames per row.
    # DECIMAL sums are exact, so difference-of-cumsums == frame-sum to the
    # bit, and the DuckDB oracle (which keeps the direct frame form) still
    # hash-matches. Window parallelism is capped by event_type cardinality
    # either way; this cuts the per-row constant by ~2w decimal adds.
    w_run = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_ord = Window.partitionBy("event_type").orderBy(*order)
    v_dec = F.col("value").cast(DEC)
    v2_dec = (F.col("value") * F.col("value")).cast(DEC)
    cum = e.select(
        "event_type",
        "ts",
        "event_id",
        F.sum(v_dec).over(w_run).alias("cs"),
        F.sum(v2_dec).over(w_run).alias("cs2"),
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("cnt"),
    )
    zero = F.lit(0).cast(DEC)
    prev = F.coalesce(F.lag("cs", 1).over(w_ord), zero)
    prev_w = F.coalesce(F.lag("cs", _CP_W + 1).over(w_ord), zero)
    prev2 = F.coalesce(F.lag("cs2", 1).over(w_ord), zero)
    prev2_w = F.coalesce(F.lag("cs2", _CP_W + 1).over(w_ord), zero)
    lead_a = F.lead("cs", _CP_W - 1).over(w_ord)
    lead2_a = F.lead("cs2", _CP_W - 1).over(w_ord)
    framed = cum.select(
        "event_type",
        "ts",
        "event_id",
        (prev - prev_w).alias("sum_b"),
        (prev2 - prev2_w).alias("sumsq_b"),
        F.lit(_CP_W).alias("n_b"),
        (lead_a - prev).alias("sum_a"),
        (lead2_a - prev2).alias("sumsq_a"),
        F.lit(_CP_W).alias("n_a"),
    ).filter((F.col("rn") > _CP_W) & (F.col("cnt") - F.col("rn") + 1 >= _CP_W))
    mean_b = F.col("sum_b").cast("double") / F.col("n_b")
    mean_a = F.col("sum_a").cast("double") / F.col("n_a")
    var_b = (
        F.col("sumsq_b").cast("double")
        - F.col("sum_b").cast("double") * F.col("sum_b").cast("double") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    var_a = (
        F.col("sumsq_a").cast("double")
        - F.col("sum_a").cast("double") * F.col("sum_a").cast("double") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    z = (mean_a - mean_b) / F.sqrt(var_b / F.col("n_b") + var_a / F.col("n_a"))
    return framed.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        dround(mean_b, 4).alias("mean_before"),
        dround(mean_a, 4).alias("mean_after"),
        dround(z, 4).alias("z"),
        # guard: two constant equal-variance-zero windows make z = x/0
        # (±Inf / NaN); a zero pooled variance can never be a changepoint
    ).filter((var_b / F.col("n_b") + var_a / F.col("n_a") > 0) & (F.abs(z) >= 2.5))


@register(
    "agg_market_basket",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item_n AS (
      SELECT l_partkey, COUNT(*) AS n_i FROM baskets GROUP BY l_partkey
    ), pair_n AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
    )
    SELECT part_a, part_b, n_ab,
           {sql_dround("CAST(n_ab AS DOUBLE) * n.n / (ia.n_i * ib.n_i)", 4)} AS lift
    FROM pair_n
    JOIN item_n ia ON ia.l_partkey = part_a
    JOIN item_n ib ON ib.l_partkey = part_b
    CROSS JOIN n_orders n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 100
    """,
    section=_SEC,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-purchased in the same order,
    scored by lift = P(a,b) / (P(a)·P(b)), minimum support 2, top-100 —
    the association-rule shape behind recommenders and fraud co-occurrence
    screens.

    Scale design: the pair generation is a SELF-JOIN WITHIN l_orderkey
    (co-partitioned after one shuffle of the deduped basket table — never
    an all-pairs item join), so cost is sum over orders of |basket|², not
    |items|². Item totals are broadcast back onto the pair aggregate, the
    order count rides a broadcast single-row cross join, and the final
    top-100 is TakeOrderedAndProject — no global sort. Min-support on the
    GROUP BY output prunes before the lift join."""
    li = table(spark, sf_dir, "lineitem")
    # r14 (guide §1.2, §2.4): baskets feeds FOUR consumers (both pair-join
    # sides, the item totals, the order count) and used to re-scan +
    # re-distinct lineitem for each — the dedup exchange, the only
    # data-scale shuffle here, ran 4x. One explicit repartition on
    # l_orderkey satisfies the (l_orderkey, l_partkey) dedup by the
    # subset rule AND pre-clusters the pair self-join's key, so after the
    # lazy checkpoint the self-join is exchange-free on both sides and
    # lineitem is scanned exactly once.
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # item_n is consumed twice (the part_a and part_b lift lookups) — one
    # lazy checkpoint of the |parts|-bounded totals keeps the basket pass
    # behind it single-run too
    item_n = (
        baskets.groupBy("l_partkey")
        .agg(F.count("*").alias("n_i"))
        .localCheckpoint(eager=False)
    )
    a = baskets.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = baskets.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pair_n = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    n_orders = baskets.agg(F.countDistinct("l_orderkey").alias("n"))
    ia = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_i").alias("n_a"))
    ib = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_i").alias("n_b"))
    return (
        pair_n.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            dround(
                F.col("n_ab").cast("double") * F.col("n") / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(100)
    )


_COHORT_MAX_OFFSET = 7


@register(
    "agg_retention_cohort",
    oracle=f"""
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(d) AS cohort_day FROM activity GROUP BY user_id
    ), cohort_n AS (
      SELECT cohort_day, COUNT(*) AS n_users FROM cohorts GROUP BY cohort_day
    ), ret AS (
      SELECT c.cohort_day,
             date_diff('day', c.cohort_day, a.d) AS offset_days,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM cohorts c JOIN activity a ON a.user_id = c.user_id
      WHERE date_diff('day', c.cohort_day, a.d) BETWEEN 0 AND {_COHORT_MAX_OFFSET}
      GROUP BY 1, 2
    )
    SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(offset_days AS INTEGER) AS offset_days,
           CAST(n_active AS BIGINT) AS n_active,
           {sql_dround("CAST(n_active AS DOUBLE) / n.n_users", 4)} AS retention
    FROM ret r JOIN cohort_n n ON n.cohort_day = r.cohort_day
    ORDER BY cohort_day, offset_days
    """,
    section=_SEC,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity day,
    tracked for {_COHORT_MAX_OFFSET} days — retention(cohort, k) = share of
    the cohort active k days later. The canonical product-analytics rollup
    (and, in surveillance terms, a re-presentation-rate table).

    Scale design: activity collapses to DISTINCT (user, day) first (the
    only event-volume shuffle); cohort assignment is a groupBy(user) min;
    the retention join is user-keyed (co-partitioned with activity), and
    the final divide joins a cohort-sized (days × 1) table — broadcast.
    Offsets are capped so output is |cohorts| × {_COHORT_MAX_OFFSET + 1}
    rows regardless of data scale."""
    e = table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    cohort_n = cohorts.groupBy("cohort_day").agg(F.count("*").alias("n_users"))
    ret = (
        activity.join(cohorts, "user_id")
        .withColumn("offset_days", F.datediff("d", "cohort_day"))
        .filter(F.col("offset_days").between(0, _COHORT_MAX_OFFSET))
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(cohort_n), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("offset_days").cast("int").alias("offset_days"),
            F.col("n_active").cast("bigint").alias("n_active"),
            dround(F.col("n_active").cast("double") / F.col("n_users"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "offset_days")
    )


@register(
    "agg_period_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)), '%Y-%m') AS month,
             {sql_dsum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           {sql_dround("revenue - LAG(revenue, 1) OVER (ORDER BY month)", 2)} AS mom_delta,
           {sql_dround(
               "(revenue - LAG(revenue, 1) OVER (ORDER BY month))"
               " / LAG(revenue, 1) OVER (ORDER BY month) * 100", 4)} AS mom_pct,
           {sql_dround(
               "(revenue - LAG(revenue, 12) OVER (ORDER BY month))"
               " / LAG(revenue, 12) OVER (ORDER BY month) * 100", 4)} AS yoy_pct
    FROM monthly
    ORDER BY month
    """,
    section=_SEC,
)
def agg_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: monthly revenue with month-over-month
    delta/percent and year-over-year percent via 1-lag and 12-lag over the
    month series — the canonical BI trend table (and, for surveillance,
    the same-period seasonal comparison). NULL for months without a
    comparison period (the first month / first year), matching SQL LAG
    semantics on both engines.

    Scale: the month rollup is one partial-agg exchange down to |months|
    rows; the growth windows then run on metadata-sized input (a global
    sort of dozens of rows). Revenue is DECIMAL-exact before rounding."""
    o = table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    mom = F.col("revenue") - F.lag("revenue", 1).over(w)
    mom_pct = mom / F.lag("revenue", 1).over(w) * 100
    yoy_pct = (
        (F.col("revenue") - F.lag("revenue", 12).over(w))
        / F.lag("revenue", 12).over(w)
        * 100
    )
    return monthly.select(
        "month",
        "revenue",
        dround(mom, 2).alias("mom_delta"),
        dround(mom_pct, 4).alias("mom_pct"),
        dround(yoy_pct, 4).alias("yoy_pct"),
    ).orderBy("month")


@register(
    "agg_pareto_abc",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_partkey, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / SUM(revenue) OVER () AS cum_share
      FROM part_rev
    ), classed AS (
      SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                  WHEN cum_share <= 0.8 THEN 'B'
                  ELSE 'C' END AS abc_class,
             revenue
      FROM ranked
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           {sql_dsum("revenue")} AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    section=_SEC,
)
def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: parts ranked by revenue, classified by
    cumulative revenue share (A = the head that makes the first 50%,
    B = to 80%, C = the tail) — the inventory-analytics standard for
    'which 20% of items carry 80% of value'. Deterministic tie-break on
    partkey; DECIMAL-exact sums so the cumulative shares are identical
    across engines.

    Scale: per-part rollup is one hash exchange; the ranked cumulative
    share is a single-partition window over |parts| rows — at true scale
    swap it for a two-pass quantile-threshold classification (compute the
    revenue thresholds from a 3-point percentile of per-part revenue,
    then classify map-side); the output contract (3 rows) is unchanged."""
    li = table(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window

    part_rev = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w_cum = (
        Window.orderBy(F.col("revenue").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = part_rev.select(
        "revenue",
        (F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all)).alias(
            "cum_share"
        ),
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
        .alias("abc_class"),
        "revenue",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            dsum("revenue").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


_KANON_K = 5


@register(
    "dq_k_anonymity",
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           group_size < {_KANON_K} AS violates_k
    FROM groups
    ORDER BY c_nationkey, c_mktsegment
    """,
    section=_SEC,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment): every equivalence class with fewer than k=5 members
    is a re-identification risk — the check a privacy review runs before a
    customer table (or a training-data export joined against one) leaves
    the boundary. Emits every class with its size and violation flag, so
    the consumer can suppress or generalize the violating rows.

    One hash aggregation to |QI classes| rows — trivially scale-safe; at
    100 TB the class count, not the row count, bounds the output, and the
    aggregation is the same one partial-agg exchange as any groupBy."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            F.col("group_size").cast("bigint").alias("group_size"),
            (F.col("group_size") < _KANON_K).alias("violates_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# l-diversity: every k-anonymity class must also contain at least l
# DISTINCT values of the sensitive attribute — k-anonymity alone permits
# the "homogeneity attack" (a class of 10 identical diagnoses re-identifies
# all 10). Sensitive attribute here: account standing banded from acctbal
# (delinquent / low / high — financial status, the thing a privacy review
# actually protects in this table).
_LDIV_L = 2
_LDIV_SENS_SQL = (
    "CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' "
    "WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END"
)


@register(
    "dq_l_diversity",
    oracle=f"""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment, {_LDIV_SENS_SQL} AS sens,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3
    ), tot AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(SUM(cnt) AS BIGINT) AS group_size,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive
      FROM cells GROUP BY 1, 2
    ), ent AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             SUM(CAST(-1.0 * c.cnt / t.group_size
                      * ln(CAST(c.cnt AS DOUBLE) / t.group_size)
                      AS DECIMAL(38,18))) AS entropy
      FROM cells c
      JOIN tot t USING (c_nationkey, c_mktsegment)
      GROUP BY 1, 2
    )
    SELECT CAST(t.c_nationkey AS INTEGER) AS c_nationkey, t.c_mktsegment,
           t.group_size, t.n_distinct_sensitive,
           {sql_dround('CAST(e.entropy AS DOUBLE)', 4)} AS entropy,
           t.n_distinct_sensitive < {_LDIV_L} AS violates_l
    FROM tot t JOIN ent e USING (c_nationkey, c_mktsegment)
    ORDER BY c_nationkey, c_mktsegment
    """,
    section=_SEC,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the same quasi-identifier classes as
    `dq_k_anonymity` (nation, market segment) with sensitive attribute =
    account standing (delinquent / low / high from acctbal): a class
    passes only if it contains ≥ l = 2 distinct sensitive values, and the
    Shannon entropy of the within-class sensitive distribution is emitted
    for the stronger entropy-l-diversity reading — the audit that catches
    the homogeneity attack k-anonymity misses (a class of 10 members that
    are ALL delinquent re-identifies every one of them the moment the
    class is linkable).

    Determinism: class sizes and distinct counts are exact BIGINTs; the
    entropy sums at most 3 −p·ln p terms in a fixed grouping, rounded
    once (ln agrees cross-engine at 4 dp on these well-separated ratios,
    the PMI/zipf convention).

    Scale: one hash aggregation to |QI classes × 3 bands| cells, one more
    to classes — both metadata-sized after the single data-scale
    exchange, exactly dq_k_anonymity's shape with one extra tiny agg."""
    c = table(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "DELINQUENT")
        .when(F.col("c_acctbal") < 5000, "LOW")
        .otherwise("HIGH")
    )
    cells = (
        c.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
        .groupBy("c_nationkey", "c_mktsegment", "sens")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(w)
    # each −p·ln p term is the identical double on both engines; entering
    # DECIMAL before the sum makes the ≤3-term addition exact and
    # order-free (partial-agg order must not move the 4th decimal)
    terms = cells.select(
        "c_nationkey",
        "c_mktsegment",
        "cnt",
        (-p * F.log(p)).cast("decimal(38,18)").alias("h_term"),
    )
    return (
        terms.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("cnt").cast("bigint").alias("group_size"),
            F.count("*").cast("bigint").alias("n_distinct_sensitive"),
            F.sum("h_term").cast("double").alias("entropy"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            "group_size",
            "n_distinct_sensitive",
            dround("entropy", 4).alias("entropy"),
            (F.col("n_distinct_sensitive") < _LDIV_L).alias("violates_l"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Serfling cyclic regression — the SIXTH classical surveillance detector
# ---------------------------------------------------------------------------

# 21-day frozen baseline (3 full weekly cycles), weekly harmonic. The
# fixture spans 30 days, so the seasonal term is the DAY-OF-WEEK cycle;
# a production deployment over years swaps the period for 365.25 days —
# the algebra is identical.
_SERF_EPOCH = "2024-01-01"
_SERF_SPLIT = "2024-01-22"
_SERF_PERIOD = 7
_SERF_L = 2.0  # threshold = expected + L * sigma(residual)
_SERF_TWO_PI = 6.283185307179586

# Baseline moment names shared by the Spark fold and the SQL oracle: every
# per-day term snaps to the 1e-8 grid and sums as DECIMAL so the normal
# equations see ORDER-INDEPENDENT sums (AQE/partitioning cannot move a
# coefficient), then Cramer's rule runs as scalar double arithmetic.
_SERF_MOMENTS = (
    ("s1", "1.0"),
    ("ss", "sn"),
    ("sc", "cs"),
    ("sss", "sn * sn"),
    ("scc", "cs * cs"),
    ("ssc", "sn * cs"),
    ("sy", "c"),
    ("sys", "c * sn"),
    ("syc", "c * cs"),
)

_SERF_CRAMER = {
    "det": "(s1*(sss*scc - ssc*ssc) - ss*(ss*scc - ssc*sc)"
           " + sc*(ss*ssc - sss*sc))",
    "deta": "(sy*(sss*scc - ssc*ssc) - ss*(sys*scc - ssc*syc)"
            " + sc*(sys*ssc - sss*syc))",
    "detb": "(s1*(sys*scc - ssc*syc) - sy*(ss*scc - ssc*sc)"
            " + sc*(ss*syc - sys*sc))",
    "detc": "(s1*(sss*syc - sys*ssc) - ss*(ss*syc - sys*sc)"
            " + sy*(ss*ssc - sss*sc))",
}

_SERF_SQL = f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), angled AS (
      SELECT event_type, d, c,
             sin({_SERF_TWO_PI} * (date_diff('day', DATE '{_SERF_EPOCH}', d)
                 % {_SERF_PERIOD}) / {_SERF_PERIOD}.0) AS sn,
             cos({_SERF_TWO_PI} * (date_diff('day', DATE '{_SERF_EPOCH}', d)
                 % {_SERF_PERIOD}) / {_SERF_PERIOD}.0) AS cs
      FROM daily
    ), moments AS (
      SELECT event_type,
             {", ".join(
                 f"CAST(SUM(CAST(FLOOR(({expr}) * 100000000 + 0.5) / 100000000"
                 f" AS DECIMAL(30,8))) AS DOUBLE) AS {name}"
                 for name, expr in _SERF_MOMENTS)}
      FROM angled WHERE d < DATE '{_SERF_SPLIT}' GROUP BY event_type
    ), coef AS (
      SELECT event_type,
             {_SERF_CRAMER['deta']} / {_SERF_CRAMER['det']} AS ca,
             {_SERF_CRAMER['detb']} / {_SERF_CRAMER['det']} AS cb,
             {_SERF_CRAMER['detc']} / {_SERF_CRAMER['det']} AS cc
      FROM moments
    ), resid AS (
      SELECT a.event_type,
             sqrt(CAST(SUM(CAST(FLOOR(
                     (a.c - (f.ca + f.cb * a.sn + f.cc * a.cs))
                   * (a.c - (f.ca + f.cb * a.sn + f.cc * a.cs))
                   * 100000000 + 0.5) / 100000000 AS DECIMAL(30,8)))
                   AS DOUBLE) / COUNT(*)) AS sigma
      FROM angled a JOIN coef f USING (event_type)
      WHERE a.d < DATE '{_SERF_SPLIT}'
      GROUP BY a.event_type
    )
    SELECT a.event_type, strftime(a.d, '%Y-%m-%d') AS day,
           CAST(a.c AS BIGINT) AS n_events,
           FLOOR((f.ca + f.cb * a.sn + f.cc * a.cs) * 10000 + 0.5) / 10000
             AS expected,
           FLOOR((f.ca + f.cb * a.sn + f.cc * a.cs + {_SERF_L} * r.sigma)
                 * 10000 + 0.5) / 10000 AS threshold,
           a.c > FLOOR((f.ca + f.cb * a.sn + f.cc * a.cs + {_SERF_L} * r.sigma)
                 * 10000 + 0.5) / 10000 AS alert
    FROM angled a
    JOIN coef f USING (event_type)
    JOIN resid r ON r.event_type = a.event_type
    WHERE a.d >= DATE '{_SERF_SPLIT}'
"""


def serfling_scored(daily: DataFrame) -> DataFrame:
    """Serfling cyclic-regression scoring over a (event_type, d, c) daily
    frame: fit y = a + b*sin(th) + c*cos(th) (th = weekly phase) on the
    frozen baseline by CLOSED-FORM OLS — the 3x3 normal equations solved
    with Cramer's rule, no iteration, no ML library — then flag scored
    days whose count exceeds the seasonal expectation plus L residual
    sigmas. Every baseline moment snaps to the 1e-8 grid and sums as
    DECIMAL, so the coefficients are identical under any partitioning /
    aggregation order; the alert compares the raw count (an integer) to
    the ROUNDED threshold (the histlimits/EWMA convention — no unrounded
    float inequality can flip cross-engine). Shared by the batch
    capstone and the streaming twin."""
    daily = daily.localCheckpoint()  # consumed by 3 branches; run once
    phase = (
        F.datediff(F.col("d"), F.lit(_SERF_EPOCH).cast("date")) % _SERF_PERIOD
    ).cast("double")
    angled = daily.select(
        "event_type",
        "d",
        "c",
        F.sin(F.lit(_SERF_TWO_PI) * phase / _SERF_PERIOD).alias("sn"),
        F.cos(F.lit(_SERF_TWO_PI) * phase / _SERF_PERIOD).alias("cs"),
    )
    base = angled.filter(F.col("d") < F.lit(_SERF_SPLIT).cast("date"))

    def snapped_dec(expr):
        return (F.floor(expr * 100000000 + F.lit(0.5)) / 100000000).cast(DEC)

    moment_exprs = {
        "s1": F.lit(1.0),
        "ss": F.col("sn"),
        "sc": F.col("cs"),
        "sss": F.col("sn") * F.col("sn"),
        "scc": F.col("cs") * F.col("cs"),
        "ssc": F.col("sn") * F.col("cs"),
        "sy": F.col("c"),
        "sys": F.col("c") * F.col("sn"),
        "syc": F.col("c") * F.col("cs"),
    }
    moments = base.groupBy("event_type").agg(
        *[
            F.sum(snapped_dec(e)).cast("double").alias(n)
            for n, e in moment_exprs.items()
        ]
    )
    coef = moments.selectExpr(
        "event_type",
        f"{_SERF_CRAMER['deta']} / {_SERF_CRAMER['det']} AS ca",
        f"{_SERF_CRAMER['detb']} / {_SERF_CRAMER['det']} AS cb",
        f"{_SERF_CRAMER['detc']} / {_SERF_CRAMER['det']} AS cc",
    )
    fitted = F.col("ca") + F.col("cb") * F.col("sn") + F.col("cc") * F.col("cs")
    resid = (
        base.join(F.broadcast(coef), "event_type")
        .groupBy("event_type")
        .agg(
            F.sqrt(
                F.sum(snapped_dec((F.col("c") - fitted) * (F.col("c") - fitted)))
                .cast("double")
                / F.count("*")
            ).alias("sigma")
        )
    )
    scored = (
        angled.filter(F.col("d") >= F.lit(_SERF_SPLIT).cast("date"))
        .join(F.broadcast(coef), "event_type")
        .join(F.broadcast(resid), "event_type")
    )
    thr = dround(fitted + _SERF_L * F.col("sigma"), 4)
    return scored.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("bigint").alias("n_events"),
        dround(fitted, 4).alias("expected"),
        thr.alias("threshold"),
        (F.col("c") > thr).alias("alert"),
    )


@register(
    "query_outbreak_serfling",
    oracle=_SERF_SQL,
    section=_SEC,
)
def query_outbreak_serfling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serfling cyclic regression (Serfling 1963) — the SIXTH classical
    surveillance detector, and the one the others cannot replace: EARS /
    CUSUM / EWMA / historical-limits all compare against a LEVEL
    baseline, so a signal whose baseline itself oscillates (day-of-week
    reporting cycles, seasonal incidence) either false-alarms at every
    peak or desensitizes to cover it. Serfling fits the cycle explicitly
    — expected(t) = a + b*sin + c*cos over a frozen baseline — and
    alerts on excess over the SEASONALLY-ADJUSTED expectation, the
    method behind the classic influenza epidemic-threshold curves.

    The fit is closed-form OLS (3x3 normal equations, Cramer's rule) —
    one declarative aggregation over the daily rollup, no iteration, no
    UDF, no ML dependency. Plan: identical shape to CUSUM/EWMA — the
    raw-events daily rollup is the only data-scale pass; moments,
    coefficients, residual sigma and scoring are four metadata-scale ops
    over |types x days| rows with the coefficient/sigma frames
    broadcast. Scoring runs through `serfling_scored`, the SAME core the
    streaming twin calls — stream==batch is structural, as with the
    other five detector pairs."""
    daily = events_daily_dc(spark, sf_dir)
    return serfling_scored(daily)


# Shared excess-burden rollup SQL (batch key + streaming twin):
EXCESS_BURDEN_SQL = f"""
    SELECT event_type,
           CAST(SUM(n_events) AS BIGINT) AS observed,
           CAST(ROUND(SUM(CAST(expected AS DECIMAL(30,8))), 4) AS DOUBLE)
             AS expected_total,
           CAST(ROUND(SUM(CAST(GREATEST(0.0, n_events - expected)
                                AS DECIMAL(30,8))), 4) AS DOUBLE)
             AS excess,
           CAST(SUM(CASE WHEN alert THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alert_days,
           {sql_dround(
               "CAST(SUM(CAST(GREATEST(0.0, n_events - expected)"
               " AS DECIMAL(30,8))) AS DOUBLE)"
               " / CAST(SUM(CAST(expected AS DECIMAL(30,8))) AS DOUBLE)",
               4)} AS excess_ratio
    FROM ({_SERF_SQL}) s
    GROUP BY event_type
    ORDER BY event_type
    """


def excess_burden_rollup(scored: DataFrame) -> DataFrame:
    """Per-type burden rollup over a serfling_scored frame — the shared
    core of `ts_excess_burden` and its streaming twin (exact-decimal
    sums of the 4 dp-rounded dailies; see the batch key's docstring)."""
    excess_d = F.greatest(F.lit(0.0), F.col("n_events") - F.col("expected"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("observed"),
            F.round(F.sum(F.col("expected").cast(DEC)), 4)
            .cast("double")
            .alias("expected_total"),
            F.round(F.sum(excess_d.cast(DEC)), 4)
            .cast("double")
            .alias("excess"),
            F.sum(F.col("alert").cast("int")).cast("bigint").alias(
                "n_alert_days"
            ),
            dround(
                F.sum(excess_d.cast(DEC)).cast("double")
                / F.sum(F.col("expected").cast(DEC)).cast("double"),
                4,
            ).alias("excess_ratio"),
        )
        .orderBy("event_type")
    )


@register("ts_excess_burden", oracle=EXCESS_BURDEN_SQL, section=_SEC)
def ts_excess_burden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal EXCESS burden estimation — Serfling's original 1963
    purpose (the method was built to estimate excess pneumonia-influenza
    MORTALITY over the expected seasonal curve, before it was an alert
    threshold): per event_type over the scored window, observed events,
    the seasonally-expected total, the cumulative positive excess
    sum(max(0, observed_d − expected_d)), alert-day count, and the
    excess ratio — the season-summary number a health department
    publishes ('X% above expected'). Composes the certified
    `serfling_scored` core (same fitted baseline, same frozen-window
    OLS), so the burden estimate can never drift from the detector that
    flagged the days.

    Determinism: expected_d is already 4 dp-rounded by the core; the
    per-type totals sum those rounded doubles as DECIMAL (exact,
    order-free) before one final rounding — the num.py dsum discipline.
    Plan: the daily rollup is the only event-scale pass (shared shape
    with every detector); burden is one further metadata-scale rollup
    to |types| rows."""
    daily = events_daily_dc(spark, sf_dir)
    return excess_burden_rollup(serfling_scored(daily))


# Shared onset/offset SQL (batch key + streaming twin):
EPIDEMIC_ONSET_SQL = f"""
    WITH s AS ({_SERF_SQL}),
    runs AS (
      SELECT event_type, day, alert,
             LEAD(alert) OVER (PARTITION BY event_type ORDER BY day) AS nxt
      FROM s
    ), onset AS (
      SELECT event_type, MIN(day) AS onset_day
      FROM runs WHERE alert AND COALESCE(nxt, FALSE)
      GROUP BY event_type
    ), offs AS (
      SELECT r.event_type, MIN(r.day) AS offset_day
      FROM runs r JOIN onset o ON r.event_type = o.event_type
      WHERE r.day > o.onset_day
        AND NOT r.alert AND NOT COALESCE(r.nxt, TRUE)
      GROUP BY r.event_type
    ), alerts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN alert THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alert_days
      FROM s GROUP BY event_type
    )
    SELECT a.event_type, o.onset_day, f.offset_day, a.n_alert_days
    FROM alerts a
    LEFT JOIN onset o ON a.event_type = o.event_type
    LEFT JOIN offs f ON a.event_type = f.event_type
    ORDER BY a.event_type
    """


def epidemic_onset_rollup(scored: DataFrame) -> DataFrame:
    """Onset/offset/alert-day rollup over a serfling_scored frame — the
    shared core of `ts_epidemic_onset` and its streaming twin (see the
    batch key's docstring for the two-consecutive rule)."""
    s = scored.localCheckpoint()
    wl = Window.partitionBy("event_type").orderBy("day")
    runs = s.select(
        "event_type", "day", "alert", F.lead("alert").over(wl).alias("nxt")
    )
    onset = (
        runs.filter(F.col("alert") & F.coalesce(F.col("nxt"), F.lit(False)))
        .groupBy("event_type")
        .agg(F.min("day").alias("onset_day"))
    )
    offs = (
        runs.join(onset, "event_type")
        .filter(
            (F.col("day") > F.col("onset_day"))
            & ~F.col("alert")
            & ~F.coalesce(F.col("nxt"), F.lit(True))
        )
        .groupBy("event_type")
        .agg(F.min("day").alias("offset_day"))
    )
    alerts = s.groupBy("event_type").agg(
        F.sum(F.col("alert").cast("int")).cast("bigint").alias("n_alert_days")
    )
    return (
        alerts.join(F.broadcast(onset), "event_type", "left")
        .join(F.broadcast(offs), "event_type", "left")
        .select("event_type", "onset_day", "offset_day", "n_alert_days")
        .orderBy("event_type")
    )


@register("ts_epidemic_onset", oracle=EPIDEMIC_ONSET_SQL, section=_SEC)
def ts_epidemic_onset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epidemic onset/offset detection over the Serfling threshold — the
    season-timing deliverable ('the epidemic period began week X and
    ended week Y') behind the classic influenza epidemic-period curves:
    onset = the first scored day that exceeds the seasonal threshold
    AND is followed by another exceedance (the standard two-consecutive
    rule that keeps one-day blips from declaring a season), offset =
    the first post-onset day that is quiet and followed by another
    quiet day. Types with no sustained run report NULL onset — 'no
    epidemic this season' is an answer, not an absence (the fixture's
    null data exercises exactly that; the planted step drives real
    onsets/offsets in pytest). One row per event_type with the
    alert-day total.

    Plan: rides the certified `serfling_scored` core (the daily rollup
    is the only event-scale pass); the run logic is one LEAD window +
    two metadata-scale aggregates over |types x days| rows."""
    daily = events_daily_dc(spark, sf_dir)
    return epidemic_onset_rollup(serfling_scored(daily))


_TS_WIN_DAYS = 180  # Theil-Sen pair window: quadratic in DAYS, not rows


@register(
    "ts_theil_sen",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                 AS DATE)) AS INTEGER) AS t,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ), capped AS (
      SELECT d.* FROM daily d
      JOIN (SELECT event_type, MAX(t) AS mx FROM daily GROUP BY 1) m
        ON d.event_type = m.event_type AND d.t > m.mx - {_TS_WIN_DAYS}
    ), slopes AS (
      SELECT a.event_type, a.t AS ti, b.t AS tj,
             (b.c - a.c) / (b.t - a.t) AS slope
      FROM capped a JOIN capped b
        ON a.event_type = b.event_type AND b.t > a.t
    ), ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, ti, tj) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    ), med_slope AS (
      SELECT event_type,
             SUM(slope) / COUNT(*) AS slope_med
      FROM ranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY event_type
    ), resid AS (
      SELECT c.event_type, c.c - s.slope_med * c.t AS r, c.t,
             s.slope_med
      FROM capped c JOIN med_slope s ON c.event_type = s.event_type
    ), rranked AS (
      SELECT event_type, r, slope_med,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, t) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM resid
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           {sql_dround('MAX(slope_med)', 6)} AS slope,
           {sql_dround('SUM(r) / COUNT(*)', 4)} AS intercept,
           {sql_dround('MAX(slope_med) * 7', 4)} AS trend_per_week
    FROM rranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY event_type
    ORDER BY event_type
    """,
    section=_SEC,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event stream: the median of
    all pairwise daily-count slopes, with the median-residual intercept
    (the Siegel/Conover form). The outlier-proof companion of
    agg_regression's least-squares line - one spiked outbreak day moves
    OLS arbitrarily but shifts a median-of-slopes only one rank, which
    is why Theil-Sen is the standard trend test in environmental and
    surveillance series (Mann-Kendall's estimator twin).

    Determinism: NO quantile interpolation - the median is selected by
    ROW_NUMBER over (slope, ti, tj) with unique integer tiebreaks, and
    an even count averages exactly two selected doubles ((a+b)/2 via
    SUM/COUNT on both engines); slopes are identical per-pair IEEE
    divisions of exact ints/doubles.

    Scale: events collapse to (type, day) rows FIRST - the pair join is
    quadratic in the DAY-WINDOW length (capped at {_TS_WIN_DAYS} days =
    <=16k pairs per stream), never in event volume; everything heavier
    is partial-agg rollup."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01")
            )
            .cast("int")
            .alias("t"),
        )
        .agg(F.count("*").cast("double").alias("c"))
    )
    mx = daily.groupBy("event_type").agg(F.max("t").alias("mx"))
    capped = daily.join(F.broadcast(mx), "event_type").filter(
        F.col("t") > F.col("mx") - _TS_WIN_DAYS
    ).drop("mx").localCheckpoint()  # pair join consumes it twice
    a = capped.select(
        "event_type",
        F.col("t").alias("ti"),
        F.col("c").alias("ci"),
    )
    b = capped.select(
        "event_type",
        F.col("t").alias("tj"),
        F.col("c").alias("cj"),
    )
    slopes = a.join(b, "event_type").filter(F.col("tj") > F.col("ti")).select(
        "event_type",
        "ti",
        "tj",
        ((F.col("cj") - F.col("ci")) / (F.col("tj") - F.col("ti"))).alias("slope"),
    )
    w_t = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number()
        .over(w_t.orderBy("slope", "ti", "tj"))
        .alias("rn"),
        F.count("*").over(w_t).alias("n"),
    )
    mid = (F.col("rn") == F.floor((F.col("n") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("n") + 2) / 2)
    )
    med_slope = (
        ranked.filter(mid)
        .groupBy("event_type")
        .agg((F.sum("slope") / F.count("*")).alias("slope_med"))
    )
    resid = capped.join(F.broadcast(med_slope), "event_type").select(
        "event_type",
        "slope_med",
        "t",
        (F.col("c") - F.col("slope_med") * F.col("t")).alias("r"),
    )
    rranked = resid.select(
        "event_type",
        "r",
        "slope_med",
        F.row_number().over(w_t.orderBy("r", "t")).alias("rn"),
        F.count("*").over(w_t).alias("n"),
    )
    return (
        rranked.filter(mid)
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            dround(F.max("slope_med"), 6).alias("slope"),
            dround(F.sum("r") / F.count("*"), 4).alias("intercept"),
            dround(F.max("slope_med") * 7, 4).alias("trend_per_week"),
        )
        .orderBy("event_type")
    )


_HOLT_ALPHA, _HOLT_1MA = "0.3", "0.7"
_HOLT_BETA, _HOLT_1MB = "0.2", "0.8"
_HOLT_H = 7


@register(
    "ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM daily
    ), hw AS (
      SELECT b1.event_type, 1 AS rn, b1.c AS level, b2.c - b1.c AS trend
      FROM base b1 JOIN base b2
        ON b2.event_type = b1.event_type AND b1.rn = 1 AND b2.rn = 2
      UNION ALL
      SELECT s.event_type, s.rn,
             {_HOLT_ALPHA} * s.c + {_HOLT_1MA} * (hw.level + hw.trend)
               AS level,
             {_HOLT_BETA} * (({_HOLT_ALPHA} * s.c
                              + {_HOLT_1MA} * (hw.level + hw.trend))
                             - hw.level) + {_HOLT_1MB} * hw.trend AS trend
      FROM hw JOIN base s
        ON s.event_type = hw.event_type AND s.rn = hw.rn + 1
    ), last AS (
      SELECT hw.event_type, hw.level, hw.trend, hw.rn
      FROM hw
      JOIN (SELECT event_type, MAX(rn) AS mx FROM hw GROUP BY 1) f
        ON hw.event_type = f.event_type AND hw.rn = f.mx
    )
    SELECT event_type, CAST(h.h AS INTEGER) AS h,
           CAST(rn AS BIGINT) AS n_days,
           {sql_dround('level', 4)} AS level,
           {sql_dround('trend', 4)} AS trend,
           {sql_dround('level + h.h * trend', 4)} AS yhat
    FROM last CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) h(h)
    ORDER BY event_type, h
    """,
    section=_SEC,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing with an h-step
    linear forecast per event stream: the trend-aware upgrade of
    win_ewma (which tracks level only) and the classic short-horizon
    surveillance forecaster - 'given the smoothed level and trend of
    daily counts, what do the next 7 days look like?'. State recursion:
    l_t = 0.3 y_t + 0.7 (l+b), b_t = 0.2 (l_t - l) + 0.8 b, seeded
    l_1 = y_1, b_1 = y_2 - y_1; forecast yhat_h = l_T + h b_T.

    Cross-engine determinism: the recursion is SEQUENTIAL by
    definition, so both engines evaluate the identical IEEE expression
    chain in the identical order - Spark replays it per-series inside
    an Arrow grouped-map (pandas float64), DuckDB as a recursive CTE
    advancing every series one day per iteration; +,*,- are correctly
    rounded, constants are shared decimal literals, results round once.

    Scale: events collapse to (type, day) partial-agg rows first; the
    grouped-map receives ONE tiny series per group (days, not events)
    and parallelizes across streams - state is O(1) per series, the
    exact shape applyInPandasWithState runs live in
    stream_ewma_alerts."""
    import math

    import pandas as pd

    daily = events_daily_dc(spark, sf_dir)

    n_h = _HOLT_H
    alpha, one_m_a = float(_HOLT_ALPHA), float(_HOLT_1MA)
    beta, one_m_b = float(_HOLT_BETA), float(_HOLT_1MB)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        def dr(x: float, n: int) -> float:
            p = 10**n
            return math.floor(x * p + 0.5) / p

        pdf = pdf.sort_values("d")
        y = pdf["c"].tolist()
        if len(y) < 2:
            return pd.DataFrame(
                columns=["event_type", "h", "n_days", "level", "trend", "yhat"]
            )
        level, trend = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            l_new = alpha * y[t] + one_m_a * (level + trend)
            trend = beta * (l_new - level) + one_m_b * trend
            level = l_new
        et = pdf["event_type"].iloc[0]
        return pd.DataFrame(
            {
                "event_type": [et] * n_h,
                "h": list(range(1, n_h + 1)),
                "n_days": [len(y)] * n_h,
                "level": [dr(level, 4)] * n_h,
                "trend": [dr(trend, 4)] * n_h,
                "yhat": [dr(level + h * trend, 4) for h in range(1, n_h + 1)],
            }
        )

    out = daily.groupBy("event_type").applyInPandas(
        fit,
        "event_type string, h int, n_days bigint, level double, trend double,"
        " yhat double",
    )
    return out.orderBy("event_type", "h")


_MK_Z = 1.96


@register(
    "ts_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                 AS DATE)) AS INTEGER) AS t,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.t > a.t
      GROUP BY a.event_type
    ), n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
      GROUP BY event_type
    ), ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(tk * (tk - 1) * (2 * tk + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (
        SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS tk
        FROM daily GROUP BY event_type, c
      ) g
      WHERE tk > 1
      GROUP BY event_type
    ), var_s AS (
      SELECT n.event_type, n.n_days, s.s_stat,
             (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
              - COALESCE(t.tie_term, 0)) / 18.0 AS v
      FROM n JOIN s ON n.event_type = s.event_type
      LEFT JOIN ties t ON n.event_type = t.event_type
    )
    SELECT event_type, n_days, s_stat,
           {sql_dround('v', 4)} AS var_s,
           {sql_dround('''CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(v)
                 WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(v)
                 ELSE 0.0 END''', 4)} AS z,
           CASE WHEN s_stat > 0
                     AND (s_stat - 1) / sqrt(v) >= {_MK_Z} THEN 'increasing'
                WHEN s_stat < 0
                     AND (s_stat + 1) / sqrt(v) <= -{_MK_Z} THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM var_s
    ORDER BY event_type
    """,
    section=_SEC,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event stream: S = sum of
    sign(c_j - c_i) over all day pairs i<j, tie-corrected variance
    Var(S) = [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18, and the
    continuity-corrected normal z — the nonparametric significance TEST
    whose effect-size twin is ts_theil_sen's slope (the pair every
    environmental/surveillance trend readout reports together: MK says
    WHETHER the trend is real, Theil-Sen says HOW STEEP).

    Determinism: S and the tie term are exact BIGINT pair/tie sums; the
    z expression is one shared IEEE chain (division + sqrt are
    correctly rounded) over exact integers, rounded once; the trend
    verdict compares the UNROUNDED z against +/-{_MK_Z} identically on
    both engines.

    Scale: identical skeleton to ts_theil_sen — events collapse to
    (type, day) first, the pair join is quadratic only in the day-count
    (calendar-bounded), the tie rollup is |distinct counts|-sized."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01")
            )
            .cast("int")
            .alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()  # consumed by s / n / ties
    )
    a = daily.select(
        "event_type", F.col("t").alias("ti"), F.col("c").alias("ci")
    )
    b = daily.select(
        "event_type", F.col("t").alias("tj"), F.col("c").alias("cj")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("tj") > F.col("ti"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cj") > F.col("ci"), 1)
                .when(F.col("cj") < F.col("ci"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("bigint").alias("tk"))
        .filter(F.col("tk") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tk") * (F.col("tk") - 1) * (2 * F.col("tk") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(v))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(v))
        .otherwise(0.0)
    )
    trend = (
        F.when(
            (F.col("s_stat") > 0) & ((F.col("s_stat") - 1) / F.sqrt(v) >= _MK_Z),
            "increasing",
        )
        .when(
            (F.col("s_stat") < 0)
            & ((F.col("s_stat") + 1) / F.sqrt(v) <= -_MK_Z),
            "decreasing",
        )
        .otherwise("none")
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            dround(v, 4).alias("var_s"),
            dround(z, 4).alias("z"),
            trend.alias("trend"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Farrington seasonal-regression aberration detector — the SEVENTH (and in
# practice most-deployed) classical surveillance detector
# ---------------------------------------------------------------------------

# Reference windows: for each scored day, the baseline days whose weekly
# phase is within +-_FARR_W of the scored day's phase (circular) — the
# day-of-week analogue of Farrington's "same period +- w weeks in previous
# years" reference windows (the fixture spans 30 days; a production
# deployment swaps period 7 for 365.25 and weeks for years — the algebra
# is identical). 21 baseline days x 3 phases = 9 reference points per
# scored day when the daily grid is dense.
_FARR_EPOCH = "2024-01-01"
_FARR_SPLIT_T = 21  # day index: t < 21 baseline (3 full weeks), t >= 21 scored
_FARR_PERIOD = 7
_FARR_W = 1         # phase window half-width (circular day-of-week distance)
_FARR_Z = 2.0       # one-sided prediction-bound score
_FARR_Z23 = repr(2.0 * _FARR_Z / 3.0)  # the 2/3-power transform's (2/3)*z

_FARR_SNAP = "100000000"  # 1e-8 moment grid (repo DECIMAL convention)

_FARR_SQL = f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS DOUBLE) AS c,
             date_diff('day', DATE '{_FARR_EPOCH}', date_trunc('day', ts)) AS t
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT s.event_type, s.t AS ts_, s.d AS ds, s.c AS cs,
             r.t AS tr, r.c AS cr
      FROM daily s JOIN daily r ON r.event_type = s.event_type
      WHERE s.t >= {_FARR_SPLIT_T} AND r.t < {_FARR_SPLIT_T}
        AND LEAST(ABS(s.t % {_FARR_PERIOD} - r.t % {_FARR_PERIOD}),
                  {_FARR_PERIOD} - ABS(s.t % {_FARR_PERIOD}
                                       - r.t % {_FARR_PERIOD})) <= {_FARR_W}
    ), mom AS (
      SELECT event_type, ts_, ds, cs,
             CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(tr) AS DOUBLE) AS st,
             CAST(SUM(tr * tr) AS DOUBLE) AS stt,
             CAST(SUM(CAST(FLOOR(cr * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
                  AS DECIMAL(30,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(FLOOR(cr * tr * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
                  AS DECIMAL(30,8))) AS DOUBLE) AS syt
      FROM pairs GROUP BY 1, 2, 3, 4
    ), coef AS (
      SELECT *, (nn * syt - st * sy) / (nn * stt - st * st) AS b FROM mom
    ), coef2 AS (
      SELECT *, (sy - b * st) / nn AS a FROM coef
    ), resid AS (
      SELECT p.event_type, p.ts_,
             GREATEST(CAST(SUM(CAST(FLOOR(
               (p.cr - (k.a + k.b * p.tr)) * (p.cr - (k.a + k.b * p.tr))
               / GREATEST(k.a + k.b * p.tr, 0.5)
               * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
               AS DECIMAL(30,8))) AS DOUBLE) / (COUNT(*) - 2.0), 1.0) AS phi
      FROM pairs p JOIN coef2 k
        ON k.event_type = p.event_type AND k.ts_ = p.ts_
      GROUP BY 1, 2
    ), fin AS (
      SELECT k.event_type, k.ds, k.cs,
             GREATEST(k.a + k.b * k.ts_, 0.5) AS muc, r.phi
      FROM coef2 k JOIN resid r
        ON r.event_type = k.event_type AND r.ts_ = k.ts_
    ), fin2 AS (
      SELECT *, 1.0 + {_FARR_Z23} * sqrt(phi / muc) AS g FROM fin
    )
    SELECT event_type, strftime(ds, '%Y-%m-%d') AS day,
           CAST(cs AS BIGINT) AS n_events,
           {sql_dround('muc', 4)} AS expected,
           {sql_dround('phi', 4)} AS dispersion,
           {sql_dround('muc * g * sqrt(g)', 4)} AS threshold,
           cs > {sql_dround('muc * g * sqrt(g)', 4)} AS alert
    FROM fin2
"""


def farrington_scored(
    daily: DataFrame,
    count_col: str = "n_events",
    integer_counts: bool = True,
) -> DataFrame:
    """Farrington(-flexible) scoring over a (event_type, d, c) daily frame:
    for each scored day, fit a LINEAR TREND by closed-form OLS over the
    day's reference window (baseline days within +-w weekly phase,
    Farrington's same-period-in-history windows), estimate overdispersion
    phi from the Pearson residuals of that fit, and alert when the count
    exceeds the 2/3-power-transformed upper prediction bound
    U = mu * (1 + (2/3) * z * sqrt(phi/mu))^(3/2) (Farrington, Andrews,
    Beale & Catchpole 1996, JRSS-A — the quasi-Poisson bound on the
    variance-stabilizing y^(2/3) scale; the full GLM's IRLS collapses to
    plain OLS here because the weights are constant under the identity
    link on a short window, which is the 'Farrington flexible' noufaily
    simplification in spirit).

    Determinism: all OLS moments snap to the 1e-8 grid and sum as
    DECIMAL (order-independent under any partitioning/AQE re-plan), the
    coefficient/bound arithmetic is a single shared IEEE expression
    chain (+ * - / sqrt only, shared decimal literals), x^(3/2) is
    spelled x * sqrt(x) on both engines, and the alert compares the raw
    integer count to the ROUNDED threshold (the repo's detector
    convention). Expectation and Pearson denominators clamp at 0.5 so a
    down-trending fit can never divide by <=0.

    Scale: the daily rollup is the only data-scale pass; the scored x
    reference pair frame is |types x 9 x scored-days| metadata, consumed
    twice (moments, residuals) off one localCheckpoint. Shared by the
    batch capstone and the streaming twin (stream == batch structural)."""
    daily = daily.localCheckpoint()  # metadata-sized; consumed by 2 branches
    dd = daily.withColumn(
        "t",
        F.datediff(F.col("d"), F.lit(_FARR_EPOCH).cast("date")).cast("bigint"),
    )
    base = dd.filter(F.col("t") < _FARR_SPLIT_T).select(
        "event_type", F.col("t").alias("tr"), F.col("c").alias("cr")
    )
    scored = dd.filter(F.col("t") >= _FARR_SPLIT_T).select(
        "event_type",
        F.col("t").alias("ts_"),
        F.col("d").alias("ds"),
        F.col("c").alias("cs"),
    )
    pdist = F.abs(F.col("ts_") % _FARR_PERIOD - F.col("tr") % _FARR_PERIOD)
    pairs = (
        scored.join(F.broadcast(base), "event_type")
        .filter(F.least(pdist, _FARR_PERIOD - pdist) <= _FARR_W)
        .localCheckpoint()  # consumed by moments AND residuals
    )

    def snap(e):
        return (F.floor(e * 100000000 + F.lit(0.5)) / 100000000).cast(DEC)

    mom = pairs.groupBy("event_type", "ts_", "ds", "cs").agg(
        F.count("*").cast("double").alias("nn"),
        F.sum("tr").cast("double").alias("st"),
        F.sum(F.col("tr") * F.col("tr")).cast("double").alias("stt"),
        F.sum(snap(F.col("cr"))).cast("double").alias("sy"),
        F.sum(snap(F.col("cr") * F.col("tr"))).cast("double").alias("syt"),
    )
    coef = mom.withColumn(
        "b",
        (F.col("nn") * F.col("syt") - F.col("st") * F.col("sy"))
        / (F.col("nn") * F.col("stt") - F.col("st") * F.col("st")),
    ).withColumn("a", (F.col("sy") - F.col("b") * F.col("st")) / F.col("nn"))

    yh = F.col("a") + F.col("b") * F.col("tr")
    resid = (
        pairs.join(
            F.broadcast(coef.select("event_type", "ts_", "a", "b")),
            ["event_type", "ts_"],
        )
        .groupBy("event_type", "ts_")
        .agg(
            F.greatest(
                F.sum(
                    snap((F.col("cr") - yh) * (F.col("cr") - yh) / F.greatest(yh, F.lit(0.5)))
                ).cast("double")
                / (F.count("*") - F.lit(2.0)),
                F.lit(1.0),
            ).alias("phi")
        )
    )
    fin = coef.join(F.broadcast(resid), ["event_type", "ts_"]).withColumn(
        "muc", F.greatest(F.col("a") + F.col("b") * F.col("ts_"), F.lit(0.5))
    )
    g = F.lit(1.0) + F.lit(2.0 * _FARR_Z / 3.0) * F.sqrt(F.col("phi") / F.col("muc"))
    fin = fin.withColumn("g", g)
    thr = dround(F.col("muc") * F.col("g") * F.sqrt(F.col("g")), 4)
    # integer_counts: the raw detector's counts are exact integers and
    # ship as BIGINT; the nowcast-composed detector feeds CORRECTED
    # (rational) counts, which ship rounded to the output grid.
    cnt = (
        F.col("cs").cast("bigint")
        if integer_counts
        else dround(F.col("cs"), 4)
    )
    return fin.select(
        "event_type",
        F.date_format("ds", "yyyy-MM-dd").alias("day"),
        cnt.alias(count_col),
        dround(F.col("muc"), 4).alias("expected"),
        dround(F.col("phi"), 4).alias("dispersion"),
        thr.alias("threshold"),
        (F.col("cs") > thr).alias("alert"),
    )


@register(
    "query_outbreak_farrington",
    oracle=_FARR_SQL,
    section=_SEC,
)
def query_outbreak_farrington(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farrington seasonal-regression aberration detection — the SEVENTH
    classical surveillance detector and the standard at most national
    surveillance agencies (it is what `surveillance::farrington` runs
    weekly over hundreds of pathogen series). The six existing detectors
    split the space: EARS/CUSUM/EWMA/histlimits compare against LEVEL
    baselines, Serfling fits a global seasonal cycle. Farrington is the
    per-day LOCAL regression: each scored day gets its own reference
    window (same weekly phase +- w in the frozen baseline), its own
    trend-adjusted expectation, and its own overdispersion estimate — so
    it adapts to series whose trend AND dispersion drift, which is why
    agencies run it over heterogeneous disease panels unattended.

    Plan shape: identical to the other detector capstones — the
    raw-events daily rollup is the only pass that scales with data;
    pairing, moments, coefficients, dispersion and the prediction bound
    are metadata-scale ops over |types x days| rows with every small
    side broadcast. Scoring runs through `farrington_scored`, the SAME
    core the streaming twin calls — stream == batch is structural, as
    with the other six detector pairs."""
    daily = events_daily_dc(spark, sf_dir)
    return farrington_scored(daily)


# ---------------------------------------------------------------------------
# Reporting-delay nowcasting (the reporting triangle)
# ---------------------------------------------------------------------------

# Report date = event date + a deterministic per-event delay (0..7 days,
# Knuth hash of event_id — the repo's derived-attribute idiom, as with the
# customer geo coordinates). As-of date T truncates the stream: events
# reported after T are invisible, which is exactly the right-truncation a
# live surveillance system sees. Historical days older than the max delay
# are COMPLETE and estimate the delay distribution.
_NC_ASOF = "2024-01-28"
_NC_DMAX = 8          # delays are 0..7 -> days aged >= 8 are complete
_NC_SALT = 101

_NC_SQL = f"""
    WITH ev AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ((event_id + {_NC_SALT}) * 2654435761) % 4294967296
               % {_NC_DMAX} AS delay
      FROM events
    ), hist AS (
      SELECT event_type, delay, COUNT(*) AS n
      FROM ev WHERE d <= DATE '{_NC_ASOF}' - {_NC_DMAX}
      GROUP BY 1, 2
    ), cumd AS (
      SELECT event_type, delay,
             SUM(n) OVER (PARTITION BY event_type ORDER BY delay) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM hist
    ), aged AS (
      SELECT event_type, d, delay,
             date_diff('day', d, DATE '{_NC_ASOF}') AS age
      FROM ev
      WHERE d > DATE '{_NC_ASOF}' - {_NC_DMAX} AND d <= DATE '{_NC_ASOF}'
    ), scored AS (
      SELECT event_type, d, age,
             SUM(CASE WHEN delay <= age THEN 1 ELSE 0 END) AS n_reported,
             COUNT(*) AS n_true
      FROM aged GROUP BY 1, 2, 3
    )
    SELECT s.event_type, strftime(s.d, '%Y-%m-%d') AS day,
           CAST(s.age AS INTEGER) AS age,
           CAST(s.n_reported AS BIGINT) AS n_reported,
           CAST(s.n_true AS BIGINT) AS n_true,
           FLOOR(CAST(c.cum AS DOUBLE) / c.total * 10000 + 0.5) / 10000
             AS completeness,
           FLOOR(CAST(s.n_reported * c.total AS DOUBLE) / c.cum
                 * 10000 + 0.5) / 10000 AS n_nowcast
    FROM scored s
    JOIN cumd c ON c.event_type = s.event_type AND c.delay = s.age
"""


@register(
    "ts_nowcast_delay",
    oracle=_NC_SQL,
    section=_SEC,
)
def ts_nowcast_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting-delay nowcasting — the reporting-triangle completeness
    correction every surveillance shop applies BEFORE running a detector
    (Lawless 1994's multiplicative chain-ladder shape): recent days look
    artificially low only because their reports haven't all arrived, and
    feeding truncated counts to any aberration detector either masks a
    real outbreak or (after it ends) fires on the artefactual 'drop'.
    The fix: estimate the delay distribution F(a) = P(delay <= a) from
    fully-observed historical days, then inflate each truncated day by
    its cumulative completeness — nowcast(d) = reported(d) / F(age(d)).

    Determinism: F and the nowcast are single IEEE divisions of exact
    integer counts (the delay histogram and its running sum are pure
    BIGINT), rounded once — no float accumulation anywhere, so the
    correction is identical under any partitioning. n_true (the full
    count, observable here because the fixture is complete) ships in the
    output so the truncation error is directly auditable; the pytest
    pins exact recovery when the delay process is stationary.

    Scale: one pass over events builds both the historical delay
    histogram (|types x delays| rows) and the truncated recent counts
    (|types x Dmax| rows); the completeness join is a broadcast of the
    tiny cumulative-distribution frame. Nothing downstream of the first
    grouped exchange scales with data volume. Scoring runs through
    `nowcast_scored`, the SAME core the streaming twin calls."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    e = table(spark, sf_dir, "events")
    ev = e.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        (
            ((F.col("event_id") + _NC_SALT) * F.lit(KNUTH))
            % F.lit(KNUTH_MOD)
            % _NC_DMAX
        ).alias("delay"),
    )
    counts = ev.groupBy("event_type", "d", "delay").agg(
        F.count("*").alias("n")
    )
    return nowcast_scored(counts)


def nowcast_scored(counts: DataFrame) -> DataFrame:
    """Reporting-triangle scoring over a (event_type, d, delay, n) count
    frame: delay CDF from the complete historical days, completeness
    correction on the truncated recent ones. Exact BIGINT counts +
    single IEEE divisions, rounded once — identical under any
    partitioning/trigger schedule. Shared by the batch capstone and the
    streaming twin (stream == batch structural)."""
    asof = F.lit(_NC_ASOF).cast("date")
    hist = (
        counts.filter(F.col("d") <= F.date_sub(asof, _NC_DMAX))
        .groupBy("event_type", "delay")
        .agg(F.sum("n").alias("n"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("delay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    # cumd and scored share lineage (a self-join on the same counts
    # frame, which under a memory-sink view shares attribute ids) —
    # rename the CDF side's keys so resolution is by NAME, not id
    cumd = hist.select(
        F.col("event_type").alias("cdf_type"),
        F.col("delay").alias("cdf_delay"),
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("total"),
    )
    aged = counts.filter(
        (F.col("d") > F.date_sub(asof, _NC_DMAX)) & (F.col("d") <= asof)
    ).withColumn("age", F.datediff(asof, F.col("d")).cast("bigint"))
    scored = aged.groupBy("event_type", "d", "age").agg(
        F.sum(F.when(F.col("delay") <= F.col("age"), F.col("n")).otherwise(0)).alias(
            "n_reported"
        ),
        F.sum("n").alias("n_true"),
    )
    return scored.join(
        F.broadcast(cumd),
        (F.col("event_type") == F.col("cdf_type"))
        & (F.col("cdf_delay") == F.col("age")),
    ).select(
        F.col("event_type"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("age").cast("int").alias("age"),
        F.col("n_reported").cast("bigint").alias("n_reported"),
        F.col("n_true").cast("bigint").alias("n_true"),
        dround(F.col("cum").cast("double") / F.col("total"), 4).alias(
            "completeness"
        ),
        dround(
            (F.col("n_reported") * F.col("total")).cast("double") / F.col("cum"),
            4,
        ).alias("n_nowcast"),
    )


# ---------------------------------------------------------------------------
# Detector-on-nowcast composition: Farrington over completeness-corrected
# counts — the operationally correct prospective pipeline
# ---------------------------------------------------------------------------

_FARR_NC_SQL = f"""
    WITH ev AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ((event_id + {_NC_SALT}) * 2654435761) % 4294967296
               % {_NC_DMAX} AS delay
      FROM events
      WHERE CAST(date_trunc('day', ts) AS DATE) <= DATE '{_NC_ASOF}'
    ), hist AS (
      SELECT event_type, delay, COUNT(*) AS n
      FROM ev WHERE d <= DATE '{_NC_ASOF}' - {_NC_DMAX}
      GROUP BY 1, 2
    ), cumd AS (
      SELECT event_type, delay,
             SUM(n) OVER (PARTITION BY event_type ORDER BY delay) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM hist
    ), rep AS (
      -- counts VISIBLE as of the nowcast date: only reports whose delay
      -- has elapsed (the right truncation a live system sees)
      SELECT event_type, d, date_diff('day', d, DATE '{_NC_ASOF}') AS age,
             SUM(CASE WHEN delay <= date_diff('day', d, DATE '{_NC_ASOF}')
                 THEN 1 ELSE 0 END) AS n_reported
      FROM ev GROUP BY 1, 2, 3
    ), daily AS (
      -- the nowcasted series: complete days pass through, truncated
      -- days inflate by cumulative completeness F(age) = cum/total
      SELECT r.event_type, r.d,
             CASE WHEN r.age >= {_NC_DMAX} THEN CAST(r.n_reported AS DOUBLE)
                  ELSE CAST(r.n_reported * c.total AS DOUBLE) / c.cum
             END AS c,
             date_diff('day', DATE '{_FARR_EPOCH}', r.d) AS t
      FROM rep r LEFT JOIN cumd c
        ON c.event_type = r.event_type AND c.delay = r.age
    ), pairs AS (
      SELECT s.event_type, s.t AS ts_, s.d AS ds, s.c AS cs,
             r.t AS tr, r.c AS cr
      FROM daily s JOIN daily r ON r.event_type = s.event_type
      WHERE s.t >= {_FARR_SPLIT_T} AND r.t < {_FARR_SPLIT_T}
        AND LEAST(ABS(s.t % {_FARR_PERIOD} - r.t % {_FARR_PERIOD}),
                  {_FARR_PERIOD} - ABS(s.t % {_FARR_PERIOD}
                                       - r.t % {_FARR_PERIOD})) <= {_FARR_W}
    ), mom AS (
      SELECT event_type, ts_, ds, cs,
             CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(tr) AS DOUBLE) AS st,
             CAST(SUM(tr * tr) AS DOUBLE) AS stt,
             CAST(SUM(CAST(FLOOR(cr * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
                  AS DECIMAL(30,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(FLOOR(cr * tr * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
                  AS DECIMAL(30,8))) AS DOUBLE) AS syt
      FROM pairs GROUP BY 1, 2, 3, 4
    ), coef AS (
      SELECT *, (nn * syt - st * sy) / (nn * stt - st * st) AS b FROM mom
    ), coef2 AS (
      SELECT *, (sy - b * st) / nn AS a FROM coef
    ), resid AS (
      SELECT p.event_type, p.ts_,
             GREATEST(CAST(SUM(CAST(FLOOR(
               (p.cr - (k.a + k.b * p.tr)) * (p.cr - (k.a + k.b * p.tr))
               / GREATEST(k.a + k.b * p.tr, 0.5)
               * {_FARR_SNAP} + 0.5) / {_FARR_SNAP}
               AS DECIMAL(30,8))) AS DOUBLE) / (COUNT(*) - 2.0), 1.0) AS phi
      FROM pairs p JOIN coef2 k
        ON k.event_type = p.event_type AND k.ts_ = p.ts_
      GROUP BY 1, 2
    ), fin AS (
      SELECT k.event_type, k.ds, k.cs,
             GREATEST(k.a + k.b * k.ts_, 0.5) AS muc, r.phi
      FROM coef2 k JOIN resid r
        ON r.event_type = k.event_type AND r.ts_ = k.ts_
    ), fin2 AS (
      SELECT *, 1.0 + {_FARR_Z23} * sqrt(phi / muc) AS g FROM fin
    )
    SELECT event_type, strftime(ds, '%Y-%m-%d') AS day,
           {sql_dround('cs', 4)} AS n_nowcast,
           {sql_dround('muc', 4)} AS expected,
           {sql_dround('phi', 4)} AS dispersion,
           {sql_dround('muc * g * sqrt(g)', 4)} AS threshold,
           cs > {sql_dround('muc * g * sqrt(g)', 4)} AS alert
    FROM fin2
"""


@register(
    "query_outbreak_nowcasted",
    oracle=_FARR_NC_SQL,
    section=_SEC,
)
def query_outbreak_nowcasted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farrington aberration detection over NOWCASTED counts — the
    composition real surveillance shops actually schedule (VERDICT r10
    next-round #3): every detector in this repo scores a daily series,
    but the last Dmax days of a live series are right-truncated (recent
    reports haven't arrived), which is exactly where PROSPECTIVE
    detection looks — so raw detectors systematically under-alert on
    emerging outbreaks. The pipeline: (1) estimate the reporting-delay
    CDF F(a) from fully-observed historical days (`ts_nowcast_delay`'s
    reporting triangle), (2) build the as-of-date visible series (only
    reports whose delay has elapsed — the truncation a live system
    sees), (3) inflate each truncated day by 1/F(age), (4) run the
    Farrington reference-window detector (`farrington_scored`, the
    SHARED core — integer_counts=False ships the corrected rational
    counts) on the corrected series. The pytest plants a spike 1 day
    before the as-of date with a back-loaded delay mix: the raw
    truncated series shows baseline-level counts (raw Farrington is
    silent) while the nowcasted detector alerts — the operational loop
    the composition closes.

    Determinism: F and the correction are single IEEE divisions of
    exact BIGINT counts (identical both engines); the corrected counts
    then flow through Farrington's 1e-8 DECIMAL moment snaps, so the
    OLS/dispersion chain stays order-independent; the alert compares
    the corrected count to the ROUNDED threshold (the repo's detector
    convention).

    Scale: ONE pass over events builds both the delay histogram and the
    visible daily counts (the only data-scale exchanges); the CDF is a
    broadcast |types x Dmax| frame and the Farrington scoring runs on
    |types x days| metadata exactly as in the raw key."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    e = table(spark, sf_dir, "events")
    asof = F.lit(_NC_ASOF).cast("date")
    ev = e.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        (
            ((F.col("event_id") + _NC_SALT) * F.lit(KNUTH))
            % F.lit(KNUTH_MOD)
            % _NC_DMAX
        ).alias("delay"),
    ).filter(F.col("d") <= asof)
    hist = (
        ev.filter(F.col("d") <= F.date_sub(asof, _NC_DMAX))
        .groupBy("event_type", "delay")
        .agg(F.count("*").alias("n"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("delay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cumd = hist.select(
        F.col("event_type").alias("cdf_type"),
        F.col("delay").alias("cdf_delay"),
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("total"),
    )
    rep = (
        ev.withColumn("age", F.datediff(asof, F.col("d")).cast("bigint"))
        .groupBy("event_type", "d", "age")
        .agg(
            F.sum(
                F.when(F.col("delay") <= F.col("age"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_reported")
        )
    )
    daily = rep.join(
        F.broadcast(cumd),
        (F.col("event_type") == F.col("cdf_type"))
        & (F.col("cdf_delay") == F.col("age")),
        "left",
    ).select(
        "event_type",
        "d",
        F.when(
            F.col("age") >= _NC_DMAX, F.col("n_reported").cast("double")
        )
        .otherwise(
            (F.col("n_reported") * F.col("total")).cast("double")
            / F.col("cum")
        )
        .alias("c"),
    )
    return farrington_scored(daily, count_col="n_nowcast", integer_counts=False)


# ---------------------------------------------------------------------------
# Detector concordance — the panel operations runs OVER the detectors
# ---------------------------------------------------------------------------


# NOTE: registered from insights.py (after query_outbreak_histlimits), so
# its oracle can compose ALL SEVEN component detectors' certified oracles.
def query_detector_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise concordance of the eight batch aberration detectors (EARS
    C1, C2 and C3, CUSUM, EWMA, historical limits, Serfling,
    Farrington) — the
    monitor a surveillance shop runs over its detector PANEL: 'which
    detectors agree, and is any one firing alone?' A detector that
    alerts where no peer does is either the panel's most sensitive
    instrument or its noisiest — this table is how an epidemiologist
    tells which, and the operational basis for n-of-m alert-escalation
    rules. Composes the eight REGISTRY operators (EARS C1/C3 via
    `query_outbreak_ears_family`, filtered by variant; no reimplementation can
    drift — the llm_ann_recall_eval doctrine applied to surveillance).

    Per ordered pair (det_a < det_b): the comparison domain is the
    INTERSECTION of scored (event_type, day) rows — detectors have
    different warm-up windows (moving baselines, reference weeks), and
    a day only one detector even scored says nothing about agreement —
    then n alerts on each side, co-alerts, alert-set Jaccard
    (co-alerts / alert-union, defined 1.0 when the union is empty:
    agreeing that NOTHING is aberrant is agreement), and raw percent
    agreement including joint silence.

    FULLY HASH-ORACLED since r14 (VERDICT r13 work list #2): the oracle
    composes the seven component detectors' OWN certified oracle texts
    as CTEs and replays the identical normalize/pair/aggregate SQL, so
    the composition — not just the inputs — is cross-engine pinned.
    Deterministic: day keys normalize to ISO strings, pair order is
    lexicographic, output sorts on (det_a, det_b)."""
    from sdp_spark.operators.insights import query_outbreak_histlimits

    fam = query_outbreak_ears_family(spark, sf_dir)
    dets = {
        "cusum": query_outbreak_cusum(spark, sf_dir),
        "ears": query_outbreak_ears(spark, sf_dir),
        "ears_c1": fam.filter(F.col("variant") == "c1"),
        "ears_c3": fam.filter(F.col("variant") == "c3"),
        "ewma": query_outbreak_ewma(spark, sf_dir),
        "farrington": query_outbreak_farrington(spark, sf_dir),
        "histlimits": query_outbreak_histlimits(spark, sf_dir),
        "serfling": query_outbreak_serfling(spark, sf_dir),
    }
    norm = None
    for name, df in sorted(dets.items()):
        daycol = "day_s" if "day_s" in df.columns else "day"
        part = df.select(
            F.lit(name).alias("det"),
            "event_type",
            F.col(daycol).cast("string").alias("day"),
            F.col("alert").cast("boolean").alias("alert"),
        )
        norm = part if norm is None else norm.unionByName(part)
    norm = norm.localCheckpoint()
    a = norm.select(
        F.col("det").alias("det_a"),
        "event_type",
        "day",
        F.col("alert").alias("alert_a"),
    )
    b = norm.select(
        F.col("det").alias("det_b"),
        "event_type",
        "day",
        F.col("alert").alias("alert_b"),
    )
    pairs = a.join(b, ["event_type", "day"]).filter(
        F.col("det_a") < F.col("det_b")
    )
    agg = pairs.groupBy("det_a", "det_b").agg(
        F.count("*").cast("bigint").alias("n_scored_both"),
        F.sum(F.col("alert_a").cast("int")).cast("bigint").alias("n_alert_a"),
        F.sum(F.col("alert_b").cast("int")).cast("bigint").alias("n_alert_b"),
        F.sum((F.col("alert_a") & F.col("alert_b")).cast("int"))
        .cast("bigint")
        .alias("n_alert_both"),
    )
    union_n = (
        F.col("n_alert_a") + F.col("n_alert_b") - F.col("n_alert_both")
    )
    return agg.select(
        "det_a",
        "det_b",
        "n_scored_both",
        "n_alert_a",
        "n_alert_b",
        "n_alert_both",
        dround(
            F.when(union_n == 0, F.lit(1.0)).otherwise(
                F.col("n_alert_both").cast("double") / union_n
            ),
            4,
        ).alias("jaccard"),
        dround(
            (
                F.col("n_scored_both")
                - F.col("n_alert_a")
                - F.col("n_alert_b")
                + 2 * F.col("n_alert_both")
            ).cast("double")
            / F.col("n_scored_both"),
            4,
        ).alias("pct_agree"),
    ).orderBy("det_a", "det_b")
