"""Aggregation — SURVEY.md §2.4 (+ the flagship pricing-summary query).

Reference semantics: GROUP BY / HAVING / aggregate functions of the deployed
MySQL 5.6 engine (mysql-persistent-template.json:68), incl. GROUP_CONCAT and
WITH ROLLUP; CUBE/GROUPING SETS are the Spark-native superset (MySQL gap).

Scale notes: all groupBys here run as partial (map-side) + final hash
aggregate — shuffle carries only group keys × partial states, not rows.
Low-cardinality keys (returnflag×linestatus = 6 groups) make the shuffle
negligible at any scale; approx_count_distinct replaces exact distinct
count where a 100 TB exact count would need a full shuffle of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
from sdp_spark.sources.fixtures import table, wide_table

_SEC = "2.4 aggregation"


@register(
    "agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity', 2)} AS avg_qty,
           {sql_davg('l_extendedprice', 2)} AS avg_price,
           {sql_davg('l_discount', 4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    section=_SEC,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (TPC-H Q1 shape): scan→filter→hash-agg→(sort at caller).

    This is also the ``entry()`` smoke query. The shipdate predicate pushes
    to parquet row groups; 6 output groups mean the final shuffle is bytes.

    r14: reads through ``wide_table`` — the fixture file is ONE row group,
    so the scan is a single split and the six DECIMAL(30,8) partial sums
    (the double→decimal cast is ~5x the cost of everything else, measured)
    ran serialized on one core. The guard's narrow repartition buys
    full-width partial aggregation (2.36 → 1.49 s best-of-3 at sf0.1); on a
    real multi-split scan it is a no-op by construction, so the 100 TB plan
    shape (scan → map-side partial agg → 6-group exchange) is unchanged.
    """
    l = wide_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_discount', 6)} AS avg_disc,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
    section=_SEC,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_discount", 6).alias("avg_disc"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_cust, {sql_davg('c_acctbal', 2)} AS avg_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 3 AND SUM(CAST(c_acctbal AS DECIMAL(30,8))) > 0
    """,
    section=_SEC,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING filters on the exact DECIMAL sum (order-independent and
    boundary-safe), not the rounded projection — a group averaging 0.004
    must still pass AVG > 0, and a group summing to ±1 ulp of zero must not
    flip between engines."""
    c = table(spark, sf_dir, "customer")
    from sdp_spark.functions.num import DEC

    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            davg("c_acctbal", 2).alias("avg_bal"),
            F.sum(F.col("c_acctbal").cast(DEC)).alias("_dec_sum"),
        )
        .filter((F.col("n_cust") > 3) & (F.col("_dec_sum") > 0))
        .drop("_dec_sum")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders
    GROUP BY o_orderstatus
    """,
    section=_SEC,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


@register("agg_approx_distinct", oracle=None, section=_SEC)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path where exact
    COUNT(DISTINCT) would shuffle every key. rsd=0.01 keeps the sketch small
    enough to merge map-side. Accuracy asserted in tests vs exact count."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_custs")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_POP(l_quantity), 4) AS std_pop_qty,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_samp_qty,
           ROUND(VAR_POP(l_extendedprice), 2) AS var_pop_price,
           ROUND(VAR_SAMP(l_extendedprice), 2) AS var_samp_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section=_SEC,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 4).alias("std_pop_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_samp_qty"),
        F.round(F.var_pop("l_extendedprice"), 2).alias("var_pop_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_samp_price"),
    )


@register(
    "agg_group_concat",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    section=_SEC,
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT(x ORDER BY x SEPARATOR ',') — MySQL idiom; Spark-side the
    deterministic form is collect_list → array_sort → array_join (collect
    order is partition-dependent, sorting restores determinism)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@register(
    "agg_bool_bit",
    oracle="""
    SELECT o_orderstatus,
           CAST(BIT_AND(o_orderkey % 256) AS BIGINT) AS band,
           CAST(BIT_OR(o_orderkey % 256) AS BIGINT) AS bor,
           CAST(MAX(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS any_big,
           CAST(MIN(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS all_pos
    FROM orders
    GROUP BY o_orderstatus
    """,
    section=_SEC,
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and(F.col("o_orderkey") % 256).cast("bigint").alias("band"),
        F.bit_or(F.col("o_orderkey") % 256).cast("bigint").alias("bor"),
        F.max(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).cast("bigint").alias("any_big"),
        F.min(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).cast("bigint").alias("all_pos"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(GROUPING(r.r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation,
           COUNT(*) AS n_rows
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    section=_SEC,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH ROLLUP (MySQL 5.6 native; grand-total + per-level
    subtotals)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
           CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nat,
           COUNT(*) AS n_cust,
           {sql_dsum('c_acctbal')} AS sum_bal
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
    section=_SEC,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — MySQL 5.6 gap (no CUBE/GROUPING SETS); Spark-native superset."""
    c = table(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.grouping("c_mktsegment").cast("int").alias("g_seg"),
        F.grouping("c_nationkey").cast("int").alias("g_nat"),
        F.count("*").alias("n_cust"),
        dsum("c_acctbal").alias("sum_bal"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
    section=_SEC,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — MySQL idiom is manual CASE aggregation; Spark has first-class
    pivot. Explicit value list avoids the extra distinct-values job."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
           ROUND(median(l_quantity), 4)              AS med,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section=_SEC,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (MySQL idiom: self-join/variables; a
    Spark-native superset). Interpolations of 2dp inputs are <= 3dp-exact,
    so ROUND(.,4) is an identity on both engines — no boundary risk. At
    100 TB swap for approx_percentile (t-digest sketch, map-side merge)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25"),
        F.round(F.median("l_quantity"), 4).alias("med"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
           CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nat,
           COUNT(*) AS n_cust
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    section=_SEC,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-segment,
    per-nation, and grand total in one pass — MySQL gap, Spark SQL native."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
               CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
               COUNT(*) AS n_cust
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@register("agg_approx_percentile", oracle=None, section=_SEC)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, accuracy 1/10000) — the
    100 TB twin of agg_percentile: mergeable per-partition sketches instead
    of a global sort. rows-only oracle; tests bound the error vs the exact
    quantiles. Quantiles come out as scalar q25/q50/q75 columns (the driver's
    row hasher cannot hash array cells — VERDICT r3 What's-wrong #1)."""
    l = table(spark, sf_dir, "lineitem")
    q = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias("approx_q"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), 10000).alias("approx_p90"),
    )
    return q.select(
        "l_returnflag",
        F.element_at("approx_q", 1).alias("q25"),
        F.element_at("approx_q", 2).alias("q50"),
        F.element_at("approx_q", 3).alias("q75"),
        "approx_p90",
    )


@register(
    "agg_corr",
    oracle="""
    SELECT o_orderstatus,
           ROUND(corr(o_totalprice, o_custkey), 6)      AS price_cust_corr,
           ROUND(covar_pop(o_totalprice, o_custkey), 2) AS cov_pop,
           ROUND(covar_samp(o_totalprice, o_custkey), 2) AS cov_samp
    FROM orders
    GROUP BY o_orderstatus
    """,
    section=_SEC,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (CORR / COVAR) — generic irrational values, so
    plain ROUND is boundary-safe (unlike money sums, functions/num.py)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
        F.round(F.covar_pop("o_totalprice", "o_custkey"), 2).alias("cov_pop"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("cov_samp"),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey,
                 CAST(p_retailprice AS DOUBLE) AS retailprice,
                 CAST(p_size AS DOUBLE)        AS size
          FROM part)
    UNPIVOT (value FOR metric IN (retailprice, size))
    """,
    section=_SEC,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide→long reshaping (the inverse of agg_pivot; the
    feature-table→(entity, metric, value) triple shape ML pipelines feed
    from). Codegen Expand node: rows×metrics emitted in one pass, no
    shuffle, no Python."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot("p_partkey", ["retailprice", "size"], "metric", "value")


@register("agg_sketch_rollup", oracle=None, section=_SEC)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark 3.5+): per-group sketches are aggregated once, then MERGED
    (hll_union_agg) into the grand total WITHOUT re-touching the base
    table — the 100 TB pattern for distinct counting across rollup levels
    (per-partition sketches union associatively; exact COUNT(DISTINCT)
    would re-shuffle raw keys per level). rows-only oracle: estimates are
    sketch-parameter-dependent; tests pin the estimate within HLL error
    bounds of the exact count. Output: one row per l_returnflag plus an
    'ALL' row whose estimate comes purely from merging the group sketches."""
    l = table(spark, sf_dir, "lineitem")
    per_group = l.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", 14).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    groups = per_group.select(
        "l_returnflag",
        "n_rows",
        F.hll_sketch_estimate("sk").alias("est_distinct_orders"),
    )
    total = per_group.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_rows").alias("n_rows")
    ).select(
        F.lit("ALL").alias("l_returnflag"),
        "n_rows",
        F.hll_sketch_estimate("sk").alias("est_distinct_orders"),
    )
    return groups.unionByName(total)


@register(
    "agg_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_users
    UNION ALL
    SELECT 'view>click', (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
    UNION ALL
    SELECT 'view>click>purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
    """,
    section=_SEC,
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click → purchase): per user, the first
    view, the first click strictly after it, the first purchase strictly
    after that — then the per-stage user counts a conversion report needs.
    The self-join-on-user_id emulation MySQL 5.6 users write by hand,
    expressed as three co-keyed aggregates: every join and groupBy shuffles
    on user_id, so at 100 TB the stages are ONE co-partitioned lineage
    (Catalyst reuses the exchange) and no stage ever re-keys the event log.
    Funnel windows (stage k within N minutes of stage k-1) are the same
    plan with a range predicate on the join."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # r14 (guide §1.2): v and c each feed TWO consumers (the next stage's
    # join and their own stage count), and every reference used to re-run
    # the filtered events scan + per-user agg behind it — ~6 event scans
    # for a 3-stage funnel. Lazy checkpoints on the |users|-sized stage
    # frames cut that to one scan per stage.
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def _stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.lit(name).alias("stage"), F.count("*").alias("n_users"))

    return (
        _stage(v, "view")
        .unionByName(_stage(c, "view>click"))
        .unionByName(_stage(p, "view>click>purchase"))
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
                        FILTER (WHERE o_totalprice > 100000), 2)
                AS DOUBLE) AS big_total,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           CAST(COUNT(*) AS BIGINT) AS n_all
    FROM orders
    GROUP BY o_orderstatus
    """,
    section=_SEC,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered (conditional) aggregation — SQL's `agg FILTER (WHERE ...)`
    clause / MySQL's COUNT(IF(...)) idiom: several differently-predicated
    aggregates in ONE pass over the table, instead of N filtered scans.
    Map-side partial aggregation applies each predicate per-row before
    anything shuffles — at 100 TB this is the difference between one scan
    and four."""
    o = table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(big, 1)).alias("n_big"),
        F.round(F.sum(F.when(big, F.col("o_totalprice")).cast(DEC)), 2)
        .cast("double")
        .alias("big_total"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.count("*").alias("n_all"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                       ORDER BY n DESC, o_orderpriority) AS rn
          FROM counts) t
    WHERE rn = 1
    """,
    section=_SEC,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group (most frequent value) — the GROUP BY + ORDER BY count
    idiom MySQL users run for "most common X per Y". Implemented as
    count-then-rank rather than F.mode because mode's tie-breaking is
    engine-defined; row_number over (count DESC, value ASC) pins a
    deterministic winner on BOTH engines. Two shuffles (count keys, then
    the tiny per-group rank) but the second input is |statuses x priorities|
    rows — metadata-scale at any corpus size."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderstatus").orderBy(F.col("n").desc(), F.col("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


@register(
    "agg_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_disc(l_quantity, 0.25), 2) AS q25_disc,
           ROUND(quantile_disc(l_quantity, 0.50), 2) AS med_disc,
           ROUND(quantile_disc(l_quantity, 0.75), 2) AS q75_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section=_SEC,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (PERCENTILE_DISC WITHIN GROUP): the returned
    value is an ACTUAL data value (smallest with cume_dist >= p), not an
    interpolation — the variant auditors want when the answer must be a
    real observed measurement. Spark SQL's WITHIN GROUP syntax; DuckDB's
    quantile_disc implements the same definition, so plain ROUND is safe
    (both sides return exact input values)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pdisc")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity), 2) AS q25_disc,
               ROUND(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY l_quantity), 2) AS med_disc,
               ROUND(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY l_quantity), 2) AS q75_disc
        FROM li_pdisc
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_ohlc_resample",
    oracle=f"""
    WITH d AS (
      SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             ts, event_id, value
      FROM events
    ), r AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM d
    )
    SELECT user_id, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS INTEGER) AS n_events,
           {sql_dsum('value')} AS vol
    FROM r GROUP BY 1, 2
    """,
    section=_SEC,
)
def agg_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars (open/high/low/close +
    volume) per user — the canonical resample the reference platform's
    surveillance-stream consumers run over event series. Spark-first:
    `min_by`/`max_by` (arg-min/arg-max aggregates) pick the first/last
    value per bar in ONE hash aggregate — no window, no self-join; the
    (ts, event_id) struct key makes ties deterministic. The oracle mirrors
    with row-number windows (portable arg-min).

    Plan: single partial+final aggregate (SortAggregate — struct-keyed
    min_by/max_by states aren't hash-aggregable, but the map-side combine
    still runs) shuffling only |users × days| group states; open/close/
    high/low are raw picked doubles (bit-identical cross-engine), volume
    is the DECIMAL dsum. At 100 TB this is the map-side-combine resample
    shape — per-bar state is O(1) and the shuffle carries bars, not
    events."""
    e = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .groupBy("user_id", "day")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").cast("int").alias("n_events"),
            dsum("value").alias("vol"),
        )
    )


@register("agg_approx_topk", oracle=None, section=_SEC)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters: `approx_top_k` (Spark 4's bounded-memory
    frequent-items sketch) over the corpus token stream — the sketch twin
    of the exact explode→count→TakeOrdered top-k (`llm_vocab_oov`'s vocab
    build), for the 100 TB case where even the count shuffle should carry
    a fixed-size sketch instead of the full key set. Mergeable partial
    sketches → one tiny final merge; memory is O(items_tracked), not
    O(distinct tokens).

    rows-only by design (sketch internals are engine-specific); pytest
    pins the invariant that matters: with capacity >> distinct(tokens) the
    sketch is EXACT — returned counts equal the exact counts and the set
    equals the exact top-k modulo count ties at the boundary."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    sk = tok.agg(F.expr("approx_top_k(token, 10, 100000)").alias("top"))
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("bigint").alias("n"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
    )


@register(
    "agg_regression",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dround('regr_slope(l_extendedprice, l_quantity)', 4)} AS slope,
           {sql_dround('regr_intercept(l_extendedprice, l_quantity)', 4)} AS intercept,
           {sql_dround('regr_r2(l_extendedprice, l_quantity)', 6)} AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section=_SEC,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (REGR_SLOPE / REGR_INTERCEPT /
    REGR_R2 / REGR_COUNT): price-vs-quantity fit per return flag — the
    SQL:2003 ordinary-least-squares aggregates (MySQL lacks them; users
    assemble them from SUM/COUNT — this is the native superset, same
    stance as window functions). Both engines compute them as mergeable
    moment sketches (sum, sum², cross-sum), so the aggregation is
    partial+final like any SUM — one shuffle of 3-group moment states.
    Double moments differ in the last ulp across partition orders, so
    outputs are pinned at 4/6 decimals on both sides (the slope/r2 values
    are O(1e3)/O(1), far from the rounding grid's noise floor)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("_s"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("_i"),
            F.regr_r2("l_extendedprice", "l_quantity").alias("_r"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .select(
            "l_returnflag",
            dround(F.col("_s"), 4).alias("slope"),
            dround(F.col("_i"), 4).alias("intercept"),
            dround(F.col("_r"), 6).alias("r2"),
            "n",
        )
    )


@register(
    "agg_observe_metrics",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_extendedprice')} AS total_price,
           CAST(COUNT(CASE WHEN l_discount > 0.08 THEN 1 END) AS BIGINT)
             AS n_deep_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    section=_SEC,
)
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed metrics (df.observe + Observation) — data-quality
    counters that piggyback on a query's ONE pass instead of a second
    audit scan: the accumulator-backed metrics are collected while the
    main query streams to its sink (here a noop write standing in for a
    real export), costing zero extra reads at any scale. This is the
    lakehouse replacement for the row-count/warning counters a MySQL
    5.6 client reads after LOAD DATA INFILE. The metrics row itself is
    the certified output; the oracle recomputes it with a plain
    aggregate."""
    from pyspark.sql import Observation

    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    obs = Observation()
    observed = l.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.count(F.when(F.col("l_discount") > 0.08, 1)).alias("n_deep_discount"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_price"], m["n_deep_discount"])],
        "n_rows bigint, total_price double, n_deep_discount bigint",
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    section=_SEC,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (bitmap_bucket_number /
    bitmap_construct_agg / bitmap_count, Spark 4) — the OLAP technique
    for distinct-count at 100 TB when COUNT(DISTINCT)'s expand+shuffle
    of raw keys is the bottleneck: keys fold into fixed 4 KB bucket
    bitmaps DURING the partial aggregate, so the exchange carries
    (group, bucket, bitmap) — bounded by bucket count, not by row count
    — and bitmaps OR-merge associatively (the same property that makes
    them materializable into a rollup cube; agg_sketch_rollup is the
    approximate cousin). The result is EXACT, so the oracle is plain
    COUNT(DISTINCT)."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               SUM(bitmap_count(b)) AS n_customers
        FROM (
          SELECT o_orderpriority,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS b
          FROM orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


_HIST_NBINS = 20


@register(
    "agg_histogram_equiwidth",
    oracle=f"""
    WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders),
    binned AS (
      SELECT o_totalprice, mn, mx, (mx - mn) / {_HIST_NBINS}.0 AS w,
             CAST(CASE WHEN mn = mx THEN 0
                  ELSE LEAST(CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / {_HIST_NBINS}.0)) AS INTEGER),
                             {_HIST_NBINS - 1}) END AS INTEGER) AS bin
      FROM orders, mm
    )
    SELECT bin,
           {sql_dround("mn + bin * w", 2)} AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned
    GROUP BY bin, bin_lo ORDER BY bin
    """,
    section=_SEC,
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice ({_HIST_NBINS} bins over the
    observed [min, max]) — the profile every BI layer and every query
    optimizer's column statistics build; MySQL 5.6 users emulate it with a
    CASE ladder, here it is two aggregate passes. The max lands in the
    last bin (LEAST clamp), matching the closed upper bound convention.

    Plan: pass 1 is a 2-double global agg; its 1-row result broadcasts
    into the binning expression so pass 2 is a map-side FLOOR + one
    partial-agg shuffle of ≤ {_HIST_NBINS} groups. The bin expression is
    identical IEEE arithmetic on identical doubles in both engines, so
    bin assignment is exact cross-engine even at boundaries. At 100 TB
    both passes stream; the only state is the bin table."""
    o = table(spark, sf_dir, "orders").select("o_totalprice")
    mm = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(_HIST_NBINS))
    # a constant column gives width 0 and (x-mn)/0 = NaN — the degenerate
    # input a profiling histogram must tolerate, not crash on: one bin
    bin_ = F.when(F.col("mn") == F.col("mx"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / width).cast("int"),
            F.lit(_HIST_NBINS - 1),
        )
    )
    return (
        o.crossJoin(F.broadcast(mm))
        .select(
            bin_.alias("bin"),
            dround(F.col("mn") + bin_ * width, 2).alias("bin_lo"),
        )
        .groupBy("bin", "bin_lo")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("bin")
    )


@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, SUM(c) AS n FROM c GROUP BY 1
    )
    SELECT c.user_id,
      FLOOR((-SUM((c.c / t.n) * LN(c.c / t.n) / LN(2.0))) * 1000000 + 0.5)
        / 1000000 AS entropy_bits,
      CAST(COUNT(*) AS INTEGER) AS n_types
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id
    """,
    section=_SEC,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each user's event-type distribution — the
    behavioural-diversity / anomaly feature (a bot hammering one endpoint
    scores ~0; a uniform browser scores log2(k)). Two-level aggregation:
    exact (user, type) counts, per-user totals, then −Σ p·log2 p.

    Determinism note: p = c/n is a quotient of exact integer-derived
    doubles, identical in both engines; LN on identical doubles is
    correctly rounded on both runtimes, and the few-term sum is floored at
    6 dp — verified exact-hash at all three fixture scales. The entropy
    SUM itself has ≤ |event_type| terms per user (single-digit), so
    association order can't accumulate drift.

    Plan: both aggs key on user_id, so ONE shuffle serves the pair (the
    second agg and the join reuse the first's hash partitioning —
    Catalyst elides the extra exchanges); the log/divide arithmetic is
    map-side codegen. At 100 TB: counts partial-aggregate map-side, and
    per-user state is the type histogram, k-bounded."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("double").alias("c")
    )
    t = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            dround(-F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6).alias(
                "entropy_bits"
            ),
            F.count("*").cast("int").alias("n_types"),
        )
    )


@register(
    "agg_weighted_percentile",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_quantity,
        SUM(CAST(l_extendedprice AS DECIMAL(30,8)))
          OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cumw,
        SUM(CAST(l_extendedprice AS DECIMAL(30,8)))
          OVER (PARTITION BY l_returnflag) AS totw
      FROM lineitem
    )
    SELECT l_returnflag, MIN(l_quantity) AS w_median
    FROM w WHERE cumw * 2 >= totw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    section=_SEC,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest l_quantity at which the cumulative
    l_extendedprice weight reaches half the group's total — "the quantity
    below which half the revenue sits", the revenue-weighted center every
    pricing analysis wants where an unweighted median misleads. Neither
    engine has a weighted PERCENTILE_*, so it lowers to the definition:
    a RANGE-framed cumulative DECIMAL sum (default frame includes ORDER
    BY peers, making ties deterministic in both engines — the selected
    value is the whole tie-run's), the partition total from the same
    window spec, and MIN over the qualifying rows. Weights sum in DECIMAL
    so the crossing point is exact, never a float-order artifact.

    Plan: ONE l_returnflag shuffle + sort serves both window functions
    (same partitioning, the frame difference is evaluation-only), then a
    map-side filter and a tiny final agg. Per-group window state is the
    running decimal — constant memory at 100 TB."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    wdec = F.col("l_extendedprice").cast("decimal(30,8)")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    # collapse to per-(group, value) weight partials FIRST: the RANGE frame
    # sums whole tie-runs anyway, so cumulating the collapsed partials is
    # value-identical — and the window sort now runs over |distinct values|
    # rows (≤50/group here) instead of every lineitem row. At 100 TB this
    # is the difference between sorting the fact table and sorting its
    # value histogram; the heavy pass is a map-combined hash aggregate.
    wv = li.groupBy("l_returnflag", "l_quantity").agg(F.sum(wdec).alias("w"))
    w = wv.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(cum).alias("cumw"),
        F.sum("w").over(tot).alias("totw"),
    )
    return (
        w.filter(F.col("cumw") * 2 >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("w_median"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
             AS DOUBLE) AS s2,
        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
             AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      FLOOR(((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
             / ((s2/n - (s1/n)*(s1/n)) * SQRT(s2/n - (s1/n)*(s1/n))))
            * 1000000 + 0.5) / 1000000 AS skewness,
      FLOOR(((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
              - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3)
            * 1000000 + 0.5) / 1000000 AS kurtosis_excess
    FROM m ORDER BY l_returnflag
    """,
    section=_SEC,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness (g1) and excess kurtosis (g2) per group,
    lowered to raw power sums — NOT the built-in skewness()/kurtosis()
    (Spark and DuckDB disagree on bias correction, so the built-ins can
    never hash-match). l_quantity is integral, so Σx..Σx⁴ accumulate as
    exact BIGINTs (x⁴ ≤ 6.25e6 — no overflow until ~10^6 TB of rows per
    group) and every engine sees identical doubles; the one fractional
    power is m2·√m2 rather than pow(m2, 1.5) because SQRT is
    IEEE-correctly-rounded while pow carries no such guarantee.

    Plan: a single partial+final hash agg carrying 5 integer partials per
    group — the cheapest possible shape (same class as agg_stats), and
    the textbook sketch-mergeable moment aggregation that scales to any
    partition count without a second pass."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("x")
    )
    x = F.col("x")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.sum(x * x * x).cast("double").alias("s3"),
        F.sum(x * x * x * x).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m1 = s1 / n
    m2 = s2 / n - m1 * m1
    skew = (s3 / n - 3 * m1 * (s2 / n) + 2 * m1 * m1 * m1) / (m2 * F.sqrt(m2))
    kurt = (
        s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n) - 3 * m1 * m1 * m1 * m1
    ) / (m2 * m2) - 3
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        dround(skew, 6).alias("skewness"),
        dround(kurt, 6).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


@register(
    "agg_gini",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS revenue
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    ), ranked AS (
      SELECT c_nationkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY revenue, c_custkey) AS i
      FROM spend
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           FLOOR((2.0 * SUM(i * CAST(revenue AS DECIMAL(30,8)))
                    / (COUNT(*) * SUM(CAST(revenue AS DECIMAL(30,8))))
                  - (COUNT(*) + 1.0) / COUNT(*)) * 1000000 + 0.5) / 1000000 AS gini
    FROM ranked
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    section=_SEC,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of customer revenue per nation — the
    canonical inequality statistic for data-distribution audits (is 1% of
    customers 90% of revenue? is one domain dominating a training mix?).
    Rank-sum identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues ranked
    ascending; ties break on custkey so the rank (and thus G) is
    deterministic and engine-independent. Sums run in DECIMAL (exact,
    order-free), the single final division is double + dround(6).

    Scale shape: one partial-agg exchange for per-customer spend, one
    hash-partition window per nation (each nation sorts independently —
    no global sort), one partial-agg reduce. The per-nation sort is the
    inherent cost of any rank statistic; at 100 TB nations are the
    natural parallel grain."""
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("revenue", "c_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            dround(
                2.0
                * F.sum(F.col("i") * F.col("revenue").cast(DEC)).cast("double")
                / (F.count("*") * F.sum(F.col("revenue").cast(DEC)).cast("double"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("c_nationkey")
    )
