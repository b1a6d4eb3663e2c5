"""Subqueries & CTEs — SURVEY.md §2.9.

Reference semantics: MySQL 5.6 scalar/IN/EXISTS subqueries and derived
tables (5.6 materializes; MariaDB 10.1 adds semijoin strategies). CTEs are
an engine gap (MariaDB 10.2+/MySQL 8+) provided natively by Spark.

These run through ``spark.sql`` over the registered fixture views — the
surface that mirrors the reference's port-3306 SQL sessions. Catalyst's
RewritePredicateSubquery / DecorrelateInnerQuery turn the correlated forms
into semi/anti/left joins (SURVEY.md §4) — no manual decorrelation needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import load_tables

_SEC = "2.9 subqueries"


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(query)


_SCALAR = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
"""


@register("subq_scalar", oracle=_SCALAR, section=_SEC)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE (planned as a broadcast of the
    single-row aggregate — no per-row re-execution)."""
    return _sql(spark, sf_dir, _SCALAR)


_IN_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
"""


@register("subq_in_exists", oracle=_IN_EXISTS, section=_SEC)
def subq_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated) + EXISTS (correlated) → two stacked semi joins."""
    return _sql(spark, sf_dir, _IN_EXISTS)


_DERIVED = """
SELECT t.c_nationkey, t.n_cust,
       FLOOR(CAST(t.total_bal AS DOUBLE) / t.n_cust * 100 + 0.5) / 100 AS avg_bal
FROM (SELECT c_nationkey, COUNT(*) AS n_cust,
             SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS total_bal
      FROM customer GROUP BY c_nationkey) t
WHERE t.n_cust >= 2
"""


@register("subq_derived", oracle=_DERIVED, section=_SEC)
def subq_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _DERIVED)


_CTE = """
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big
  FROM orders WHERE o_totalprice > 200000
  GROUP BY o_custkey
),
segments AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT s.c_mktsegment, CAST(SUM(b.n_big) AS BIGINT) AS total_big_orders
FROM big_orders b JOIN segments s ON b.o_custkey = s.c_custkey
GROUP BY s.c_mktsegment
"""


@register("cte_with", oracle=_CTE, section=_SEC)
def cte_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ... AS — engine gap (MySQL 8+/MariaDB 10.2+); native in Spark."""
    return _sql(spark, sf_dir, _CTE)


_LATERAL = """
SELECT c.c_custkey, t.okey, ROUND(t.price, 2) AS price
FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 20) c,
LATERAL (SELECT o_orderkey AS okey, o_totalprice AS price
         FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 2) t
"""


@register("subq_lateral", oracle=_LATERAL, section=_SEC)
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    orders per customer) — MariaDB 10.1 lacks LATERAL; Spark decorrelates
    it into a ranked window join."""
    return _sql(spark, sf_dir, _LATERAL)


_NOT_IN_NULL = """
SELECT
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                                            ELSE o_custkey END
                                FROM orders)) AS BIGINT) AS n_not_in_with_null,
  CAST((SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus <> 'P')) AS BIGINT) AS n_not_exists,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus <> 'P'
                                  AND o_custkey IS NOT NULL)) AS BIGINT)
    AS n_not_in_filtered
"""


@register("subq_not_in_null", oracle=_NOT_IN_NULL, section=_SEC)
def subq_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued-logic semantics — the classic SQL trap the
    engine must reproduce EXACTLY: when the subquery result contains a
    NULL, `x NOT IN (...)` is never TRUE (every row is FALSE or UNKNOWN),
    so the first count is provably 0; the NOT EXISTS form and the
    null-filtered NOT IN form are the equivalent rewrites users actually
    want, and must agree with each other. One scorecard row pins all
    three against the oracle.

    Plan/scale note: Spark lowers the null-aware NOT IN to a
    BroadcastNestedLoopJoin (null-awareness defeats hashing — inherent to
    the semantics, not a planner miss), while NOT EXISTS lowers to a hash
    LEFT ANTI join. Same answer, wildly different cost at 100 TB: the
    rewrite demonstrated here IS the optimization."""
    return _sql(spark, sf_dir, _NOT_IN_NULL)


_CORR_SCALAR = """
SELECT o.o_orderkey,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
            AS BIGINT) AS n_heavy_lines
FROM orders o
WHERE o.o_orderpriority = '1-URGENT'
"""


@register("subq_correlated_scalar", oracle=_CORR_SCALAR, section=_SEC)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar aggregate subquery in the SELECT list — per outer
    row, an aggregate over matching inner rows (with the COUNT-on-empty=0
    edge the rewrite must preserve). MySQL 5.6 re-executes the inner query
    per row (index lookup); Catalyst's DecorrelateInnerQuery rewrites it
    to ONE aggregate-then-LEFT-OUTER-join plan — the decorrelation that
    turns O(outer × inner) into two scans and a hash join, which is the
    only shape that survives 100 TB. Cited plan property: no per-row
    subquery execution exists in the physical plan (single join, single
    aggregate)."""
    return _sql(spark, sf_dir, _CORR_SCALAR)


_ROW_CTOR = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_orderstatus, o_orderpriority) IN
      (('F', '1-URGENT'), ('O', '2-HIGH'), ('P', '5-LOW'))
"""


@register("filter_row_constructor", oracle=_ROW_CTOR, section=_SEC)
def filter_row_constructor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-constructor (tuple) IN predicate — `(a, b) IN ((..),(..))`,
    the multi-column membership syntax MySQL 5.6 supports and optimizers
    historically mishandled (5.6 couldn't use indexes on it; Catalyst
    folds it to an OR-of-ANDs / struct IN evaluated row-level in codegen,
    pushable to the scan). One map-side predicate, zero shuffles."""
    return _sql(spark, sf_dir, _ROW_CTOR)


_EXISTENCE = """
SELECT c_custkey, c_mktsegment,
       EXISTS(SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 250000) AS has_big_order
FROM customer c
"""


@register("join_existence", oracle=_EXISTENCE, section=_SEC)
def join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a PROJECTED boolean (not a filter) — every customer comes
    back with a has-big-order flag. This exercises Spark's fifth join
    type, ExistenceJoin (alongside inner/outer/semi/anti): a semi-join
    that keeps non-matching rows and emits the match bit as a column,
    planned as one hash join — MySQL 5.6 re-runs the EXISTS per row.
    Distinct from `subq_in_exists` (predicate position → LeftSemi) and
    `query_cust_order_counts` (outer join + count). The plan property
    (ExistenceJoin, no per-row subquery) is asserted in
    tests/test_plans.py."""
    return _sql(spark, sf_dir, _EXISTENCE)


_RECURSIVE = """
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey < 8
  UNION ALL
  SELECT c.c_custkey, ch.root, ch.depth + 1
  FROM customer c JOIN chain ch ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = ch.custkey
  WHERE c.c_custkey >= 8
)
SELECT root, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(depth) AS INT) AS max_depth
FROM chain
GROUP BY root
ORDER BY root
"""


@register("cte_recursive", oracle=_RECURSIVE, section=_SEC)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) — iterative hierarchy traversal inside
    one SQL statement, the capability MySQL added in 8.0 and 5.6 users
    emulate with session-variable tricks or stored-procedure loops. The
    fixture has no parent column, so the hierarchy is the implicit
    binary tree parent(k) = floor(k/2) over custkeys: seeds are the 8
    shallow keys, each recursion step joins the NEXT tree level; per
    root the query returns subtree size and height.

    Execution shape: Catalyst unrolls the recursion into iterative
    UnionLoop steps — each level is one distributed join of the frontier
    against the base table, the same per-iteration shape as the
    label-propagation loop in llm_dedup_near_resolve but driven by the
    SQL engine itself (frontier size is bounded by the level width;
    depth here is ~log2(N), so ~11 iterations at sf0.01). The DuckDB
    oracle runs the identical statement text — recursive CTEs are the
    one construct where both engines share syntax AND iteration
    semantics (UNION ALL = bag semantics, no cycle detection needed on
    a tree)."""
    return _sql(spark, sf_dir, _RECURSIVE)


@register(
    "subq_any_all",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > ALL (
      SELECT o_totalprice FROM orders
      WHERE o_orderpriority = '5-LOW' AND o_custkey % 100 = 7
        AND o_totalprice < 400000
    )
    AND o_totalprice < ANY (
      SELECT o_totalprice FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_custkey % 500 = 3
    )
    ORDER BY o_orderkey
    """,
    section=_SEC,
)
def subq_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL/ANSI quantified comparisons — `> ALL (subq)` / `< ANY
    (subq)` — which Spark SQL does not parse. The engine lowers them to
    their algebraic normal forms: x > ALL S ⟺ x > MAX(S) and
    x < ANY S ⟺ x < MAX(S), with the EMPTY-set edge handled explicitly:
    each MAX is coalesced to −∞, so x > ALL(∅) stays vacuously TRUE and
    x < ANY(∅) stays FALSE — without the coalesce an empty subset's NULL
    max would silently drop every row. (S is NULL-free here by
    construction; the NULL-bearing general case lowers to the
    NOT IN/EXISTS forms subq_not_in_null covers.) The oracle runs
    the NATIVE quantifiers in DuckDB, so the rewrite — including the
    empty edge — is certified against real ALL/ANY semantics, not
    against itself.

    Plan: each scalar MAX is a 1-row aggregate broadcast into the scan's
    filter — the quantified comparisons cost two tiny pre-aggregations
    and zero joins; at 100 TB both reduce map-side to one number."""
    from pyspark.sql import functions as F

    from sdp_spark.sources.fixtures import table

    o = table(spark, sf_dir, "orders")
    all_max = o.filter(
        (F.col("o_orderpriority") == "5-LOW")
        & (F.col("o_custkey") % 100 == 7)
        & (F.col("o_totalprice") < 400000)
    ).agg(F.max("o_totalprice").alias("all_max"))
    any_max = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_custkey") % 500 == 3)
    ).agg(F.max("o_totalprice").alias("any_max"))
    return (
        o.crossJoin(F.broadcast(all_max))
        .crossJoin(F.broadcast(any_max))
        .filter(
            (F.col("o_totalprice") > F.coalesce("all_max", F.lit(float("-inf"))))
            & (F.col("o_totalprice") < F.coalesce("any_max", F.lit(float("-inf"))))
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
