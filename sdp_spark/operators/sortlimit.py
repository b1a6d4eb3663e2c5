"""Sort, limit, top-k — SURVEY.md §2.6.

Reference semantics: ORDER BY (NULLs first on ASC — MySQL default),
LIMIT/OFFSET, and the ORDER BY + LIMIT top-k shortcut of MySQL 5.6.

Scale notes: `orderBy(...).limit(k)` plans as TakeOrderedAndProject — each
partition keeps a k-heap, driver merges k×partitions rows; no global sort.
LIMIT/OFFSET carries a fully deterministic ORDER BY (unique key tiebreaker)
so results are stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.6 sort/limit/topk"


@register(
    "sort_multikey",
    oracle="""
    SELECT c_custkey, c_nationkey, c_mktsegment, ROUND(c_acctbal, 2) AS bal
    FROM customer
    ORDER BY c_nationkey ASC NULLS FIRST, bal DESC, c_custkey ASC
    """,
    section=_SEC,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit NULL placement (MySQL sorts NULLs
    first ASC; Spark's default matches but we pin it explicitly)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", "c_nationkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    ).orderBy(
        F.col("c_nationkey").asc_nulls_first(), F.col("bal").desc(), F.col("c_custkey").asc()
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 20
    """,
    section=_SEC,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(50)
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    section=_SEC,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition heap, no full
    sort). The unique o_orderkey tiebreaker makes the result deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "limit_found_rows",
    oracle="""
    SELECT p.o_orderkey, p.o_totalprice, t.found_rows
    FROM (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderstatus = 'O'
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 20 OFFSET 40
    ) p
    CROSS JOIN (
      SELECT COUNT(*) AS found_rows FROM orders WHERE o_orderstatus = 'O'
    ) t
    """,
    section=_SEC,
)
def limit_found_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL 5.6 ``SELECT SQL_CALC_FOUND_ROWS ... LIMIT`` + ``FOUND_ROWS()``
    pagination idiom ([ENGINE]): one page of results plus the total
    matching-row count the LIMIT suppressed, here returned as a column of
    the page (the two-statement protocol collapsed into one relation).

    Plan: the page is TakeOrderedAndProject over the filtered scan (per-
    partition heap, offset+limit merged on the driver); the total is a
    1-row partial-count aggregate CROSS-JOINed via broadcast — the fact
    table is scanned, never globally sorted, and the count reuses the same
    pushed-down filter. MySQL's SQL_CALC_FOUND_ROWS forces the server to
    walk the full result; this shape gets the same answer from a partial
    aggregate instead."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    page = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(40)
        .limit(20)
    )
    total = o.agg(F.count("*").alias("found_rows"))
    return page.crossJoin(F.broadcast(total))
