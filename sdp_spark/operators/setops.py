"""Set operations — SURVEY.md §2.7.

Reference semantics: UNION [ALL] (MySQL 5.6 native); INTERSECT/EXCEPT are
engine gaps (MariaDB 10.3+) provided natively by Spark as the superset.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions; the
deduplicating variants shuffle on all columns (hash-distinct) — at 100 TB
prefer UNION ALL + downstream dedup on a key where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.7 set ops"


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, min multiplicity per value)."""
    return _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))


@register(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section=_SEC,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, multiplicity subtraction)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))
