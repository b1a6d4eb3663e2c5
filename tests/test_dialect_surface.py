"""Surface-level MySQL-dialect re-proof of the §2.2-2.9 relational core
(VERDICT r6 #7): each case is a CORE operator's semantics REWRITTEN as the
5.6 query a reference client would actually type — backticks, `REGEXP`,
`LIMIT offset,count`, `GROUP_CONCAT(... ORDER BY ...)`, function-form
`DATE_ADD`, `#` comments, `SUBSTRING_INDEX`, InnoDB CTAS options — routed
through ``sql_mysql`` and compared row-for-row (values AND schema) against
the registry operator's native DataFrame-path output. This closes the gap
between "each rewrite rule is unit-tested" (test_dialect.py) and "the
translated surface computes what the engine computes" for the §2 core.
"""

from __future__ import annotations

import pytest

from sdp_spark.dialect import sql_mysql
from sdp_spark.plans.registry import load_all

REGISTRY = load_all()

# key -> the same query in MySQL 5.6 idiom (deliberately using the dialect
# features the shim exists for; aliases match the operator's output columns)
MYSQL_VARIANTS = {
    "filter_like": """
        SELECT `p_partkey`, `p_name`, `p_brand`
        FROM `part`   # LIKE semantics are shared; backticks + comment are 5.6
        WHERE `p_name` LIKE '%a%' AND `p_brand` LIKE 'Brand#1_'
    """,
    "filter_regexp": """
        SELECT p_partkey, p_type, p_brand
        FROM part
        WHERE p_type REGEXP '^(STANDARD|SM.LL)$'
          AND p_brand REGEXP '#[0-9]*[13579]$'
    """,
    "filter_between": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM `lineitem`
        WHERE l_extendedprice BETWEEN 20000 AND 30000
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
    "project_case": """
        SELECT `o_orderkey`,
               CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS size_bucket,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_coalesced,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
        FROM orders
    """,
    "agg_group_concat": """
        SELECT r.`r_name`,
               GROUP_CONCAT(n.n_name ORDER BY n.n_name SEPARATOR ',') AS nations
        FROM `nation` n STRAIGHT_JOIN `region` r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "limit_offset": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20, 50   # MySQL offset,count form
    """,
    "subq_in_exists": """
        SELECT `c_custkey`, `c_name`
        FROM customer c
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    """,
    "cte_with": """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM `orders` WHERE o_totalprice > 200000
          GROUP BY o_custkey
        ),
        segments AS (
          SELECT c_custkey, c_mktsegment FROM `customer`
        )
        SELECT s.c_mktsegment, CAST(SUM(b.n_big) AS BIGINT) AS total_big_orders
        FROM big_orders b JOIN segments s ON b.o_custkey = s.c_custkey
        GROUP BY s.c_mktsegment
    """,
    "join_inner": """
        SELECT o.`o_orderkey`, o.o_orderdate IS NOT NULL AS has_date,
               c.`c_name`, c.c_mktsegment
        FROM orders o STRAIGHT_JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
}


@pytest.mark.parametrize("key", sorted(MYSQL_VARIANTS))
def test_mysql_surface_equals_dataframe_path(spark, sf_dir, key):
    native = REGISTRY[key].fn(spark, sf_dir)
    shimmed = sql_mysql(spark, sf_dir, MYSQL_VARIANTS[key])
    assert [f.name for f in shimmed.schema.fields] == [
        f.name for f in native.schema.fields
    ], "column names must match the operator's contract"
    n_rows = sorted(map(tuple, (map(str, r) for r in native.collect())))
    s_rows = sorted(map(tuple, (map(str, r) for r in shimmed.collect())))
    assert s_rows == n_rows
