"""Differential fuzzing: Hypothesis generates small random tables (with
NULLs and adversarial values); the SAME SQL runs on Spark and DuckDB and
must agree. This is the sqllogictest-style randomized layer on top of the
fixture-based oracle suite (SURVEY.md §5.2 item 4) — it probes 3VL,
grouping with NULL keys, and set-op multiplicity semantics off the happy
path of the fixtures."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "B", "", " x", "ü"])),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ),
    min_size=0,
    max_size=25,
)

# Each template runs verbatim on both engines over view/table `t(k, s, g)`.
TEMPLATES = [
    "SELECT k, s, g FROM t WHERE k > 0 AND s IS NOT NULL",
    "SELECT k, s, g FROM t WHERE k IS NULL OR NOT (g = 1)",
    "SELECT g, COUNT(*) AS n, COUNT(k) AS nk, CAST(SUM(k) AS BIGINT) AS sk"
    " FROM t GROUP BY g",
    "SELECT DISTINCT s, g FROM t",
    "SELECT k FROM t WHERE k IN (1, 2, 3)",
    "SELECT s FROM t WHERE s LIKE '%x%' OR s = 'a'",
    "SELECT g, CAST(MIN(k) AS BIGINT) AS mn, CAST(MAX(k) AS BIGINT) AS mx"
    " FROM t WHERE s IS NOT NULL GROUP BY g HAVING COUNT(*) >= 1",
    "SELECT COALESCE(s, 'NULL!') AS s2, COUNT(*) AS n FROM t GROUP BY 1",
    "SELECT k, s, g FROM t WHERE g BETWEEN 1 AND 2",
    "SELECT CASE WHEN k > 0 THEN 'pos' WHEN k < 0 THEN 'neg' ELSE 'zero?' END AS b,"
    " COUNT(*) AS n FROM t GROUP BY 1",
    # NOT IN over a subquery that may contain NULL: the classic 3VL trap —
    # one NULL in the list empties the result on BOTH ANSI engines
    "SELECT k FROM t WHERE k NOT IN (SELECT g FROM t)",
    "SELECT k FROM t WHERE k NOT IN (SELECT g FROM t WHERE g IS NOT NULL)",
    "SELECT g, CAST(COUNT(DISTINCT s) AS BIGINT) AS nds FROM t GROUP BY g",
    "SELECT s, upper(s) AS u, CAST(length(s) AS BIGINT) AS ln FROM t",
]


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    vals = [tuple("∅" if pd.isna(v) else str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(vals)


@pytest.mark.parametrize("sql", TEMPLATES)
@given(rows=rows_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential_random_tables(spark, sql, rows):
    sdf = spark.createDataFrame(
        [tuple(r) for r in rows] or [(None, None, None)], "k int, s string, g int"
    )
    if not rows:
        sdf = sdf.limit(0)
    sdf.createOrReplaceTempView("t")
    sp = spark.sql(sql).toPandas()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, s VARCHAR, g INTEGER)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    du = con.execute(sql).df()
    con.close()

    assert _norm(sp) == _norm(du), f"engines disagree on: {sql}\nrows={rows}"


two_tables_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=0,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
            st.sampled_from(["p", "q", "r"]),
        ),
        min_size=0,
        max_size=15,
    ),
)

JOIN_TEMPLATES = [
    "SELECT a.k, a.v, b.w FROM t1 a JOIN t2 b ON a.k = b.k",
    "SELECT a.k, a.v, b.w FROM t1 a LEFT JOIN t2 b ON a.k = b.k",
    "SELECT a.k FROM t1 a WHERE EXISTS (SELECT 1 FROM t2 b WHERE b.k = a.k)",
    "SELECT a.k FROM t1 a WHERE NOT EXISTS (SELECT 1 FROM t2 b WHERE b.k = a.k)",
    "SELECT b.w, COUNT(*) AS n, CAST(SUM(a.v) AS BIGINT) AS sv"
    " FROM t1 a JOIN t2 b ON a.k = b.k GROUP BY b.w",
    "SELECT k, v, CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY v, k) AS INTEGER) AS rn"
    " FROM t1 WHERE k IS NOT NULL",
    "SELECT k, v, CAST(SUM(v) OVER (PARTITION BY k ORDER BY v"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs"
    " FROM t1 WHERE k IS NOT NULL",
    "SELECT k FROM t1 INTERSECT SELECT k FROM t2",
    "SELECT k FROM t1 EXCEPT SELECT k FROM t2",
    "SELECT k FROM t1 UNION ALL SELECT k FROM t2",
    "SELECT k, v, CAST(LAG(v) OVER (PARTITION BY k ORDER BY v, k) AS BIGINT) AS pv"
    " FROM t1 WHERE k IS NOT NULL",
    "SELECT a.k, CAST(COUNT(b.k) AS BIGINT) AS nb FROM t1 a"
    " LEFT JOIN t2 b ON a.k = b.k GROUP BY a.k",
]


@pytest.mark.parametrize("sql", JOIN_TEMPLATES)
@given(data=two_tables_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential_joins_windows(spark, sql, data):
    rows1, rows2 = data
    sdf1 = spark.createDataFrame(rows1 or [(None, None)], "k int, v int")
    sdf2 = spark.createDataFrame(rows2 or [(None, None)], "k int, w string")
    if not rows1:
        sdf1 = sdf1.limit(0)
    if not rows2:
        sdf2 = sdf2.limit(0)
    sdf1.createOrReplaceTempView("t1")
    sdf2.createOrReplaceTempView("t2")
    sp = spark.sql(sql).toPandas()

    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (k INTEGER, v INTEGER)")
    con.execute("CREATE TABLE t2 (k INTEGER, w VARCHAR)")
    if rows1:
        con.executemany("INSERT INTO t1 VALUES (?, ?)", rows1)
    if rows2:
        con.executemany("INSERT INTO t2 VALUES (?, ?)", rows2)
    du = con.execute(sql).df()
    con.close()

    assert _norm(sp) == _norm(du), f"engines disagree on: {sql}\nt1={rows1}\nt2={rows2}"
