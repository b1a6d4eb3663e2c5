"""Shared test fixtures: one SparkSession, a DuckDB connection per sf_dir,
and the Spark-vs-DuckDB comparison helper mirroring the driver's check
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdp_spark.session import get_spark
from sdp_spark.sources.fixtures import TABLES

SF_SMOKE = os.environ.get("SDP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdp_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _is_nan(x) -> bool:
    return isinstance(x, float) and math.isnan(x)


def _values_close(a, b) -> bool:
    """Exact compare, mirroring the driver's stringified value hash:
    NaN == NaN, NULL == NULL, but NaN != NULL, and floats are exact —
    the dsum/dround discipline is supposed to make them bit-identical."""
    if _is_nan(a) or _is_nan(b):
        return _is_nan(a) and _is_nan(b)
    if a is None or b is None:
        return a is None and b is None
    return a == b


def _sorted_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Project to name-sorted columns; sort rows by stringified tuple
    (order-insensitive, like the driver's hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    proj = [tuple(r[i] for i in order) for r in rows]
    proj.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], proj


def assert_df_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, key: str = "?"):
    # dtype check rides pandas (dtype alignment is part of the contract) —
    # but VALUES are compared from collect()/fetchall(), because toPandas()
    # and .df() both collapse NULL doubles to NaN and would mask exactly the
    # NaN-vs-NULL divergences the driver's exact hash catches.
    # The oracle query itself runs ONCE (materialized to a temp table); the
    # .df() dtype read and fetchall() value read are then trivial rescans.
    sp = spark_df.toPandas()
    con.execute(f"CREATE OR REPLACE TEMP TABLE _oracle_result AS {sql}")
    sql = "SELECT * FROM _oracle_result"
    du = con.execute(sql).df()
    assert len(sp) == len(du), f"[{key}] row count: spark={len(sp)} duckdb={len(du)}"
    assert sorted(sp.columns) == sorted(du.columns), (
        f"[{key}] columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    dt_mism = [
        (c, str(sp[c].dtype), str(du[c].dtype))
        for c in sp.columns
        if str(sp[c].dtype) != str(du[c].dtype)
    ]
    assert not dt_mism, f"[{key}] dtype mismatches (spark vs duckdb): {dt_mism}"
    sp_rows = [tuple(r) for r in spark_df.collect()]
    du_rows = con.execute(sql).fetchall()
    cols, sp_n = _sorted_rows(list(spark_df.columns), sp_rows)
    _, du_n = _sorted_rows([d[0] for d in con.execute(sql).description], du_rows)
    for ci, col in enumerate(cols):
        mism = [
            (i, a[ci], b[ci])
            for i, (a, b) in enumerate(zip(sp_n, du_n))
            if not _values_close(a[ci], b[ci])
        ]
        assert not mism, f"[{key}] column {col!r}: first mismatches {mism[:5]}"
