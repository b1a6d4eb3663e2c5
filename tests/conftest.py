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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by stringified values (order-insensitive
    compare, like the driver's hash)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def _values_close(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def assert_df_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, key: str = "?"):
    sp = spark_df.toPandas()
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
    sp_n, du_n = _normalize(sp), _normalize(du)
    for col in sp_n.columns:
        sv, dv = sp_n[col].tolist(), du_n[col].tolist()
        mism = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not _values_close(a, b)
        ]
        assert not mism, f"[{key}] column {col!r}: first mismatches {mism[:5]}"
