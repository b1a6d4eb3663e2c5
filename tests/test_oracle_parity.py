"""Differential test: every SQL-expressible operator key in the registry
must match its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01).
This is the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from sdp_spark.plans.registry import load_all

from tests.conftest import assert_df_matches_oracle

REGISTRY = load_all()
SQL_KEYS = sorted(k for k, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("key", SQL_KEYS)
def test_matches_oracle(key, spark, sf_dir, ddb):
    spec = REGISTRY[key]
    df = spec.fn(spark, sf_dir)
    assert_df_matches_oracle(df, ddb, spec.oracle, key=key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    """rows-only keys must at least execute and return a stable schema."""
    spec = REGISTRY[key]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"[{key}] empty schema"
    assert df.count() >= 0
