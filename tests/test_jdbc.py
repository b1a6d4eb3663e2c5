"""JDBC source/sink tests. The real JDBC branch needs a live DB
(``SDP_JDBC_URL``); without one those tests SKIP — visibly, never silently
pass — and the parquet-fallback path is asserted instead."""

from __future__ import annotations

import os

import pytest

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()

HAS_JDBC = bool(os.environ.get("SDP_JDBC_URL"))
needs_jdbc = pytest.mark.skipif(
    not HAS_JDBC, reason="SDP_JDBC_URL not set: JDBC round-trip not exercised"
)


def test_sink_jdbc_fallback_roundtrip(spark, sf_dir, monkeypatch):
    monkeypatch.delenv("SDP_JDBC_URL", raising=False)  # force the fallback branch
    df = REGISTRY["sink_jdbc"].fn(spark, sf_dir)
    rows = {r["n_nationkey"]: r["n_name"] for r in df.collect()}
    assert len(rows) == 25
    src = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    assert rows == src


def test_sink_stream_jdbc_fallback_roundtrip(spark, sf_dir, monkeypatch):
    monkeypatch.delenv("SDP_JDBC_URL", raising=False)  # force the fallback branch
    df = REGISTRY["sink_stream_jdbc"].fn(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert df.count() == n_events


@needs_jdbc
def test_sink_jdbc_live_roundtrip(spark, sf_dir):
    df = REGISTRY["sink_jdbc"].fn(spark, sf_dir)
    assert df.count() == 25


@needs_jdbc
def test_scan_jdbc_live(spark, sf_dir):
    df = REGISTRY["scan_jdbc"].fn(spark, sf_dir)
    assert df.count() == 25


@needs_jdbc
def test_sink_stream_jdbc_live(spark, sf_dir):
    df = REGISTRY["sink_stream_jdbc"].fn(spark, sf_dir)
    assert df.count() >= 1
