"""Invariant tests for the round-10 batch: Farrington trend-following
detection (planted trend + spike), MMWR epiweek calendar boundaries,
Kulldorff variable-window scan localization, WKT shape round-trips,
polygon-intersects join vs naive recompute, IVF-PQ recall, and
reporting-delay nowcast convergence."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _write_events(spark, path, rows):
    os.makedirs(path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{path}/events.parquet")
    return path


# ---------------------------------------------------------------------------
# Farrington
# ---------------------------------------------------------------------------


def test_farrington_follows_trend_and_flags_spike(spark, tmp_path):
    """Plant a cleanly increasing series (c = 10 + t): a level detector's
    frozen-baseline mean (~20) would flag EVERY scored day (31..39), but
    Farrington's per-day trend regression tracks the line, so only the
    planted +8x spike on day 28 alerts."""
    from sdp_spark.operators.analytics import query_outbreak_farrington

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(30):
        d = base + dt.timedelta(days=day)
        n = 10 + day
        if day == 28:
            n = 300  # planted outbreak far above the trend line
        for i in range(n):
            rows.append((eid, d + dt.timedelta(minutes=i), 1, "click", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, str(tmp_path / "farr"), rows)

    out = {r.day: r for r in query_outbreak_farrington(spark, sf).collect()}
    assert len(out) == 9  # scored days 21..29
    spike = out["2024-01-29"]
    assert spike.alert, spike
    for day, r in out.items():
        if day != "2024-01-29":
            assert not r.alert, r
            # the trend-adjusted expectation tracks the line, not the
            # baseline level: day t expects ~10+t, far above the frozen
            # 21-day mean of 20
            t = (dt.date.fromisoformat(day) - dt.date(2024, 1, 1)).days
            assert abs(r.expected - (10 + t)) < 2.5, r


def test_farrington_overdispersion_widens_bound(spark, tmp_path):
    """Two series with the same reference mean but different variance:
    the noisy one must get a HIGHER threshold (phi scales the bound) —
    the property that distinguishes Farrington from a plain Poisson
    bound."""
    from sdp_spark.operators.analytics import query_outbreak_farrington

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    # calm: constant 20; noisy: alternates 5/35 (same mean 20)
    for day in range(30):
        d = base + dt.timedelta(days=day)
        for etype, n in (("calm", 20), ("noisy", 5 if day % 2 == 0 else 35)):
            for i in range(n):
                rows.append(
                    (eid, d + dt.timedelta(minutes=i), 1, etype, 1.0, "{}")
                )
                eid += 1
    sf = _write_events(spark, str(tmp_path / "disp"), rows)
    out = query_outbreak_farrington(spark, sf).collect()
    calm = {r.day: r for r in out if r.event_type == "calm"}
    noisy = {r.day: r for r in out if r.event_type == "noisy"}
    assert set(calm) == set(noisy)
    for day in calm:
        assert noisy[day].dispersion > calm[day].dispersion
        assert noisy[day].threshold > calm[day].threshold


def test_farrington_stream_equals_batch(spark, sf_dir):
    from sdp_spark.operators.analytics import query_outbreak_farrington
    from sdp_spark.streaming.ops import stream_farrington_alerts

    batch = {
        (r.event_type, r.day)
        for r in query_outbreak_farrington(spark, sf_dir).collect()
        if r.alert
    }
    live = {
        (r.event_type, r.day)
        for r in stream_farrington_alerts(spark, sf_dir).collect()
    }
    assert live == batch
