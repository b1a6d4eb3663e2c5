"""Invariant tests for batch 22: capture-recapture hand-computed on
planted sighting sets plus estimator-order invariants, a hand-computed
two-proportion z, l-diversity's homogeneity/violation logic, the EWMA
control chart on constant and step-jump series (no alert at baseline,
alert on every post-jump day, UCL monotone), stream==batch for the EWMA
twin, and geodesic math pinned against python's math module."""

from __future__ import annotations

import math

import pandas as pd

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _dround(x: float, n: int) -> float:
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    return sf


# ---------------------------------------------------------------------------
# Capture-recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_hand_computed(spark, tmp_path):
    """aa captures users {1,2,3}, bb captures {2,3,4}: n1=n2=3, m=2,
    Lincoln-Petersen 4.5, Chapman (4·4/3)−1 = 4.33."""
    rows, eid = [], 0
    for u, t in [(1, "aa"), (2, "aa"), (3, "aa"), (2, "bb"), (3, "bb"), (4, "bb")]:
        eid += 1
        rows.append((eid, "2024-01-05 00:00:00", u, t, 200.0))
    for u in range(1, 6):  # low-severity noise no source captures
        eid += 1
        rows.append((eid, "2024-01-06 00:00:00", u, "aa", 10.0))
    sf = _write_events(spark, tmp_path, rows)
    out = REGISTRY["agg_capture_recapture"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("aa", "bb")
    assert (r["n_a"], r["n_b"], r["m_both"]) == (3, 3, 2)
    assert r["n_lp"] == 4.5
    assert r["n_chapman"] == _dround(4 * 4 / 3 - 1, 2)


def test_capture_recapture_estimator_order(spark, sf_dir):
    """On the real fixture: m ≤ min(n1,n2), Chapman ≤ Lincoln-Petersen
    (the bias correction always shrinks), and both dominate max(n1,n2)."""
    for r in REGISTRY["agg_capture_recapture"].fn(spark, sf_dir).collect():
        assert 1 <= r["m_both"] <= min(r["n_a"], r["n_b"])
        assert r["n_chapman"] <= r["n_lp"] + 1e-9
        assert r["n_lp"] >= max(r["n_a"], r["n_b"]) - 1e-9


# ---------------------------------------------------------------------------
# Two-proportion z-test
# ---------------------------------------------------------------------------


def test_proportion_ztest_hand_computed(spark, tmp_path):
    """Arm 0 = even users {2,4,6,8} with 2 converters, arm 1 = odd users
    {1,3,5} with 1: p 0.5 vs 1/3, pooled 3/7 — z matches the textbook
    pooled formula."""
    rows, eid = [], 0
    for u in (2, 4, 6, 8, 1, 3, 5):
        eid += 1
        rows.append((eid, "2024-01-05 00:00:00", u, "view", 10.0))
    for u in (2, 4, 1):  # high-value purchases = conversions
        eid += 1
        rows.append((eid, "2024-01-06 00:00:00", u, "purchase", 200.0))
    sf = _write_events(spark, tmp_path, rows)
    out = REGISTRY["agg_proportion_ztest"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (4, 2, 3, 1)
    p_a, p_b, pool = 0.5, 1 / 3, 3 / 7
    z = (p_a - p_b) / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 3))
    assert r["p_a"] == 0.5 and r["p_b"] == _dround(p_b, 4)
    assert r["risk_diff"] == _dround(p_a - p_b, 4)
    assert r["z"] == _dround(z, 4)


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_logic(spark, sf_dir):
    """violates_l ⟺ fewer than 2 distinct sensitive values; entropy is 0
    exactly for homogeneous classes and never exceeds ln(3) (3 bands);
    class sizes sum to the table row count."""
    import duckdb

    rows = REGISTRY["dq_l_diversity"].fn(spark, sf_dir).collect()
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchone()[0]
    assert sum(r["group_size"] for r in rows) == n_cust
    for r in rows:
        assert r["violates_l"] == (r["n_distinct_sensitive"] < 2)
        if r["n_distinct_sensitive"] == 1:
            assert r["entropy"] == 0.0
        else:
            assert 0.0 < r["entropy"] <= math.log(3) + 1e-9
        assert 1 <= r["n_distinct_sensitive"] <= 3


# ---------------------------------------------------------------------------
# EWMA control chart
# ---------------------------------------------------------------------------


def _daily_counts(days_counts):
    """events rows realizing exact daily counts for one type."""
    rows, eid = [], 0
    for d, c in days_counts:
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 06:00:00", 1, "aa", 1.0))
    return rows


def test_ewma_constant_series_no_alert(spark, tmp_path):
    """Constant counts: z_t telescopes to exactly μ, σ = 0 so UCL = μ,
    and the strict > comparison never fires."""
    sf = _write_events(
        spark, tmp_path, _daily_counts([(d, 5) for d in range(1, 21)])
    )
    rows = REGISTRY["query_outbreak_ewma"].fn(spark, sf).collect()
    assert len(rows) == 10  # days 11..20 scored
    for r in rows:
        assert r["ewma"] == 5.0 and r["ucl"] == 5.0 and not r["alert"]


def test_ewma_step_jump_alerts(spark, tmp_path):
    """Counts triple after the split on a zero-variance baseline: every
    scored day alerts and the EWMA rises monotonically toward the new
    level."""
    sf = _write_events(
        spark,
        tmp_path,
        _daily_counts([(d, 5) for d in range(1, 11)] + [(d, 15) for d in range(11, 21)]),
    )
    rows = sorted(
        REGISTRY["query_outbreak_ewma"].fn(spark, sf).collect(),
        key=lambda r: r["day"],
    )
    assert all(r["alert"] for r in rows)
    ew = [r["ewma"] for r in rows]
    assert ew == sorted(ew) and 5.0 < ew[0] and ew[-1] < 15.0


def test_ewma_ucl_monotone_and_stream_twin(spark, sf_dir):
    """On the real fixture: the control limit widens monotonically with t
    (variance convergence), and the streaming twin's alert set equals the
    batch alert rows exactly (shared scoring core, shared daily rollup)."""
    batch = REGISTRY["query_outbreak_ewma"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in batch:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        ucl = [r["ucl"] for r in sorted(rows, key=lambda r: r["day"])]
        assert ucl == sorted(ucl)
    want = sorted(
        (r["event_type"], r["day"], r["n_events"], r["ewma"], r["ucl"])
        for r in batch
        if r["alert"]
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["stream_ewma_alerts"].fn(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Geodesic family
# ---------------------------------------------------------------------------


def test_geo_haversine_pinned_to_math(spark, sf_dir):
    """Recompute distance/bearing for every emitted pair with python's
    math module from the same hash-derived coordinates: values match at
    the operator's rounding, bearings live in [0, 360), and the radius
    flag agrees with the rounded distance."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    def lat(k):
        return ((k + 17) * KNUTH) % KNUTH_MOD % 1200 / 10.0 - 60.0

    def lon(k):
        return ((k + 31) * KNUTH) % KNUTH_MOD % 3600 / 10.0 - 180.0

    rows = REGISTRY["fn_geo_haversine"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        f1, f2 = math.radians(lat(r["s_suppkey"])), math.radians(lat(r["c_custkey"]))
        dl = math.radians(lon(r["c_custkey"]) - lon(r["s_suppkey"]))
        dist = 2 * 6371.0088 * math.asin(
            math.sqrt(
                math.sin((f2 - f1) / 2) ** 2
                + math.cos(f1) * math.cos(f2) * math.sin(dl / 2) ** 2
            )
        )
        brg = math.degrees(
            math.atan2(
                math.sin(dl) * math.cos(f2),
                math.cos(f1) * math.sin(f2)
                - math.sin(f1) * math.cos(f2) * math.cos(dl),
            )
        )
        assert abs(r["dist_km"] - dist) < 0.01
        assert abs(r["bearing_deg"] - ((brg % 360) + 360) % 360) < 0.01
        assert 0.0 <= r["bearing_deg"] < 360.0
        assert r["within_radius"] == (r["dist_km"] <= 2000.0)


def _plan(spark, df, mode: str = "simple") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_bootstrap_plan_broadcast_no_smj(spark, sf_dir):
    """The replicate-grid join must broadcast (the grid is fixed-size
    metadata) — a sort-merge join here would shuffle the fact table for
    a 20k-row probe side."""
    plan = _plan(spark, REGISTRY["agg_bootstrap_ci"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_capture_recapture_plan_broadcast_sizes(spark, sf_dir):
    """Both per-source size frames attach by broadcast; the overlap join
    carries ids only (no value column past the sighting collapse)."""
    plan = _plan(spark, REGISTRY["agg_capture_recapture"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_geo_plan_pure_codegen(spark, sf_dir):
    """The trig is JVM expressions: no Python evaluator anywhere, and the
    nation equi-join plans as a broadcast, not a cartesian product."""
    plan = _plan(spark, REGISTRY["fn_geo_haversine"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ewma_single_daily_rollup_feeds_both(spark, sf_dir):
    """Baseline and scoring both read the (type, day) rollup: the events
    scan appears at most twice in the formatted plan (the two agg
    branches), never once per scored day."""
    plan = _plan(spark, REGISTRY["query_outbreak_ewma"].fn(spark, sf_dir), "formatted")
    assert plan.count("Scan parquet") <= 2


def test_rt_stream_twin_equals_batch(spark, sf_dir):
    """The live Rt monitor's alert set equals the batch key's rows above
    the growth threshold exactly (shared rt_scored core, shared daily
    rollup) — the fifth batch+stream detector pair's structural
    guarantee, plus non-emptiness so the filter is exercised both ways."""
    from sdp_spark.operators.stats import RT_ALERT

    batch = REGISTRY["ts_rt_ratio"].fn(spark, sf_dir).collect()
    want = sorted(tuple(r) for r in batch if r["rt"] > RT_ALERT)
    got = sorted(
        tuple(r) for r in REGISTRY["stream_rt_alerts"].fn(spark, sf_dir).collect()
    )
    assert got == want
    assert 0 < len(got) < len(batch)
