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


# ---------------------------------------------------------------------------
# Prospective space-time scan
# ---------------------------------------------------------------------------


def test_spacetime_scan_flags_emerging_not_endemic(spark, tmp_path):
    """The space-time permutation scan's defining property: a cell that
    is ALWAYS hot (endemic) is absorbed by its own space marginal and
    scores zero, while a cell that became hot in the last 3 days (an
    EMERGING cluster) tops the ranking at exactly the 3-day trailing
    window — neither the purely spatial scan nor a level detector can
    make that distinction."""
    from sdp_spark.operators.stats import query_spacetime_scan

    pools = _cell_id_pools()  # user_id hashing == customer hashing (17/31)
    cells = sorted(pools.keys())
    emerging = cells[0]
    # keep the endemic cell's zones disjoint from the emerging cluster
    endemic = next(c for c in cells[1:] if _cheb(c, emerging) >= 3)
    background = [c for c in cells if c not in (emerging, endemic)][:40]
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)

    def emit(cell, day, n):
        nonlocal eid
        for i in range(n):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(days=day, minutes=i),
                    pools[cell][i % len(pools[cell])],
                    "case",
                    1.0,
                    "{}",
                )
            )
            eid += 1

    for day in range(30):
        for c in background:
            emit(c, day, 1)
        emit(endemic, day, 10)              # hot EVERY day
        emit(emerging, day, 1 + (20 if day >= 27 else 0))  # spikes at the end
    sf = _write_events(spark, str(tmp_path / "st"), rows)
    out = query_spacetime_scan(spark, sf).collect()
    top = out[0]
    assert (top.cx, top.cy) == emerging, (top, emerging)
    assert top.r == 0 and top.win_days == 3
    assert top.obs == 63  # 3 x (1 + 20)
    # the planted cluster must be SIGNIFICANT: no multinomial replicate's
    # max cylinder LLR reaches it -> the smallest attainable p, 1/(R+1)
    from sdp_spark.operators.stats import _ST_REPS

    assert top.p_value == pytest.approx(1 / (_ST_REPS + 1))
    # the endemic cell must not appear with a positive LLR anywhere
    assert all(
        r.llr == 0.0 for r in out if (r.cx, r.cy) == endemic
    )


def test_spacetime_stream_equals_batch(spark, sf_dir):
    from sdp_spark.operators.stats import query_spacetime_scan
    from sdp_spark.streaming.ops import stream_spacetime_alerts

    batch = [
        (r.cx, r.cy, r.r, r.win_days, r.obs, r.llr)
        for r in query_spacetime_scan(spark, sf_dir).collect()
        if r.llr > 0.0
    ]
    live = [
        (r.cx, r.cy, r.r, r.win_days, r.obs, r.llr)
        for r in stream_spacetime_alerts(spark, sf_dir).collect()
    ]
    assert live == batch


# ---------------------------------------------------------------------------
# Direct standardization
# ---------------------------------------------------------------------------


def test_direct_standardization_resolves_simpsons_paradox(spark, tmp_path):
    """Plant the textbook confounding case: nation A has the HIGHER rate
    in EVERY stratum but the LOWER crude rate (its population skews to
    the low-rate stratum). The directly standardized rate must rank A
    above B — resolving the paradox is exactly what DSR is for — and
    equal the hand-computed 0.5-weighted stratum rates."""
    import pandas as pd

    from sdp_spark.operators.stats import agg_direct_standardization

    sf = str(tmp_path / "dsr")
    os.makedirs(sf)
    pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["AAA", "BBB"]}
    ).to_parquet(f"{sf}/nation.parquet")
    cust, orders, ck, ok = [], [], 0, 0
    # (nation, segment, n_cust, n_orders): A beats B per-stratum, loses crude
    for nk, seg, nc, no in [
        (0, "YOUNG", 90, 18),  # A young rate 0.2
        (0, "OLD", 10, 10),    # A old   rate 1.0  -> crude 0.28
        (1, "YOUNG", 10, 1),   # B young rate 0.1
        (1, "OLD", 90, 81),    # B old   rate 0.9  -> crude 0.82
    ]:
        first = ck
        for _ in range(nc):
            cust.append((ck, nk, seg))
            ck += 1
        for i in range(no):
            orders.append((ok, first + (i % nc)))
            ok += 1
    pd.DataFrame(cust, columns=["c_custkey", "c_nationkey", "c_mktsegment"]).to_parquet(
        f"{sf}/customer.parquet"
    )
    pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).to_parquet(
        f"{sf}/orders.parquet"
    )
    out = {r.n_name: r for r in agg_direct_standardization(spark, sf).collect()}
    a, b = out["AAA"], out["BBB"]
    assert a.crude_rate < b.crude_rate          # the paradox
    assert a.dsr > b.dsr                        # resolved
    assert a.dsr == pytest.approx(0.6, abs=1e-6)   # 0.5*0.2 + 0.5*1.0
    assert b.dsr == pytest.approx(0.5, abs=1e-6)   # 0.5*0.1 + 0.5*0.9


# ---------------------------------------------------------------------------
# WKT shapes + polygon-intersects join
# ---------------------------------------------------------------------------


def _plan(spark, df, mode: str = "simple") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_wkt_shapes_roundtrip_all_true(spark, sf_dir):
    from sdp_spark.functions.families import fn_geo_wkt_shapes

    out = fn_geo_wkt_shapes(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.ls_npoints == 3
        assert not r.ls_ring_closed  # a linestring is open
        assert r.poly_ring_closed    # a POLYGON ring closes on vertex 1
        assert r.ls_roundtrip_ok and r.poly_roundtrip_ok, r
    # zero exchanges: pure codegen projection
    plan = _plan(spark, fn_geo_wkt_shapes(spark, sf_dir))
    assert "Exchange" not in plan


def test_polygon_intersects_superset_of_contains(spark, sf_dir):
    """If a customer's POINT is inside a polygon, the rect buffered
    around that point must intersect it — the intersects join is a
    superset of the contains join on the shared customer subset."""
    from sdp_spark.operators.joins import (
        join_polygon_contains,
        join_polygon_intersects,
    )

    inter = {
        (r.c_custkey, r.poly_id)
        for r in join_polygon_intersects(spark, sf_dir).collect()
    }
    contains = {
        (r.c_custkey, r.poly_id)
        for r in join_polygon_contains(spark, sf_dir).collect()
        if r.c_custkey % 5 == 0
    }
    assert contains <= inter
    assert len(inter) > len(contains)  # buffers also CROSS boundaries


def test_polygon_intersects_plan_is_cell_bucketed(spark, sf_dir):
    """Candidates must come from the broadcast (cx, cy) equi-join — no
    all-pairs nested loop anywhere in the plan."""
    from sdp_spark.operators.joins import join_polygon_intersects

    plan = _plan(spark, join_polygon_intersects(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Kulldorff spatial scan
# ---------------------------------------------------------------------------


def _cell_id_pools(max_ids: int = 400_000) -> dict[tuple[int, int], list[int]]:
    """Map grid cell -> candidate c_custkeys landing there. The lat and
    lon hashes share the Knuth multiplier (constant offset), so (lat,
    lon) pairs lie on a 1-D lattice and only ~100 cells are REACHABLE —
    the tests must plant clusters on reachable cells."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    pools: dict[tuple[int, int], list[int]] = {}
    for i in range(1, max_ids):
        lat = ((i + 17) * KNUTH) % KNUTH_MOD % 1200 / 10.0 - 60.0
        lon = ((i + 31) * KNUTH) % KNUTH_MOD % 3600 / 10.0 - 180.0
        pools.setdefault((int(lon // 15), int(lat // 15)), []).append(i)
    return pools


def _run_kulldorff(spark, tmp_path, name, need):
    import pandas as pd

    from sdp_spark.operators.stats import query_spatial_scan_kulldorff

    pools = _cell_id_pools()
    keys = []
    for cell, n in need.items():
        assert len(pools.get(cell, [])) >= n, (cell, n)
        keys.extend(pools[cell][:n])
    sf = str(tmp_path / name)
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": keys}).to_parquet(f"{sf}/customer.parquet")
    return query_spatial_scan_kulldorff(spark, sf).collect()


def _cheb(a, b):
    return max(abs(a[0] - b[0]), abs(a[1] - b[1]))


def test_kulldorff_localizes_single_cell_cluster(spark, tmp_path):
    """Uniform background (2 points in each of 40 reachable cells) + one
    hot cell at +30: the top zone must be that single cell at RADIUS 0
    with the smallest attainable p (1/20) — the fixed 3x3 scan smears
    the same cluster across nine windows."""
    cells = sorted(_cell_id_pools().keys())
    from sdp_spark.operators.stats import _KULL_REPS

    hot = cells[0]
    need = {c: 2 for c in cells[:40]}
    need[hot] = 32
    out = _run_kulldorff(spark, tmp_path, "kull1", need)
    top = out[0]
    assert (top.cx, top.cy, top.r) == (hot[0], hot[1], 0), top
    assert (top.obs, top.k) == (32, 1)
    assert top.p_value == pytest.approx(1 / (_KULL_REPS + 1))
    assert all(r.llr <= top.llr for r in out[1:])


def test_kulldorff_prefers_wide_zone_for_spread_cluster(spark, tmp_path):
    """A SPREAD cluster (every reachable cell within Chebyshev radius 2
    of a chosen center elevated to 8 points) over a distant background:
    the top zone must be a radius-2 window capturing the WHOLE cluster
    and nothing else — the variable window the 3x3 scan lacks."""
    pools = _cell_id_pools()
    cells = sorted(pools.keys())
    # center with the most reachable neighbors within cheb <= 2,
    # requiring one at cheb exactly 2 so radius 2 is genuinely needed
    best, elev = None, []
    for c in cells:
        near = [d for d in cells if _cheb(c, d) <= 2 and len(pools[d]) >= 8]
        if len(pools[c]) >= 8 and any(_cheb(c, d) == 2 for d in near):
            if len(near) > len(elev):
                best, elev = c, near
    assert best is not None and len(elev) >= 3, (best, elev)
    background = [d for d in cells if all(_cheb(d, e) >= 3 for e in elev)][:40]
    assert len(background) >= 20
    need = {d: 2 for d in background}
    for d in elev:
        need[d] = 8
    from sdp_spark.operators.stats import _KULL_REPS

    out = _run_kulldorff(spark, tmp_path, "kull2", need)
    top = out[0]
    assert top.r == 2, top
    assert (top.obs, top.k) == (8 * len(elev), len(elev)), (top, len(elev))
    assert top.p_value == pytest.approx(1 / (_KULL_REPS + 1))


# ---------------------------------------------------------------------------
# Reporting-delay nowcast
# ---------------------------------------------------------------------------


def test_nowcast_recovers_true_counts_exactly(spark, tmp_path):
    """Stationary delay process -> the completeness correction recovers
    the full-stream counts EXACTLY: plant 8 events/day (one per delay
    0..7, event_ids chosen so the hash delay hits every bucket once),
    so F(a) = (a+1)/8 and nowcast = reported / F(age) = 8 on every
    truncated day."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD
    from sdp_spark.operators.analytics import _NC_SALT, ts_nowcast_delay

    # bucket candidate ids by their hash delay
    buckets: dict[int, list[int]] = {d: [] for d in range(8)}
    i = 0
    while any(len(v) < 30 for v in buckets.values()):
        buckets[((i + _NC_SALT) * KNUTH) % KNUTH_MOD % 8].append(i)
        i += 1
    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(28):
        d = base + dt.timedelta(days=day)
        for delay in range(8):
            rows.append(
                (buckets[delay][day], d, 1, "report", 1.0, "{}")
            )
    sf = _write_events(spark, str(tmp_path / "nc"), rows)
    out = ts_nowcast_delay(spark, sf).collect()
    assert len(out) == 8  # days 2024-01-21 .. 2024-01-28
    for r in out:
        assert r.n_true == 8
        assert r.n_reported == r.age + 1
        assert r.completeness == pytest.approx((r.age + 1) / 8)
        assert r.n_nowcast == pytest.approx(8.0)


def test_nowcast_stream_equals_batch(spark, sf_dir):
    """The live nowcast must equal the batch recurrence on the incomplete
    days (same core, structural equality)."""
    from sdp_spark.operators.analytics import ts_nowcast_delay
    from sdp_spark.streaming.ops import stream_nowcast_delay

    batch = {
        (r.event_type, r.day): (r.n_reported, r.completeness, r.n_nowcast)
        for r in ts_nowcast_delay(spark, sf_dir).collect()
        if r.completeness < 1.0
    }
    live = {
        (r.event_type, r.day): (r.n_reported, r.completeness, r.n_nowcast)
        for r in stream_nowcast_delay(spark, sf_dir).collect()
    }
    assert live == batch and batch


def test_nowcast_fixture_convergence(spark, sf_dir):
    """On the real fixture (uniform hash delays) the correction must be
    unbiased: completeness is monotone in age and the macro relative
    error of the nowcast vs the known full count is far below the raw
    truncation error it corrects."""
    from sdp_spark.operators.analytics import ts_nowcast_delay

    out = ts_nowcast_delay(spark, sf_dir).collect()
    assert out
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.age)
        comps = [r.completeness for r in rs]
        assert comps == sorted(comps)
    # per-day counts at sf0.001 are ~6 events (Poisson-noise-dominated);
    # the honest accuracy claim is over the truncated WINDOW per type
    errs_now, errs_raw = [], []
    for rs in by_type.values():
        st = sum(r.n_true for r in rs)
        errs_now.append(abs(sum(r.n_nowcast for r in rs) - st) / st)
        errs_raw.append(abs(sum(r.n_reported for r in rs) - st) / st)
    err_now = sum(errs_now) / len(errs_now)
    err_raw = sum(errs_raw) / len(errs_raw)
    assert err_now < err_raw / 2
    assert err_now < 0.25


# ---------------------------------------------------------------------------
# MMWR epiweek calendar
# ---------------------------------------------------------------------------


def test_epiweek_published_mmwr_boundaries(spark):
    """Pin the Wednesday rule against published MMWR calendar facts:
    2014 was a 53-week MMWR year whose week 53 spanned 2014-12-28 ..
    2015-01-03 (so 2015-01-01, a Thursday, belongs to 2014w53); MMWR
    week 1 of 2015 began Sunday 2015-01-04; 2008 was also a 53-week
    year (week 53 ended 2009-01-03); 1997-01-01 (a Wednesday) opened
    week 1 of 1997 ending 1997-01-04; and 2016-01-02 (Saturday) closed
    2015's week 52 while 2016-01-03 (Sunday) opened 2016 week 1."""
    from sdp_spark.functions.families import epiweek_cols

    cases = [
        # (date, epiyear, epiweek, week_ending)
        ("2014-12-28", 2014, 53, "2015-01-03"),
        ("2015-01-01", 2014, 53, "2015-01-03"),
        ("2015-01-03", 2014, 53, "2015-01-03"),
        ("2015-01-04", 2015, 1, "2015-01-10"),
        ("2008-12-31", 2008, 53, "2009-01-03"),
        ("2009-01-04", 2009, 1, "2009-01-10"),
        ("1997-01-01", 1997, 1, "1997-01-04"),
        ("2016-01-02", 2015, 52, "2016-01-02"),
        ("2016-01-03", 2016, 1, "2016-01-09"),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(c[0],) for c in cases], "d string")
    ey, ew, we = epiweek_cols(F.to_date("d"))
    out = df.select(
        "d",
        ey.alias("ey"),
        ew.alias("ew"),
        F.date_format(we, "yyyy-MM-dd").alias("we"),
    ).collect()
    got = {r.d: (r.ey, r.ew, r.we) for r in out}
    for d, y, w, e in cases:
        assert got[d] == (y, w, e), (d, got[d], (y, w, e))


def test_epiweek_grid_invariants(spark, sf_dir):
    """Every MMWR week maps exactly 7 calendar days, epiweek is within
    1..53, and the week_ending date is always a Saturday."""
    import pyspark.sql.functions as F

    from sdp_spark.functions.families import epiweek_cols

    days = spark.createDataFrame(
        [("1992-01-01",)], "start string"
    ).select(
        F.explode(
            F.sequence(
                F.to_date("start"),
                F.to_date(F.lit("2002-12-31")),
            )
        ).alias("d")
    )
    ey, ew, we = epiweek_cols(F.col("d"))
    g = (
        days.select(ey.alias("ey"), ew.alias("ew"), we.alias("we"))
        .groupBy("ey", "ew", "we")
        .count()
        .collect()
    )
    interior = [r for r in g if 1992 < r.ey < 2002]
    assert interior and all(r["count"] == 7 for r in interior)
    assert all(1 <= r.ew <= 53 for r in g)
    import datetime as _dt

    assert all(r.we.weekday() == 5 for r in g)  # Saturday


def test_detector_on_epiweek_grid(spark):
    """A surveillance detector re-expressed on the MMWR weekly grid:
    three years of weekly counts (level 20), with the SAME epiweek in
    the final year planted at 5x. A same-week-of-year historical-limits
    score over the epiweek key must flag exactly the planted week —
    the shape every CDC-reportable detector runs in production."""
    import pyspark.sql.functions as F

    from sdp_spark.functions.families import epiweek_cols

    # daily events, 2012-01-01 .. 2014-12-27 (all full MMWR weeks)
    days = spark.createDataFrame([("x",)], "k string").select(
        F.explode(
            F.sequence(F.to_date(F.lit("2012-01-01")), F.to_date(F.lit("2014-12-27")))
        ).alias("d")
    )
    ey, ew, we = epiweek_cols(F.col("d"))
    daily = days.select(
        ey.alias("ey"), ew.alias("ew"), F.lit(3).alias("n")
    ).withColumn(
        "n",
        F.when((F.col("ey") == 2014) & (F.col("ew") == 30), 15).otherwise(F.col("n")),
    )
    weekly = daily.groupBy("ey", "ew").agg(F.sum("n").alias("c"))
    base = (
        weekly.filter(F.col("ey") < 2014)
        .groupBy("ew")
        .agg(F.avg("c").alias("mu"), F.stddev_pop("c").alias("sd"))
    )
    scored = (
        weekly.filter(F.col("ey") == 2014)
        .join(base, "ew")
        .withColumn("alert", F.col("c") > F.col("mu") + 3 * F.greatest("sd", F.lit(1.0)))
    )
    alerts = [r.ew for r in scored.collect() if r.alert]
    assert alerts == [30]


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


# ---------------------------------------------------------------------------
# Plan-shape assertions for the round-10 batch (the docstrings' scale
# claims, pinned)
# ---------------------------------------------------------------------------


def test_farrington_plan_single_events_scan_broadcast_small_sides(spark, sf_dir):
    """The daily rollup is the only data-scale pass: exactly ONE events
    scan in the plan, and the pairing/coefficient/dispersion joins are
    broadcast (no shuffled join of the metadata frames)."""
    from sdp_spark.operators.analytics import query_outbreak_farrington

    df = query_outbreak_farrington(spark, sf_dir)
    plan = _plan(spark, df)
    assert plan.count("events.parquet") <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_nowcast_plan_single_events_scan(spark, sf_dir):
    from sdp_spark.operators.analytics import ts_nowcast_delay

    plan = _plan(spark, ts_nowcast_delay(spark, sf_dir))
    # one scan feeds both the delay histogram and the truncated counts
    # branch (two Filter consumers of the same relation are fine; no SMJ)
    assert "SortMergeJoin" not in plan, plan


def test_spacetime_plan_no_datascale_join(spark, sf_dir):
    """Cylinder enumeration joins only the resolution-bounded cell-day
    frame: the single events scan feeds one grouped exchange, and no
    sort-merge join appears anywhere (offsets/marginals broadcast)."""
    from sdp_spark.operators.stats import query_spacetime_scan

    plan = _plan(spark, query_spacetime_scan(spark, sf_dir))
    assert plan.count("events.parquet") <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_epiweek_plan_one_exchange(spark, sf_dir):
    """Row-level date arithmetic + ONE grouped exchange — nothing else."""
    from sdp_spark.functions.families import fn_epiweek

    plan = (
        fn_epiweek(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan  # partial+final agg exchange (+AQE read)


def test_spacetime_mix_hash_portable_and_dispersed(ddb):
    """The replicate case hash must (a) replay EXACTLY in DuckDB (the
    oracle evaluates the same chain) and (b) disperse like a true
    multinomial — the affine-stride failure mode this mix replaced was
    per-bucket sd ~2 where multinomial sd is ~10 (see the constants
    note in stats.py)."""
    import statistics

    from sdp_spark.operators.stats import (
        _ST_M31,
        _ST_MIX2,
        _ST_MIX3,
        _st_mix_sql,
    )

    def mix(x: int) -> int:
        h = (x % _ST_M31) * 48271 % _ST_M31
        h = h ^ (h >> 15)
        h = h * _ST_MIX2 % _ST_M31
        h = h ^ (h >> 13)
        h = h * _ST_MIX3 % 4294967296
        return h ^ (h >> 16)

    steps = _st_mix_sql("x")
    chain = "SELECT CAST(range AS BIGINT) AS x FROM range(1, 2001)"
    for name, expr in zip(("h1", "h2", "h3", "h4", "h5", "h"), steps):
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    dd = [r[0] for r in ddb.execute(f"SELECT h FROM ({chain})").fetchall()]
    assert dd == [mix(x) for x in range(1, 2000 + 1)]

    # dispersion: 10000 synthetic cases of one day/replicate over 100
    # equal buckets — multinomial sd = sqrt(n p (1-p)) ~ 9.95
    c = 10000
    buckets = [0] * 100
    for i in range(1, c + 1):
        buckets[mix((5 * 100003 + i) * 10 + 3) % c * 100 // c] += 1
    sd = statistics.pstdev(buckets)
    assert 7.0 < sd < 13.5, sd
