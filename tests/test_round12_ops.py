"""Round-12 operator tests: the completed CDC EARS family (C1 no-gap /
C2 gapped / C3 cumulative carryover) with planted scenarios that
distinguish the three variants' firing profiles, and the IVF-bootstrapped
NSW graph build (scale-safe edge construction replacing the exact
all-pairs k-NN)."""
import datetime as dt
import os


# ---------------------------------------------------------------------------
# EARS family: planted step + creep scenarios (VERDICT r11 next-round #5)
# ---------------------------------------------------------------------------


def _write_events(spark, sf, day_counts):
    """day_counts: {event_type: [count per day from 2024-01-01]}."""
    rows, ev = [], 0
    for typ, counts in day_counts.items():
        for t, n in enumerate(counts):
            d = dt.date(2024, 1, 1) + dt.timedelta(days=t)
            for i in range(n):
                rows.append(
                    (ev, dt.datetime(d.year, d.month, d.day, 9, i % 60, i % 60),
                     1, typ, 1.0, "{}")
                )
                ev += 1
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")


def test_ears_family_planted_profiles(spark, tmp_path):
    """The three EARS variants must fire DIFFERENTLY on the same plants —
    that difference is the family's reason to exist:

    - STEP (18/22 jitter baseline, then 60/day from day 20): C1's no-gap
      baseline swallows the outbreak within two days (the spike inflates
      its own mu and sd), C2's 2-day gap keeps it firing two days longer,
      C3's carryover two days longer still — strictly nested alert sets.
    - CREEP (same baseline, then a modest 24/day from day 20, ~1.9 sigma):
      individual z-scores straddle the 2.0 threshold on alternating days
      (the 18/22 parity of the 7-day window), but the carryover sum
      accumulates the persistent ~0.9 excess, so C3 alerts on a day
      (Jan 24) where C2 itself is silent — the sustained-modest-shift
      case C3 was designed for (Fricker/Hegler/Dunfee 2008)."""
    from sdp_spark.plans.registry import load_all

    sf = str(tmp_path / "ears_fam")
    base = [18 if t % 2 else 22 for t in range(40)]
    _write_events(spark, sf, {
        "step": [60 if t >= 20 else base[t] for t in range(40)],
        "creep": [24 if t >= 20 else base[t] for t in range(40)],
    })
    out = load_all()["query_outbreak_ears_family"].fn(spark, sf).collect()

    def alert_days(typ, variant):
        return sorted(
            r["day_s"][-2:]
            for r in out
            if r["event_type"] == typ and r["variant"] == variant and r["alert"]
        )

    # step: strictly nested, C1 silenced first (deterministic plant)
    assert alert_days("step", "c1") == ["21", "22"]
    assert alert_days("step", "c2") == ["21", "22", "23", "24"]
    assert alert_days("step", "c3") == ["21", "22", "23", "24", "25"]
    # creep: C3 fires where C2 is silent (Jan 24), and the profiles differ
    c2d, c3d = alert_days("creep", "c2"), alert_days("creep", "c3")
    assert "24" in c3d and "24" not in c2d
    assert c2d == ["21", "23"] and c3d == ["23", "24"]

    # family C2 rows must equal the standalone certified detector —
    # one definition, relabeled, never a drifting reimplementation
    standalone = {
        (r["event_type"], r["day_s"]): (r["n"], r["c2_score"], r["alert"])
        for r in load_all()["query_outbreak_ears"].fn(spark, sf).collect()
    }
    family_c2 = {
        (r["event_type"], r["day_s"]): (r["n"], r["score"], r["alert"])
        for r in out
        if r["variant"] == "c2"
    }
    assert family_c2 == standalone


def test_knn_graph_ivf_edge_quality_and_bounds(spark, sf_dir):
    """The IVF-bootstrapped k-NN graph (the scale-safe NSW edge source,
    VERDICT r11 next-round #4) must (a) recover most of the exact
    graph's edges — >= 0.7 of exact top-5 edges appear among its top-8
    on the near-uniform-sphere fixture (the hard case for any
    cell-pruning build; measured 0.75) — (b) respect the out-degree
    cap with contiguous ranks, and (c) be run-to-run deterministic
    (cached deterministic-seed fit, lowest-index ties)."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    approx = REG["llm_knn_graph_ivf"].fn(spark, sf_dir).collect()
    exact = REG["llm_knn_graph"].fn(spark, sf_dir).collect()
    a_edges = {(r["vec_id"], r["neighbor_id"]) for r in approx}
    e_edges = {(r["vec_id"], r["neighbor_id"]) for r in exact}
    assert len(e_edges & a_edges) / len(e_edges) >= 0.7
    by_src = {}
    for r in approx:
        by_src.setdefault(r["vec_id"], []).append(r["rnk"])
    for src, rnks in by_src.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), src
        assert len(rnks) <= 8
    again = {
        (r["vec_id"], r["neighbor_id"], r["cos_sim"], r["rnk"])
        for r in REG["llm_knn_graph_ivf"].fn(spark, sf_dir).collect()
    }
    assert again == {
        (r["vec_id"], r["neighbor_id"], r["cos_sim"], r["rnk"]) for r in approx
    }


def test_ears_family_applicability_and_carryover(spark, tmp_path):
    """Applicability filters are per-variant: with exactly 8 days of data,
    day 8 has a complete C1 baseline (days 1-7) but an incomplete C2
    baseline (needs 9 prior days), so C1 scores a day C2 cannot; C3 rows
    exist exactly where C2 rows do. Zero-variance baselines score
    nothing (flat plant)."""
    from sdp_spark.plans.registry import load_all

    sf = str(tmp_path / "ears_app")
    _write_events(spark, sf, {
        "short": [10, 12, 10, 12, 10, 12, 10, 30],
        "flat": [10] * 15,
    })
    out = load_all()["query_outbreak_ears_family"].fn(spark, sf).collect()
    short = [(r["variant"], r["day_s"][-2:]) for r in out
             if r["event_type"] == "short"]
    assert ("c1", "08") in short          # no-gap baseline complete
    assert all(v != "c2" and v != "c3" for v, _ in short)  # gap never fills
    assert not [r for r in out if r["event_type"] == "flat"]  # sd=0 excluded
