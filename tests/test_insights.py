"""Invariant + plan tests for the insight-analytics batch (batch 19):
the algebraic guarantees the DuckDB hash oracle proves numerically but
not structurally — historical-limits scoring on a planted outbreak,
decomposition's zero-mean seasonal residuals, Markov row-stochasticity,
RFM quintile balance, χ² marginal consistency, assortativity bounds,
Zipf negativity, hash-sample determinism — plus the plan shapes the
scale docstrings claim (broadcast degree joins, single-scan
expectations, no cartesian products)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _plan(spark, df, mode: str = "simple") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts_str, user_id, event_type, value)."""
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


def test_histlimits_planted_outbreak(spark, tmp_path):
    """Plant a 30-day single-type series where the last day's same-weekday
    baseline is exactly {1,2,3,2} (mean 2, var 2/3) and the last day
    spikes to 10 events: the detector must alert on that day with
    z = 8/sqrt(2/3) = 9.798 (dround 4), and no same-weekday prior day
    has enough baseline to alert."""
    rows = []
    eid = 0
    # day index 1..30 relative to 2024-03-01; the spike day is day 30.
    # Same-weekday priors of day 30 are days 2, 9, 16, 23.
    counts = {2: 1, 9: 2, 16: 3, 23: 2, 30: 10}
    for d in range(1, 31):
        n = counts.get(d, 1)
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-03-{d:02d} 12:00:00", 1, "error", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    out = REGISTRY["query_outbreak_histlimits"].fn(spark, sf).collect()
    alerts = [r for r in out if r["alert"]]
    assert len(alerts) == 1
    a = alerts[0]
    assert a["day_s"] == "2024-03-30" and a["n"] == 10 and a["n_base"] == 4
    assert a["hl_score"] == pytest.approx(9.798, abs=1e-9)


def test_histlimits_stream_matches_batch_alerts(spark, sf_dir):
    """The streaming twin must emit exactly the batch capstone's alert
    rows (shared scoring core -> structural equality, proved e2e here)."""
    batch = (
        REGISTRY["query_outbreak_histlimits"].fn(spark, sf_dir).collect()
    )
    expected = sorted(
        (r["event_type"], r["day_s"], r["n"], r["n_base"], r["hl_score"])
        for r in batch
        if r["hl_score"] > 2.0
    )
    live = REGISTRY["stream_histlimits_alerts"].fn(spark, sf_dir).collect()
    got = sorted(
        (r["event_type"], r["day_s"], r["n"], r["n_base"], r["hl_score"])
        for r in live
    )
    assert got == expected


def test_decompose_seasonal_residuals_zero_mean(spark, sf_dir):
    """By construction the seasonal component is the per-(type, weekday)
    mean of the detrended series, so residuals must sum to ~0 within
    each (type, weekday) class (exactly 0 pre-rounding; rounding adds
    at most 1e-4 per row)."""
    out = REGISTRY["ts_decompose_seasonal"].fn(spark, sf_dir).collect()
    assert out, "decomposition produced no rows"
    sums: dict[tuple, list] = {}
    for r in out:
        dow = pd.Timestamp(r["day_s"]).dayofweek
        sums.setdefault((r["event_type"], dow), []).append(r["residual"])
        # additive identity: n == trend + seasonal + residual (post-round)
        assert r["n"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=2e-4
        )
    for k, v in sums.items():
        assert abs(sum(v)) <= 1e-4 * len(v) + 1e-9, k


def test_markov_rows_stochastic(spark, sf_dir):
    out = REGISTRY["agg_markov_transitions"].fn(spark, sf_dir).collect()
    rows: dict[str, float] = {}
    for r in out:
        assert 0.0 < r["p"] <= 1.0
        rows[r["prev_type"]] = rows.get(r["prev_type"], 0.0) + r["p"]
    assert rows, "no transitions"
    for t, s in rows.items():
        assert s == pytest.approx(1.0, abs=1e-4), t


def test_rfm_quintiles_balanced(spark, sf_dir):
    out = REGISTRY["agg_rfm_segmentation"].fn(spark, sf_dir).collect()
    n = len(out)
    assert n > 0
    for metric in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in out:
            s = r[metric]
            assert 1 <= s <= 5
            counts[s] = counts.get(s, 0) + 1
        # NTILE balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, metric
    for r in out:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"


def test_chi2_marginal_consistency(spark, sf_dir):
    """Expected counts must reproduce the observed marginals: summing
    expected over a row (priority) equals that row's observed total."""
    out = REGISTRY["agg_chi2_independence"].fn(spark, sf_dir).collect()
    obs: dict[str, int] = {}
    exp: dict[str, float] = {}
    total = 0
    for r in out:
        obs[r["o_orderpriority"]] = obs.get(r["o_orderpriority"], 0) + r["n"]
        exp[r["o_orderpriority"]] = (
            exp.get(r["o_orderpriority"], 0.0) + r["expected"]
        )
        total += r["n"]
        assert r["chi2_term"] >= 0
    orders_n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == orders_n
    for k in obs:
        assert exp[k] == pytest.approx(obs[k], rel=1e-6), k


def test_time_to_event_sane(spark, sf_dir):
    out = REGISTRY["agg_time_to_event"].fn(spark, sf_dir).collect()
    assert out, "no conversions found"
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    signup_users = (
        e.filter(e.event_type == "signup").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in out) <= signup_users
    for r in out:
        assert r["latency_days"] >= 0 and r["avg_latency_min"] >= 0
        # bucket consistency: the mean latency falls inside its day bucket
        assert (
            r["latency_days"] * 1440
            <= r["avg_latency_min"]
            < (r["latency_days"] + 1) * 1440
        )


def test_assortativity_bounds(spark, sf_dir):
    out = REGISTRY["graph_degree_assortativity"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_edges"] > 0
    assert r["mean_supp_degree"] > 0 and r["mean_cust_degree"] > 0


def test_zipf_slope_negative(spark, sf_dir):
    out = REGISTRY["llm_zipf_slope"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["zipf_slope"] < 0, "rank-frequency fit must decay"
    assert r["n_ranks"] <= 1000
    # intercept = mean(ly) + |slope| * mean(lx) > 0 for any real corpus
    assert r["zipf_intercept"] > 0


def test_sample_hash_group_deterministic(spark, sf_dir):
    a = REGISTRY["sample_hash_group"].fn(spark, sf_dir).collect()
    b = REGISTRY["sample_hash_group"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    per_group: dict[str, int] = {}
    ids = set()
    for r in a:
        per_group[r["source"]] = per_group.get(r["source"], 0) + 1
        ids.add(r["doc_id"])
    assert all(v <= 5 for v in per_group.values())
    all_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert ids <= all_ids


def test_common_neighbors_jaccard_bounds(spark, sf_dir):
    out = REGISTRY["graph_common_neighbors"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["s1"] < r["s2"]
        assert r["common"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0
    # descending by jaccard (ties broken by keys)
    js = [r["jaccard"] for r in out]
    assert js == sorted(js, reverse=True)


# --- plan shapes -----------------------------------------------------------


def test_expectations_suite_single_scan(spark, sf_dir):
    """All six expectations must fuse into ONE scan of orders (the whole
    point of the declarative one-pass design)."""
    plan = _plan(
        spark, REGISTRY["dq_expectations_suite"].fn(spark, sf_dir)
    )
    assert plan.count("orders.parquet") == 1


def test_common_neighbors_degrees_broadcast(spark, sf_dir):
    plan = _plan(spark, REGISTRY["graph_common_neighbors"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "degree joins must broadcast"
    assert "CartesianProduct" not in plan


def test_time_to_event_no_cartesian(spark, sf_dir):
    plan = _plan(spark, REGISTRY["agg_time_to_event"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_markov_single_event_pass(spark, sf_dir):
    """Adjacency comes from the lag window: events must be scanned once
    (no self-join on the event table)."""
    plan = _plan(spark, REGISTRY["agg_markov_transitions"].fn(spark, sf_dir))
    assert plan.count("events.parquet") == 1
    assert "CartesianProduct" not in plan


def test_survival_km_planted(spark, tmp_path):
    """Hand-computed KM: 4 signups at day 0; two purchase on day 1
    (S = 1 - 2/4 = 0.5), one on day 3 with risk set {u2, u3}
    (S = 0.5 * (1 - 1/2) = 0.25), one censored at the horizon (day 4)."""
    rows = [
        (1, "2024-03-01 00:00:00", 1, "signup", 1.0),
        (2, "2024-03-01 00:00:00", 2, "signup", 1.0),
        (3, "2024-03-01 00:00:00", 3, "signup", 1.0),
        (4, "2024-03-01 00:00:00", 4, "signup", 1.0),
        (5, "2024-03-02 00:00:00", 1, "purchase", 1.0),
        (6, "2024-03-02 00:00:00", 4, "purchase", 1.0),
        (7, "2024-03-04 00:00:00", 2, "purchase", 1.0),
        (8, "2024-03-05 00:00:00", 9, "view", 1.0),  # horizon marker
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = REGISTRY["agg_survival_km"].fn(spark, sf).collect()
    got = [(r["day"], r["n_risk"], r["n_events"], r["km_survival"]) for r in out]
    assert got == [(1, 4, 2, pytest.approx(0.5, abs=1e-6)),
                   (3, 2, 1, pytest.approx(0.25, abs=1e-6))]


def test_survival_km_monotone(spark, sf_dir):
    out = REGISTRY["agg_survival_km"].fn(spark, sf_dir).collect()
    assert out
    last_s, last_r = 1.0 + 1e-12, None
    for r in out:
        assert 0.0 < r["km_survival"] <= last_s + 1e-9
        if last_r is not None:
            assert r["n_risk"] <= last_r
        last_s, last_r = r["km_survival"], r["n_risk"]


def test_relative_risk_consistent(spark, sf_dir):
    out = REGISTRY["agg_relative_risk"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    assert r["a"] + r["b"] + r["c"] + r["d"] == n_users
    assert r["rr_ci_lo"] <= r["relative_risk"] <= r["rr_ci_hi"]
    expected_or = (r["a"] * r["d"]) / (r["b"] * r["c"])
    assert r["odds_ratio"] == pytest.approx(expected_or, abs=1e-4)


def test_token_budget_waterfill(spark, sf_dir):
    out = REGISTRY["llm_token_budget_alloc"].fn(spark, sf_dir).collect()
    assert out
    total = sum(r["avail"] for r in out)
    budget = total // 2
    allocated = sum(r["allocated"] for r in out)
    # allocations exhaust the budget (within per-source rounding)
    assert allocated == pytest.approx(budget, abs=0.01 * len(out) + 1)
    levels = set()
    for r in out:
        assert r["allocated"] <= r["avail"] + 1e-9
        if r["capped"]:
            levels.add(r["allocated"])
        else:
            assert r["allocated"] == pytest.approx(r["avail"], abs=1e-9)
    # every capped source sits on the SAME waterline
    assert len(levels) <= 1
    # budget < total means someone must be capped
    if total > budget:
        assert levels, "expected at least one capped source"


def _write_docs(spark, tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_bigram_perplexity_hand_computed(spark, tmp_path):
    """Corpus: doc1 'a b a b' (3 bigrams: ab, ba, ab), doc2 'a c'.
    Model: c(ab)=2, c(ba)=1, c(ac)=1 -> c(a.)=3, c(b.)=1. doc2's single
    term is ln(1/3) -> ppl exactly 3.0; doc1 = exp(-(2 ln(2/3))/3)."""
    sf = _write_docs(spark, tmp_path, ["a b a b", "a c"])
    out = {r["doc_id"]: r for r in
           REGISTRY["llm_bigram_perplexity"].fn(spark, sf).collect()}
    assert out[2]["n_bigrams"] == 1 and out[2]["ppl"] == pytest.approx(3.0)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["ppl"] == pytest.approx(
        math.exp(-2 * math.log(2 / 3) / 3), abs=1e-4
    )


def test_bigram_perplexity_floor(spark, sf_dir):
    out = REGISTRY["llm_bigram_perplexity"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["ppl"] >= 1.0 - 1e-9  # MLE perplexity can't beat 1


def test_pmi_planted_collocation(spark, tmp_path):
    """'new york' co-occurs always and only together (6 times, above the
    min-count floor) amid independent filler, so it must top the PMI
    list."""
    filler = "the of and to in for on at by the of and to in for on at by"
    texts = [f"{filler} new york {filler}" for _ in range(6)]
    sf = _write_docs(spark, tmp_path, texts)
    out = REGISTRY["llm_pmi_collocations"].fn(spark, sf).collect()
    assert out
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)
    for r in out:
        assert r["c12"] >= 5
