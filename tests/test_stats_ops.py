"""Invariant + plan tests for the inferential-stats batch (batch 20):
hand-computed Welch/Mann-Whitney statistics on planted two-group data, a
planted lead-lag shift recovered at exactly r=1, hand-computed Flesch
scores, k-NN graph structural guarantees (degree, rank density, no self
edges, mutual top-1 for a planted twin pair), novelty conservation
(Σ n_novel == |distinct bigrams|), priority-sample determinism, and the
plan shapes the scale docstrings claim (readability shuffle-free,
reservoir via TakeOrderedAndProject, no cartesian products)."""

from __future__ import annotations

import math

import pandas as pd

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _plan(spark, df, mode: str = "simple") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


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


def _write_docs(spark, tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "src0",
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


# ---------------------------------------------------------------------------
# Welch / Mann-Whitney on planted groups
# ---------------------------------------------------------------------------


def _two_group_rows(a_vals, b_vals):
    rows = []
    for i, v in enumerate(a_vals):
        rows.append((i, "2024-01-01 00:00:00", 1, "aa", v))
    for j, v in enumerate(b_vals):
        rows.append((100 + j, "2024-01-01 00:00:00", 1, "bb", v))
    return rows


def test_welch_hand_computed(spark, tmp_path):
    """A=[1,2,3], B=[2,4,6,8]: mean 2 vs 5, var 1 vs 20/3 — t and the
    Welch-Satterthwaite df must equal the textbook numbers."""
    sf = _write_events(
        spark, tmp_path, _two_group_rows([1.0, 2.0, 3.0], [2.0, 4.0, 6.0, 8.0])
    )
    rows = REGISTRY["agg_welch_ttest"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"], r["n_a"], r["n_b"]) == ("aa", "bb", 3, 4)
    va_n, vb_n = 1.0 / 3, (20.0 / 3) / 4
    t = -3.0 / math.sqrt(va_n + vb_n)
    df = (va_n + vb_n) ** 2 / (va_n**2 / 2 + vb_n**2 / 3)
    assert r["mean_diff"] == -3.0
    assert r["t_stat"] == _dround(t, 4)
    assert r["df"] == _dround(df, 2)


def test_mann_whitney_no_overlap(spark, tmp_path):
    """Fully separated groups A=[1,2,3] < B=[4,5,6,7]: U_a = 0 and
    z = -6/sqrt(8) (no ties, so the tie term vanishes)."""
    sf = _write_events(
        spark, tmp_path, _two_group_rows([1.0, 2.0, 3.0], [4.0, 5.0, 6.0, 7.0])
    )
    rows = REGISTRY["agg_mann_whitney"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["u_a"] == 0.0
    assert r["z"] == _dround(-6.0 / math.sqrt(8.0), 4)


def test_mann_whitney_all_tied_pair_excluded(spark, tmp_path):
    """Both groups entirely one value: sigma == 0, the pair must be
    excluded rather than emit a division-by-zero artifact."""
    sf = _write_events(
        spark, tmp_path, _two_group_rows([5.0, 5.0, 5.0], [5.0, 5.0])
    )
    assert REGISTRY["agg_mann_whitney"].fn(spark, sf).count() == 0


def test_mann_whitney_u_bounds(spark, sf_dir):
    """On the real fixture: 0 <= U_a <= n_a*n_b for every pair, and the
    pair list is the full C(T,2) upper triangle."""
    rows = REGISTRY["agg_mann_whitney"].fn(spark, sf_dir).collect()
    types = set()
    for r in rows:
        types |= {r["type_a"], r["type_b"]}
        assert 0 <= r["u_a"] <= r["n_a"] * r["n_b"]
        assert r["type_a"] < r["type_b"]
    t = len(types)
    assert len(rows) == t * (t - 1) // 2


# ---------------------------------------------------------------------------
# Cross-correlation: planted 2-day lead recovered exactly
# ---------------------------------------------------------------------------


def test_xcorr_planted_shift(spark, tmp_path):
    """Series bb(t) = aa(t-2) counts over 20 days: the (aa, bb) pair must
    show r == 1.0 at lag 2 and |r| < 1 at the other lags."""
    rows, eid = [], 0
    # aa counts on day d: 1 + (d % 4) — variance > 0, period 4 so lag-2
    # autocorrelation is NOT trivially 1 (only the planted shift is).
    for d in range(1, 21):
        for _ in range(1 + (d % 4)):
            eid += 1
            rows.append((eid, f"2024-03-{d:02d} 06:00:00", 1, "aa", 1.0))
    for d in range(3, 23):
        for _ in range(1 + ((d - 2) % 4)):
            eid += 1
            day = f"2024-03-{d:02d}" if d <= 31 else None
            rows.append((eid, f"{day} 06:00:00", 1, "bb", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["lag"]: r["r"]
        for r in REGISTRY["ts_cross_correlation"].fn(spark, sf).collect()
        if r["type_lead"] == "aa" and r["type_lag"] == "bb"
    }
    assert out[2] == 1.0
    assert all(abs(v) < 1.0 for lag, v in out.items() if lag != 2)


# ---------------------------------------------------------------------------
# Readability: hand-computed Flesch scores
# ---------------------------------------------------------------------------


def test_readability_hand_computed(spark, tmp_path):
    """'go to it' = 3 words / 1 sentence (clamped) / 3 vowel groups:
    FRE = 206.835 - 1.015*3 - 84.6*1; 'Stop! Go now.' exercises the
    sentence counter (2 sentence-end runs)."""
    sf = _write_docs(spark, tmp_path, ["go to it", "Stop! Go now.", ""])
    rows = {r["doc_id"]: r for r in REGISTRY["llm_readability"].fn(spark, sf).collect()}
    r0 = rows[0]
    assert (r0["n_words"], r0["n_sents"], r0["n_syll"]) == (3, 1, 3)
    assert r0["fre"] == _dround(206.835 - 1.015 * 3 - 84.6 * 1, 2)
    assert r0["fk_grade"] == _dround(0.39 * 3 + 11.8 * 1 - 15.59, 2)
    assert rows[1]["n_sents"] == 2
    assert 2 not in rows  # zero-word doc drops out


def test_readability_plan_shuffle_free(spark, sf_dir):
    """The docstring claims a pure per-row projection: the physical plan
    must contain no Exchange and no python UDF."""
    df = REGISTRY["llm_readability"].fn(spark, sf_dir)
    plan = _plan(spark, df, "formatted")
    body = plan.split("AdaptiveSparkPlan")[0] if "AdaptiveSparkPlan" in plan else plan
    # the global ORDER BY is the only allowed exchange (range partitioning)
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "rangepartitioning" for e in exchanges), exchanges
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert body  # plan rendered


# ---------------------------------------------------------------------------
# k-NN graph structure
# ---------------------------------------------------------------------------


def test_knn_graph_structure(spark, sf_dir):
    """Every node has exactly k neighbors with dense ranks 1..k, no self
    edges, and cosines inside [-1, 1] (+ rounding grid)."""
    import duckdb

    n_vecs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    rows = REGISTRY["llm_knn_graph"].fn(spark, sf_dir).collect()
    assert len(rows) == 5 * n_vecs
    by_node: dict[int, list] = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        by_node.setdefault(r["vec_id"], []).append(r)
    for vid, nb in by_node.items():
        assert sorted(x["rnk"] for x in nb) == [1, 2, 3, 4, 5]
        sims = [x["cos_sim"] for x in sorted(nb, key=lambda x: x["rnk"])]
        assert sims == sorted(sims, reverse=True)


def test_knn_graph_twin_pair_mutual_top1(spark, tmp_path):
    """Two identical vectors among orthogonal noise must be each other's
    rank-1 neighbor with cos_sim == 1."""
    dim = 64
    vecs = []
    for i in range(8):
        v = [0.0] * dim
        v[i] = 1.0
        vecs.append((i, v, 0))
    twin = [0.5] * dim
    vecs.append((100, list(twin), 1))
    vecs.append((101, list(twin), 1))
    pdf = pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/embeddings.parquet"
    )
    rows = REGISTRY["llm_knn_graph"].fn(spark, sf).collect()
    top1 = {r["vec_id"]: r for r in rows if r["rnk"] == 1}
    assert top1[100]["neighbor_id"] == 101 and top1[100]["cos_sim"] == 1.0
    assert top1[101]["neighbor_id"] == 100 and top1[101]["cos_sim"] == 1.0


# ---------------------------------------------------------------------------
# Novelty: conservation + first-doc totality
# ---------------------------------------------------------------------------


def test_novelty_conservation(spark, sf_dir):
    """Each distinct bigram is novel in exactly one doc (its min doc_id):
    Σ n_novel == |distinct (w1,w2)|, the first doc scores novelty 1.0,
    and every rate is in (0, 1]."""
    rows = REGISTRY["llm_novelty_rate"].fn(spark, sf_dir).collect()
    import duckdb

    n_distinct = duckdb.sql(
        f"""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                          generate_subscripts(string_split(text, ' '), 1) AS p
                   FROM read_parquet('{sf_dir}/documents.parquet')
                   ),
        tt AS (SELECT doc_id, w, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS i
               FROM t WHERE w <> '')
        SELECT COUNT(DISTINCT (a.w, b.w))
        FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        """
    ).fetchone()[0]
    assert sum(r["n_novel"] for r in rows) == n_distinct
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty"] == 1.0 and first["n_novel"] == first["n_bigrams"]
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_bigrams"]


# ---------------------------------------------------------------------------
# Priority sampling: determinism, size, weighting, plan
# ---------------------------------------------------------------------------


def test_reservoir_deterministic_and_weighted(spark, sf_dir):
    """Two invocations return identical row sets of exactly n rows, and
    the sample's mean weight exceeds the population mean (inclusion
    probability rises with weight)."""
    import duckdb

    a = REGISTRY["sample_weighted_reservoir"].fn(spark, sf_dir).collect()
    b = REGISTRY["sample_weighted_reservoir"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 100
    pop_mean = duckdb.sql(
        f"SELECT AVG(o_totalprice) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    samp_mean = sum(r["o_totalprice"] for r in a) / len(a)
    assert samp_mean > pop_mean


def test_reservoir_plan_take_ordered(spark, sf_dir):
    """The docstring claims no global sort: the plan must use
    TakeOrderedAndProject, not Sort + Exchange rangepartitioning."""
    df = REGISTRY["sample_weighted_reservoir"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# Batch-wide plan hygiene
# ---------------------------------------------------------------------------


def test_no_cartesian_in_stats_batch(spark, sf_dir):
    """The pair joins are all broadcast/condition joins over metadata-sized
    inputs — none may plan as CartesianProduct."""
    for key in (
        "agg_welch_ttest",
        "agg_mann_whitney",
        "ts_cross_correlation",
        "llm_novelty_rate",
    ):
        plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, key


def test_welch_single_event_scan(spark, sf_dir):
    """The moment sketch means ONE scan of events feeds every pair: the
    formatted plan must contain exactly one events scan."""
    plan = _plan(spark, REGISTRY["agg_welch_ttest"].fn(spark, sf_dir), "formatted")
    assert plan.count("events.parquet") <= 1 or plan.count("Scan parquet") == 1


# ---------------------------------------------------------------------------
# Batch 21: HHI, bootstrap, SIR, Rt, Neyman, ROUGE
# ---------------------------------------------------------------------------


def _write_tpch_small(spark, tmp_path, orders, customers, nations):
    """orders: (o_orderkey, o_custkey, o_totalprice); customers:
    (c_custkey, c_nationkey, c_mktsegment); nations: (n_nationkey, n_name)."""
    sf = str(tmp_path)
    opdf = pd.DataFrame(orders, columns=["o_orderkey", "o_custkey", "o_totalprice"])
    opdf["o_orderstatus"] = "O"
    opdf["o_orderdate"] = pd.to_datetime("2024-01-01")
    opdf["o_orderpriority"] = "1-URGENT"
    spark.createDataFrame(opdf).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    cpdf = pd.DataFrame(customers, columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    cpdf["c_name"] = "c"
    cpdf["c_acctbal"] = 0.0
    spark.createDataFrame(cpdf).write.mode("overwrite").parquet(
        f"{sf}/customer.parquet"
    )
    npdf = pd.DataFrame(nations, columns=["n_nationkey", "n_name"])
    npdf["n_regionkey"] = 0
    spark.createDataFrame(npdf).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    return sf


def test_hhi_hand_computed(spark, tmp_path):
    """One nation, customer revenues 100 (two 50s) and 300: shares
    0.25/0.75 so HHI = 10000*(0.0625+0.5625) = 6250 and CR1 = 0.75."""
    sf = _write_tpch_small(
        spark,
        tmp_path,
        orders=[(1, 1, 50.0), (2, 1, 50.0), (3, 2, 300.0)],
        customers=[(1, 0, "BUILDING"), (2, 0, "BUILDING")],
        nations=[(0, "ALGERIA")],
    )
    rows = REGISTRY["agg_hhi_concentration"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_name"], r["n_firms"], r["market_rev"]) == ("ALGERIA", 2, 400.0)
    assert r["hhi"] == 6250.0
    assert r["cr1"] == 0.75


def test_hhi_bounds(spark, sf_dir):
    """Σs² bounds: 1/n ≤ HHI/10000 ≤ cr1 ≤ 1 for every nation (the lower
    bound is equal shares, the upper is the largest-share majorant)."""
    for r in REGISTRY["agg_hhi_concentration"].fn(spark, sf_dir).collect():
        assert 10000.0 / r["n_firms"] - 1e-6 <= r["hhi"]
        assert r["hhi"] <= 10000.0 * r["cr1"] + 1e-6
        assert 0.0 < r["cr1"] <= 1.0


def test_bootstrap_deterministic_and_bounded(spark, sf_dir):
    """40 replicates of exactly 500 draws, identical across invocations
    (hash-addressed, zero rand()), every replicate mean inside the
    population value range."""
    import duckdb

    a = REGISTRY["agg_bootstrap_ci"].fn(spark, sf_dir).collect()
    b = REGISTRY["agg_bootstrap_ci"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 40
    lo, hi = duckdb.sql(
        f"SELECT MIN(value), MAX(value) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    for r in a:
        assert r["n_drawn"] == 500
        assert lo <= r["boot_mean"] <= hi


def test_sir_conservation(spark, sf_dir):
    """Indirect standardization with reference rates fitted on the same
    population must conserve the total: Σ observed == Σ expected (up to
    the per-nation 1e-4 rounding), and every SIR is positive."""
    rows = REGISTRY["agg_indirect_standardization"].fn(spark, sf_dir).collect()
    tot_obs = sum(r["observed"] for r in rows)
    tot_exp = sum(r["expected"] for r in rows)
    assert abs(tot_obs - tot_exp) < 1e-3 * len(rows) + 1e-6
    for r in rows:
        assert r["sir"] > 0.0


def test_rt_constant_series_is_one(spark, tmp_path):
    """A constant daily count c makes the serial-interval denominator
    Σw·c = 13c once the 7-day window is full, so Rt == 1.0 exactly from
    day 8 on (and > 1 on the ramp-in days where pressure is partial)."""
    rows, eid = [], 0
    for d in range(1, 21):
        for _ in range(3):
            eid += 1
            rows.append((eid, f"2024-03-{d:02d} 06:00:00", 1, "aa", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["day_s"]: r for r in REGISTRY["ts_rt_ratio"].fn(spark, sf).collect()}
    for d in range(8, 21):
        r = out[f"2024-03-{d:02d}"]
        assert r["w_denom"] == 39  # 13 * 3
        assert r["rt"] == 1.0
    assert out["2024-03-02"]["rt"] > 1.0


def test_neyman_budget_exact(spark, sf_dir):
    """Largest-remainder rounding: integer allocations sum to the budget
    EXACTLY and each sits within 1 of its exact Neyman share."""
    rows = REGISTRY["sample_neyman_allocation"].fn(spark, sf_dir).collect()
    assert sum(r["n_alloc"] for r in rows) == 1000
    for r in rows:
        assert r["n_alloc"] >= 0
        assert abs(r["n_alloc"] - r["alloc_exact"]) < 1.0 + 1e-9
        assert r["s_h"] >= 0.0


def test_rouge_identical_and_disjoint(spark, tmp_path):
    """Identical docs score F1 == 1.0; token-disjoint docs emit no pair;
    overlap never exceeds the shorter multiset."""
    sf = _write_docs(
        spark,
        tmp_path,
        ["the cat sat on the mat", "the cat sat on the mat", "zebra quagga yak"],
    )
    rows = REGISTRY["llm_rouge_overlap"].fn(spark, sf).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert pairs[(0, 1)]["rouge1_f1"] == 1.0
    assert pairs[(0, 1)]["overlap"] == 6
    assert not any(2 in p for p in pairs)
    for r in rows:
        assert r["overlap"] <= min(r["len_a"], r["len_b"])
        assert 0.0 < r["rouge1_f1"] <= 1.0


def test_rouge_collapse_equals_naive(spark, sf_dir):
    """The exact-collapse branch (dup-dense gate) must emit EXACTLY the
    naive blocked pair set — fixture is below the density gate, so the
    registry key runs naive and the collapsed branch is called directly
    (the llm_dedup_near equality-pin idiom)."""
    from sdp_spark.operators import stats as st

    naive = sorted(tuple(r) for r in REGISTRY["llm_rouge_overlap"].fn(spark, sf_dir).collect())
    coll = sorted(tuple(r) for r in st._rouge_collapsed(spark, sf_dir).collect())
    assert naive == coll and len(naive) > 0


def test_no_cartesian_in_batch21(spark, sf_dir):
    """HHI/SIR/Rt/ROUGE join on keys or banded conditions over rolled-up
    or blocked inputs — none may plan as CartesianProduct."""
    for key in (
        "agg_hhi_concentration",
        "agg_indirect_standardization",
        "ts_rt_ratio",
        "llm_rouge_overlap",
        "agg_bootstrap_ci",
    ):
        plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, key
