"""Cross-operator semantic properties (SURVEY.md §5.2 item 4): invariants
that must hold between operators regardless of data, checked on fixtures
and small literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdp_spark.plans.registry import load_all
from sdp_spark.sources.fixtures import table

REGISTRY = load_all()


def test_topk_is_prefix_of_full_sort(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    full = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .collect()
    )
    topk = REGISTRY["topk"].fn(spark, sf_dir).collect()
    assert topk == full


def test_union_all_count_additivity(spark, sf_dir):
    c = table(spark, sf_dir, "customer").count()
    s = table(spark, sf_dir, "supplier").count()
    assert REGISTRY["set_union_all"].fn(spark, sf_dir).count() == c + s


def test_distinct_idempotent(spark, sf_dir):
    d1 = REGISTRY["dedup_distinct"].fn(spark, sf_dir)
    assert d1.count() == d1.distinct().count()


def test_semi_anti_partition_customers(spark, sf_dir):
    """left_semi(anything) + left_anti(same) partitions the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = REGISTRY["join_anti"].fn(spark, sf_dir).count()
    assert semi + anti == c.count()


def test_intersect_except_partition_union(spark, sf_dir):
    """distinct(A) = (A ∩ B) ∪ (A \\ B) for nationkey projections."""
    inter = {r["nationkey"] for r in REGISTRY["set_intersect"].fn(spark, sf_dir).collect()}
    exc = {r["nationkey"] for r in REGISTRY["set_except"].fn(spark, sf_dir).collect()}
    a = {
        r["c_nationkey"]
        for r in table(spark, sf_dir, "customer").select("c_nationkey").distinct().collect()
    }
    assert inter | exc == a and not (inter & exc)


def test_rollup_row_counts(spark, sf_dir):
    """ROLLUP(r, n) = leaf groups + per-region subtotals + grand total."""
    rows = REGISTRY["agg_rollup"].fn(spark, sf_dir).collect()
    leaves = [r for r in rows if r["g_region"] == 0 and r["g_nation"] == 0]
    region_subs = [r for r in rows if r["g_region"] == 0 and r["g_nation"] == 1]
    grand = [r for r in rows if r["g_region"] == 1 and r["g_nation"] == 1]
    assert len(grand) == 1
    assert len(region_subs) == 5
    assert len(leaves) == 25
    assert grand[0]["n_rows"] == sum(r["n_rows"] for r in region_subs) == 25


def test_not_in_with_null_is_empty(spark):
    """MySQL/ANSI 3VL: x NOT IN (subquery containing NULL) is never true."""
    spark.createDataFrame([(1,), (2,)], ["x"]).createOrReplaceTempView("t_a")
    spark.createDataFrame([(1,), (None,)], "y int").createOrReplaceTempView("t_b")
    n = spark.sql("SELECT x FROM t_a WHERE x NOT IN (SELECT y FROM t_b)").count()
    assert n == 0


def test_full_outer_covers_both_sides(spark, sf_dir):
    rows = REGISTRY["join_full"].fn(spark, sf_dir).collect()
    cust_nations = {
        r["c_nationkey"]
        for r in table(spark, sf_dir, "customer").select("c_nationkey").distinct().collect()
    }
    supp_nations = {
        r["s_nationkey"]
        for r in table(spark, sf_dir, "supplier").select("s_nationkey").distinct().collect()
    }
    assert {r["nationkey"] for r in rows} == cust_nations | supp_nations


def test_window_topk_matches_per_group_sort(spark, sf_dir):
    """win_topk_group rows per group == min(3, group size), ranked correctly."""
    rows = REGISTRY["win_topk_group"].fn(spark, sf_dir).collect()
    c = table(spark, sf_dir, "customer")
    sizes = {r["c_nationkey"]: r["n"] for r in c.groupBy("c_nationkey").agg(F.count("*").alias("n")).collect()}
    per_group: dict[int, int] = {}
    for r in rows:
        per_group[r["c_nationkey"]] = per_group.get(r["c_nationkey"], 0) + 1
    for k, n in per_group.items():
        assert n == min(3, sizes[k])


def test_asof_join_view_precedes_purchase(spark, sf_dir):
    """Every matched as-of view event must belong to the same user and not
    follow its purchase."""
    asof = REGISTRY["join_asof"].fn(spark, sf_dir)
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    p = e.withColumnRenamed("event_id", "purchase_id").withColumnRenamed("ts", "p_ts")
    v = e.select(
        F.col("event_id").alias("asof_view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    joined = asof.dropna().join(p, ["purchase_id", "user_id"]).join(v, "asof_view_id")
    bad = joined.filter((F.col("v_user") != F.col("user_id")) | (F.col("v_ts") > F.col("p_ts")))
    assert bad.count() == 0


def test_sort_nulls_order_is_real(spark, sf_dir):
    """The oracle harness compares order-insensitively, so NULLS FIRST must
    be pinned by an order-sensitive check: collected rows start with the
    NULL block, and keys descend within each block."""
    rows = REGISTRY["sort_nulls"].fn(spark, sf_dir).collect()
    null_block = [r for r in rows if r["st"] is None]
    assert rows[: len(null_block)] == null_block, "NULLs are not a prefix"
    keys = [r["o_orderkey"] for r in null_block]
    assert keys == sorted(keys, reverse=True), "tiebreaker not DESC in NULL block"
    rest = [r for r in rows[len(null_block):]]
    assert all(r["st"] is not None for r in rest)
    assert [r["st"] for r in rest] == sorted(r["st"] for r in rest)


def test_sample_splits_are_stable_and_disjoint(spark, sf_dir):
    """Same row -> same split on every run; labels partition the sample."""
    a = {r["o_orderkey"]: r["split"] for r in REGISTRY["sample_systematic"].fn(spark, sf_dir).collect()}
    b = {r["o_orderkey"]: r["split"] for r in REGISTRY["sample_systematic"].fn(spark, sf_dir).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "valid", "test"}
    n = table(spark, sf_dir, "orders").count()
    # ~30% kept (10% train sample + 20% eval tail)
    assert 0.15 * n < len(a) < 0.45 * n


def test_fulltext_matches_contain_query_terms(spark, sf_dir):
    """Natural mode: every returned doc contains >= 1 query term with
    positive relevance; boolean mode: +term present, -term absent."""
    from sdp_spark.operators.fulltext import _FT_TERMS

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    nat = REGISTRY["filter_fulltext"].fn(spark, sf_dir).collect()
    assert nat
    for r in nat:
        assert r["relevance"] > 0
        assert any(t in docs[r["doc_id"]].split(" ") for t in _FT_TERMS)
    boolean = REGISTRY["filter_fulltext_bool"].fn(spark, sf_dir).collect()
    assert boolean
    for r in boolean[:50]:
        toks = docs[r["doc_id"]].split(" ")
        assert "stream" in toks and "window" not in toks


def test_train_corpus_counts_reconcile(spark, sf_dir):
    """Pipeline accounting must reconcile with its own stages: total docs ==
    deduped keepers of the filtered set; budgets positive."""
    rows = REGISTRY["llm_pipeline_train_corpus"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    d = table(spark, sf_dir, "documents")
    filtered = d.filter(F.col("lang").isin("en", "es") & F.col("n_chars").between(100, 500))
    keepers = filtered.groupBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).count().count()
    assert total == keepers
    assert all(r["token_budget"] > 0 for r in rows)


def test_autoincrement_dense_and_key_ordered(spark, sf_dir):
    """Surrogate keys: exactly 1..N, and id order == key order."""
    rows = REGISTRY["sink_autoincrement"].fn(spark, sf_dir).collect()
    ids = sorted(r["row_id"] for r in rows)
    assert ids == list(range(1, len(rows) + 1)), "ids must be dense 1..N"
    by_id = sorted(rows, key=lambda r: r["row_id"])
    keys = [r["o_orderkey"] for r in by_id]
    assert keys == sorted(keys), "id order must follow the declared key order"


def test_domain_mix_shares_and_weights(spark, sf_dir):
    """Token shares sum to 1; weights are in (0, 1] and only over-cap
    sources are down-weighted."""
    rows = REGISTRY["llm_domain_mix"].fn(spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    # Branch on the UNROUNDED share (recomputed from exact token counts):
    # a true share in (0.10, 0.1000005] rounds to 0.10 and would otherwise
    # flip into the under-cap branch while the weight rounds below 1.0.
    tot_tokens = sum(r["n_tokens"] for r in rows)
    for r in rows:
        true_share = r["n_tokens"] / tot_tokens
        assert 0.0 < r["sample_weight"] <= 1.0
        if true_share <= 0.10:
            assert r["sample_weight"] == 1.0, f"under-cap source {r['source']} down-weighted"
        else:
            assert r["sample_weight"] < 1.0


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    """Chunking invariants: chunk 0 starts at token 0; consecutive chunks
    advance by the stride; every token index is covered by some chunk; the
    reassembled stride-prefixes reconstruct the document."""
    from sdp_spark.operators.corpus import _CHUNK_STRIDE, _CHUNK_TOKENS

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in table(spark, sf_dir, "documents").collect()
    }
    chunks = REGISTRY["llm_chunk_windows"].fn(spark, sf_dir).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c["chunk_idx"])
        toks = docs[doc_id]
        assert [c["chunk_idx"] for c in cs] == list(range(len(cs)))
        for c in cs:
            start = c["chunk_idx"] * _CHUNK_STRIDE
            expect = toks[start : start + _CHUNK_TOKENS]
            assert c["chunk"].split(" ") == expect
            assert c["n_toks"] == len(expect)
        covered = (len(cs) - 1) * _CHUNK_STRIDE + cs[-1]["n_toks"]
        assert covered == len(toks), "chunks must cover every token exactly"


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    """Exactly ceil(frac * n) docs per language, deterministic."""
    import math

    from sdp_spark.operators.corpus import _STRAT_FRAC

    got = {}
    for r in REGISTRY["llm_sample_stratified"].fn(spark, sf_dir).collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    totals = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == set(totals)
    for lang, n in totals.items():
        assert got[lang] == math.ceil(n * _STRAT_FRAC), lang


def test_bpe_apply_training_log_invariants(spark, sf_dir):
    """Round 1's merge must be the argmax of llm_bpe_pair_counts; symbol
    counts strictly decrease; each round's post-merge count equals the
    pre-merge count minus the non-overlapping merges performed."""
    log = REGISTRY["llm_bpe_apply"].fn(spark, sf_dir).collect()
    assert [r["round"] for r in log] == [1, 2, 3]
    top_pair = REGISTRY["llm_bpe_pair_counts"].fn(spark, sf_dir).collect()[0]
    assert log[0]["merged_pair"] == top_pair["pair"][0] + "+" + top_pair["pair"][1]
    counts = [r["symbols_after"] for r in log]
    assert counts == sorted(counts, reverse=True) and len(set(counts)) == 3
    # decode losslessness + exact merge accounting, recomputed in python
    d = table(spark, sf_dir, "documents").select("text").collect()
    words = [w for r in d for w in r["text"].split(" ") if len(w) >= 2]
    syms = [list(w) for w in words]
    before = sum(len(s) for s in syms)
    for r in log:
        a, b = r["merged_pair"].split("+")
        merges = 0
        for s in syms:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                    merges += 1
                else:
                    out.append(x)
            s[:] = out
        before -= merges
        assert r["symbols_after"] == before, f"round {r['round']} accounting"
    assert all("".join(s) == w for s, w in zip(syms, words)), "decode loss"


def test_sized_files_cap_honored(spark, sf_dir):
    """Every parquet file written by sink_sized_files holds at most the
    configured record cap, and the multi-file dataset is lossless."""
    from sdp_spark.operators.scans import _SIZED_MAX_RECORDS

    df = REGISTRY["sink_sized_files"].fn(spark, sf_dir)
    files = df.inputFiles()
    assert files, "no files written"
    total = 0
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= _SIZED_MAX_RECORDS, f"{f} exceeds cap ({n})"
        total += n
    assert total == df.count()


def test_cdc_chunks_reconstruct_and_resync(spark, sf_dir):
    """CDC invariants: (a) per-doc chunks reassemble the document; (b) a
    prefix edit only disturbs chunks up to the first post-edit boundary —
    the shifted copy re-synchronizes (shares every later chunk hash),
    which fixed-stride chunking cannot do."""
    from sdp_spark.operators.corpus import _cdc_chunks

    d = table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    chunks = _cdc_chunks(d).collect()
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n_tokens = sum(r["chunk_tokens"] for r in rows)
        assert n_tokens == len(texts[doc_id].split(" ")), doc_id
    # (b) shift-robustness on a synthetic pair: doc vs EDIT-prefixed doc
    base = texts[sorted(texts)[0]]
    pair = spark.createDataFrame(
        [(1, base), (2, "zzz qqq " + base)], "doc_id LONG, text STRING"
    )
    pc = _cdc_chunks(pair).collect()
    h1 = [r["chunk_hash"] for r in sorted((r for r in pc if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted((r for r in pc if r["doc_id"] == 2), key=lambda r: r["chunk_idx"])]
    # all chunks after the first boundary of doc 1 must reappear in doc 2
    assert len(h1) > 1, "fixture doc produced a single chunk; widen the doc"
    assert set(h1[1:]) <= set(h2), "CDC failed to re-synchronize after edit"


def test_bpe_pairs_guard_single_symbol_words(spark):
    """A word that fully merges into one symbol must not crash pair
    extraction in later rounds (sequence(1,0) runs descending)."""
    from sdp_spark.operators.corpus import _bpe_merge_expr

    df = spark.createDataFrame([("in",), ("inn",)], "w STRING").selectExpr(
        "w", "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms"
    )
    merged = df.selectExpr("w", _bpe_merge_expr("i", "n") + " AS syms")
    pairs = merged.filter(F.size("syms") >= 2).selectExpr(
        "explode(transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))) AS p"
    )
    got = [(r["p"]["a"], r["p"]["b"]) for r in pairs.collect()]
    assert got == [("in", "n")], got  # 'in' fully merged, contributes nothing


def test_cdc_chunks_minimal_docs(spark):
    """Docs with exactly the window width (4 tokens) are one whole chunk,
    not a crash; 3-token docs are filtered; reconstruction holds."""
    from sdp_spark.operators.corpus import _cdc_chunks

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "w1 w2 w3 w4 w5 w6 w7 w8")],
        "doc_id LONG, text STRING",
    )
    rows = _cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["chunk_tokens"]
    assert by_doc[1] == 4 and 2 not in by_doc and by_doc[3] == 8


def test_dynamic_overwrite_touches_only_restated_partition(spark, sf_dir):
    """Dynamic-mode proof, independently staged so the before-state is
    observable: write a 3-partition table, snapshot every partition's
    file listing + mtimes, dynamically overwrite ONE partition, then
    assert (a) the other partitions' files are bit-identical (same
    paths, same mtimes — static mode would truncate them) and (b) the
    restated partition's values actually changed."""
    import glob
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="sdp_dynover_test_")
    base = spark.createDataFrame(
        [(i, float(i), f"p{i % 3}") for i in range(30)],
        "id LONG, v DOUBLE, part STRING",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(out)

    def snap(p):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(out, f"part={p}", "*.parquet"))
        }

    before = {p: snap(p) for p in ("p0", "p1", "p2")}
    restated = base.filter(F.col("part") == "p1").withColumn(
        "v", F.col("v") * 10
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part")
        .parquet(out)
    )
    assert snap("p0") == before["p0"], "p0 files rewritten — not partition-scoped"
    assert snap("p2") == before["p2"], "p2 files rewritten — not partition-scoped"
    assert snap("p1") != before["p1"], "restated partition unchanged"
    got = {
        r["id"]: r["v"]
        for r in spark.read.parquet(out).filter(F.col("part") == "p1").collect()
    }
    assert got and all(v == k * 10.0 for k, v in got.items()), "values not restated"
    # and the registered operator's 12-month output reconciles
    from sdp_spark.operators.scans import _RESTATE_MONTH

    df = REGISTRY["sink_dynamic_overwrite"].fn(spark, sf_dir)
    months = {r["m"] for r in df.select("m").distinct().collect()}
    assert len(months) == 12 and _RESTATE_MONTH in months
    n_src = (
        table(spark, sf_dir, "orders")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == _RESTATE_MONTH)
        .count()
    )
    assert df.filter(F.col("m") == _RESTATE_MONTH).count() == n_src


def test_cusum_reflection_identity_property():
    """The algebraic identity query_outbreak_cusum's lowering rests on:
    for ANY real sequence u, max(0, S_{t-1} + u_t) == cum_t − min(0,
    min_{j≤t} cum_j). Pure-python hypothesis check, no Spark needed —
    this is the proof obligation of the declarative CUSUM."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=60))
    def check(us):
        # integer arithmetic: the engine runs the same identity in DECIMAL
        s = 0
        cum = 0
        lo = 0
        for u in us:
            s = max(0, s + u)
            cum += u
            lo = min(lo, cum)
            assert s == cum - min(0, lo)

    check()


def test_weighted_median_collapse_property():
    """The tie-run collapse agg_weighted_percentile rests on: cumulating
    per-value weight totals (RANGE-frame semantics) selects the same
    weighted median as cumulating raw rows with peers included. Random
    multisets with duplicate values and integer weights."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 10), st.integers(1, 100)),
            min_size=1,
            max_size=50,
        ),
        st.randoms(use_true_random=False),
    )
    def check(pairs, rng):
        tot = sum(w for _, w in pairs)
        # RAW form, literally per row in an ARBITRARY tie order: each row's
        # RANGE-frame cum is the weight of every row whose value <= its own
        # (peers included); qualifying rows have 2*cum >= tot; the operator
        # takes MIN(value) over them
        rows = list(pairs)
        rng.shuffle(rows)
        raw_qualifying = []
        for v, _ in rows:
            cum = sum(w2 for v2, w2 in rows if v2 <= v)
            if 2 * cum >= tot:
                raw_qualifying.append(v)
        raw_median = min(raw_qualifying)
        # COLLAPSED form (what the operator now executes): cumulate the
        # per-value weight histogram
        by_v = defaultdict(int)
        for v, w in pairs:
            by_v[v] += w
        cum2 = 0
        col_median = None
        for v in sorted(by_v):
            cum2 += by_v[v]
            if 2 * cum2 >= tot:
                col_median = v
                break
        assert raw_median == col_median is not None

    check()


def test_winnowing_selection_property():
    """The window-argmin lowering llm_winnow_fingerprint rests on: for ANY
    hash sequence, the Spark/DuckDB expression — per window p, (min of the
    window, rightmost position attaining it), then dedup — equals the
    reference winnowing algorithm (Schleimer et al. §4: slide, pick
    rightmost minimal hash, record once). Also re-proves the coverage
    theorem on random pairs: two sequences sharing a run of >= w
    consecutive equal hashes share a selected (value) fingerprint."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    W = 4

    def reference(gh):
        sel = set()
        for p in range(len(gh) - W + 1):
            win = gh[p : p + W]
            m = min(win)
            # rightmost index attaining the min
            idx = max(i for i, v in enumerate(win) if v == m)
            sel.add((p + idx, m))
        return sel

    def lowered(gh):
        sel = set()
        for p in range(1, len(gh) - W + 2):
            win = gh[p - 1 : p - 1 + W]
            m = min(win)
            arg = 0
            for i in range(1, W + 1):
                if gh[p + i - 2] == m:
                    arg = i
            sel.add((p + arg - 1 - 1, m))  # back to 0-based
        return sel

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(0, 50), min_size=W, max_size=60))
    def check(gh):
        assert lowered(gh) == reference(gh)

    check()

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 50), min_size=0, max_size=20),
        st.lists(st.integers(0, 50), min_size=W, max_size=10),
        st.lists(st.integers(0, 50), min_size=0, max_size=20),
        st.lists(st.integers(0, 50), min_size=0, max_size=20),
    )
    def coverage(pre_a, shared, post_a, pre_b):
        a = pre_a + shared + post_a
        b = pre_b + shared
        if len(a) < W or len(b) < W:
            return
        fps_a = {v for _, v in reference(a)}
        fps_b = {v for _, v in reference(b)}
        assert fps_a & fps_b, "shared >=w-run must share a fingerprint value"

    coverage()


def test_psi_term_sign_property():
    """PSI terms are individually non-negative — (c-r)·ln(c/r) >= 0 for any
    positive shares — so a per-day PSI sum can never hide drift through
    cancellation. This is the property that makes emitting per-bucket
    terms (dq_drift_psi) and a summed total (stream_drift_psi) equally
    alarm-safe."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(
        st.floats(min_value=1e-6, max_value=1.0),
        st.floats(min_value=1e-6, max_value=1.0),
    )
    def check(r, c):
        assert (c - r) * math.log(c / r) >= 0.0

    check()


def test_ewma_closed_form_property():
    """The algebraic identity query_outbreak_ewma's lowering rests on:
    for ANY sequence c and baseline mu, the recurrence
    z_t = lam*c_t + (1-lam)*z_(t-1) with z_0 = mu equals the closed form
    mu*(1-lam)^t + lam*sum_i (1-lam)^(t-i)*c_i the operator evaluates.
    Proved in EXACT rational arithmetic (fractions) so no tolerance
    hides a wrong exponent — the proof obligation of the declarative
    EWMA chart."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    lam = Fraction(3, 10)

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=0, max_value=10**4),
        st.lists(st.integers(min_value=0, max_value=10**4), min_size=1, max_size=40),
    )
    def check(mu, cs):
        mu = Fraction(mu)
        z = mu
        for t, c in enumerate(cs, start=1):
            z = lam * c + (1 - lam) * z
            closed = mu * (1 - lam) ** t + lam * sum(
                (1 - lam) ** (t - i) * Fraction(ci)
                for i, ci in enumerate(cs[:t], start=1)
            )
            assert z == closed

    check()


def test_largest_remainder_allocation_property():
    """The rounding contract sample_neyman_allocation rests on: for ANY
    positive weights and budget B, largest-remainder rounding of the
    proportional shares yields nonnegative integers that sum to B
    EXACTLY with each allocation within 1 of its exact share. Exact
    rational arithmetic; tie-break by index mirrors the operator's
    event_type tie-break."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=20),
        st.integers(min_value=0, max_value=10**4),
    )
    def check(ws, budget):
        tot = sum(ws)
        exact = [Fraction(budget) * w / tot for w in ws]
        base = [int(e) for e in exact]  # floor of nonnegative rationals
        rem = budget - sum(base)
        order = sorted(range(len(ws)), key=lambda i: (-(exact[i] - base[i]), i))
        alloc = list(base)
        for i in order[:rem]:
            alloc[i] += 1
        assert sum(alloc) == budget
        for a, e in zip(alloc, exact):
            assert a >= 0 and abs(Fraction(a) - e) < 1

    check()


def test_chapman_dominated_by_lincoln_petersen():
    """agg_capture_recapture's estimator-order invariant, proved for the
    whole integer domain the operator can emit (m >= 1, n1, n2 >= m):
    Chapman's (n1+1)(n2+1)/(m+1) - 1 never exceeds Lincoln-Petersen's
    n1*n2/m, and both dominate max(n1, n2). Exact rational arithmetic."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 10**6), st.integers(0, 10**6), st.integers(0, 10**6))
    def check(m, e1, e2):
        n1, n2 = m + e1, m + e2
        lp = Fraction(n1 * n2, m)
        chap = Fraction((n1 + 1) * (n2 + 1), m + 1) - 1
        assert chap <= lp
        assert lp >= max(n1, n2)
        assert chap >= max(n1, n2) - 1  # Chapman can undershoot by < 1

    check()
