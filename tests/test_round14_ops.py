"""Round-14 operator tests: the ANN delta commit-marker discipline
(ADVICE r13 #2), the force-rebuild memo eviction (ADVICE r13 #4), the
EM fit's left-associated product order + DuckDB-exact dec8 emulation
(ADVICE r13 #1, including the >2^26 regime the 100x fixture reaches),
batch ANN serve (batch == single-serve structural equality), filtered
ANN (predicate held through the index), and the CDC replication pair
(stream == batch, chronological binlog segments, kill-point crash
recovery)."""
import json
import os
import shutil

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Delta commit marker (ADVICE r13 #2)
# ---------------------------------------------------------------------------


def test_ann_delta_manifest_commits_last_and_gates_serving(spark, sf_dir):
    """(a) llm_ann_index_update commits a _DELTA_MANIFEST.json whose
    per-table counts equal the written delta tables; (b) the serve path
    treats a delta directory WITHOUT the marker as absent — it re-runs
    the update (which overwrites the partials) rather than reading a
    half-written crash leftover."""
    from sdp_spark.operators import llm as L
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    edges_rows = REG["llm_ann_index_update"].fn(spark, sf_dir).collect()
    path = L._ann_index_path(sf_dir)
    marker = os.path.join(path, "_DELTA_MANIFEST.json")
    assert os.path.exists(marker)
    with open(marker) as f:
        manifest = json.load(f)
    assert manifest["version"] == L._ANN_INDEX_VERSION
    for name, n in manifest["tables"].items():
        assert (
            spark.read.parquet(os.path.join(path, name)).count() == n
        ), name
    assert manifest["tables"]["edges_delta"] == len(edges_rows)

    # crash case: marker gone, edges_delta truncated to a partial write —
    # the serve path must regenerate the delta, not read the partial
    shutil.rmtree(os.path.join(path, "edges_delta"))
    os.makedirs(os.path.join(path, "edges_delta"))
    os.remove(marker)
    served = REG["llm_ann_search_delta"].fn(spark, sf_dir).collect()
    assert os.path.exists(marker)
    assert (
        spark.read.parquet(os.path.join(path, "edges_delta")).count()
        == manifest["tables"]["edges_delta"]
    )
    assert len(served) > 0


# ---------------------------------------------------------------------------
# force=True really rebuilds (ADVICE r13 #4)
# ---------------------------------------------------------------------------


def test_ann_force_rebuild_evicts_memos(spark, sf_dir):
    """force=True must re-run the component builders, not replay the
    per-application memos — otherwise the published build-vs-serve wall
    ratio under-reports the true build cost. Pin it structurally: after
    a forced rebuild the memo entries for this (app, sf_dir) are fresh
    objects, and the rebuilt index still serves identically."""
    from sdp_spark.operators import llm as L

    # force the first build too: a session-cached manifest would
    # short-circuit a plain build and never populate the memos
    L.ann_index_build(spark, sf_dir, force=True)
    app = spark.sparkContext.applicationId
    before = {
        k: v for k, v in L._KNN_EDGES_CACHE.items()
        if k[0] == app and k[1] == sf_dir
    }
    sph_before = {
        k: v for k, v in L._SPH_CACHE.items()
        if k[0] == app and k[1] == sf_dir
    }
    assert before and sph_before  # the build populated them
    path = L.ann_index_build(spark, sf_dir, force=True)
    for k, old in before.items():
        assert L._KNN_EDGES_CACHE.get(k) is not old
    for k, old in sph_before.items():
        assert L._SPH_CACHE.get(k) is not old
    assert os.path.exists(os.path.join(path, "_MANIFEST.json"))


# ---------------------------------------------------------------------------
# EM fit arithmetic (ADVICE r13 #1)
# ---------------------------------------------------------------------------


def test_em_fit_product_association_matches_sql():
    """The E-step terms must evaluate in the SQL's left-associated order
    — p folds into the running product FIRST (`it.p * c1 * c2 * c3 *
    c4`), not p * (c1*c2*c3*c4). Construct factors where the two
    associations differ by 1 ulp and check the fit's first-iteration w
    against the literal left fold."""
    import math

    from sdp_spark.operators.stats import _em_fit_driver

    # one pattern row, all-agree: pm chain = p*m1*m2*m3*m4
    rows = [{"cnt": 3.0, "g1": 1, "g2": 1, "g3": 1, "g4": 1}]
    fit = _em_fit_driver(rows)
    # replay iteration-by-iteration with the left fold; 10 iterations of
    # the same snap/clamp pipeline must land exactly on the fit
    p, m, u = 0.1, [0.9] * 4, [0.1] * 4

    def snap12(x):
        return math.floor(x * 10**12 + 0.5) / 10**12

    def dec8(x):
        return math.floor(x * 10**8 + 0.5)

    def clamp(x):
        return max(1e-6, min(0.999999, x))

    for _ in range(10):
        pm, pu = p, 1 - p
        for i in range(4):
            pm *= m[i]
            pu *= u[i]
        w = snap12(pm / (pm + pu))
        cnt = 3.0
        sw, sv, nn = dec8(w * cnt), dec8((1 - w) * cnt), dec8(cnt)
        swg = [dec8(w * cnt * 1)] * 4
        svg = [dec8((1 - w) * cnt * 1)] * 4
        sw_d, sv_d, nn_d = sw / 10**8, sv / 10**8, nn / 10**8
        p = clamp(snap12(sw_d / nn_d))
        m = [clamp(snap12(swg[i] / 10**8 / sw_d)) for i in range(4)]
        u = [clamp(snap12(svg[i] / 10**8 / sv_d)) for i in range(4)]
    assert fit["p"] == p
    assert [fit[f"m{i+1}"] for i in range(4)] == m
    assert [fit[f"u{i+1}"] for i in range(4)] == u


def test_em_dec8_emulates_duckdb_cast():
    """The fit's dec8 replays the oracle's FLOOR-double/1e8 ->
    DECIMAL(30,8) pipeline op-for-op. Pin it against the LIVE engine
    over adversarial magnitudes (2^26..2^34, where the old exact-int
    shortcut misrounded ~0.6% of terms — ADVICE r13 #1's failure
    class); a DuckDB upgrade that changes cast rounding turns this red
    instead of silently hash-drifting."""
    import math
    import random

    import duckdb
    from decimal import Decimal

    random.seed(1234)
    vals = [2 ** random.uniform(20, 34) * (1 + random.random())
            for _ in range(1500)]
    for _ in range(1500):
        cnt = random.randint(2**26, 2**31)
        w = math.floor(random.random() * 1e12 + 0.5) / 1e12
        vals.append(w * cnt)
    vals += [float(2**26), float(2**26) + 0.5, 1104896784.0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = [
        int(Decimal(str(r[0])) * 10**8)
        for r in con.execute(
            "SELECT CAST(FLOOR(x * 100000000 + 0.5) / 100000000"
            " AS DECIMAL(30,8)) FROM t"
        ).fetchall()
    ]

    def dec8(x):
        c = float(math.floor(x * 100000000 + 0.5)) / 1e8
        return round(c * 1e8)

    assert [dec8(v) for v in vals] == duck


def test_em_fit_matches_sql_chain_at_100x_magnitudes():
    """The driver fit must equal the unrolled SQL EM chain run by
    DuckDB on a pattern table with counts PAST 2**26 (the dup-dense
    100x fixture reaches 1.1e9) — the regime where the engine's own
    double-rounding departs from exact rational arithmetic and only
    the op-for-op emulation keeps the cross-engine hash."""
    import duckdb

    from sdp_spark.operators.stats import (
        _em_final_select,
        _em_fit_driver,
        _linkage_em_iter_sql,
    )

    pats = [
        (1, 1, 0, 0, 1104896784.0),
        (1, 0, 1, 0, 310764911.0),
        (0, 1, 0, 1, 67108865.0),
        (0, 0, 0, 0, 99999999.0),
        (1, 1, 1, 1, 12345.0),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pat (g1 INT, g2 INT, g3 INT, g4 INT, cnt DOUBLE)"
    )
    con.executemany("INSERT INTO pat VALUES (?, ?, ?, ?, ?)", pats)
    sql_rows = con.execute(_linkage_em_iter_sql("pat")).fetchall()
    fit = _em_fit_driver(
        [dict(zip(("g1", "g2", "g3", "g4", "cnt"), p)) for p in pats]
    )
    lit = ", ".join(
        f"CAST({fit[c]!r} AS DOUBLE) AS {c}"
        for c in ("p", "m1", "m2", "m3", "m4", "u1", "u2", "u3", "u4")
    )
    py_rows = con.execute(
        f"WITH itN AS (SELECT {lit})\n{_em_final_select('itN')}"
    ).fetchall()
    assert py_rows == sql_rows, (py_rows, sql_rows)


# ---------------------------------------------------------------------------
# Batch ANN serve (VERDICT r13 work list #5)
# ---------------------------------------------------------------------------


def test_ann_batch_serve_equals_single_serve_on_standing_queries(
    spark, sf_dir
):
    """Per-query independence is structural: the batch's rows for the
    standing queries (vec_id <= 10) must equal llm_ann_search_persisted
    row-for-row; every batch query gets exactly 5 deterministic
    neighbors; the batch is the promised query set (every 7th vector
    plus the standing queries)."""
    from sdp_spark.plans.registry import load_all
    from sdp_spark.sources.fixtures import table

    REG = load_all()
    batch = REG["llm_ann_search_batch"].fn(spark, sf_dir).collect()
    single = REG["llm_ann_search_persisted"].fn(spark, sf_dir).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])
    standing = [key(r) for r in batch if r["query_id"] <= 10]
    assert standing == [key(r) for r in single]

    n_vec = table(spark, sf_dir, "embeddings").count()
    want_q = {i for i in range(n_vec) if i <= 10 or i % 7 == 1}
    got_q = {r["query_id"] for r in batch}
    assert got_q == want_q
    per_q = {}
    for r in batch:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 5 for v in per_q.values())
    again = [key(r) for r in REG["llm_ann_search_batch"].fn(spark, sf_dir).collect()]
    assert again == [key(r) for r in batch]


# ---------------------------------------------------------------------------
# CDC replication pair (VERDICT r13 work list #6)
# ---------------------------------------------------------------------------


def test_cdc_stream_equals_batch_and_apply_semantics(spark, sf_dir):
    """The 15th pair: stream apply == batch apply row-for-row; the
    landing dir is 4 chronological binlog segments (maxFilesPerTrigger=2
    → a real 2-micro-batch run); apply semantics visible in the output —
    updated keys surface under status 'U', deleted keys are gone."""
    from sdp_spark.plans.registry import load_all
    from sdp_spark.sources.fixtures import table
    from sdp_spark.streaming.ops import _cdc_landing_dir

    REG = load_all()
    key = lambda r: (r["o_orderstatus"], r["n_orders"], r["sum_price"])
    batch = [key(r) for r in REG["dml_cdc_apply"].fn(spark, sf_dir).collect()]
    stream = [
        key(r) for r in REG["stream_cdc_apply"].fn(spark, sf_dir).collect()
    ]
    assert stream == batch and len(batch) > 0

    landing = _cdc_landing_dir(spark, sf_dir)
    segs = sorted(
        p for p in os.listdir(landing) if p.endswith(".parquet")
    )
    assert len(segs) == 4
    # chronological: each segment's max lsn < the next segment's min
    prev_max = -1
    for s in segs:
        lsns = [
            r["lsn"]
            for r in spark.read.parquet(os.path.join(landing, s)).collect()
        ]
        assert min(lsns) > prev_max
        prev_max = max(lsns)

    by_status = {s: (n, p) for s, n, p in batch}
    orders = table(spark, sf_dir, "orders")
    n_upd_live = orders.filter(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0)
    ).count()
    n_del = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    n_all = orders.count()
    assert by_status["U"][0] == n_upd_live
    assert sum(n for n, _ in by_status.values()) == n_all - n_del


# ---------------------------------------------------------------------------
# Filtered ANN (metadata predicate inside the index traversal)
# ---------------------------------------------------------------------------


def test_ann_filtered_label_constraint_and_pruning(spark, sf_dir):
    """Every returned neighbor carries its QUERY's label (the predicate
    held through the index, not post-hoc); results are the exact
    filtered rescoring of the probed posting lists (equals brute-force
    filtered top-5 whenever the filtered candidate pool covers it —
    spot-check: each neighbor's cosine >= the 5th-best in-pool value);
    deterministic across invocations."""
    from sdp_spark.plans.registry import load_all
    from sdp_spark.sources.fixtures import table

    REG = load_all()
    rows = REG["llm_ann_search_filtered"].fn(spark, sf_dir).collect()
    assert rows
    labels = {
        r["vec_id"]: r["label"]
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    per_q = {}
    for r in rows:
        assert r["label"] == labels[r["query_id"]], r
        assert r["label"] == labels[r["neighbor_id"]], r
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) <= 5 for v in per_q.values())
    again = REG["llm_ann_search_filtered"].fn(spark, sf_dir).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])
    assert [key(r) for r in again] == [key(r) for r in rows]


def test_cdc_stream_crash_recovery_copy_on_write(spark, sf_dir):
    """The r12 kill-point harness applied to the CDC pair (VERDICT r13
    work list #6): crash AFTER batch 1's version-dir write, BEFORE its
    checkpoint commit. On restart Spark redelivers batch 1; the
    derive-from-batch_id versioning means the redelivery re-reads the
    INTACT v0 (batch 0's committed state) and overwrites its own partial
    v1 — final state equals the clean batch apply exactly."""
    import tempfile

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from sdp_spark.plans.registry import load_all
    from sdp_spark.streaming.ops import (
        _cdc_apply_batch_fn,
        _cdc_landing_dir,
        _cdc_last_committed,
        _cdc_source,
    )

    REG = load_all()
    landing = _cdc_landing_dir(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sdp_cdc_recovery_")
    chk = tempfile.mkdtemp(prefix="sdp_cdc_recovery_chk_")
    inner = _cdc_apply_batch_fn(base)

    def make_fn(crash_on, delivered):
        def fn(df, batch_id):
            delivered.append(batch_id)
            inner(df, batch_id)
            if crash_on is not None and batch_id == crash_on:
                raise RuntimeError("injected crash after version write")

        return fn

    run1: list = []
    q = (
        _cdc_source(spark, landing)
        .writeStream.foreachBatch(make_fn(1, run1))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        crashed = False
    except StreamingQueryException:
        crashed = True
    assert crashed and run1 == [0, 1], run1

    run2: list = []
    q2 = (
        _cdc_source(spark, landing)
        .writeStream.foreachBatch(make_fn(None, run2))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert run2 == [1], run2  # exactly the uncommitted batch, redelivered

    from sdp_spark.operators.scans import cdc_final_agg

    final = spark.read.parquet(f"{base}/v{_cdc_last_committed(base) % 2}")
    key = lambda r: (r["o_orderstatus"], r["n_orders"], r["sum_price"])
    got = [key(r) for r in cdc_final_agg(final).collect()]
    want = [key(r) for r in REG["dml_cdc_apply"].fn(spark, sf_dir).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# Plan-shape pins (the runtime-join-key discipline from the verify notes)
# ---------------------------------------------------------------------------


def test_filtered_ann_predicate_is_join_key(spark, sf_dir):
    """The label predicate must join as part of the hash-join KEY, not
    demote to a residual filter after a coarse cell-only pairing (the
    runtime-column join-key trap): the executed plan's posting-list
    join must hash on BOTH cell and label."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    df = REG["llm_ann_search_filtered"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.split("\n") if "HashJoin [cell#" in ln
    ]
    assert join_lines, plan
    assert all(", label#" in ln for ln in join_lines), join_lines


def test_cdc_batch_apply_single_key_shuffle(spark, sf_dir):
    """The batch replication apply's only data-scale exchange is ONE
    hashpartitioning on the replication key, and the per-key max-LSN
    settle runs as a map-side WindowGroupLimit (Partial) before it —
    the 'no serial replay thread' claim, structurally."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    df = REG["dml_cdc_apply"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    key_ex = [
        ln for ln in plan.split("\n")
        if "Exchange hashpartitioning(o_orderkey#" in ln
    ]
    assert len(key_ex) == 1, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
