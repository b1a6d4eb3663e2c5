"""Round-14 operator tests: the ANN delta commit-marker discipline
(ADVICE r13 #2), the force-rebuild memo eviction (ADVICE r13 #4), the
EM fit's left-associated product order + DuckDB-exact dec8 emulation
(ADVICE r13 #1, including the >2^26 regime the 100x fixture reaches),
batch ANN serve (batch == single-serve structural equality), filtered
ANN (predicate held through the index), the CDC replication pair
(stream == batch, chronological binlog segments, kill-point crash
recovery), multi-statement transactions (atomic create-if-absent
commit, snapshot isolation, rollback, two-writer conflict race,
vacuum) and the GRANT-shaped privilege catalog."""
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


# ---------------------------------------------------------------------------
# Multi-statement transactions (VERDICT r13 "missing" #3)
# ---------------------------------------------------------------------------


def test_txn_atomic_commit_snapshot_isolation_and_crash(spark, sf_dir, tmp_path):
    """The versioned-snapshot transaction machinery: (a) a reader between
    staging and commit sees the PRE-transaction state (snapshot
    isolation); (b) a crash after staging but before the commit-file link
    leaves readers on the old version, a re-run recovers, and vacuum
    collects the orphaned attempt; (c) commit flips all statements at
    once."""
    from sdp_spark.operators import scans as S

    root = str(tmp_path / "txn")
    os.makedirs(root)
    seed = spark.range(1, 101).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") % 2 == 0, "F").otherwise("O").alias("o_orderstatus"),
        (F.col("id") * 100.0).alias("o_totalprice"),
    )
    S.txn_commit(root, 1, S.txn_stage(seed, root, 1), 1)
    before = S.txn_read(spark, root).count()
    assert before == 100

    # stage TXN A but CRASH before commit (the kill-point): no commit
    # file names the attempt, the reader is unaffected
    state = S.txn_read(spark, root)
    for stmt in S._TXN_STATEMENTS:
        state = stmt(state)
    crashed_dir = S.txn_stage(state, root, 2)
    assert S.txn_current_version(root) == 1
    assert S.txn_read(spark, root).count() == before

    # recovery: re-run the whole transaction (fresh private attempt dir)
    # and commit — all three statements become visible at once; vacuum
    # sweeps the crashed attempt and ONLY it
    v = S.txn_apply(spark, root)
    assert v == 2
    removed = S.txn_vacuum(root)
    assert removed == [os.path.basename(crashed_dir)]
    after = S.txn_read(spark, root)
    # statement 2 inserted keys past the offset, statement 3's delete ran
    assert after.filter(F.col("o_orderkey") > S._TXN_INS_OFFSET).count() > 0
    assert (
        after.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 20000)
        ).count()
        == 0
    )


def test_txn_rollback_invisible_and_statement_order(spark, sf_dir, tmp_path):
    """(a) ROLLBACK leaves no trace: staged version deleted, manifest
    unmoved, reader output byte-identical. (b) In-transaction visibility:
    statement 2's inserted price must equal HALF of statement 1's
    DISCOUNTED price — folding the statements in the wrong order is a
    value error, not just a structural one."""
    from sdp_spark.functions.num import dround
    from sdp_spark.operators import scans as S

    root = str(tmp_path / "txn")
    os.makedirs(root)
    # key 22: status 'F', price 2200.0 -> stmt1 discounts to 2156.0,
    # stmt2 inserts key 22+OFFSET at dround(2156*0.5) = 1078.0
    seed = spark.createDataFrame(
        [(22, "F", 2200.0), (33, "O", 3300.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    S.txn_commit(root, 1, S.txn_stage(seed, root, 1), 1)
    S.txn_apply(spark, root)
    rows = {
        r.o_orderkey: r
        for r in S.txn_read(spark, root).collect()
    }
    ins = rows[22 + S._TXN_INS_OFFSET]
    assert ins.o_totalprice == 1078.0  # half of the DISCOUNTED 2156.0
    assert ins.o_orderstatus == "T"
    committed = sorted((r.o_orderkey, r.o_totalprice) for r in rows.values())

    # TXN B staged then rolled back: nothing changes
    doomed = S.txn_read(spark, root).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    staged = S.txn_stage(doomed, root, 3)
    S.txn_rollback(root, staged)
    assert S.txn_current_version(root) == 2
    assert not os.path.exists(staged)
    again = sorted(
        (r.o_orderkey, r.o_totalprice)
        for r in S.txn_read(spark, root).collect()
    )
    assert again == committed
    _ = dround  # imported for parity with operator arithmetic docs


def test_dml_txn_multi_registered_key(spark, sf_dir):
    """The registered key end-to-end: bounded aggregate, rollback left
    nothing for vacuum, commit log at v2, and the committed state
    excludes TXN B."""
    from sdp_spark.operators import scans as S
    from sdp_spark.plans.registry import load_all
    from sdp_spark.sources.fixtures import cache_dir

    out = load_all()["dml_txn_multi"].fn(spark, sf_dir)
    rows = {r.o_orderstatus: r for r in out.collect()}
    assert "T" in rows  # statement 2's inserts survive
    root = cache_dir(sf_dir, "txn_orders")
    assert S.txn_current_version(root) == 2
    assert S.txn_vacuum(root) == []
    with open(os.path.join(root, "_commit_v2.json")) as f:
        assert json.load(f)["n_statements"] == 3


def test_txn_conflict_exactly_one_winner_and_retry(spark, sf_dir, tmp_path):
    """Optimistic concurrency: two writers race the same base version —
    the create-if-absent commit admits exactly ONE; the loser raises
    TxnConflict having published nothing, and its txn_apply retry
    re-derives on the winner's snapshot (serializable, no lost update)."""
    import pytest

    from sdp_spark.operators import scans as S

    root = str(tmp_path / "txn")
    os.makedirs(root)
    seed = spark.createDataFrame(
        [(1, "O", 100.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    S.txn_commit(root, 1, S.txn_stage(seed, root, 1), 1)

    # both writers compute against v1 and stage private attempts at v2
    add_a = lambda df: df.withColumn("o_totalprice", F.col("o_totalprice") + 10.0)  # noqa: E731
    add_b = lambda df: df.withColumn("o_totalprice", F.col("o_totalprice") * 2.0)  # noqa: E731
    staged_a = S.txn_stage(add_a(S.txn_read(spark, root)), root, 2)
    staged_b = S.txn_stage(add_b(S.txn_read(spark, root)), root, 2)
    S.txn_commit(root, 2, staged_a, 1)  # writer A wins v2
    with pytest.raises(S.TxnConflict):
        S.txn_commit(root, 2, staged_b, 1)  # writer B loses, publishes nothing
    assert S.txn_read(spark, root).first().o_totalprice == 110.0

    # B's retry path: full txn_apply re-derives on A's snapshot -> v3,
    # observing A's +10 (no lost update): (100+10)*2, not 100*2
    S.txn_rollback(root, staged_b)
    v = S.txn_apply(spark, root, statements=(add_b,))
    assert v == 3
    assert S.txn_read(spark, root).first().o_totalprice == 220.0
    # vacuum: every surviving data dir is referenced by a commit file
    assert S.txn_vacuum(root) == []


# ---------------------------------------------------------------------------
# Privilege catalog (VERDICT r13 "missing" #2)
# ---------------------------------------------------------------------------


def test_catalog_privileges_expansion_and_enforcement(spark, sf_dir):
    """Effective-grant algebra: schema grants expand over every catalog
    table, table grants attach directly, revokes override. The decision
    point agrees with the materialized view row-for-row."""
    from sdp_spark.operators import catalog as C
    from sdp_spark.plans.registry import load_all

    out = load_all()["catalog_privileges"].fn(spark, sf_dir).collect()
    # 10 schema grants x 10 tables + 3 table grants - 1 revoke
    assert len(out) == 10 * len(C._INFOSCHEMA_TABLES) + 3 - 1
    materialized = {(r.grantee, r.table_name, r.privilege_type) for r in out}
    assert materialized == C.effective_privileges()
    # revoke beat the schema grant
    assert ("app_user", "lineitem", "DELETE") not in materialized
    assert ("app_user", "orders", "DELETE") in materialized
    # enforcement face
    assert C.check_privilege("readonly", "SELECT", "documents")
    assert not C.check_privilege("readonly", "DELETE", "documents")
    assert not C.check_privilege("nobody", "SELECT", "orders")
    # n_table_columns reflects the live schema
    ncols = {r.table_name: r.n_table_columns for r in out}
    from sdp_spark.sources.fixtures import table as tbl

    assert ncols["nation"] == len(tbl(spark, sf_dir, "nation").schema.fields)


def test_txn_time_travel_immutable_and_vacuum_safe(spark, sf_dir):
    """AS OF reads: v1 stays byte-stable after v2 commits, vacuum never
    collects a committed version's data, and reading an uncommitted
    version raises."""
    import pytest

    from sdp_spark.operators import scans as S

    root = S._txn_history_root(spark, sf_dir)
    v1_before = S.txn_read_at(spark, root, 1).count()
    assert S.txn_current_version(root) == 2
    assert S.txn_vacuum(root) == []  # both versions are referenced
    assert S.txn_read_at(spark, root, 1).count() == v1_before
    assert S.txn_read(spark, root).count() == S.txn_read_at(spark, root, 2).count()
    with pytest.raises(RuntimeError, match="not committed"):
        S.txn_read_at(spark, root, 99)


def test_txn_changes_replay_reconstructs_v2(spark, sf_dir):
    """The change feed is COMPLETE and MINIMAL: applying it to v1
    (delete DELETEd keys, overwrite UPDATEd keys with after-images,
    append INSERTs) reproduces v2 row-for-row, and no emitted UPDATE has
    an unchanged (status, price) pair."""
    from sdp_spark.operators import scans as S
    from sdp_spark.plans.registry import load_all

    ch = load_all()["dml_txn_changes"].fn(spark, sf_dir).cache()
    assert ch.filter(
        (F.col("op") == "UPDATE")
        & (F.col("old_price") == F.col("new_price"))
        & (F.col("old_status") == F.col("new_status"))
    ).count() == 0

    root = S._txn_history_root(spark, sf_dir)
    v1 = S.txn_read_at(spark, root, 1)
    gone = ch.filter(F.col("op").isin("DELETE", "UPDATE")).select("o_orderkey")
    after = ch.filter(F.col("op").isin("INSERT", "UPDATE")).select(
        "o_orderkey",
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_price").alias("o_totalprice"),
    )
    replayed = v1.join(gone, "o_orderkey", "left_anti").unionByName(after)
    v2 = S.txn_read_at(spark, root, 2)
    assert replayed.count() == v2.count()
    assert replayed.exceptAll(v2).count() == 0
    ch.unpersist()


def test_txn_expire_retention(spark, sf_dir, tmp_path):
    """Expire drops exactly the pre-window versions (commit file AND
    data), keeps the window readable, and can never expire the current
    version."""
    import pytest

    from sdp_spark.operators import scans as S

    root = str(tmp_path / "txn")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(1, "O", 10.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    for v in (1, 2, 3):
        S.txn_commit(root, v, S.txn_stage(df, root, v), 1)
    assert S.txn_expire(root, keep_last=2) == [1]
    with pytest.raises(RuntimeError, match="not committed"):
        S.txn_read_at(spark, root, 1)
    assert S.txn_read_at(spark, root, 2).count() == 1
    assert S.txn_read(spark, root).count() == 1
    # only the retained versions' data dirs survive
    import re

    dirs = [n for n in os.listdir(root) if re.fullmatch(r"v\d+-[0-9a-f]+", n)]
    assert len(dirs) == 2
    with pytest.raises(ValueError):
        S.txn_expire(root, keep_last=0)
