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


def test_ann_insert_incremental_recall_and_partition(spark, sf_dir):
    """Incremental insertion must attach arrivals to the standing index
    correctly: (a) every output vec_id is an arrival (>= the 80% split)
    and every neighbor an indexed vector (< split); (b) per-arrival
    edges recover >= 0.6 of the TRUE top-8 among indexed vectors
    (numpy ground truth on the small fixture; same coverage-bound
    near-uniform-sphere caveat as the build key — measured ~0.75);
    (c) rnk is contiguous from 1 and capped at 8; (d) deterministic
    across runs."""
    import numpy as np

    from sdp_spark.operators.llm import _emb_normed
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    out = REG["llm_ann_insert_incremental"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["dvec"]) / r["norm"]
        for r in _emb_normed(spark, sf_dir).collect()
    }
    split = int(max(emb) * 0.8)
    assert all(r["vec_id"] >= split and r["neighbor_id"] < split for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r["vec_id"], []).append(r)
    idx_ids = sorted(i for i in emb if i < split)
    idx_mat = np.stack([emb[i] for i in idx_ids])
    recalls = []
    for src, rows in by_src.items():
        assert sorted(x["rnk"] for x in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 8
        sims = idx_mat @ emb[src]
        true_top = {
            idx_ids[j]
            for j in sorted(range(len(idx_ids)), key=lambda j: (-sims[j], idx_ids[j]))[:8]
        }
        got = {x["neighbor_id"] for x in rows}
        recalls.append(len(got & true_top) / 8)
    assert sum(recalls) / len(recalls) >= 0.6, sum(recalls) / len(recalls)
    again = {
        (r["vec_id"], r["neighbor_id"], r["rnk"])
        for r in REG["llm_ann_insert_incremental"].fn(spark, sf_dir).collect()
    }
    assert again == {(r["vec_id"], r["neighbor_id"], r["rnk"]) for r in out}


def test_linkage_em_recovers_planted_error_rates(spark, sf_dir):
    """EM over the blocked candidate pairs must recover the fixture's
    PLANTED corruption rates without any labeled truth: m(name) = 2/3
    (1/3 of B names case-folded), m(phone) = 4/5, m(bal) = 6/7,
    m(seg) = 10/11 — each within 0.05. u for the high-cardinality
    fields collapses toward 0 inside blocked candidates; u(seg) is HIGH
    (pass-1 blocks on segment, so unmatched blocked pairs usually agree
    there) — the real-world blocked-sampling artifact the EM correctly
    learns and the published-table key cannot. Prevalence lands near
    true-pairs/candidates, and the learned agreement weights rank the
    fields by discriminative power."""
    from sdp_spark.plans.registry import load_all

    rows = {
        r["field"]: r
        for r in load_all()["query_linkage_em_weights"]
        .fn(spark, sf_dir)
        .collect()
    }
    truth = {"name": 2 / 3, "phone": 4 / 5, "bal": 6 / 7, "seg": 10 / 11}
    for f, m_true in truth.items():
        assert abs(rows[f]["m"] - m_true) < 0.05, (f, rows[f]["m"])
    for f in ("name", "phone", "bal"):
        assert rows[f]["u"] < 0.01, (f, rows[f]["u"])
        assert rows[f]["w_agree"] > 5.0
    # blocking keeps segment-agreeing pairs: u(seg) is orders above the
    # high-cardinality fields' u (0.28 at sf0.001, 0.63 at sf0.01 — the
    # pass-2 name-prefix pairs dilute it more on the smaller fixture)
    assert rows["seg"]["u"] > 0.1
    # seg is the panel's weakest discriminator by a wide margin
    assert rows["seg"]["w_agree"] < min(
        rows[f]["w_agree"] for f in ("name", "phone", "bal")
    ) - 3.0
    p = rows["name"]["match_prevalence"]
    assert 0.005 < p < 0.15
    assert all(r["w_disagree"] < 0 for r in rows.values())


def test_knn_graph_collapse_branch(spark, sf_dir, tmp_path):
    """The duplicate-collapse branch of the ANN-graph build must be
    output-invisible where it's optional and correct where it's
    mandatory: (a) on the dup-FREE fixture (below the 5% gate, every
    group a singleton) forcing the collapsed path yields EXACTLY the
    plain build's edges; (b) on a planted 90%-clone corpus (40
    directions x 10 clones — the crawl-scale shape whose clone cliques
    make the plain per-cell self-join output-bound) the gate fires, and
    every member's edges are its 8 smallest-id clone-mates at cos 1.0 —
    the exact (cos desc, id asc) answer."""
    import numpy as np

    from sdp_spark.operators import llm as L
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    plain = {
        (r["vec_id"], r["neighbor_id"], r["cos_sim"], r["rnk"])
        for r in REG["llm_knn_graph_ivf"].fn(spark, sf_dir).collect()
    }
    assert not L._vec_dup_dense(spark, sf_dir)
    # force the collapsed CELL build, then run it through the SAME
    # refine+truncate tail the registry key applies (r13: the build
    # refines at degree 16 and truncates to 8 — see _ivf_knn_edges)
    k_in = max(8, L._KNNG_REFINE_DEGREE)
    forced = {
        (r["vec_id"], r["neighbor_id"], r["cos_sim"], r["rnk"])
        for r in L._nndescent_refine(
            spark,
            sf_dir,
            L._collapsed_edges(spark, sf_dir, k_in, None, None),
            k_in,
        )
        .filter("rnk <= 8")
        .collect()
    }
    assert forced == plain

    sf = str(tmp_path / "clones")
    os.makedirs(sf)
    rng = np.random.RandomState(7)
    dirs = rng.randn(40, 64)
    rows = []
    for v in range(400):
        rows.append((v, [float(x) for x in dirs[v % 40]], v % 40))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    assert L._vec_dup_dense(spark, sf)
    out = REG["llm_knn_graph_ivf"].fn(spark, sf).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["vec_id"], []).append(r)
    for src, edges in by_src.items():
        mates = sorted(v for v in range(src % 40, 400, 40) if v != src)[:8]
        got = sorted(e["neighbor_id"] for e in edges)
        assert got == mates, (src, got, mates)
        assert all(e["cos_sim"] == 1.0 for e in edges)


def test_excess_burden_planted_step(spark, tmp_path):
    """Serfling excess burden on a planted corpus: a weekly-cycled
    baseline (Jan 1-21, the frozen fit window) followed by the same
    cycle ELEVATED by 10/day in the scored window (Jan 22 onward). The
    fitted seasonal expectation tracks the cycle, so the excess must
    come out ~10 x scored days and the ratio ~10/cycle-mean — the
    'X% above expected' number, season-summarized. Tolerances are wide
    (OLS on 21 noisy-phase days), but the planted step must dominate."""
    from sdp_spark.plans.registry import load_all

    sf = str(tmp_path / "excess")
    cycle = [18, 22, 25, 20, 16, 24, 15]  # weekly shape, mean = 20
    counts = [cycle[t % 7] + (10 if t >= 21 else 0) for t in range(35)]
    _write_events(spark, sf, {"resp": counts})
    rows = load_all()["ts_excess_burden"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    n_scored = 35 - 21
    assert r["observed"] == sum(counts[21:])
    # expected tracks the un-elevated cycle: 20/day +- fit slack
    assert abs(r["expected_total"] - 20.0 * n_scored) < 0.15 * 20 * n_scored
    assert abs(r["excess"] - 10.0 * n_scored) < 0.35 * 10 * n_scored
    assert 0.3 < r["excess_ratio"] < 0.75
    assert r["n_alert_days"] >= n_scored // 2


def test_epidemic_onset_planted_wave(spark, tmp_path):
    """Onset/offset timing on planted seasons: a SUSTAINED step (elevated
    from day 21 onward) must onset at the first scored day (two
    consecutive exceedances) and never offset; a WAVE (elevated days
    21-26 only) must onset the same day and offset at the first quiet
    day followed by another quiet day; an all-baseline type must report
    NULL onset — 'no epidemic this season' is an answer."""
    from sdp_spark.plans.registry import load_all

    sf = str(tmp_path / "onset")
    cycle = [18, 22, 25, 20, 16, 24, 15]
    base = [cycle[t % 7] for t in range(35)]
    _write_events(spark, sf, {
        "sustained": [base[t] + (30 if t >= 21 else 0) for t in range(35)],
        "wave": [base[t] + (30 if 21 <= t <= 26 else 0) for t in range(35)],
        "quiet": base,
    })
    rows = {
        r["event_type"]: r
        for r in load_all()["ts_epidemic_onset"].fn(spark, sf).collect()
    }
    assert rows["sustained"]["onset_day"] == "2024-01-22"
    assert rows["sustained"]["offset_day"] is None
    assert rows["wave"]["onset_day"] == "2024-01-22"
    assert rows["wave"]["offset_day"] is not None
    assert "2024-01-28" <= rows["wave"]["offset_day"] <= "2024-01-31"
    assert rows["quiet"]["onset_day"] is None
    assert rows["quiet"]["n_alert_days"] == 0
    assert rows["sustained"]["n_alert_days"] == 14


def test_stream_ears_family_equals_batch_alerts(spark, sf_dir):
    """The eleventh batch+stream pair must agree STRUCTURALLY: the
    stream's alert feed == the batch family's alert rows, variant by
    variant (same core, two-stage split — the invariant every detector
    twin in the repo carries)."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    stream = {
        (r["variant"], r["event_type"], r["day_s"], r["n"], r["score"])
        for r in REG["stream_ears_family_alerts"].fn(spark, sf_dir).collect()
    }
    batch = {
        (r["variant"], r["event_type"], r["day_s"], r["n"], r["score"])
        for r in REG["query_outbreak_ears_family"].fn(spark, sf_dir).collect()
        if r["alert"]
    }
    assert stream == batch


# ---------------------------------------------------------------------------
# Streaming crash recovery — the exactly-once proof (VERDICT r11 #8)
# ---------------------------------------------------------------------------


def test_stream_crash_recovery_exactly_once_jdbc(spark, sf_dir):
    """Kill a checkpointed foreachBatch JDBC sink mid-stream and prove the
    restart yields EXACTLY the batch result — the durability discipline
    SURVEY §4's 'builtin (design discipline)' row promises, previously
    certified only by clean single-trigger runs.

    The crash is injected at the worst point: AFTER the sink write of
    batch 1, BEFORE Spark commits that batch to the checkpoint. On
    restart Spark REDELIVERS batch 1 (its offsets were reserved but
    never committed); an append-only writer would duplicate those rows.
    The writer here is idempotent-by-batchId (DELETE the batch's rows,
    then INSERT — the JDBC stand-in for MERGE/upsert), so the redelivery
    replaces instead of duplicating. Asserts: the crash actually fired,
    the second run redelivers exactly the crashed batch, and the final
    table equals the batch read of the same files — same rows, no
    event_id seen twice."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.utils import StreamingQueryException

    from sdp_spark.operators.scans import jdbc_conn
    from sdp_spark.streaming.ops import _events_stream

    url, extra, _ = jdbc_conn(sf_dir)
    table = "sdp_recovery_proof"
    chk = tempfile.mkdtemp(prefix="sdp_recovery_chk_")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("_batch_id", T.LongType()),
        ]
    )

    def _writer(df, mode):
        w = (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option(
                "createTableColumnTypes",
                "event_id BIGINT, user_id BIGINT, event_type VARCHAR(32),"
                " _batch_id BIGINT",
            )
            .option("isolationLevel", "NONE")
            .mode(mode)
        )
        for k, v in extra.items():
            w = w.option(k, v)
        return w

    _writer(spark.createDataFrame([], schema), "overwrite").save()

    def make_write_batch(crash_on, delivered):
        def write_batch(df, batch_id):
            delivered.append(batch_id)
            # idempotent redelivery: clear this batch's rows, then append
            # (foreachBatch runs driver-side; Derby is embedded in the
            # same JVM, so a raw statement reaches the same database)
            conn = spark._jvm.java.sql.DriverManager.getConnection(url)
            try:
                st = conn.createStatement()
                # Spark's JDBC writer passes dbtable unquoted (Derby folds
                # it to upper case) but quotes COLUMN names at CREATE time
                # (case preserved) — mirror that split here
                st.executeUpdate(
                    f'DELETE FROM {table} WHERE "_batch_id" = {batch_id}'
                )
                st.close()
            finally:
                conn.close()
            _writer(
                df.withColumn("_batch_id", F.lit(batch_id)).coalesce(4),
                "append",
            ).save()
            if crash_on is not None and batch_id == crash_on:
                raise RuntimeError("injected crash after sink write")

        return write_batch

    src = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    run1: list = []
    q = (
        src.writeStream.foreachBatch(make_write_batch(1, run1))
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
        src.writeStream.foreachBatch(make_write_batch(None, run2))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert run2 == [1], run2  # exactly the uncommitted batch, redelivered

    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in extra.items():
        r = r.option(k, v)
    got = r.load().select("event_id", "user_id", "event_type")
    from sdp_spark.sources.fixtures import table as fixture_table

    want = fixture_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    assert got.count() == want.count()
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_knn_graph_ivf_edge_quality_and_bounds(spark, sf_dir):
    """The IVF-bootstrapped k-NN graph (the scale-safe NSW edge source,
    VERDICT r11 next-round #4) must (a) recover most of the exact
    graph's edges — >= 0.8 of exact top-5 edges appear among its top-8
    on the near-uniform-sphere fixture (the hard case for any
    cell-pruning build; the r13 NNDescent refinement lifted the floor
    from 0.7: build+refine at degree 16, truncate to 8 — measured
    0.83/0.84/0.83 at sf0.001/0.01/0.1, VERDICT r12 next-round #3) —
    (b) respect the out-degree cap with contiguous ranks, and (c) be
    run-to-run deterministic (cached deterministic-seed fit,
    lowest-index ties)."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    approx = REG["llm_knn_graph_ivf"].fn(spark, sf_dir).collect()
    exact = REG["llm_knn_graph"].fn(spark, sf_dir).collect()
    a_edges = {(r["vec_id"], r["neighbor_id"]) for r in approx}
    e_edges = {(r["vec_id"], r["neighbor_id"]) for r in exact}
    assert len(e_edges & a_edges) / len(e_edges) >= 0.8
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
