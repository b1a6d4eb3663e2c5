"""Round-13 operator tests: the persisted ANN index lifecycle
(build-once/serve-many, VERDICT r12 next-round #1), the driver-side EM
fit equivalence, the EARS per-variant CDC thresholds, and the file-sink
crash-recovery proof."""
import json
import os
import shutil


# ---------------------------------------------------------------------------
# ANN index persistence (VERDICT r12 next-round #1)
# ---------------------------------------------------------------------------


def test_ann_persisted_search_equals_inplan(spark, sf_dir):
    """The serve half of the index lifecycle: a search answered from the
    persisted parquet index must equal the in-plan build's search
    EXACTLY — same neighbors, same rounded cosines, same order. The
    equality is structural (both run _nsw_beam_search over the same
    edge set), so a mismatch means the persisted state drifted from
    the build."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    inplan = [
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in REG["llm_sim_search_nsw"].fn(spark, sf_dir).collect()
    ]
    served = [
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in REG["llm_ann_search_persisted"].fn(spark, sf_dir).collect()
    ]
    assert served == inplan
    assert len(served) > 0


def test_ann_index_manifest_and_zero_build(spark, sf_dir, monkeypatch):
    """The build half: (a) the manifest's per-table counts equal the
    persisted tables' actual row counts; (b) once the manifest exists,
    the serve path does ZERO build work — poison every build entry
    point (the k-means fit, the cell assignment, the edge build) and
    the persisted search must still answer; (c) a directory WITHOUT a
    committed manifest is treated as absent (the half-written-build
    crash case) and rebuilt."""
    from sdp_spark.operators import llm as L
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    path = L.ann_index_build(spark, sf_dir)
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["version"] == L._ANN_INDEX_VERSION
    for name, n in manifest["tables"].items():
        assert (
            spark.read.parquet(os.path.join(path, name)).count() == n
        ), name
    # centroid count = trained K (sqrt-N law, floor 8 / cap 256)
    n_vec = manifest["tables"]["assignments"]
    assert manifest["tables"]["centroids"] == max(
        8, min(256, int(n_vec ** 0.5))
    )

    def poisoned(*a, **k):
        raise AssertionError("persisted search invoked a build path")

    monkeypatch.setattr(L, "_spherical_cells", poisoned)
    monkeypatch.setattr(L, "_knng_assigned", poisoned)
    monkeypatch.setattr(L, "_ivf_knn_edges", poisoned)
    served = REG["llm_ann_search_persisted"].fn(spark, sf_dir).collect()
    assert len(served) > 0
    monkeypatch.undo()

    # crash case: wipe the manifest only — the index must be rebuilt,
    # recommitted, and serve identically
    os.remove(os.path.join(path, "_MANIFEST.json"))
    shutil.rmtree(os.path.join(path, "edges"))
    again = L.ann_index_build(spark, sf_dir)
    assert os.path.exists(os.path.join(again, "_MANIFEST.json"))
    assert (
        spark.read.parquet(os.path.join(again, "edges")).count()
        == manifest["tables"]["edges"]
    )


def test_ann_index_persist_key_output(spark, sf_dir):
    """The registry key returns the manifest as (component, n_rows) rows —
    deterministic across invocations, one row per persisted table."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    rows = REG["llm_ann_index_persist"].fn(spark, sf_dir).collect()
    got = {r["component"]: r["n_rows"] for r in rows}
    assert set(got) == {
        "centroids", "assignments", "edges", "edges_undirected", "entries"
    }
    assert all(n > 0 for n in got.values())
    again = {
        r["component"]: r["n_rows"]
        for r in REG["llm_ann_index_persist"].fn(spark, sf_dir).collect()
    }
    assert got == again


# ---------------------------------------------------------------------------
# Driver-side EM fit ≡ the SQL chain (VERDICT r12 next-round #4)
# ---------------------------------------------------------------------------


def test_em_fit_driver_matches_sql_chain():
    """_em_fit_driver must reproduce the unrolled SQL EM chain
    BIT-FOR-BIT on arbitrary pattern tables — run DuckDB over the pure
    _linkage_em_iter_sql text (the oracle's metadata half) and the
    Python fit over the same rows; every parameter-dependent output
    column must be exactly equal. Includes a degenerate all-agree table
    (where the r12 chain produced p -> boundary; the shared clamp keeps
    both engines finite and equal, ADVICE r12 #2)."""
    import duckdb

    from sdp_spark.operators.stats import (
        _em_final_select,
        _em_fit_driver,
        _linkage_em_iter_sql,
    )

    cases = [
        # (name, rows of (g1, g2, g3, g4, cnt))
        ("mixed", [
            (1, 1, 1, 1, 40.0), (1, 1, 0, 1, 25.0), (0, 0, 0, 0, 9000.0),
            (1, 0, 0, 0, 310.0), (0, 1, 0, 0, 220.0), (0, 0, 1, 0, 4600.0),
            (1, 1, 0, 0, 18.0), (0, 0, 0, 1, 130.0),
        ]),
        ("degenerate_all_agree", [(1, 1, 1, 1, 50.0)]),
        ("two_patterns", [(1, 1, 1, 1, 5.0), (0, 0, 0, 0, 5.0)]),
    ]
    for name, pats in cases:
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
        assert py_rows == sql_rows, (name, py_rows, sql_rows)
        # finite everywhere, even on the degenerate table
        assert all(
            all(v == v and abs(v) != float("inf") for v in r[1:])
            for r in py_rows
        ), name


def test_em_pattern_fast_equals_distinct(spark, sf_dir):
    """The inclusion-exclusion pattern pass (no pair-grain shuffle) must
    produce EXACTLY the DISTINCT text's pattern counts — |A| + |B| -
    |A ∩ B| = |A ∪ B| holds because each record carries one blk and one
    name-prefix, so neither pass can emit a pair twice. The oracle keeps
    the DISTINCT text; this pins the algebra the hash match rides on."""
    from sdp_spark.operators.stats import (
        _linkage_em_pat_fast_sql,
        _linkage_em_pat_sql,
    )
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    slow = {
        tuple(r[:4]): r[4] for r in spark.sql(_linkage_em_pat_sql()).collect()
    }
    fast = {
        tuple(r[:4]): r[4]
        for r in spark.sql(_linkage_em_pat_fast_sql()).collect()
    }
    assert fast == slow and len(fast) > 0


# ---------------------------------------------------------------------------
# EARS per-variant CDC thresholds (VERDICT r12 next-round #6)
# ---------------------------------------------------------------------------


def test_ears_cdc_convention_diverges_where_expected(spark, tmp_path):
    """alert (uniform 2.0σ) vs alert_cdc (CDC's 3/3/2): the conventions
    must diverge EXACTLY on C1/C2 rows scoring in (2, 3] — a moderate
    planted bump sized to land there fires the uniform alert but not
    the CDC one — and agree everywhere on C3 (both thresholds 2.0σ),
    plus on any row scoring above 3σ (a big spike fires both)."""
    import datetime as dt

    from sdp_spark.plans.registry import load_all

    sf = str(tmp_path / "ears_cdc")
    rows, ev = [], 0
    # jittered baseline sd ~2 around 20; day 13 bumps +5 (z in (2,3]),
    # day 17 spikes +40 (z >> 3)
    counts = [18, 22, 18, 22, 18, 22, 18, 22, 18, 22, 18, 22, 25, 20,
              18, 22, 60, 20]
    for t, n in enumerate(counts):
        d = dt.date(2024, 1, 1) + dt.timedelta(days=t)
        for i in range(n):
            rows.append(
                (ev, dt.datetime(d.year, d.month, d.day, 9, i % 60, i % 60),
                 1, "resp", 1.0, "{}")
            )
            ev += 1
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    out = load_all()["query_outbreak_ears_family"].fn(spark, sf).collect()
    assert len(out) > 0
    diverged = [r for r in out if r["alert"] != r["alert_cdc"]]
    # divergence exists, and ONLY on c1/c2 rows in (2, 3]
    assert diverged, "planted bump produced no (2,3] scores"
    for r in diverged:
        assert r["variant"] in ("c1", "c2"), r
        assert 2.0 < r["score"] <= 3.0, r
        assert r["alert"] and not r["alert_cdc"], r
    # c3 agrees everywhere (same 2.0 threshold in both conventions)
    assert all(
        r["alert"] == r["alert_cdc"] for r in out if r["variant"] == "c3"
    )
    # the big spike fires BOTH on some c1/c2 row
    assert any(
        r["alert"] and r["alert_cdc"] and r["variant"] in ("c1", "c2")
        for r in out
    )


# ---------------------------------------------------------------------------
# File-sink crash recovery via Spark's commit protocol (VERDICT r12 #7)
# ---------------------------------------------------------------------------


def test_file_sink_crash_recovery_commit_protocol(spark, sf_dir, tmp_path):
    """The file-sink twin of the JDBC exactly-once proof
    (test_round12_ops.test_stream_crash_recovery_exactly_once_jdbc):
    `sink_stream_partitioned`'s lake layout rides Spark's file-commit
    protocol — the _spark_metadata transaction log — so a crash that
    dies AFTER writing parquet part-files but BEFORE committing the
    batch to the log must leave the READER's view unchanged: no
    partials, no duplicates.

    Shape: run batch 0 against a 2-file staged landing dir (native
    parquet file sink, partitioned by day, checkpointed); plant the
    crash leftovers a died-before-commit attempt produces (byte-exact
    copies of part-files under new names inside the partition dirs,
    absent from the log — the artifact, not the crash schedule, is what
    the reader must survive); then land the remaining 2 files and
    RESTART from the same checkpoint. Asserts: the restart resumes from
    the committed offsets, the read-back equals the batch source
    exactly (no event_id twice — the orphans are invisible because the
    read lists files FROM THE LOG), and the orphans are physically
    present on disk (the naive directory view disagrees with the
    committed view, proving the log is load-bearing)."""
    import glob as globmod

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sdp_spark.sources.fixtures import table as fixture_table
    from sdp_spark.streaming.ops import _events_landing_dir

    landing = _events_landing_dir(spark, sf_dir)
    files = sorted(
        globmod.glob(os.path.join(landing, "*.parquet")),
        key=lambda p: (os.path.getmtime(p), p),
    )
    assert len(files) == 4
    stage = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(stage)
    for f in files[:2]:
        shutil.copy(f, stage)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def run_once():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(stage)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                "event_id",
                "event_type",
                "user_id",
            )
        )
        q = (
            sdf.writeStream.format("parquet")
            .partitionBy("day")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    meta0 = os.path.join(out, "_spark_metadata", "0")
    assert os.path.exists(meta0), "batch 0 never committed"

    # plant the died-before-commit leftovers: copies of real part-files
    # under fresh names, in the partition dirs, absent from the log
    committed = sorted(
        globmod.glob(os.path.join(out, "day=*", "*.parquet"))
    )
    assert committed
    orphans = []
    for i, f in enumerate(committed[:3]):
        orphan = os.path.join(
            os.path.dirname(f), f"part-9{i:04d}-crashleft-c000.snappy.parquet"
        )
        shutil.copy(f, orphan)
        orphans.append(orphan)

    for f in files[2:]:
        shutil.copy(f, stage)
    run_once()
    assert os.path.exists(os.path.join(out, "_spark_metadata", "1"))

    got = spark.read.parquet(out).select("event_id", "event_type", "user_id")
    want = fixture_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    assert got.count() == want.count()
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the orphans ARE on disk — the committed view just never lists them
    assert all(os.path.exists(o) for o in orphans)
    n_disk = len(globmod.glob(os.path.join(out, "day=*", "*.parquet")))
    import duckdb

    naive = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/day=*/*.parquet')"
    ).fetchone()[0]
    assert naive > want.count(), (naive, want.count())
    assert n_disk > len(committed)


def test_ann_index_update_lifecycle(spark, sf_dir, monkeypatch):
    """The daily-batch write path over the persisted index: (a) each
    cloned arrival's top-1 neighbor is its SOURCE vector at cos 1.0
    (the batch is every-5th standing vector re-ingested under a fresh
    id); (b) the update is deterministic and idempotent (rerun replaces
    the delta, outputs equal); (c) ZERO refit/rebuild — with the index
    persisted, poisoning every build/fit entry point must not stop the
    update (it reads the versioned quantizer from parquet); (d) the
    delta tables land with counts matching the returned edges."""
    import json as jsonmod

    from sdp_spark.operators import llm as L
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    path = L.ann_index_build(spark, sf_dir)
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        n_indexed = jsonmod.load(f)["tables"]["assignments"]

    out1 = REG["llm_ann_index_update"].fn(spark, sf_dir).collect()
    assert out1

    def poisoned(*a, **k):
        raise AssertionError("index update invoked a build/fit path")

    monkeypatch.setattr(L, "_spherical_cells", poisoned)
    monkeypatch.setattr(L, "_knng_assigned", poisoned)
    monkeypatch.setattr(L, "_ivf_knn_edges", poisoned)
    out2 = REG["llm_ann_index_update"].fn(spark, sf_dir).collect()
    monkeypatch.undo()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]

    by_src = {}
    for r in out1:
        by_src.setdefault(r["vec_id"], []).append(r)
    offset = n_indexed  # vec_ids are 0..n-1, so max_id + 1 == n_indexed
    for src, edges in by_src.items():
        top = min(edges, key=lambda r: r["rnk"])
        assert top["cos_sim"] == 1.0, (src, top)
        # the source vector (or another exact duplicate of it) wins
        assert top["neighbor_id"] < offset
    # every arrival id lies past the standing corpus, every neighbor
    # inside it (arrivals never link to each other — the batch attaches
    # to the INDEX, matching llm_ann_insert_incremental's discipline)
    assert all(r["vec_id"] >= offset for r in out1)
    assert all(r["neighbor_id"] < offset for r in out1)

    got_edges = spark.read.parquet(os.path.join(path, "edges_delta"))
    assert got_edges.count() == len(out1)
    got_asg = spark.read.parquet(os.path.join(path, "assignments_delta"))
    assert got_asg.count() == len(by_src)

    # the dup-dense branch (direction-grain attach) must be
    # output-invisible where it's optional: force it on the dup-free
    # fixture and the member-grain edges must equal the plain branch's
    from pyspark.sql import functions as F

    emb = L._emb_normed(spark, sf_dir)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    unit = F.transform("dvec", lambda x: x / F.col("norm"))
    arrivals = emb.filter(F.col("vec_id") % 5 == 3).select(
        (F.col("vec_id") + F.lit(int(max_id) + 1)).alias("vec_id"),
        F.col("dvec").alias("rvec"),
        unit.alias("dvec"),
    )
    cents = [
        r["centroid"]
        for r in spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cell")
        .collect()
    ]
    forced_edges, _ = L._ann_update_collapsed(
        spark, sf_dir, path, arrivals, cents, L._NSW_K
    )
    forced = [
        tuple(r) for r in forced_edges.orderBy("vec_id", "rnk").collect()
    ]
    assert forced == [tuple(r) for r in out1]


def test_ann_search_delta_surfaces_arrivals(spark, sf_dir, monkeypatch):
    """Serve over base+delta: (a) queries whose id % 5 == 3 have an exact
    clone in the arrival batch — the delta search MUST surface that
    arrival at cos 1.0 (it is only reachable through delta edges);
    (b) still zero build/fit work (poison the build entry points);
    (c) deterministic across invocations."""
    from sdp_spark.operators import llm as L
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    out1 = REG["llm_ann_search_delta"].fn(spark, sf_dir).collect()
    emb = L._emb_normed(spark, sf_dir)
    from pyspark.sql import functions as F

    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    qids = {r["query_id"] for r in out1}
    assert qids
    for q in qids:
        if q % 5 == 3:
            hit = [
                r
                for r in out1
                if r["query_id"] == q and r["neighbor_id"] == q + max_id + 1
            ]
            assert hit and hit[0]["cos_sim"] == 1.0, q
    assert any(r["neighbor_id"] > max_id for r in out1)

    def poisoned(*a, **k):
        raise AssertionError("delta search invoked a build/fit path")

    monkeypatch.setattr(L, "_spherical_cells", poisoned)
    monkeypatch.setattr(L, "_knng_assigned", poisoned)
    monkeypatch.setattr(L, "_ivf_knn_edges", poisoned)
    out2 = REG["llm_ann_search_delta"].fn(spark, sf_dir).collect()
    monkeypatch.undo()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]


def test_stream_ann_ingest_equals_batch_update(spark, sf_dir):
    """The FOURTEENTH batch+stream pair: micro-batched vector ingest over
    the persisted index must equal the one-shot batch attach ROW FOR ROW
    (an arrival's edges depend only on its vector and the standing
    index, so any batch split is output-invisible), must have processed
    the arrivals across MULTIPLE micro-batches (a single batch would not
    exercise the per-batch idempotent partition write), and must be
    rerun-stable."""
    from sdp_spark.plans.registry import load_all
    from sdp_spark.sources.fixtures import cache_dir

    REG = load_all()
    stream = [
        tuple(r) for r in REG["stream_ann_ingest"].fn(spark, sf_dir).collect()
    ]
    batch = [
        tuple(r)
        for r in REG["llm_ann_index_update"].fn(spark, sf_dir).collect()
    ]
    assert stream == batch and len(stream) > 0
    from sdp_spark.operators.llm import _ANN_INDEX_VERSION

    out = cache_dir(sf_dir, f"ann_ingest_out_{_ANN_INDEX_VERSION}")
    parts = [
        p
        for p in os.listdir(os.path.join(out, "edges"))
        if p.startswith("_batch_id=")
    ]
    assert len(parts) >= 2, parts  # genuinely multi-batch
    again = [
        tuple(r) for r in REG["stream_ann_ingest"].fn(spark, sf_dir).collect()
    ]
    assert again == stream
