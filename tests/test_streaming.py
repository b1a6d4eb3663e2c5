"""Batch-equivalence tests for streaming ops whose availableNow emission set
isn't fully pinned by a SQL oracle (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdp_spark.plans.registry import load_all
from sdp_spark.sources.fixtures import table

REGISTRY = load_all()


def test_watermark_emits_sealed_prefix_of_batch(spark, sf_dir):
    """Append-mode watermarked windows: every emitted window must match the
    batch tumbling count exactly, and the emitted set must be the sealed
    windows (window_end <= max_ts - 2h watermark)."""
    streamed = {
        r["win_start"]: r["n"]
        for r in REGISTRY["stream_watermark"].fn(spark, sf_dir).collect()
    }
    events = table(spark, sf_dir, "events")
    batch = {
        r["win_start"]: r["n"]
        for r in (
            events.groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "n",
            )
        ).collect()
    }
    assert streamed, "watermarked stream emitted nothing"
    for k, v in streamed.items():
        assert batch.get(k) == v, f"window {k}: streamed {v} != batch {batch.get(k)}"
    # all but the last ~3 unsealed windows must have been emitted
    assert len(streamed) >= len(batch) - 3


def test_stream_ingest_equals_batch(spark, sf_dir):
    n_stream = REGISTRY["stream_ingest"].fn(spark, sf_dir).count()
    n_batch = table(spark, sf_dir, "events").count()
    assert n_stream == n_batch


def test_stream_session_gap_semantics(spark, sf_dir):
    """No two sessions of the same user may be closer than the 30-min gap."""
    rows = REGISTRY["stream_session"].fn(spark, sf_dir).collect()
    by_user: dict[int, list[str]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["session_start"])
    import datetime as dt

    for starts in by_user.values():
        starts = sorted(dt.datetime.fromisoformat(s) for s in starts)
        for a, b in zip(starts, starts[1:]):
            assert (b - a).total_seconds() > 1800


def _batch_equiv(spark, sf_dir, streamed_rows, batch_df, keycols, valcols):
    """Every emitted (append-mode) row must equal the batch row for its key;
    emission must be nonempty (the watermark seals most fixture windows)."""
    streamed = {tuple(r[k] for k in keycols): tuple(r[v] for v in valcols) for r in streamed_rows}
    batch = {tuple(r[k] for k in keycols): tuple(r[v] for v in valcols) for r in batch_df.collect()}
    assert streamed, "append-mode watermarked stream emitted nothing"
    for k, v in streamed.items():
        assert batch.get(k) == v, f"{k}: streamed {v} != batch {batch.get(k)}"
    return len(streamed), len(batch)


def test_tumbling_wm_equals_batch(spark, sf_dir):
    rows = REGISTRY["stream_tumbling_wm"].fn(spark, sf_dir).collect()
    n_s, n_b = _batch_equiv(
        spark, sf_dir, rows,
        REGISTRY["stream_tumbling"].fn(spark, sf_dir),
        ["win_start", "event_type"], ["n", "sum_value"],
    )
    assert n_s >= n_b * 0.5  # only the unsealed tail may be withheld


def test_sliding_wm_equals_batch(spark, sf_dir):
    rows = REGISTRY["stream_sliding_wm"].fn(spark, sf_dir).collect()
    _batch_equiv(
        spark, sf_dir, rows,
        REGISTRY["stream_sliding"].fn(spark, sf_dir),
        ["win_start_s"], ["n", "sum_value"],
    )


def test_session_wm_equals_batch(spark, sf_dir):
    rows = REGISTRY["stream_session_wm"].fn(spark, sf_dir).collect()
    _batch_equiv(
        spark, sf_dir, rows,
        REGISTRY["stream_session"].fn(spark, sf_dir),
        ["user_id", "session_start"], ["n_events", "sum_value"],
    )


def test_multi_batch_watermark_progression(spark, sf_dir, tmp_path):
    """Real watermark semantics only show up across micro-batch boundaries
    (single-batch availableNow never advances the watermark mid-run). Force
    3 time-ordered batches with maxFilesPerTrigger=1: windows sealed by the
    advancing watermark emit mid-stream in append mode, and every emitted
    row must equal the batch result exactly.

    The files MUST be time-range splits written oldest-first (the file
    source processes by mtime): a round-robin split makes most of batches
    2..n LATE relative to the watermark batch 1 advanced, and the sealed
    windows then (correctly!) carry partial counts."""
    import time as _time

    events = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    landing = str(tmp_path / "landing")
    t0, t1 = events.agg(F.min("ts"), F.max("ts")).first()
    cut1 = t0 + (t1 - t0) / 3
    cut2 = t0 + 2 * (t1 - t0) / 3
    ranges = [
        F.col("ts") < F.lit(cut1),
        (F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2)),
        F.col("ts") >= F.lit(cut2),
    ]
    for pred in ranges:
        events.filter(pred).coalesce(1).write.mode("append").parquet(landing)
        _time.sleep(1.1)  # distinct mtimes -> oldest-first processing order

    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    agg = (
        sdf.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mb_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    streamed = {r["win_start"]: r["n"] for r in spark.table("mb_wm").collect()}

    batch = {
        r["win_start"]: r["n"]
        for r in events.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
        .collect()
    }
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"
    assert streamed, "no windows sealed across batches"
    for k, v in streamed.items():
        assert batch.get(k) == v, f"window {k}: streamed {v} != batch {batch.get(k)}"


def test_checkpoint_incremental_restart(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: a second availableNow run sharing the
    checkpoint must process ONLY files that arrived since the first run —
    no reprocessing, no duplicates in the foreachBatch sink."""
    events = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    landing, ckpt, sink = (str(tmp_path / d) for d in ("landing", "ckpt", "sink"))
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(landing)

    def run_once():
        sdf = spark.readStream.schema(events.schema).parquet(landing)

        def write_batch(df, batch_id):
            df.write.mode("append").parquet(sink)

        q = (
            sdf.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()

    second.coalesce(1).write.mode("append").parquet(landing)
    run_once()  # same checkpoint -> offset log skips already-committed files
    ids = [r["event_id"] for r in spark.read.parquet(sink).collect()]
    assert len(ids) == len(set(ids)) == events.count(), "duplicates or loss on restart"


def test_stream_stream_join_outer_invariants(spark, sf_dir):
    """Outer stream-stream join: (a) matched rows equal the batch inner
    interval join exactly; (b) every NULL-padded purchase truly has no
    qualifying view; (c) no purchase appears both matched and NULL-padded."""
    rows = REGISTRY["stream_stream_join_outer"].fn(spark, sf_dir).collect()
    matched = {(r["purchase_id"], r["view_id"]) for r in rows if r["view_id"] is not None}
    unmatched = {r["purchase_id"] for r in rows if r["view_id"] is None}

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vu"), F.col("ts").alias("vt")
    )
    inner = p.join(
        v, (F.col("pu") == F.col("vu"))
        & (F.col("vt") >= F.col("pt") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("vt") <= F.col("pt"))
    )
    batch_pairs = {(r["purchase_id"], r["view_id"]) for r in inner.collect()}
    batch_matched_ids = {pid for pid, _ in batch_pairs}
    assert matched == batch_pairs, "matched subset diverges from batch inner join"
    assert not (unmatched & batch_matched_ids), "NULL-padded purchase has a real match"
    assert not (unmatched & {pid for pid, _ in matched}), "purchase both matched and padded"
    assert rows, "outer join emitted nothing"


def test_insert_ignore_vs_replace_duality(spark, sf_dir):
    """Same target/incoming slices: INSERT IGNORE keeps the target row on
    key conflict, REPLACE keeps the incoming row; both agree off-conflict."""
    ign = {r["o_orderkey"]: (r["o_totalprice"], r["o_orderstatus"])
           for r in REGISTRY["sink_insert_ignore"].fn(spark, sf_dir).collect()}
    rep = {r["o_orderkey"]: (r["o_totalprice"], r["o_orderstatus"])
           for r in REGISTRY["sink_replace"].fn(spark, sf_dir).collect()}
    assert set(ign) == set(rep), "the two verbs must cover the same key set"
    orders = table(spark, sf_dir, "orders")
    conflict = {
        r["o_orderkey"]
        for r in orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 3 == 0)
        ).collect()
    }
    diff = {k for k in ign if ign[k] != rep[k]}
    assert diff == conflict, "verbs must differ exactly on conflicting keys"
    for k in conflict:
        assert ign[k][1] == "F" and rep[k][1] == "N"


def test_late_metrics_emission_equals_sealed_and_state_bounded(spark, sf_dir):
    """Watermark observability invariants on the OUT-OF-ORDER landing dir:
    (1) every input row is accounted; (2) genuine multi-batch run;
    (3) append-mode emission == exactly the windows the final watermark
    sealed (computed independently from the batch query); (4) state after
    the run holds only the unsealed tail — bounded despite adversarial
    input order; (5) deterministic across invocations."""
    m = REGISTRY["stream_late_metrics"].fn(spark, sf_dir).collect()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert m["rows_in"] == n_events
    assert m["n_batches"] >= 2, "must be a genuine multi-batch run"

    wm = F.to_timestamp(F.lit(m["final_watermark"].replace("T", " ").replace("Z", "")))
    batch_windows = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    sealed = batch_windows.filter(F.col("window.end") <= wm).count()
    unsealed = batch_windows.count() - sealed
    assert m["windows_emitted"] == sealed, "append emission must equal sealed windows"
    assert m["state_rows_final"] == unsealed, "state must hold only the unsealed tail"
    assert m["state_rows_final"] < 10, "state bound violated"

    again = REGISTRY["stream_late_metrics"].fn(spark, sf_dir).collect()[0]
    assert m == again, "observability metrics must be deterministic"


def test_state_store_soak_10x_bounded(spark, sf_dir, tmp_path):
    """State-store soak (VERDICT r4 #7): a 10x-replicated landing dir (events
    tiled over ~10 months, 20 chronological files, 10 micro-batches) must
    keep the watermarked tumbling aggregation's state BOUNDED by the unsealed
    tail — peak state rows stays two orders of magnitude below the total
    window count, because the advancing watermark evicts sealed windows every
    batch. This is the 100-TB state-bound made measurable: state tracks the
    watermark lag (hours), never the stream length (months)."""
    import json
    import os
    import shutil

    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        F.timestamp_add("DAY", (F.col("rep") * 31).cast("int"), F.col("ts")).alias("ts"),
        "user_id",
        "value",
        "rep",
    )
    n_total = big.count()

    landing = str(tmp_path / "landing10x")
    os.makedirs(landing, exist_ok=True)
    base = 1_600_000_000
    seq = 0
    t0, t1 = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = t0 + (t1 - t0) / 2
    for i in range(10):
        for pred in (F.col("ts") < F.lit(mid), F.col("ts") >= F.lit(mid)):
            stage = os.path.join(landing, f"_stage_{seq}")
            (
                big.filter((F.col("rep") == i) & pred)
                .drop("rep")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(stage)
            )
            part = next(
                p for p in os.listdir(stage)
                if p.endswith(".parquet") and not p.startswith((".", "_"))
            )
            dst = os.path.join(landing, f"events_{seq:03d}.parquet")
            os.replace(os.path.join(stage, part), dst)
            shutil.rmtree(stage, ignore_errors=True)
            os.utime(dst, (base + seq, base + seq))
            seq += 1

    # NOTE: the shifted ts tiles are chronological ACROSS replicas and the
    # two halves are chronological within each replica -> oldest-first
    # processing, so the watermark advances monotonically every batch.
    sdf = (
        spark.readStream.schema(big.drop("rep").schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(landing)
    )
    agg = (
        sdf.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("soak10x")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows_in = 0
    peak_state = 0
    n_batches = len(q.recentProgress)
    for p in q.recentProgress:
        d = json.loads(p.json)
        rows_in += d["numInputRows"]
        for op in d.get("stateOperators", []):
            peak_state = max(peak_state, op.get("numRowsTotal", 0))

    total_windows = (
        big.select(F.window("ts", "1 hour")).distinct().count()
    )
    emitted = spark.table("soak10x").count()

    assert rows_in == n_total, f"ingested {rows_in} != staged {n_total}"
    assert n_batches >= 8, f"expected ~10 micro-batches, got {n_batches}"
    assert emitted >= 0.9 * total_windows, (
        f"only {emitted}/{total_windows} windows sealed — watermark stalled"
    )
    # THE bound: peak state is the unsealed tail (watermark lag + one batch
    # span), not the stream length. 10 months of windows, peak must stay
    # far below the total (measured ~60-400 rows vs ~7000 windows).
    assert peak_state > 0, "state metrics missing from progress"
    assert peak_state <= total_windows * 0.15, (
        f"peak state {peak_state} rows vs {total_windows} windows — state unbounded"
    )


def test_stateful_timeout_sessions_match_batch(spark, sf_dir, ddb):
    """stream_stateful_timeout: every emitted (closed) session must equal a
    batch-sessionized session EXACTLY (start, count, exact-cents total);
    no session emits twice; and at least the early sessions (well behind
    the final watermark) must have closed."""
    out = REGISTRY["stream_stateful_timeout"].fn(spark, sf_dir).collect()
    assert out, "no sessions closed — timeout machinery never fired"
    emitted = {(r["user_id"], r["session_start"]): (r["n_events"], r["total_value"]) for r in out}
    assert len(emitted) == len(out), "a session emitted twice"

    batch = ddb.execute("""
        WITH gaps AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                           - epoch(CAST(LAG(ts) OVER w AS TIMESTAMP)) >= 1800
                        OR LAG(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM gaps
        )
        SELECT user_id,
               strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
               MAX(CAST(ts AS TIMESTAMP)) AS session_end
        FROM sess GROUP BY user_id, sid
    """).df()
    bmap = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in batch.itertuples()
    }
    for k, v in emitted.items():
        assert k in bmap, f"emitted session {k} not in batch sessionization"
        assert bmap[k] == v, f"session {k}: stream {v} != batch {bmap[k]}"
    # completeness: sessions ending >= 4h before the stream's end must have
    # timed out (final watermark = max_ts - 2h; 30-min gap; wide margin)
    import pandas as pd_

    horizon = batch["session_end"].max() - pd_.Timedelta(hours=4)
    must_close = batch[batch["session_end"] < horizon]
    for r in must_close.itertuples():
        assert (r.user_id, r.session_start) in emitted, (
            f"session ending {r.session_end} never closed"
        )


def test_stream_approx_distinct_batch_equivalent(spark, sf_dir):
    """Same sketch + same data => the streaming HLL result must equal the
    batch approx_count_distinct exactly, and sit within the rsd bound of
    the exact distinct count."""
    from pyspark.sql import functions as F

    got = {
        r["win_start"]: (r["approx_users"], r["n_events"])
        for r in REGISTRY["stream_approx_distinct"].fn(spark, sf_dir).collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"))
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("a"),
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("exact"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("w"),
            "a",
            "n",
            "exact",
        )
        .collect()
    )
    assert len(batch) == len(got)
    for r in batch:
        a, n = got[r["w"]]
        assert n == r["n"]
        assert a == r["a"], "streaming sketch != batch sketch"
        assert abs(a - r["exact"]) <= max(3, 0.1 * r["exact"])


def test_stream_matview_upkeep_rerun_and_multibatch(spark, sf_dir):
    """stream_matview_upkeep: result is stable across reruns (fresh state
    dir per invocation) and the operator itself asserts the fold ran as a
    genuine multi-batch execution (it raises otherwise)."""
    from sdp_spark.plans.registry import load_all

    R = load_all()
    a = sorted(map(tuple, R["stream_matview_upkeep"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, R["stream_matview_upkeep"].fn(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_wm_seal_boundary_semantics(spark, tmp_path):
    """Pins the seal boundary the round-7 watermark oracles depend on: a
    window whose end EQUALS the final watermark (max ts - delay) IS
    emitted in append mode — Spark seals at end <= watermark, not <.
    Synthetic fixture: events at 10:30 and 13:00 with a 2h watermark put
    the watermark at exactly 11:00, the [10:00, 11:00) window end."""
    import datetime as dt

    d = str(tmp_path / "wm_boundary")
    rows = [(1, dt.datetime(2024, 1, 1, 10, 30)), (2, dt.datetime(2024, 1, 1, 13, 0))]
    spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1).write.parquet(d)
    sdf = spark.readStream.schema("id long, ts timestamp").parquet(d)
    agg = (
        sdf.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", "HH:mm").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_boundary_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {(r["ws"], r["n"]) for r in spark.table("wm_boundary_pin").collect()}
    assert ("10:00", 1) in out, "end==watermark window must be emitted (<= seal)"
    assert ("13:00", 1) not in out, "unsealed tail window must be withheld"


def test_ssjoin_outer_eviction_boundary(spark, tmp_path):
    """Pins the eviction boundary the stream_stream_join_outer oracle
    depends on: a NULL-padded purchase is emitted only when p_ts is
    STRICTLY below the final watermark — equality is withheld (asymmetric
    to the window seal's <=). Synthetic fixture: watermark lands exactly
    on one purchase's p_ts (10:00), a second purchase sits strictly below
    it (9:00)."""
    import datetime as dt

    d = str(tmp_path / "ssj_boundary")
    rows = [
        (1, "purchase", 1, dt.datetime(2024, 1, 1, 10, 0)),
        (2, "purchase", 1, dt.datetime(2024, 1, 1, 9, 0)),
        (3, "purchase", 1, dt.datetime(2024, 1, 1, 12, 0)),
        (4, "view", 2, dt.datetime(2024, 1, 1, 12, 0)),
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp"
    ).coalesce(1).write.parquet(d)
    src = spark.readStream.schema(
        "event_id long, event_type string, user_id long, ts timestamp"
    ).parquet(d)
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    v = (
        src.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    j = p.join(
        v,
        F.expr("p_user = v_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"),
        "left_outer",
    ).select("purchase_id", "view_id")
    q = (
        j.writeStream.format("memory")
        .queryName("ssj_boundary_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = sorted(
        (r["purchase_id"], r["view_id"]) for r in spark.table("ssj_boundary_pin").collect()
    )
    assert (2, None) in out, "p_ts strictly below watermark must emit its NULL row"
    assert (1, None) not in out, "p_ts == watermark must be withheld (strict <)"
    assert (3, None) not in out, "p_ts above watermark must be withheld"


def test_event_time_timeout_boundary(spark, tmp_path):
    """Pins the applyInPandasWithState event-time-timeout boundary the
    stream_stateful_timeout oracle depends on: hasTimedOut fires only when
    the final watermark is STRICTLY past the timeout timestamp — a state
    whose timeout EQUALS the watermark stays open (asymmetric to the
    window seal's <=). Synthetic fixture: user 1's timeout (10:00 + 30min)
    lands exactly on the watermark (12:30 − 2h), user 2's strictly below."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    d = str(tmp_path / "timeout_boundary")
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 10, 0)),
        (2, 2, dt.datetime(2024, 1, 1, 9, 59)),
        (3, 3, dt.datetime(2024, 1, 1, 12, 30)),
    ]
    spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(d)
    sdf = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .parquet(d)
        .withWatermark("ts", "2 hours")
    )
    out_schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("closed", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("last_us", T.LongType())])
    gap_ms = 30 * 60 * 1000

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"user_id": [int(key[0])], "closed": [1]})
            return
        rows = pd.concat(list(pdfs))
        last_us = int(rows["ts"].astype("int64").max() // 1000)
        state.update((last_us,))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)

    q = (
        sdf.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
        .writeStream.format("memory")
        .queryName("timeout_boundary_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fired = sorted(r["user_id"] for r in spark.table("timeout_boundary_pin").collect())
    assert 2 in fired, "timeout strictly below watermark must fire"
    assert 1 not in fired, "timeout == watermark must NOT fire (strict <)"
