"""Round-9 operator invariants: fulltext query expansion (recall
widening on a planted corpus), point-in-polygon (pure-python ray-casting
cross-check + shuffle-free plan), the changelog trigger (replay == post
state), and the information-schema view (structural invariants).

Cross-engine value parity for all four keys is covered by
tests/test_oracle_parity.py like every other registry key; these tests
pin the semantic claims the oracles cannot express.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_query_expansion_widens_recall_planted(spark, tmp_path):
    """Blind feedback must strictly widen recall: on a corpus where an
    expansion term ('zebra') co-occurs with the base query in the
    feedback pool AND appears alone in one extra doc, pass 2 must return
    a strict superset of pass 1's docs, including the zebra-only doc."""
    from sdp_spark.operators.fulltext import (
        filter_fulltext,
        fulltext_query_expansion,
    )

    rows = []
    # 4 docs matching the base query, all carrying the rare term
    for i in range(1, 5):
        rows.append((i, "query spark join zebra common", "en", "t", 29))
    # 1 doc carrying ONLY the rare term — invisible to pass 1
    rows.append((5, "zebra common", "en", "t", 12))
    # 7 fillers so zebra's df (5/12) clears the 50% common-word cut
    for i in range(6, 13):
        rows.append((i, "filler common words", "en", "t", 19))
    sf = str(tmp_path / "planted")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    base = {r.doc_id for r in filter_fulltext(spark, sf).collect()}
    widened = {r.doc_id for r in fulltext_query_expansion(spark, sf).collect()}
    assert base == {1, 2, 3, 4}
    assert widened == {1, 2, 3, 4, 5}, "expansion must pull in the zebra-only doc"
    assert base < widened, "expansion must STRICTLY widen recall"


def test_query_expansion_widens_on_fixture(spark, sf_dir):
    """The real fixture also widens: the corpus carries one sub-50%-df
    term ('dup') that reaches the feedback pool — pass 2 ⊋ pass 1."""
    from sdp_spark.operators.fulltext import (
        filter_fulltext,
        fulltext_query_expansion,
    )

    base = {r.doc_id for r in filter_fulltext(spark, sf_dir).collect()}
    widened = {r.doc_id for r in fulltext_query_expansion(spark, sf_dir).collect()}
    assert base <= widened
    assert len(widened) > len(base)


def _pip_reference(lon: float, lat: float) -> bool:
    """Independent pure-python even-odd ray casting over the same
    polygon literal (textbook form, no shared code with the operator)."""
    from sdp_spark.functions.families import _GEO_POLY

    inside = False
    n = len(_GEO_POLY)
    for i in range(n):
        x1, y1 = _GEO_POLY[i]
        x2, y2 = _GEO_POLY[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            if lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


def test_geo_polygon_matches_reference(spark, sf_dir):
    from sdp_spark.functions.families import fn_geo_polygon

    out = fn_geo_polygon(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.in_polygon == _pip_reference(r.lon, r.lat), (
            f"custkey {r.c_custkey} at ({r.lon}, {r.lat})"
        )


def test_geo_polygon_plan_shuffle_free(spark, sf_dir):
    """bbox prefilter + crossing count must be one codegen scan-project:
    zero exchanges (the docstring's plan claim, pinned)."""
    from sdp_spark.functions.families import fn_geo_polygon

    plan = (
        fn_geo_polygon(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_geo_polygon_concavity_exercised(spark, sf_dir):
    """The notch must matter: some bbox-passing point inside the notch
    triangle's bounding region is OUTSIDE the polygon (a convex-hull
    test would get it wrong). At least one excluded-but-bbox-passing row
    exists at sf0.01+; at sf0.001 the 6-row sample may be all-inside."""
    from sdp_spark.functions.families import fn_geo_polygon

    out = fn_geo_polygon(spark, "/root/testdata/sf0.01").collect()
    assert any(not r.in_polygon for r in out), "no bbox-pass/poly-fail rows"


def test_changelog_replays_to_post_state(spark, sf_dir):
    """The trigger guarantee: base + changelog == post-state. Post-state
    = dml_update_delete's rewritten table plus the insert batch."""
    from sdp_spark.functions.num import dround
    from sdp_spark.operators.scans import (
        changelog_replay,
        dml_changelog_trigger,
        dml_update_delete,
    )
    from sdp_spark.sources.fixtures import table

    base = table(spark, sf_dir, "orders")
    clog = dml_changelog_trigger(spark, sf_dir)
    replayed = changelog_replay(base, clog)

    inserted = clog.filter(F.col("op") == "INSERT").select(
        "o_orderkey",
        F.col("new_price").alias("o_totalprice"),
        F.col("new_status").alias("o_orderstatus"),
    )
    want = (
        dml_update_delete(spark, sf_dir)
        .select(
            "o_orderkey",
            dround(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(inserted)
    )
    got = {tuple(r) for r in replayed.collect()}
    exp = {tuple(r) for r in want.collect()}
    assert got == exp


def test_changelog_ops_disjoint_and_typed(spark, sf_dir):
    from sdp_spark.operators.scans import _CLG_INS_OFFSET, dml_changelog_trigger

    rows = dml_changelog_trigger(spark, sf_dir).collect()
    ops = {r.op for r in rows}
    assert ops <= {"INSERT", "UPDATE", "DELETE"}
    for r in rows:
        if r.op == "DELETE":
            assert r.new_price is None and r.new_status is None
            assert r.old_price is not None
        elif r.op == "UPDATE":
            assert r.old_price is not None and r.new_price is not None
            assert r.new_price == pytest.approx(round(r.old_price * 0.95, 2), abs=0.011)
        else:
            assert r.old_price is None and r.old_status is None
            assert r.o_orderkey >= _CLG_INS_OFFSET
    # a key appears under at most one op (trigger batches are disjoint)
    from collections import Counter

    c = Counter((r.o_orderkey) for r in rows)
    assert max(c.values()) == 1


def test_information_schema_structure(spark, sf_dir):
    from sdp_spark.operators.catalog import (
        _INFOSCHEMA_TABLES,
        catalog_information_schema,
    )
    from sdp_spark.sources.fixtures import table

    rows = catalog_information_schema(spark, sf_dir).collect()
    by_table: dict[str, list] = {}
    for r in rows:
        by_table.setdefault(r.table_name, []).append(r)
    assert set(by_table) == set(_INFOSCHEMA_TABLES)
    for t, cols in by_table.items():
        # ordinals contiguous from 1, one row count per table
        assert sorted(c.ordinal_position for c in cols) == list(
            range(1, len(cols) + 1)
        )
        assert len({c.n_table_rows for c in cols}) == 1
    # row counts are the REAL counts (distributed aggregates, not stubs)
    assert by_table["nation"][0].n_table_rows == table(
        spark, sf_dir, "nation"
    ).count()
    assert by_table["lineitem"][0].n_table_rows == table(
        spark, sf_dir, "lineitem"
    ).count()
    # the type families match the live Spark schema
    doc_fields = {
        r.column_name: r.type_family for r in by_table["documents"]
    }
    assert doc_fields == {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    }
    emb = {r.column_name: r.type_family for r in by_table["embeddings"]}
    assert emb["embedding"] == "array<float>"


def test_serfling_flags_planted_excess(spark, tmp_path):
    """Serfling must (a) stay quiet on a day-of-week cycle that the
    level detectors would flag, and (b) fire on a genuine excess over
    the seasonally-adjusted expectation. Planted: a clean weekly cycle
    in the baseline; scored days repeat the cycle except one day with
    a +10x spike."""
    import datetime as dt
    import os

    from sdp_spark.operators.analytics import query_outbreak_serfling

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(30):
        d = base + dt.timedelta(days=day)
        # weekly cycle: weekend days 3x the weekday volume
        n = 30 if d.weekday() >= 5 else 10
        if day == 25:
            n = 100  # planted outbreak on a WEEKDAY (cycle low)
        for i in range(n):
            rows.append((eid, d + dt.timedelta(minutes=i), 1, "click", 1.0, "{}"))
            eid += 1
    sf = str(tmp_path / "serf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    out = {r.day: r for r in query_outbreak_serfling(spark, sf).collect()}
    spike = out["2024-01-26"]
    assert spike.alert, spike
    # every un-spiked scored day repeats the baseline cycle exactly —
    # the seasonal expectation absorbs it, no false alarms
    for day, r in out.items():
        if day != "2024-01-26":
            assert not r.alert, r
    # the weekend peak is EXPECTED, not excess: the first harmonic lifts
    # the weekend expectation far above the weekday level (10), so the
    # 3x peak clears without an alert (a flat-baseline detector would
    # need a threshold so wide it misses the planted weekday spike)
    weekend = [r for d, r in out.items()
               if dt.date.fromisoformat(d).weekday() >= 5]
    assert weekend and all(r.expected > 20 for r in weekend)


def test_serfling_stream_equals_batch(spark, sf_dir):
    from sdp_spark.operators.analytics import query_outbreak_serfling
    from sdp_spark.streaming.ops import stream_serfling_alerts

    batch = {
        (r.event_type, r.day)
        for r in query_outbreak_serfling(spark, sf_dir).collect()
        if r.alert
    }
    live = {
        (r.event_type, r.day)
        for r in stream_serfling_alerts(spark, sf_dir).collect()
    }
    assert live == batch


def test_balanced_class_equalizes(spark, sf_dir):
    from collections import Counter

    from sdp_spark.operators.insights import sample_balanced_class
    from sdp_spark.sources.fixtures import table

    out = sample_balanced_class(spark, sf_dir).collect()
    per_class = Counter(r.lang for r in out)
    sizes = {
        r.lang: r.n
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    k = min(sizes.values())
    assert set(per_class) == set(sizes)
    assert all(v == k for v in per_class.values()), per_class
    # sampled ids are real members of their class
    assert all(r.sample_rank <= k for r in out)


def test_k_core_is_fixpoint_and_sound(spark, sf_dir):
    """Every node in the emitted core has degree >= K (the defining
    invariant), and the peel converged (the operator raises otherwise —
    run it to prove the fixture converges inside the round budget)."""
    from sdp_spark.operators.graphs import _KCORE_K, graph_k_core

    hist = graph_k_core(spark, sf_dir).collect()
    assert hist, "month-window 3-core must be non-empty"
    assert all(r.deg >= _KCORE_K for r in hist)


def test_polygon_join_matches_naive(spark, sf_dir):
    """Grid-cell candidate generation must be lossless: the bucketed
    join equals the naive per-polygon scan over all points."""
    from sdp_spark.functions.families import (
        _GEO_POLY_SET,
        _pip_col,
        _poly_bbox,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD
    from sdp_spark.operators.joins import join_polygon_contains
    from sdp_spark.sources.fixtures import table

    got = {
        (r.c_custkey, r.poly_id)
        for r in join_polygon_contains(spark, sf_dir).collect()
    }
    lat = (
        ((F.col("c_custkey") + 17) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
    ) / 10.0 - 60.0
    lon = (
        ((F.col("c_custkey") + 31) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
    ) / 10.0 - 180.0
    pts = table(spark, sf_dir, "customer").select(
        "c_custkey", lat.alias("lat"), lon.alias("lon")
    )
    want = set()
    for pid, poly in _GEO_POLY_SET.items():
        x0, x1, y0, y1 = _poly_bbox(poly)
        hit = pts.filter(
            F.col("lon").between(x0, x1)
            & F.col("lat").between(y0, y1)
            & _pip_col(F.col("lon"), F.col("lat"), poly)
        )
        want |= {(r.c_custkey, pid) for r in hit.collect()}
    assert got == want
    assert got, "containment join must be non-empty on the fixture"


def test_span_corruption_invariants(spark, sf_dir):
    """Spans must be in-bounds, non-overlapping, deterministic, and land
    the canonical ~15% noise density (3/20 expected mask fraction)."""
    from sdp_spark.operators.corpus import (
        _SPANC_BLOCK,
        _SPANC_LEN_MOD,
        llm_span_corruption,
    )
    from sdp_spark.sources.fixtures import table

    rows = llm_span_corruption(spark, sf_dir).collect()
    assert rows
    n_tok = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    masked = total = 0
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r.start_tok)
        prev_end = -1
        for r in spans:
            # inside its own block, inside the doc, no overlap
            assert r.span_id * _SPANC_BLOCK <= r.start_tok
            assert r.start_tok + r.span_len <= (r.span_id + 1) * _SPANC_BLOCK
            assert r.start_tok + r.span_len <= n_tok[doc]
            assert 1 <= r.span_len <= _SPANC_LEN_MOD
            assert r.start_tok > prev_end
            prev_end = r.start_tok + r.span_len - 1
            masked += r.span_len
        total += n_tok[doc]
    density = masked / total
    assert 0.05 < density < 0.16, density
    again = llm_span_corruption(spark, sf_dir).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in rows}


def test_event_sequence_planted(spark, tmp_path):
    """A planted consecutive view-click-purchase run matches exactly
    once; the same three events with an interloper between click and
    purchase must NOT match (strict contiguity — the contract that
    separates this from agg_funnel)."""
    import datetime as dt
    import os

    from sdp_spark.operators.windows import win_event_sequence

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: exact consecutive pattern
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        # user 2: interloper breaks contiguity
        (4, base, 2, "view", 1.0, "{}"),
        (5, base + dt.timedelta(minutes=1), 2, "click", 1.0, "{}"),
        (6, base + dt.timedelta(minutes=2), 2, "error", 1.0, "{}"),
        (7, base + dt.timedelta(minutes=3), 2, "purchase", 1.0, "{}"),
    ]
    sf = str(tmp_path / "seq")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = win_event_sequence(spark, sf).collect()
    assert [(r.user_id, r.start_event_id, r.end_event_id) for r in out] == [
        (1, 1, 3)
    ]


def test_pq_compression_and_recall(spark, sf_dir):
    """PQ: codes are 8 symbols over a 16-symbol alphabet (4 bits each =
    8 B vs 256 B float32 — the 32x compression claim), codebooks are
    deterministic, and the emitted top-5 (post exact rescore) keeps
    recall@5 >= 0.75 against the brute-force baseline."""
    from sdp_spark.operators.llm import (
        _PQ_DSUB,
        _PQ_KS,
        _PQ_M,
        _pq_codebooks,
        llm_sim_search,
        llm_sim_search_pq,
    )

    assert _PQ_M * _PQ_DSUB == 64 and _PQ_KS == 16
    books = _pq_codebooks(spark, sf_dir)
    assert len(books) == _PQ_M
    assert all(len(b) == _PQ_KS and len(b[0]) == _PQ_DSUB for b in books)
    assert books == _pq_codebooks(spark, sf_dir)  # memoized + deterministic

    exact: dict[int, set] = {}
    for r in llm_sim_search(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set] = {}
    for r in llm_sim_search_pq(spark, sf_dir).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact)
    assert all(len(v) == 5 for v in got.values())
    recalls = [len(exact[q] & got[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.75


def test_geo_wkt_roundtrip(spark, sf_dir):
    from sdp_spark.functions.families import fn_geo_wkt

    rows = fn_geo_wkt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wkt.startswith("POINT(") and r.wkt.endswith(")")
        assert r.roundtrip_ok, r


def test_diagnostic_accuracy_identities(spark, sf_dir):
    """The screening panel must satisfy its own algebra: prevalence,
    accuracy, Youden and the likelihood ratios all derive from the four
    cells; recompute each from the emitted cells and compare at the
    shared rounding grid."""
    import math

    from sdp_spark.operators.stats import agg_diagnostic_accuracy

    def dr(x, n=4):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    r = agg_diagnostic_accuracy(spark, sf_dir).collect()[0]
    tp, fp, fn, tn = r.tp, r.fp, r.fn, r.tn
    n = tp + fp + fn + tn
    sens, spec = tp / (tp + fn), tn / (fp + tn)
    assert r.prevalence == dr((tp + fn) / n)
    assert r.accuracy == dr((tp + tn) / n)
    assert r.sensitivity == dr(sens) and r.specificity == dr(spec)
    assert r.youden_j == dr(sens + spec - 1)
    assert r.lr_pos == dr(sens / (1 - spec))
    assert 0 <= r.ppv <= 1 and 0 <= r.npv <= 1


def test_cmh_within_stratum_hull(spark, sf_dir):
    """Every stratum row must appear (zero cells don't drop strata — the
    whole point of MH pooling); the pooled OR repeats identically on
    every row; and when all stratum ORs are finite, the MH estimate (a
    positively-weighted average of them) lies in their convex hull."""
    from sdp_spark.operators.stats import agg_cmh_stratified

    rows = agg_cmh_stratified(spark, sf_dir).collect()
    assert len(rows) == 3
    assert sum(r.a + r.b + r.c + r.d for r in rows) > 0
    cmh = {r.cmh_or for r in rows}
    assert len(cmh) == 1
    c = cmh.pop()
    assert c is not None and c >= 0
    ors = [r.or_stratum for r in rows]
    if all(o is not None for o in ors):
        assert min(ors) - 1e-4 <= c <= max(ors) + 1e-4


def test_moran_grid_bounds(spark, sf_dir):
    """Moran's I over a binary-weight grid is bounded (|I| <= ~1 for any
    weight matrix after normalization; the raw statistic stays in a
    slightly wider band), E[I] = -1/(n-1), and the queen adjacency link
    count is even (symmetry: every (a,b) link has its (b,a) twin)."""
    from sdp_spark.operators.stats import agg_moran_grid

    r = agg_moran_grid(spark, sf_dir).collect()[0]
    assert r.n_cells > 10
    assert r.w_links % 2 == 0
    assert abs(r.expected_i - (-1.0 / (r.n_cells - 1))) < 1e-6
    assert -1.5 <= r.moran_i <= 1.5
    assert r.sq_sum > 0


def test_theil_sen_outlier_resistance(spark, tmp_path):
    """Planted series: a perfect slope-2 line with one massive outlier
    day. OLS would be dragged far off; the Theil-Sen median slope must
    stay exactly 2 (more than half the pairwise slopes are outlier-free)."""
    import os

    from sdp_spark.operators.analytics import ts_theil_sen

    sf = str(tmp_path / "ts_planted")
    os.makedirs(sf)
    from datetime import datetime

    rows = []
    for t in range(21):
        ts = datetime(2024, 1, t + 1, 0, 0, 0)
        n = 1000 if t == 10 else 5 + 2 * t  # outlier day 10
        for i in range(n):
            rows.append((t * 10000 + i, ts, i, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    got = {r.event_type: r for r in ts_theil_sen(spark, sf).collect()}
    assert got["click"].slope == 2.0
    assert got["click"].n_days == 21


def test_holt_linear_forecast_is_linear(spark, sf_dir):
    """The h-step forecasts must fall on the line level + h*trend at the
    rounding grid, share one (level, trend) per stream, and cover all
    5 event types x 7 horizons."""
    import math

    from sdp_spark.operators.analytics import ts_holt_linear

    def dr(x, n=4):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    rows = ts_holt_linear(spark, sf_dir).collect()
    assert len(rows) == 35
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        assert sorted(x.h for x in rs) == list(range(1, 8))
        assert len({(x.level, x.trend, x.n_days) for x in rs}) == 1


def test_holt_linear_constant_series_fixpoint(spark, tmp_path):
    """A constant series is a fixpoint: level == the constant, trend == 0,
    every forecast == the constant (exact — no float drift, the recursion
    multiplies exact values)."""
    import os

    from sdp_spark.operators.analytics import ts_holt_linear

    sf = str(tmp_path / "holt_const")
    os.makedirs(sf)
    from datetime import datetime

    rows = []
    for t in range(10):
        for i in range(4):  # 4 events/day, constant
            rows.append((t * 100 + i, datetime(2024, 2, t + 1, 1, 0, 0), i,
                         "view", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    for r in ts_holt_linear(spark, sf).collect():
        assert r.level == 4.0 and r.trend == 0.0 and r.yhat == 4.0


def test_label_propagation_mass_and_determinism(spark, sf_dir):
    """Community sizes must sum to <= |V| (each node holds exactly one
    label; top-k may truncate), every community id must be a valid node
    label, and a rerun must emit the identical frame (synchronous rounds
    + smallest-label tie-break leave no run-order freedom)."""
    from sdp_spark.operators.graphs import _trade_edges, graph_label_propagation

    rows = graph_label_propagation(spark, sf_dir).collect()
    assert rows
    e = _trade_edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("supp").alias("n")).distinct().count()
        + e.select(F.col("cust").alias("n")).distinct().count()
    )
    assert sum(r.n_members for r in rows) <= n_nodes
    assert all(r.community[:2] in ("s:", "c:") for r in rows)
    rows2 = graph_label_propagation(spark, sf_dir).collect()
    assert rows == rows2


def test_patch_grid_token_arithmetic(spark, sf_dir):
    """Grid dims are bounded by the 672/14 = 48-patch cap, token totals
    match gw*gh+1 times the image count per shape, and every image-
    modality asset (doc_id%3==1) is accounted for exactly once."""
    from sdp_spark.operators.multimodal import mm_patch_grid
    from sdp_spark.sources.fixtures import table

    rows = mm_patch_grid(spark, sf_dir).collect()
    assert rows
    assert all(1 <= r.gw <= 48 and 1 <= r.gh <= 48 for r in rows)
    assert all(r.total_tokens == (r.gw * r.gh + 1) * r.n_images for r in rows)
    n_imgs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .count()
    )
    assert sum(r.n_images for r in rows) == n_imgs


def test_rake_scores_and_segmentation(spark, sf_dir):
    """RAKE invariants: no phrase contains a stopword, every score is
    positive, scores are emitted in non-increasing order, and each
    phrase's score >= its word count (degree/freq >= 1 for every word,
    so a phrase of k words scores >= k)."""
    from sdp_spark.operators.stats import _RAKE_STOP, llm_keyword_rake

    rows = llm_keyword_rake(spark, sf_dir).collect()
    assert rows
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words
        assert not set(words) & set(_RAKE_STOP)
        assert r.score >= r.n_words - 1e-9
        assert r.n_occurrences >= 2


def test_fulltext_phrase_stricter_than_bool(spark, sf_dir):
    """Phrase matching is strictly stronger than term conjunction: every
    phrase-matching doc contains both words (subset of the +spark +join
    boolean result), occurrence counts are positive, and a doc holding
    the words NON-adjacently must not match."""
    from sdp_spark.operators.fulltext import _FT_PHRASE, filter_fulltext_phrase
    from sdp_spark.sources.fixtures import table

    w1, w2 = _FT_PHRASE
    rows = filter_fulltext_phrase(spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("text").contains(w1) & F.col("text").contains(w2))
        .collect()
    }
    for r in rows:
        assert r.occ >= 1
        toks = [t for t in docs[r.doc_id].split(" ") if t]
        n_adj = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2
        )
        assert n_adj == r.occ, r.doc_id


def test_spatial_hotspot_window_arithmetic(spark, sf_dir):
    """Window invariants: k <= 9 occupied cells per 3x3 window, obs >=
    the center cell's own count, ratio == obs/expected at the grid, and
    the ranking is by ratio with (cx, cy) tiebreak."""
    import math

    from sdp_spark.operators.stats import query_spatial_hotspot

    def dr(x, n=4):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    rows = query_spatial_hotspot(spark, sf_dir).collect()
    assert rows
    assert all(1 <= r.k <= 9 for r in rows)
    keys = [(-r.ratio, r.cx, r.cy) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.obs > 0 and r.expected > 0
        assert abs(r.ratio - dr(r.obs / (r.expected))) <= 2e-4


def test_mann_kendall_agrees_with_reference(spark, sf_dir):
    """Recompute S, Var(S) and z per stream in pure python from the
    daily counts and compare exactly at the rounding grid; the trend
    verdict must match the z sign and magnitude."""
    import math
    from collections import Counter

    from sdp_spark.operators.analytics import _MK_Z, ts_mann_kendall
    from sdp_spark.sources.fixtures import table

    def dr(x, n=4):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r.c))
    got = {r.event_type: r for r in ts_mann_kendall(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, c in pts]
        n = len(cs)
        s = sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(cs).values()
            if t > 1
        )
        v = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (s - 1) / math.sqrt(v) if s > 0 else (s + 1) / math.sqrt(v) if s < 0 else 0.0
        r = got[et]
        assert r.n_days == n and r.s_stat == s
        assert r.var_s == dr(v) and r.z == dr(z)
        want = (
            "increasing"
            if s > 0 and z >= _MK_Z
            else "decreasing"
            if s < 0 and z <= -_MK_Z
            else "none"
        )
        assert r.trend == want


def test_trend_estimators_vs_reference_random_series(spark, tmp_path):
    """Seeded random series (3 shapes: up-trend, down-trend, flat+ties):
    Theil-Sen slope, Mann-Kendall S/z/verdict and Holt level/trend all
    recomputed in pure python and compared at the rounding grid."""
    import math
    import os
    import random
    from collections import Counter
    from datetime import datetime

    from sdp_spark.operators.analytics import (
        _MK_Z,
        ts_holt_linear,
        ts_mann_kendall,
        ts_theil_sen,
    )

    def dr(x, n=4):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    rng = random.Random(907)
    n_days = 25
    shapes = {
        "click": [3 + 2 * t + rng.randrange(0, 3) for t in range(n_days)],
        "error": [60 - 2 * t + rng.randrange(0, 3) for t in range(n_days)],
        "view": [5 + (t % 2) for t in range(n_days)],  # flat, heavy ties
    }
    sf = str(tmp_path / "rand_series")
    os.makedirs(sf)
    rows = []
    eid = 0
    for et, counts in shapes.items():
        for t, n in enumerate(counts):
            for _ in range(n):
                rows.append(
                    (eid, datetime(2024, 3, t + 1, 12, 0, 0), 1, et, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(f"{sf}/events.parquet")

    # --- python references ---
    def theil_sen(cs):
        slopes = sorted(
            (cs[j] - cs[i]) / (j - i)
            for i in range(len(cs))
            for j in range(i + 1, len(cs))
        )
        m = len(slopes)
        if m % 2:
            return slopes[m // 2]
        return (slopes[m // 2 - 1] + slopes[m // 2]) / 2

    def mann_kendall(cs):
        n = len(cs)
        s = sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(cs).values() if t > 1)
        v = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (s - 1) / math.sqrt(v) if s > 0 else (s + 1) / math.sqrt(v) if s < 0 else 0.0
        return s, z

    def holt(cs):
        level, trend = float(cs[0]), float(cs[1] - cs[0])
        for t in range(1, len(cs)):
            l_new = 0.3 * cs[t] + 0.7 * (level + trend)
            trend = 0.2 * (l_new - level) + 0.8 * trend
            level = l_new
        return level, trend

    got_ts = {r.event_type: r for r in ts_theil_sen(spark, sf).collect()}
    got_mk = {r.event_type: r for r in ts_mann_kendall(spark, sf).collect()}
    got_h = {r.event_type: r for r in ts_holt_linear(spark, sf).collect() if r.h == 1}
    for et, cs in shapes.items():
        assert got_ts[et].slope == dr(theil_sen(cs), 6), et
        s, z = mann_kendall(cs)
        assert got_mk[et].s_stat == s and got_mk[et].z == dr(z), et
        lv, tr = holt(cs)
        assert got_h[et].level == dr(lv) and got_h[et].trend == dr(tr), et
    # directional sanity: the planted shapes must be classified correctly
    assert got_mk["click"].trend == "increasing"
    assert got_mk["error"].trend == "decreasing"
    assert got_mk["view"].trend == "none"
    assert got_ts["click"].slope > 0 > got_ts["error"].slope


def test_geo_nearest_is_true_neighborhood_argmin(spark, sf_dir):
    """For a sample of assigned customers, recompute the 9-cell
    candidate set and haversine argmin in pure python and compare the
    winner + distance; n_candidates must match the candidate count."""
    import math

    from sdp_spark.functions.families import (
        _GEO_EARTH_KM,
        _GEO_NN_CELL,
        join_geo_nearest,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD
    from sdp_spark.sources.fixtures import table

    def pos(key, salt_lat=17, salt_lon=31):
        la = (((key + salt_lat) * KNUTH) % KNUTH_MOD % 1200) / 10.0 - 60.0
        lo = (((key + salt_lon) * KNUTH) % KNUTH_MOD % 3600) / 10.0 - 180.0
        return la, lo

    def hav(clat, clon, slat, slon):
        f1, f2 = math.radians(clat), math.radians(slat)
        dl = math.radians(slon - clon)
        a = (
            math.sin((f2 - f1) / 2) ** 2
            + math.cos(f1) * math.cos(f2) * math.sin(dl / 2) ** 2
        )
        return 2 * _GEO_EARTH_KM * math.asin(math.sqrt(a))

    def dr(x, n):
        p = 10**n
        return math.floor(x * p + 0.5) / p

    sup = [
        r.s_suppkey for r in table(spark, sf_dir, "supplier").collect()
    ]
    scells = {}
    for k in sup:
        la, lo = pos(k)
        scells.setdefault(
            (math.floor(lo / _GEO_NN_CELL), math.floor(la / _GEO_NN_CELL)), []
        ).append((k, la, lo))
    rows = join_geo_nearest(spark, sf_dir).collect()
    assert rows
    for r in rows[:60]:
        cla, clo = pos(r.c_custkey)
        cx, cy = math.floor(clo / _GEO_NN_CELL), math.floor(cla / _GEO_NN_CELL)
        cands = [
            s
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for s in scells.get((cx + dx, cy + dy), [])
        ]
        assert len(cands) == r.n_candidates, r.c_custkey
        best = min(
            cands, key=lambda s: (dr(hav(cla, clo, s[1], s[2]), 4), s[0])
        )
        assert best[0] == r.nearest_suppkey, r.c_custkey
        assert r.dist_km == dr(dr(hav(cla, clo, best[1], best[2]), 4), 2)


def test_geohash_matches_canonical_algorithm(spark, sf_dir):
    """The emitted geohash must equal the PUBLIC geohash algorithm's
    output (canonical interval-bisection form, independently coded
    here), char for char — proving interoperability, not just
    self-consistency — and the text round trip must hold."""
    from sdp_spark.functions.families import fn_geo_geohash
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def canonical(lat, lon, n_chars=6):
        lat_lo, lat_hi = -90.0, 90.0
        lon_lo, lon_hi = -180.0, 180.0
        bits, out, even = 0, [], True
        ch = 0
        while len(out) < n_chars:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    ch = (ch << 1) | 1
                    lon_lo = mid
                else:
                    ch <<= 1
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    ch = (ch << 1) | 1
                    lat_lo = mid
                else:
                    ch <<= 1
                    lat_hi = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(B32[ch])
                bits, ch = 0, 0
        return "".join(out)

    rows = fn_geo_geohash(spark, sf_dir).collect()
    assert rows
    for r in rows:
        la = (((r.c_custkey + 17) * KNUTH) % KNUTH_MOD % 1200) / 10.0 - 60.0
        lo = (((r.c_custkey + 31) * KNUTH) % KNUTH_MOD % 3600) / 10.0 - 180.0
        assert r.geohash == canonical(la, lo), (r.c_custkey, la, lo)
        assert r.roundtrip_ok
        assert abs(r.cell_lat - la) <= 180.0 / 32768
        assert abs(r.cell_lon - lo) <= 360.0 / 32768
