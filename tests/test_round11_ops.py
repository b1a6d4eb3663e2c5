"""Round-11 operator tests: Kulldorff MC hash dispersion (parametric in
the registry's replicate count — R=999 since r12),
nowcast-composed outbreak detection, MySQL misc built-ins round 2,
polygon metrics, WKB round-trip, IVF-PQ boundary replication, the
Fellegi-Sunter linkage pair (batch bands, block-key ladder, streaming
intake), the naive-Bayes signal/no-signal pair, Cori gamma-posterior
Rt (batch + the tenth stream pair), grid-GDBSCAN ribbon clustering,
and the meta-analysis pair (fixed effects + DerSimonian-Laird)."""
import datetime as dt
import math
import os
import statistics

import pytest


# ---------------------------------------------------------------------------
# Kulldorff Monte-Carlo case hash: multinomial dispersion (the ADVICE r10
# high item — the affine stride this replaced is a low-discrepancy lattice)
# ---------------------------------------------------------------------------


def _mix(x, M31, MIX2, MIX3):
    h = (x % M31) * 48271 % M31
    h = h ^ (h >> 15)
    h = h * MIX2 % M31
    h = h ^ (h >> 13)
    h = h * MIX3 % 4294967296
    return h ^ (h >> 16)


def test_kulldorff_mix_hash_dispersed_vs_affine_stride():
    """The Kulldorff replicate draw pos = 1 + mix(i*(R+1)+j) % n must
    disperse like a TRUE multinomial: with C cases over n equal cells,
    per-cell counts have sd ~ sqrt(C/n * (1 - 1/n)). The affine stride
    ((i*R + j)*KNUTH) % 2^32 % n it replaced is systematic sampling —
    its per-cell counts hug C/n within ~1, shrinking the null max-LLR
    distribution and making p anti-conservative. Both halves asserted:
    the shipped mix is multinomial-wide AND the rejected stride is
    provably narrow on the same draw."""
    from sdp_spark.operators.stats import (
        _KULL_REPS,
        _ST_M31,
        _ST_MIX2,
        _ST_MIX3,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    n, c = 96, 15000  # cells / cases, the sf0.1-ish fixture shape
    sd_theory = math.sqrt(c / n * (1 - 1 / n))  # ~12.4

    sds_mix, sds_aff = [], []
    for j in range(1, 6):  # five replicates, each judged alone
        cnt_mix, cnt_aff = [0] * n, [0] * n
        for i in range(1, c + 1):
            cnt_mix[_mix(i * (_KULL_REPS + 1) + j, _ST_M31, _ST_MIX2, _ST_MIX3) % n] += 1
            cnt_aff[((i * _KULL_REPS + j) * KNUTH) % KNUTH_MOD % n] += 1
        sds_mix.append(statistics.pstdev(cnt_mix))
        sds_aff.append(statistics.pstdev(cnt_aff))

    # shipped mix: every replicate within [0.6, 1.5] x multinomial sd
    for sd in sds_mix:
        assert 0.6 * sd_theory < sd < 1.5 * sd_theory, (sd, sd_theory)
    # rejected affine stride: systematically under-dispersed (< 0.25x)
    assert max(sds_aff) < 0.25 * sd_theory, (sds_aff, sd_theory)


def test_kulldorff_null_p_values_not_anticonservative(spark, tmp_path):
    """On NULL data (a uniform grid, no planted cluster) the scan must
    not report significance: every returned zone's p must be well above
    the 1/(R+1) floor. Under the affine stride this failed — near-null
    zones reported p at the floor because no replicate max ever reached
    even modest observed LLRs."""
    import pandas as pd

    from sdp_spark.operators.stats import (
        _KULL_REPS,
        query_spatial_scan_kulldorff,
    )
    from tests.test_round10_ops import _cell_id_pools

    pools = _cell_id_pools()
    cells = sorted(pools.keys())[:40]
    keys = []
    for cell in cells:  # 2 customers per cell: flat, clusterless
        keys.extend(pools[cell][:2])
    sf = str(tmp_path / "kullnull")
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": keys}).to_parquet(f"{sf}/customer.parquet")
    out = query_spatial_scan_kulldorff(spark, sf).collect()
    assert len(out) > 0
    floor = 1 / (_KULL_REPS + 1)
    for r in out:
        assert r.p_value >= 10 * floor, (r, floor)


# ---------------------------------------------------------------------------
# Detector-on-nowcast composition (VERDICT r10 next-round #3)
# ---------------------------------------------------------------------------


def _delay_pools(n_ids=20000):
    """Bucket candidate event_ids by their hash delay (the repo's
    derived-attribute idiom — delays aren't stored, they're a Knuth hash
    of event_id, so a test plants a delay by CHOOSING the id)."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD
    from sdp_spark.operators.analytics import _NC_DMAX, _NC_SALT

    pools = {d: [] for d in range(_NC_DMAX)}
    for i in range(n_ids):
        pools[((i + _NC_SALT) * KNUTH) % KNUTH_MOD % _NC_DMAX].append(i)
    return pools


def test_nowcasted_detector_flags_spike_raw_farrington_misses(spark, tmp_path):
    """The composition's reason to exist: a real spike 1 day before the
    as-of date with a BACK-LOADED delay mix (only ~2/10 of reports
    visible at age 1). The raw truncated series shows baseline-level
    counts on the spike day, so Farrington over what's visible stays
    silent; the nowcasted detector inflates by 1/F(1) and alerts."""
    from sdp_spark.operators.analytics import (
        _NC_ASOF,
        farrington_scored,
        query_outbreak_nowcasted,
    )
    from pyspark.sql import functions as F

    pools = _delay_pools()
    take = {d: 0 for d in pools}

    def ids_for(delays):
        out = []
        for d in delays:
            out.append(pools[d][take[d]])
            take[d] += 1
        return out

    # stationary delay mix, 10 cases/day: delays (0,1,2,3,4,5,6,7,6,7)
    # -> F(0)=.1, F(1)=.2 ... back-loaded tail so age-1 visibility is 20%
    base_mix = [0, 1, 2, 3, 4, 5, 6, 7, 6, 7]
    asof = dt.date.fromisoformat(_NC_ASOF)
    day0 = asof - dt.timedelta(days=27)  # 28 days: t = 0..27
    rows = []
    for t in range(28):
        d = day0 + dt.timedelta(days=t)
        mixes = list(base_mix)
        if t == 26:  # spike 1 day before asof (age 1): +40 cases
            mixes += base_mix * 4
        for i, ev_id in enumerate(ids_for(mixes)):
            rows.append(
                (
                    ev_id,
                    dt.datetime(d.year, d.month, d.day, 12, 0, i % 60, i),
                    1,
                    "case",
                    1.0,
                    "{}",
                )
            )
    sf = str(tmp_path / "nc")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    spike_day = (day0 + dt.timedelta(days=26)).isoformat()

    # raw Farrington over the VISIBLE (truncated) series: silent on the
    # spike day — visibility at age 1 is F(1) = 0.2, so the 50-case day
    # reports only 10 = baseline
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD
    from sdp_spark.operators.analytics import _NC_DMAX, _NC_SALT
    from sdp_spark.sources.fixtures import table

    e = table(spark, sf, "events")
    asof_c = F.lit(_NC_ASOF).cast("date")
    visible = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
            (
                ((F.col("event_id") + _NC_SALT) * F.lit(KNUTH))
                % F.lit(KNUTH_MOD)
                % _NC_DMAX
            ).alias("delay"),
        )
        .filter(F.col("d") <= asof_c)
        .filter(F.col("delay") <= F.datediff(asof_c, F.col("d")))
        .groupBy("event_type", "d")
        .agg(F.count("*").cast("double").alias("c"))
    )
    raw = {r.day: r for r in farrington_scored(visible).collect()}
    assert raw[spike_day].alert is False, raw[spike_day]
    assert raw[spike_day].n_events == 10  # 50 * F(1) = 10 = baseline

    # the nowcasted detector recovers the true magnitude and alerts
    out = {r.day: r for r in query_outbreak_nowcasted(spark, sf).collect()}
    spiked = out[spike_day]
    assert spiked.alert is True, spiked
    assert spiked.n_nowcast == pytest.approx(50.0, abs=0.01)
    # non-spike scored days stay quiet under the composition
    for day, r in out.items():
        if day != spike_day:
            assert r.alert is False, r


# ---------------------------------------------------------------------------
# MySQL misc built-ins round 2 (VERDICT r10 next-round #5)
# ---------------------------------------------------------------------------


def test_mysql_misc2_compress_bytes_and_crc32(spark, tmp_path):
    """Pin the parts the oracle can't reach: exact zlib bytes for a known
    literal (MySQL COMPRESS = 4-byte LE length + default-level zlib
    stream), the COMPRESS('') = '' rule, and CRC32 against zlib.crc32."""
    import zlib

    import pandas as pd

    from sdp_spark.functions.families import fn_mysql_misc2

    sf = str(tmp_path / "m2")
    os.makedirs(sf)
    pd.DataFrame(
        {"c_custkey": [1, 2], "c_name": ["Customer#000000001", ""]}
    ).to_parquet(f"{sf}/customer.parquet")
    out = {r.c_custkey: r for r in fn_mysql_misc2(spark, sf).collect()}

    r1 = out[1]
    assert r1.name_crc32 == zlib.crc32(b"Customer#000000001")  # 14390204
    # full MySQL COMPRESS bytes for the literal, prefix as the key emits it
    full = "12000000789C732E2D2EC9CF4D2D52368002430039950527"
    assert r1.comp_prefix_hex == full[:12]
    assert r1.comp_roundtrip == "Customer#000000001"

    r2 = out[2]
    assert r2.name_crc32 == 0           # CRC32('') = 0
    assert r2.comp_prefix_hex == ""     # COMPRESS('') = '' (no prefix)
    assert r2.comp_roundtrip == ""

    # EXPORT_SET lowest-bit-first: custkey 1 -> bit0 set
    assert r1.export_flags == "Y,N,N,N,N,N,N,N"
    assert r1.privileges == "read"      # MAKE_SET(1, read, write, ...)
    # UUID shape: 8-4-4-4-12 with forced version/variant nibbles
    import re as _re

    assert _re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}",
        r1.uuid_det,
    )


# ---------------------------------------------------------------------------
# Polygon metrics (VERDICT r10 next-round #6)
# ---------------------------------------------------------------------------


def test_polygon_metrics_shoelace_against_hand_literals(spark, tmp_path):
    """Pin the shoelace/centroid/envelope arithmetic against values
    computed by hand for one key: reproduce the vertex hash in Python,
    run the textbook formulas on exact integers, and require equality
    with the operator output (the oracle proves cross-engine agreement;
    this proves both engines compute THE SHOELACE, not something that
    merely agrees)."""
    import pandas as pd

    from sdp_spark.functions.families import (
        _WKT_SALTS,
        fn_geo_polygon_metrics,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    key = 13
    sf = str(tmp_path / "pm")
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": [key]}).to_parquet(f"{sf}/customer.parquet")
    out = fn_geo_polygon_metrics(spark, sf).collect()
    assert len(out) == 1
    r = out[0]

    xs = [((key + sx) * KNUTH) % KNUTH_MOD % 3600 - 1800 for _, sx in _WKT_SALTS]
    ys = [((key + sy) * KNUTH) % KNUTH_MOD % 1200 - 600 for sy, _ in _WKT_SALTS]
    edges = [(0, 1), (1, 2), (2, 0)]
    crs = [xs[i] * ys[j] - xs[j] * ys[i] for i, j in edges]
    cr = sum(crs)
    assert cr != 0  # non-degenerate triangle for this key
    area = abs(cr) / 200.0
    cx = sum((xs[i] + xs[j]) * c for (i, j), c in zip(edges, crs)) / (30.0 * cr)
    cy = sum((ys[i] + ys[j]) * c for (i, j), c in zip(edges, crs)) / (30.0 * cr)
    assert r.area_deg2 == pytest.approx(area, abs=1e-6)
    assert r.centroid_lon == pytest.approx(cx, abs=1e-6)
    assert r.centroid_lat == pytest.approx(cy, abs=1e-6)
    assert r.ring_is_clockwise == (cr < 0)
    # centroid must sit strictly inside the envelope (a triangle's
    # area-weighted centroid is interior)
    assert min(xs) / 10.0 < r.centroid_lon < max(xs) / 10.0
    assert min(ys) / 10.0 < r.centroid_lat < max(ys) / 10.0
    assert r.env_area_deg2 == pytest.approx(
        (max(xs) - min(xs)) * (max(ys) - min(ys)) / 100.0, abs=1e-6
    )
    # hand-check the envelope WKT for this key's literal vertices
    exp = (
        f"POLYGON(({min(xs) / 10:.1f} {min(ys) / 10:.1f}, "
        f"{max(xs) / 10:.1f} {min(ys) / 10:.1f}, "
        f"{max(xs) / 10:.1f} {max(ys) / 10:.1f}, "
        f"{min(xs) / 10:.1f} {max(ys) / 10:.1f}, "
        f"{min(xs) / 10:.1f} {min(ys) / 10:.1f}))"
    )
    assert r.env_wkt == exp


def test_polygon_metrics_degenerate_ring_is_null(spark, tmp_path):
    """A collinear ring (cr = 0) must emit area 0 and NULL centroid, not
    a division error — hunt the fixture id space for a collinear case
    and synthesize one if none exists in range."""
    import pandas as pd

    from sdp_spark.functions.families import (
        _WKT_SALTS,
        fn_geo_polygon_metrics,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    def cross(key):
        xs = [((key + sx) * KNUTH) % KNUTH_MOD % 3600 - 1800 for _, sx in _WKT_SALTS]
        ys = [((key + sy) * KNUTH) % KNUTH_MOD % 1200 - 600 for sy, _ in _WKT_SALTS]
        return (
            (xs[0] * ys[1] - xs[1] * ys[0])
            + (xs[1] * ys[2] - xs[2] * ys[1])
            + (xs[2] * ys[0] - xs[0] * ys[2])
        )

    degen = next((k for k in range(0, 4_000_000, 13) if cross(k) == 0), None)
    if degen is None:
        pytest.skip("no collinear ring in the scanned id range")
    sf = str(tmp_path / "pmd")
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": [degen]}).to_parquet(f"{sf}/customer.parquet")
    r = fn_geo_polygon_metrics(spark, sf).collect()[0]
    assert r.area_deg2 == 0.0
    assert r.centroid_lon is None and r.centroid_lat is None


# ---------------------------------------------------------------------------
# WKB round-trip (VERDICT r10 next-round #8)
# ---------------------------------------------------------------------------


def test_wkb_hex_matches_struct_pack(spark, tmp_path):
    """The arithmetic IEEE-754 encoder must produce the SAME bytes as a
    real binary writer: compare wkb_hex against struct.pack('<bId d')-
    style assembly for every fixture row, and require bit-exact
    round-trip recovery (the oracle proves cross-engine agreement; this
    proves the bytes are genuine WKB a GIS reader would accept)."""
    import struct

    import pandas as pd

    from sdp_spark.functions.families import fn_geo_wkb

    sf = str(tmp_path / "wkb")
    os.makedirs(sf)
    # ids exercising sign/exponent variety incl. exact zero lon/lat hits
    pd.DataFrame({"c_custkey": list(range(0, 1300, 13))}).to_parquet(
        f"{sf}/customer.parquet"
    )
    out = fn_geo_wkb(spark, sf).collect()
    assert len(out) == 100
    for r in out:
        expected = (
            b"\x01"
            + struct.pack("<I", 1)
            + struct.pack("<d", r.lon)
            + struct.pack("<d", r.lat)
        ).hex().upper()
        assert r.wkb_hex == expected, (r.c_custkey, r.wkb_hex, expected)
        assert r.roundtrip_ok is True
        assert r.geom_type == 1 and r.is_little_endian is True
        assert r.lon_rt == r.lon and r.lat_rt == r.lat


# ---------------------------------------------------------------------------
# Fellegi-Sunter record linkage: classification bands, false-negative
# band, multi-pass recall, and the block-key density ladder
# ---------------------------------------------------------------------------


def test_record_linkage_classification_bands(spark, sf_dir):
    """Per-key corruption determines the score exactly (fixed literal
    weights summed in one order): a clean key is a 'link' with every
    field agreeing; a case-folded name alone still auto-links; name+phone
    corruption drops to 'possible' (clerical review); name+phone+balance
    (keys = 0 mod 105) falls below the review cutoff and is correctly
    LOST — the false-negative band a real linkage operation owns."""
    from sdp_spark.plans.registry import load_all

    rows = {
        r["a_key"]: r
        for r in load_all()["query_record_linkage"].fn(spark, sf_dir).collect()
    }
    assert all(r["a_key"] == r["b_key"] for r in rows.values())
    clean = rows[1]  # 1 is coprime to 3, 5, 7, 11
    assert clean["match_class"] == "link"
    assert (
        clean["agree_name"], clean["agree_phone"],
        clean["agree_bal"], clean["agree_seg"],
    ) == (1, 1, 1, 1)
    assert clean["score"] == pytest.approx(28.3671, abs=1e-4)
    name_only = rows[3]
    assert name_only["match_class"] == "link"
    assert name_only["agree_name"] == 0
    assert name_only["score"] == pytest.approx(18.4486, abs=1e-4)
    name_phone = rows[15]
    assert name_phone["match_class"] == "possible"
    assert name_phone["score"] == pytest.approx(7.8521, abs=1e-4)
    assert 105 not in rows and 0 not in rows  # n+p+bal corrupted: lost
    # pass-2 recall: a corrupted-segment key misses the pass-1 block but
    # the name-prefix pass recovers it
    seg_lost = rows[11]
    assert seg_lost["agree_seg"] == 0
    assert seg_lost["match_class"] == "link"


def test_record_linkage_plan_no_cartesian_blk_equijoin(spark, sf_dir):
    """Both blocking passes must plan as equi-joins: the ladder digits
    ride INSIDE the pass-1 hash key (a runtime-k substr in the join
    condition would demote to a residual filter after the coarse
    pairing — the quadratic blowup the ladder exists to prevent), and
    no data-scale cartesian appears anywhere."""
    from sdp_spark.plans.registry import load_all

    df = load_all()["query_record_linkage"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "[blk" in plan  # pass-1 hash key IS the laddered block id


def test_record_linkage_ladder_extends_block_key(spark, tmp_path):
    """Above 20k records the ladder appends a phone-prefix digit to the
    pass-1 block key. Recall must be unharmed: on a 25k synthetic
    master, every key except the designed 0-mod-105 false-negative band
    links back to its corrupted twin."""
    import os

    from sdp_spark.plans.registry import load_all

    n = 25_000
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    d = str(tmp_path / "master")
    os.makedirs(d)
    spark.createDataFrame(
        [
            (
                k,
                f"Customer#{k:09d}",
                k % 25,
                round(k * 0.37 + 1.0, 2),
                segs[k % 5],
            )
            for k in range(1, n + 1)
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    out = load_all()["query_record_linkage"].fn(spark, d)
    got = {r["a_key"] for r in out.collect()}
    # the phone typo overwrites the LAST digit with '9' — a no-op when
    # the pseudo-phone already ends in 9, so those 0-mod-105 keys keep
    # the phone agreement and survive as 'possible'
    lost = {
        k
        for k in range(1, n + 1)
        if k % 105 == 0 and ((k + 7) * 2654435761) % 2**32 % 10 != 9
    }
    assert got == set(range(1, n + 1)) - lost


# ---------------------------------------------------------------------------
# Naive Bayes: signal/no-signal pair (the ML analogue of the null-data
# scan tests)
# ---------------------------------------------------------------------------


def test_nb_classifier_perfect_on_separable_corpus(spark, tmp_path):
    """Plant three classes with DISJOINT vocabularies: the holdout
    confusion matrix must be perfectly diagonal (every test doc carries
    only its own class's tokens, so the smoothed likelihood dominates
    any prior imbalance)."""
    import os

    from sdp_spark.plans.registry import load_all

    vocabs = {
        "aa": ["alpha", "apex", "arrow", "audit"],
        "bb": ["bravo", "bend", "bloom", "basin"],
        "cc": ["cedar", "crisp", "cloud", "canal"],
    }
    langs = sorted(vocabs)
    rows = []
    for i in range(300):
        lang = langs[i % 3]
        words = [vocabs[lang][(i + j) % 4] for j in range(12)]
        rows.append((i, " ".join(words), lang, f"src{i % 4}", 60))
    d = str(tmp_path / "sep")
    os.makedirs(d)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    out = load_all()["llm_nb_classifier"].fn(spark, d).collect()
    assert all(r["lang_true"] == r["lang_pred"] for r in out)
    assert {r["lang_true"] for r in out} == set(langs)
    n_test = sum(r["n_docs"] for r in out)
    assert 30 <= n_test <= 90  # ~20% holdout of 300


def test_nb_classifier_chance_on_label_independent_text(spark, sf_dir):
    """The fixture's lang labels are independent of text by construction
    (shared vocabulary, uniform draws) — an honest learner must land at
    the majority-class floor, NOT find phantom signal."""
    from sdp_spark.plans.registry import load_all

    out = load_all()["llm_nb_classifier"].fn(spark, sf_dir).collect()
    n = sum(r["n_docs"] for r in out)
    correct = sum(r["n_docs"] for r in out if r["lang_true"] == r["lang_pred"])
    assert n > 0
    # between degenerate-all-wrong and any-real-signal: chance for 5
    # classes is 0.2, the en-majority predictor lands ~0.33-0.45
    assert 0.1 <= correct / n <= 0.6


# ---------------------------------------------------------------------------
# Cori gamma-posterior Rt: planted growth vs criticality
# ---------------------------------------------------------------------------


def test_rt_cori_growth_and_critical_series(spark, tmp_path):
    """Two planted series: counts doubling every 3 days must report
    trend='growing' with rt_mean near the Lotka-Euler value
    13/Σ(w_k·2^(-k/3)) ≈ 2.23; a flat series sits at criticality —
    rt_mean ≈ 1 and NEVER 'growing' once history fills (the posterior
    interval correctly brackets 1 instead of flagging noise)."""
    import os

    from sdp_spark.plans.registry import load_all

    rows, ev = [], 0
    day0 = dt.date(2024, 3, 1)
    for t in range(21):
        d = day0 + dt.timedelta(days=t)
        n_exp = max(1, round(8 * 2 ** (t / 3)))
        for series, n in (("exp", n_exp), ("flat", 20)):
            for i in range(n):
                rows.append(
                    (
                        ev,
                        dt.datetime(d.year, d.month, d.day, 10, i % 60, i % 60),
                        1,
                        series,
                        1.0,
                        "{}",
                    )
                )
                ev += 1
    sf = str(tmp_path / "rt")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = load_all()["ts_rt_cori"].fn(spark, sf).collect()
    by = {(r["event_type"], r["day_s"]): r for r in out}
    # late days: full 7-day serial history AND a full tau window
    late = [by[("exp", (day0 + dt.timedelta(days=t)).isoformat())] for t in range(16, 21)]
    assert all(r["trend"] == "growing" for r in late)
    assert all(1.8 <= r["rt_mean"] <= 2.8 for r in late)
    flat_late = [
        by[("flat", (day0 + dt.timedelta(days=t)).isoformat())]
        for t in range(16, 21)
    ]
    assert all(r["trend"] != "growing" for r in flat_late)
    assert all(0.85 <= r["rt_mean"] <= 1.15 for r in flat_late)
    # interval sanity: low < mean < high everywhere
    assert all(r["rt_low"] < r["rt_mean"] < r["rt_high"] for r in out)


# ---------------------------------------------------------------------------
# Grid-DBSCAN: ribbon cluster found whole; sparse noise dropped
# ---------------------------------------------------------------------------


def _cells5_pools(n_keys=300000):
    """Bucket candidate custkeys by their 5-deg grid cell (the derived
    lat/lon lattice reaches only some cells — enumerate, never assume)."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    pools = {}
    for k in range(1, n_keys):
        lat = ((k + 17) * KNUTH) % KNUTH_MOD % 1200 / 10.0 - 60.0
        lon = ((k + 31) * KNUTH) % KNUTH_MOD % 3600 / 10.0 - 180.0
        cell = (int(lon // 5.0), int(lat // 5.0))
        pools.setdefault(cell, []).append(k)
    return pools


def test_spatial_dbscan_ribbon_cluster_and_noise(spark, tmp_path):
    """Plant a 5-cell horizontal RIBBON of dense cells (the shape
    window scans smear) over a sparse background: the output must be
    ONE cluster containing all 5 ribbon cells with the min-cid label,
    and every sparse background cell must be absent (noise)."""
    import os

    import pandas as pd

    from sdp_spark.plans.registry import load_all

    pools = _cells5_pools()
    # the derived lat/lon lattice reaches only ~288 of 1728 cells and no
    # straight 5-run exists — walk the REACHABLE 8-neighbor adjacency
    # for any connected 5-cell path instead (the ribbon follows the
    # terrain, as real outbreaks do)
    rich = {c for c, v in pools.items() if len(v) >= 30}

    def path_from(start):
        path, seen = [start], {start}
        while len(path) < 5:
            cx, cy = path[-1]
            nxt = [
                (cx + dx, cy + dy)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
                and (cx + dx, cy + dy) in rich
                and (cx + dx, cy + dy) not in seen
            ]
            if not nxt:
                return None
            path.append(nxt[0])
            seen.add(nxt[0])
        return path

    ribbon = next(
        (p for p in (path_from(s) for s in sorted(rich)) if p), None
    )
    assert ribbon is not None
    keys = []
    for c in ribbon:
        keys.extend(pools[c][:30])  # dense: 30 points/cell
    background = [
        c for c in sorted(pools)
        if c not in ribbon and len(pools[c]) >= 2
    ][:60]
    for c in background:
        keys.extend(pools[c][:2])  # sparse: 2 points/cell = noise
    sf = str(tmp_path / "dbscan")
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": keys}).to_parquet(f"{sf}/customer.parquet")
    out = load_all()["query_spatial_dbscan"].fn(spark, sf).collect()
    # threshold = max(5, ceil(2 * mean)): mean = (150+120)/65 ~ 4.2 ->
    # minpts ~ 9; ribbon cells (30) are core, background (2) is noise
    assert len(out) == 1, out
    r = out[0]
    assert r["n_cells"] == 5 and r["n_points"] == 150
    assert r["min_cx"] == min(cx for cx, _ in ribbon)
    assert r["max_cx"] == max(cx for cx, _ in ribbon)
    assert r["min_cy"] == min(cy for _, cy in ribbon)
    assert r["max_cy"] == max(cy for _, cy in ribbon)
    cid = lambda cx, cy: (cx + 36) * 24 + (cy + 12)
    assert r["cluster_id"] == min(cid(cx, cy) for cx, cy in ribbon)


def test_rt_cori_stream_equals_batch(spark, sf_dir):
    """The tenth pair's structural guarantee: the streaming twin's
    alert rows must equal the batch key's trend='growing' rows exactly
    (same shared core, memory-sink snapshot in between)."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    batch = {
        (r["event_type"], r["day_s"]): r
        for r in REG["ts_rt_cori"].fn(spark, sf_dir).collect()
        if r["trend"] == "growing"
    }
    stream = {
        (r["event_type"], r["day_s"]): r
        for r in REG["stream_rt_cori_alerts"].fn(spark, sf_dir).collect()
    }
    assert set(batch) == set(stream)
    for k in batch:
        assert batch[k].asDict() == stream[k].asDict()


# ---------------------------------------------------------------------------
# Fixed-effects meta-analysis: homogeneity vs planted heterogeneity
# ---------------------------------------------------------------------------


def _meta_fixture(spark, path, strata):
    """strata: list of (nat, n1, x1, n0, x0) — build customer+orders
    parquet with exactly those 2x2 arms (one order per customer)."""
    import os

    os.makedirs(path)
    custs, orders, ck, ok = [], [], 1, 1
    for nat, n1, x1, n0, x0 in strata:
        for arm, n, x in (("BUILDING", n1, x1), ("MACHINERY", n0, x0)):
            for i in range(n):
                custs.append((ck, f"Customer#{ck:09d}", nat, 100.0, arm))
                pri = "1-URGENT" if i < x else "3-MEDIUM"
                orders.append(
                    (ok, ck, "F", 50.0, dt.datetime(2024, 1, 2, 0, 0, 0), pri)
                )
                ck += 1
                ok += 1
    spark.createDataFrame(
        custs,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{path}/orders.parquet")


def test_meta_fixed_effects_homogeneous_and_heterogeneous(spark, tmp_path):
    """Two identical strata (rd = 0.2 in both) must pool to exactly 0.2
    with Q = 0 and I2 = 0; replacing one stratum with a NULL-effect arm
    (rd = 0) must drive Q above df and I2 > 0.5, with the pooled value
    strictly between the stratum effects — the 'one effect or many?'
    panel behaving like the textbook says."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    d1 = str(tmp_path / "homog")
    _meta_fixture(spark, d1, [(1, 100, 30, 100, 10), (2, 100, 30, 100, 10)])
    out = REG["agg_meta_fixed_effects"].fn(spark, d1).collect()
    assert len(out) == 2
    for r in out:
        assert r["rd"] == pytest.approx(0.2, abs=1e-6)
        assert r["pooled_rd"] == pytest.approx(0.2, abs=1e-6)
        assert r["q_stat"] == pytest.approx(0.0, abs=1e-6)
        assert r["i2"] == 0.0 and r["q_df"] == 1
        assert r["pooled_low"] < 0.2 < r["pooled_high"]

    d2 = str(tmp_path / "heterog")
    _meta_fixture(
        spark, d2, [(1, 400, 120, 400, 40), (2, 400, 40, 400, 40)]
    )
    out2 = REG["agg_meta_fixed_effects"].fn(spark, d2).collect()
    rds = sorted(r["rd"] for r in out2)
    r0 = out2[0]
    assert rds[0] == pytest.approx(0.0, abs=1e-6)
    assert rds[1] == pytest.approx(0.2, abs=1e-6)
    assert rds[0] < r0["pooled_rd"] < rds[1]
    assert r0["q_stat"] > r0["q_df"]
    assert r0["i2"] > 0.5


def test_stream_linkage_incremental_bands(spark, sf_dir):
    """Every surviving report links to its TRUE master (user_id): clean
    reports auto-link, single-field-corrupted ones go to review, and
    double-corrupted reports (event_id % 15) are absent — the owned
    false-negative band, streaming edition."""
    import duckdb

    from sdp_spark.plans.registry import load_all

    rows = load_all()["stream_linkage_incremental"].fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    uid = {
        e: u
        for e, u in con.execute(
            f"SELECT event_id, user_id FROM"
            f" read_parquet('{sf_dir}/events.parquet')"
            f" WHERE event_id % 7 = 0"
        ).fetchall()
    }
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    def corrupt(ev):
        # phone typo is a NO-OP when the pseudo-phone already ends in 9
        name_c = ev % 3 == 0
        phone_c = ev % 5 == 0 and ((uid[ev] + 7) * KNUTH) % KNUTH_MOD % 10 != 9
        return name_c, phone_c

    by_event = {}
    for r in rows:
        by_event.setdefault(r["event_id"], []).append(r)
    for ev, rs in by_event.items():
        true_master = [r for r in rs if r["master_key"] == uid[ev]]
        assert true_master, (ev, rs)
        r = true_master[0]
        name_c, phone_c = corrupt(ev)
        if not name_c and not phone_c:
            assert r["match_class"] == "link"
            assert (r["agree_name"], r["agree_phone"]) == (1, 1)
        elif name_c != phone_c:  # exactly one field effectively corrupted
            assert r["match_class"] == "possible"
    # the double-corrupted band is lost entirely
    for ev in uid:
        if all(corrupt(ev)):
            assert ev not in by_event, ev


def test_meta_random_effects_widens_under_heterogeneity(spark, tmp_path):
    """DL behavior under planted heterogeneity (rd 0.2 vs 0.0): tau2 > 0,
    the random-effects pooled estimate sits closer to the unweighted
    mean (0.1) than the fixed one does, and the interval is strictly
    wider. Under homogeneity tau2 = 0 and DL == fixed exactly."""
    from sdp_spark.plans.registry import load_all

    REG = load_all()
    d1 = str(tmp_path / "homog")
    _meta_fixture(spark, d1, [(1, 100, 30, 100, 10), (2, 100, 30, 100, 10)])
    fx = REG["agg_meta_fixed_effects"].fn(spark, d1).collect()[0]
    re = REG["agg_meta_random_effects"].fn(spark, d1).collect()[0]
    assert re["tau2"] == 0.0
    assert re["pooled_rd_re"] == pytest.approx(fx["pooled_rd"], abs=1e-6)
    assert re["pooled_low_re"] == pytest.approx(fx["pooled_low"], abs=1e-6)

    d2 = str(tmp_path / "het")
    # unequal sizes so fixed-vs-DL pooling actually differ: the big
    # stratum carries rd=0.2, the small one rd=0.0
    strata = [(1, 1600, 480, 1600, 160), (2, 100, 10, 100, 10)]
    _meta_fixture(spark, d2, strata)
    fx2 = REG["agg_meta_fixed_effects"].fn(spark, d2).collect()[0]
    re2 = REG["agg_meta_random_effects"].fn(spark, d2).collect()[0]
    assert re2["tau2"] > 0
    mean_rd = 0.1
    assert abs(re2["pooled_rd_re"] - mean_rd) < abs(fx2["pooled_rd"] - mean_rd)
    width_fx = fx2["pooled_high"] - fx2["pooled_low"]
    width_re = re2["pooled_high_re"] - re2["pooled_low_re"]
    assert width_re > width_fx


# ---------------------------------------------------------------------------
# Detector-panel concordance
# ---------------------------------------------------------------------------


def test_detector_concordance_invariants_and_planted_spike(spark, sf_dir, tmp_path):
    """Fixture invariants: all 28 unordered pairs present (the panel
    gained ears_c1/ears_c3 in r12), every count bounded by the scored
    domain, jaccard/pct_agree in [0, 1], co-alerts never exceed either
    side. Planted 10x spike: the moving-baseline triangle (ears, cusum,
    ewma) co-alerts on it, so each of those pairs shows
    n_alert_both >= 1."""
    from itertools import combinations

    from sdp_spark.plans.registry import load_all

    REG = load_all()
    rows = REG["query_detector_concordance"].fn(spark, sf_dir).collect()
    dets = ["cusum", "ears", "ears_c1", "ears_c3", "ewma", "farrington",
            "histlimits", "serfling"]
    assert {(r["det_a"], r["det_b"]) for r in rows} == set(
        combinations(dets, 2)
    )
    for r in rows:
        assert 0 < r["n_scored_both"]
        assert r["n_alert_both"] <= min(r["n_alert_a"], r["n_alert_b"])
        assert 0.0 <= r["jaccard"] <= 1.0
        assert 0.0 <= r["pct_agree"] <= 1.0

    # planted spike: 30 flat days of 20/day, day 25 jumps to 200 — on
    # the Jan-2024 calendar the detectors' baselines anchor to
    # (_CUSUM_SPLIT = 2024-01-11 freezes the pre-split baseline)
    rows_ev, ev = [], 0
    for t in range(30):
        d = dt.date(2024, 1, 1) + dt.timedelta(days=t)
        # 18/22 jitter: EARS excludes zero-variance baselines (sd > 0
        # applicability filter), so a perfectly flat plant scores nothing
        n = 200 if t == 25 else (18 if t % 2 else 22)
        for i in range(n):
            rows_ev.append(
                (ev, dt.datetime(d.year, d.month, d.day, 9, i % 60, i % 60),
                 1, "spike", 1.0, "{}")
            )
            ev += 1
    sf = str(tmp_path / "conc")
    os.makedirs(sf)
    spark.createDataFrame(
        rows_ev,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = {
        (r["det_a"], r["det_b"]): r
        for r in REG["query_detector_concordance"].fn(spark, sf).collect()
    }
    for pair in (("cusum", "ears"), ("cusum", "ewma"), ("ears", "ewma")):
        assert out[pair]["n_alert_both"] >= 1, (pair, out[pair])


def test_stat_normal_matches_erf_reference(spark, sf_dir):
    """The A&S 26.2.17 CDF must track math.erf within its published
    7.5e-8 bound plus the 1e-6 output grid; symmetry Φ(-z) = 1 - Φ(z)
    and two-sided p = 2(1 - Φ(|z|)) hold row-wise; the CDF is monotone
    in z."""
    from sdp_spark.plans.registry import load_all

    rows = load_all()["fn_stat_normal"].fn(spark, sf_dir).collect()
    assert rows
    by_z = []
    for r in rows:
        ref = 0.5 * (1 + math.erf(r["z"] / math.sqrt(2)))
        assert abs(r["cdf"] - ref) < 2e-6, (r["z"], r["cdf"], ref)
        assert abs(
            r["p_two_sided"]
            - 2 * (1 - 0.5 * (1 + math.erf(abs(r["z"]) / math.sqrt(2))))
        ) < 4e-6
        by_z.append((r["z"], r["cdf"]))
    by_z.sort()
    assert all(a[1] <= b[1] + 1e-9 for a, b in zip(by_z, by_z[1:]))
    # symmetry via the mirrored grid rows
    cdfs = {r["c_custkey"]: r for r in rows}
    for k, r in cdfs.items():
        if k > 0 and -k in cdfs:
            assert abs(cdfs[-k]["cdf"] - (1 - r["cdf"])) < 2e-6


def test_sir_fit_recovers_planted_parameters(spark, tmp_path):
    """Generate a synthetic epidemic with the operator's own recursion
    at R0 = 1.4 (beta=0.35, gamma=0.25), run to extinction — the
    final-size equation makes the attack rate exactly 50% at that R0,
    so the operator's data-derived N = 2 x total matches the
    generator's N. The grid search must rank the TRUE (beta, gamma)
    first, and the fitted R0 must be 1.4."""
    from sdp_spark.plans.registry import load_all

    # R0 = 1.4 is chosen ON PURPOSE: the final-size equation
    # 1 - A = exp(-R0 * A) gives attack rate A = 0.5 at R0 = 1.4, so a
    # run-to-extinction epidemic infects exactly half the population
    # and the operator's data-derived N = 2 x total cases recovers the
    # generator's N — no truncation gymnastics, no N bias shifting the
    # best grid cell off the true parameters.
    beta, gamma, n_pop, i0 = 0.35, 0.25, 20000.0, 50.0
    s, i, obs = n_pop - i0, i0, [int(i0)]
    while len(obs) < 400:
        new = beta * s * i / n_pop
        if round(new) < 1:
            break
        obs.append(round(new))
        s, i = s - new, i + new - gamma * i
    rows, ev = [], 0
    for t, n in enumerate(obs):
        d = dt.date(2024, 1, 1) + dt.timedelta(days=t)
        for j in range(n):
            rows.append(
                (ev, dt.datetime(d.year, d.month, d.day, 8, j % 60, j % 60),
                 1, "case", 1.0, "{}")
            )
            ev += 1
    sf = str(tmp_path / "sir")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = load_all()["ts_sir_fit"].fn(spark, sf).collect()
    assert len(out) == 10
    top = out[0]
    assert (top["beta"], top["gamma"]) == (beta, gamma), out[:3]
    assert top["r0"] == pytest.approx(1.4, abs=1e-4)
    # ranked strictly by sse with deterministic tiebreak
    sses = [r["sse"] for r in out]
    assert sses == sorted(sses)
