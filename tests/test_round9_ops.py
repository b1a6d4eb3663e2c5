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
