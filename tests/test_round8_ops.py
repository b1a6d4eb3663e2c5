"""Invariant tests for the round-8 operators — the algorithmic guarantees
the DuckDB hash oracle can't express: winnowing's coverage theorem,
containment's embedding semantics, PSI's zero identity, changepoint recall
on a planted shift, market-basket lift on a hand-computable basket set."""

from __future__ import annotations

import pandas as pd

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _write_docs(spark, tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_winnow_coverage_guarantee(spark, tmp_path):
    """The winnowing theorem (k=5, w=4): any shared token run of length
    >= k + w - 1 = 8 between two docs guarantees at least one SELECTED
    fingerprint in common. Plant a 12-token shared run inside otherwise
    disjoint docs and require fp-set intersection; a fully disjoint doc
    must share nothing."""
    shared = " ".join(f"shared{i}" for i in range(12))
    texts = [
        "alpha bravo charlie delta echo " + shared + " foxtrot golf hotel india",
        "nov oscar papa quebec romeo sierra tango " + shared + " uniform victor",
        " ".join(f"uniq{i}" for i in range(30)),
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = REGISTRY["llm_winnow_fingerprint"].fn(spark, sf).collect()
    fps = {1: set(), 2: set(), 3: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared 12-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # selection thins: selected fingerprints < total k-grams
    n_grams_1 = len(texts[0].split()) - 5 + 1
    assert 0 < len(fps[1]) < n_grams_1


def test_winnow_deterministic(spark, sf_dir):
    a = sorted(
        (r["doc_id"], r["pos"], r["fp"])
        for r in REGISTRY["llm_winnow_fingerprint"].fn(spark, sf_dir).collect()
    )
    b = sorted(
        (r["doc_id"], r["pos"], r["fp"])
        for r in REGISTRY["llm_winnow_fingerprint"].fn(spark, sf_dir).collect()
    )
    assert a == b and len(a) > 0


def test_containment_detects_embedded_doc(spark, tmp_path):
    """A short doc verbatim-embedded in a long one: containment(short ->
    long) = 1.0 must be emitted; the reverse direction is far below the
    0.9 threshold and must NOT appear."""
    short = " ".join(f"core{i}" for i in range(20))
    long_doc = (
        " ".join(f"pre{i}" for i in range(40))
        + " "
        + short
        + " "
        + " ".join(f"post{i}" for i in range(40))
    )
    sf = _write_docs(spark, tmp_path, [short, long_doc])
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in REGISTRY["llm_dedup_containment"].fn(spark, sf).collect()
    }
    assert rows.get((1, 2)) == 1.0
    assert (2, 1) not in rows


def test_drift_psi_zero_when_distributions_match(spark, tmp_path):
    """PSI identity: identical price multisets before and after the split
    date give psi_term == 0 in every bucket."""
    prices = [1000.0, 50000.0, 80000.0, 120000.0, 200000.0, 400000.0] * 10
    n = len(prices)
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, 2 * n + 1)),
            "o_custkey": [1] * (2 * n),
            "o_orderstatus": ["F"] * (2 * n),
            "o_totalprice": prices + prices,
            "o_orderdate": (
                [pd.Timestamp("1997-06-01")] * n + [pd.Timestamp("1999-06-01")] * n
            ),
            "o_orderpriority": ["1-URGENT"] * (2 * n),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        f"{sf}/orders.parquet"
    )
    rows = REGISTRY["dq_drift_psi"].fn(spark, sf).collect()
    assert len(rows) > 0
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert all(r["ref_pct"] == r["cur_pct"] for r in rows)


def test_changepoint_detects_planted_shift(spark, tmp_path):
    """A level shift of +40 with ±0.5 jitter must fire at (and only near)
    the boundary; the same series without the shift must stay silent."""
    n = 200
    shift_at = 100

    def mk(shift: float):
        return pd.DataFrame(
            {
                "event_id": list(range(n)),
                "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
                "user_id": [1] * n,
                "event_type": ["m"] * n,
                "value": [
                    (10.0 + (0.5 if i % 2 else -0.5)) + (shift if i >= shift_at else 0)
                    for i in range(n)
                ],
                "props": ["{}"] * n,
            }
        )

    sf = str(tmp_path)
    spark.createDataFrame(mk(40.0)).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    fired = REGISTRY["ts_changepoint_meanshift"].fn(spark, sf).collect()
    assert fired, "planted +40 shift must fire"
    # the maximal |z| row sits exactly at the shift boundary
    top = max(fired, key=lambda r: abs(r["z"]))
    assert top["event_id"] == shift_at
    spark.createDataFrame(mk(0.0)).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    quiet = REGISTRY["ts_changepoint_meanshift"].fn(spark, sf).collect()
    assert not quiet, "no-shift series must not fire"


def test_market_basket_lift_hand_computed(spark, tmp_path):
    """20 baskets: {1,2} in ten, {3,4} in the other ten. lift(1,2) =
    N·n12/(n1·n2) = 20·10/100 = 2.0; cross pairs never co-occur."""
    rows = []
    for o in range(1, 11):
        rows += [(o, 1), (o, 2)]
    for o in range(11, 21):
        rows += [(o, 3), (o, 4)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = str(tmp_path)
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        f"{sf}/lineitem.parquet"
    )
    out = {
        (r["part_a"], r["part_b"]): r
        for r in REGISTRY["agg_market_basket"].fn(spark, sf).collect()
    }
    assert out[(1, 2)]["lift"] == 2.0 and out[(1, 2)]["n_ab"] == 10
    assert out[(3, 4)]["lift"] == 2.0
    assert (1, 3) not in out and (2, 4) not in out


def test_retention_cohort_offset_zero_is_one(spark, sf_dir):
    """By construction every user is active on their cohort day: retention
    at offset 0 is exactly 1.0 for every cohort."""
    rows = REGISTRY["agg_retention_cohort"].fn(spark, sf_dir).collect()
    day0 = [r for r in rows if r["offset_days"] == 0]
    assert day0, "must emit offset-0 rows"
    assert all(r["retention"] == 1.0 for r in day0)
    assert all(0.0 < r["retention"] <= 1.0 for r in rows)


def test_importance_sampling_keeps_weight_one_docs(spark, sf_dir):
    """Docs at the weight cap (n_chars >= 400 -> weight 1.0) are always
    kept; output weights are within (0, 1]; the decision is deterministic."""
    from sdp_spark.sources.fixtures import table

    d = table(spark, sf_dir, "documents")
    full = {r["doc_id"] for r in d.filter("n_chars >= 400").collect()}
    kept = {
        r["doc_id"]: r["weight"]
        for r in REGISTRY["llm_sample_importance"].fn(spark, sf_dir).collect()
    }
    assert full <= set(kept)
    assert all(0.0 < w <= 1.0 for w in kept.values())
    again = {
        r["doc_id"]: r["weight"]
        for r in REGISTRY["llm_sample_importance"].fn(spark, sf_dir).collect()
    }
    assert kept == again


def test_ann_recall_eval_bounds(spark, sf_dir):
    """Recall@5 in [0,1] per query; IVF macro >= 0.9 (r14: sqrt-N cell
    geometry with nprobe = K/4 — measured 0.9455/0.9091/1.0 at
    sf0.001/0.01/0.1 vs 0.745-0.891 for the fixed K=8 shape at the same
    candidates/query), LSH macro >= 0.95
    (r13: 6 OR-amplification tables — the knee of the measured
    recall-per-candidate ladder 4:0.836 / 6:0.964 / 8:0.982 at sf0.1),
    PQ macro >= 0.9 (r13: the rerank pool scales with the
    corpus — 20%, floor 100 — per the IVF-PQ doctrine; measured 0.927 at
    sf0.1, exact at fixture scales the floor covers); all
    three methods present with one macro row each (query_id -1, distinct
    from every real vec_id), and the macro equals the mean of the
    per-query rows."""
    rows = REGISTRY["llm_ann_recall_eval"].fn(spark, sf_dir).collect()
    methods = {r["method"] for r in rows}
    assert methods == {"ivf", "ivfpq", "lsh", "pq", "nsw"}
    assert all(0.0 <= r["recall_at_5"] <= 1.0 for r in rows)
    macro = {r["method"]: r["recall_at_5"] for r in rows if r["query_id"] == -1}
    assert len(macro) == 5
    for m in methods:
        per_q = [r["recall_at_5"] for r in rows if r["method"] == m and r["query_id"] >= 0]
        assert abs(macro[m] - sum(per_q) / len(per_q)) < 1e-3
    assert macro["lsh"] >= 0.95
    assert macro["ivf"] >= 0.9
    assert macro["pq"] >= 0.9
    # the composed index (trained spherical-k-means cells + 2-way
    # boundary replication + nprobe 5) reads 32x-compressed candidates;
    # 0.9 is the measured sf0.001 floor. (r14 dropped the ivfpq >= ivf
    # ordering assert: sqrt-N IVF-flat rescores EXACT vectors and now
    # tops the compressed index — the expected trade, not a regression.)
    assert macro["ivfpq"] >= 0.9
    # graph beam search (beam 16, 6 rounds, per-cell entries) over the
    # IVF-BOOTSTRAPPED k=8 graph (r12: the O(N^1.5) build replaced the
    # exact O(N^2) one; r13: NNDescent-refined edges, VERDICT r12 #3)
    assert macro["nsw"] >= 0.99


def test_embed_lsh_collapse_equals_uncollapsed(spark, sf_dir):
    """The embed-LSH exact-collapse prefix must be output-invisible: on the
    (below-gate) fixture, forcing the collapse branch yields exactly the
    uncollapsed pair set — same pairs, same rounded cosines."""
    from sdp_spark.operators.corpus import (
        _embed_lsh_collapsed,
        _embed_lsh_pairs,
    )
    from sdp_spark.operators.llm import _emb_normed

    plain = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in _embed_lsh_pairs(_emb_normed(spark, sf_dir)).collect()
    }
    collapsed = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in _embed_lsh_collapsed(spark, sf_dir).collect()
    }
    assert plain == collapsed and len(plain) > 0


def test_payload_cdc_reconstruction_and_resync(spark, sf_dir, tmp_path):
    """mm_payload_cdc: (a) chunk lengths reconstruct every payload exactly;
    (b) determinism; (c) re-synchronization — a payload with an edited
    PREFIX shares every chunk hash from the first boundary after the edit
    (the delta-transfer property fixed-stride chunking lacks)."""
    from sdp_spark.sources.fixtures import table

    rows = REGISTRY["mm_payload_cdc"].fn(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: len(r["text"].encode())
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(by_doc) == {d for d, n in docs.items() if n > 0}
    for doc_id, chunks in by_doc.items():
        assert sum(c["chunk_len"] for c in chunks) == docs[doc_id]
        assert sorted(c["chunk_idx"] for c in chunks) == list(range(len(chunks)))

    again = REGISTRY["mm_payload_cdc"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # resync: same tail, different prefix -> shared chunk-hash suffix
    base = " ".join(f"tok{i}" for i in range(120))
    edited = "XXXX YYYY " + base
    sf = _write_docs(spark, tmp_path, [base, edited])
    out = REGISTRY["mm_payload_cdc"].fn(spark, sf).collect()
    h1 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 2), key=lambda r: r["chunk_idx"])]
    shared_tail = 0
    while (shared_tail < min(len(h1), len(h2))
           and h1[-1 - shared_tail] == h2[-1 - shared_tail]):
        shared_tail += 1
    assert shared_tail >= max(1, len(h1) - 3), (
        f"prefix edit must re-sync: tail overlap {shared_tail} of {len(h1)}"
    )
