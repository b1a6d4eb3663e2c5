"""Invariant tests for LLM ops whose oracle is rows-only (probabilistic or
not SQL-expressible): MinHash-LSH precision/recall, SimHash structure,
ANN-LSH recall vs brute force, fingerprint consistency, HLL accuracy,
multimodal decode determinism."""

from __future__ import annotations

import os

import pytest

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_near_dedup_precision_and_recall(spark, sf_dir):
    """Every emitted pair must truly have Jaccard >= 0.5 (precision = 1 by
    construction of the verify stage); recall vs the exact all-shared-shingle
    pairs must be high (banding: P(candidate|j>=0.5) ~ 0.9 per pair)."""
    lsh = REGISTRY["llm_dedup_near"].fn(spark, sf_dir)
    exact = REGISTRY["llm_dedup_ngram_jaccard"].fn(spark, sf_dir)
    lsh_pairs = _pairs(lsh)
    truth = {
        (r["doc_a"], r["doc_b"]) for r in exact.collect() if r["jaccard"] >= 0.5
    }
    assert lsh_pairs <= truth, f"false positives: {sorted(lsh_pairs - truth)[:5]}"
    if truth:
        recall = len(lsh_pairs & truth) / len(truth)
        assert recall >= 0.6, f"recall {recall:.2f} < 0.6 ({len(truth)} true pairs)"


def test_near_dedup_collapse_equals_uncollapsed(spark, sf_dir):
    """The exact-collapse prefix must be a pure optimization: running the
    band+verify core over the FULL corpus (no collapse) and over exact-dup
    representatives + re-expansion must emit the identical (doc_a, doc_b,
    jaccard) set — calling the collapse branch DIRECTLY, below the density
    gate, so the expansion itself is what's compared. If the expansion ever
    drops or invents a pair, this fails."""
    from sdp_spark.operators.llm import (
        _cached_shingles,
        _cached_signatures,
        _minhash_band_verify,
        _near_dedup_collapsed,
    )

    uncollapsed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _minhash_band_verify(
            _cached_signatures(spark, sf_dir), _cached_shingles(spark, sf_dir)
        ).collect()
    }
    collapsed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _near_dedup_collapsed(spark, sf_dir).collect()
    }
    assert collapsed == uncollapsed, {
        "missing": sorted(set(uncollapsed) - set(collapsed))[:5],
        "extra": sorted(set(collapsed) - set(uncollapsed))[:5],
        "jaccard_diffs": [
            (k, uncollapsed[k], collapsed[k])
            for k in list(set(uncollapsed) & set(collapsed))
            if uncollapsed[k] != collapsed[k]
        ][:5],
    }
    # The default sf0.001 fixture has zero exact raw-text duplicates (every
    # cluster is a singleton → collapse is an identity there), so exercise
    # the POSITIVE path — clusters really collapsing and the expansion
    # reproducing their pairs — at sf0.1, which carries 8 exact dups.
    sf01 = "/root/testdata/sf0.1"
    if os.path.isdir(sf01):
        from sdp_spark.operators.llm import _cached_clusters

        m = _cached_clusters(spark, sf01)
        assert m.filter("doc_id != rep").count() > 0, (
            "sf0.1 lost its exact duplicates — collapse path untested"
        )
        full = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _minhash_band_verify(
                _cached_signatures(spark, sf01), _cached_shingles(spark, sf01)
            ).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _near_dedup_collapsed(spark, sf01).collect()
        }
        assert got == full
        # and the registered op (whichever branch the gate picks) agrees too
        via_op = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in REGISTRY["llm_dedup_near"].fn(spark, sf01).collect()
        }
        assert via_op == full


def test_ngram_collapse_equals_uncollapsed(spark, sf_dir):
    """Same pin for the deterministic n-gram pair plan: the collapse branch
    (reps-only self-join + expansion, full-corpus df cap) must emit exactly
    the pairs of the uncollapsed plan — and since this key IS oracled, any
    divergence would also be a driver hash mismatch."""
    from sdp_spark.operators.llm import (
        _cached_capped,
        _ngram_pair_core,
        _ngram_pairs_collapsed,
    )

    def as_map(df):
        return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}

    for sf in (sf_dir, "/root/testdata/sf0.1"):
        if not os.path.isdir(sf):
            continue
        full = as_map(_ngram_pair_core(_cached_capped(spark, sf)))
        got = as_map(_ngram_pairs_collapsed(spark, sf))
        assert got == full, {
            "sf": sf,
            "missing": sorted(set(full) - set(got))[:5],
            "extra": sorted(set(got) - set(full))[:5],
        }


def test_resolve_collapse_equals_uncollapsed(spark):
    """Keeper resolution must be branch-invariant: forcing the density gate
    dense vs sparse at sf0.1 must produce the identical (doc_id, keeper_doc,
    cluster_size, is_keeper) set. Covers the rep-graph propagation +
    member-projection rewrite (round 6)."""
    from sdp_spark.operators import llm

    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        pytest.skip("sf0.1 fixture absent")

    def run(force_dense):
        key = (spark.sparkContext.applicationId, sf)
        llm._COLLAPSE_DECISION[key] = force_dense
        llm._RESOLVE_CACHE.pop(key, None)
        try:
            return {
                tuple(r)
                for r in REGISTRY["llm_dedup_near_resolve"].fn(spark, sf).collect()
            }
        finally:
            llm._COLLAPSE_DECISION.pop(key, None)
            llm._RESOLVE_CACHE.pop(key, None)

    sparse, dense = run(False), run(True)
    assert dense == sparse, {
        "only_sparse": sorted(sparse - dense)[:5],
        "only_dense": sorted(dense - sparse)[:5],
    }


def test_minhash_deterministic(spark, sf_dir):
    a = REGISTRY["llm_dedup_near"].fn(spark, sf_dir)
    b = REGISTRY["llm_dedup_near"].fn(spark, sf_dir)
    assert _pairs(a) == _pairs(b)


def test_unpersist_all_releases_and_rebuilds(spark, sf_dir):
    """Cache lifecycle (VERDICT r3 next-round #8): after operators populate
    the memoized .cache() frames, unpersist_all() must release them all and
    a re-invocation must transparently rebuild with identical results."""
    import sdp_spark
    from sdp_spark.operators import llm

    before = _pairs(REGISTRY["llm_dedup_near"].fn(spark, sf_dir))
    assert llm._SIG_CACHE, "expected the signature cache to be populated"
    assert sdp_spark.unpersist_all() > 0
    assert not llm._SH_CACHE and not llm._SIG_CACHE
    assert _pairs(REGISTRY["llm_dedup_near"].fn(spark, sf_dir)) == before


def test_simhash_structure(spark, sf_dir):
    rows = REGISTRY["llm_dedup_simhash"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 8
    again = REGISTRY["llm_dedup_simhash"].fn(spark, sf_dir).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {
        (r["doc_a"], r["doc_b"]) for r in again
    }


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    """LSH top-k must (a) only contain true cosine values (each returned
    sim equals the brute-force sim for that pair) and (b) recover a
    reasonable share of the true top-5 despite scanning one bucket."""
    brute = REGISTRY["llm_sim_search"].fn(spark, sf_dir).collect()
    lsh = REGISTRY["llm_sim_search_lsh"].fn(spark, sf_dir).collect()
    brute_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute}
    brute_top = {}
    for r in brute:
        brute_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_sims:
            assert abs(brute_sims[key] - r["cos_sim"]) < 1e-9
    for q, top in brute_top.items():
        got = {r["neighbor_id"] for r in lsh if r["query_id"] == q}
        hits += len(got & top)
        total += len(top)
    assert total > 0
    assert hits / total >= 0.2, f"ANN recall {hits/total:.2f} too low"


def test_fingerprint_consistency(spark, sf_dir):
    """Fingerprint is deterministic and injective on the fixture: equal
    fingerprints <=> equal token streams (no collisions at this size)."""
    import collections

    fp = REGISTRY["llm_fingerprint"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    joined = fp.join(docs, "doc_id").collect()
    by_fp = collections.defaultdict(set)
    for r in joined:
        by_fp[r["fingerprint"]].add(r["text"])
    for texts in by_fp.values():
        assert len(texts) == 1, "fingerprint collision across different texts"
    again = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
    assert {r["doc_id"]: r["fingerprint"] for r in joined} == again


def test_approx_distinct_accuracy(spark, sf_dir, ddb):
    approx = {
        r["o_orderstatus"]: r["approx_custs"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = dict(
        ddb.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.05, f"{k}: approx {approx[k]} vs exact {v}"


def test_mm_decode_pipeline(spark, sf_dir):
    df = REGISTRY["mm_decode_pipeline"].fn(spark, sf_dir)
    assert [f.name for f in df.schema] == ["doc_id", "width", "height", "n_frames", "features"]
    rows = df.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows[:20]:
        assert 64 <= r["width"] < 128 and 64 <= r["height"] < 128
        assert 1 <= r["n_frames"] <= 4
        feats = [float(v) for v in r["features"].split(",")]
        assert len(feats) == 8 and all(0.0 <= v <= 1.0 for v in feats)
    again = {r["doc_id"]: (r["width"], r["height"]) for r in df.collect()}
    assert {r["doc_id"]: (r["width"], r["height"]) for r in rows} == again


def test_scan_jdbc_embedded(spark, sf_dir):
    """Without SDP_JDBC_URL the jdbc scan runs against embedded Derby —
    still a real .format('jdbc') read (asserted in test_jdbc.py)."""
    df = REGISTRY["scan_jdbc"].fn(spark, sf_dir)
    assert df.count() == 25


def test_near_resolve_closure_consistency(spark, sf_dir):
    """Keeper resolution invariants: (1) both ends of every candidate pair
    resolve to the SAME keeper (pair-closure consistency); (2) the keeper is
    the minimum member of its own cluster; (3) exactly the paired docs are
    resolved; (4) cluster_size / is_keeper are self-consistent."""
    import collections

    pairs = REGISTRY["llm_dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    res = REGISTRY["llm_dedup_near_resolve"].fn(spark, sf_dir).collect()
    keeper = {r["doc_id"]: r["keeper_doc"] for r in res}
    for p in pairs:
        assert keeper[p["doc_a"]] == keeper[p["doc_b"]], (
            f"pair ({p['doc_a']},{p['doc_b']}) split across clusters"
        )
    clusters = collections.defaultdict(set)
    for r in res:
        clusters[r["keeper_doc"]].add(r["doc_id"])
    for k, members in clusters.items():
        assert k in members and k == min(members)
    paired = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert set(keeper) == paired
    for r in res:
        assert r["cluster_size"] == len(clusters[r["keeper_doc"]])
        assert r["is_keeper"] == (r["doc_id"] == r["keeper_doc"])


def test_train_corpus_nd_drops_near_dups(spark, sf_dir):
    """The near-dedup corpus keeps <= docs of the plain corpus, and the
    delta is exactly the filtered non-keeper docs (lang/length window)."""
    plain = {
        (r["lang"], r["split"]): r["n_docs"]
        for r in REGISTRY["llm_pipeline_train_corpus"].fn(spark, sf_dir).collect()
    }
    nd = {
        (r["lang"], r["split"]): r["n_docs"]
        for r in REGISTRY["llm_pipeline_train_corpus_nd"].fn(spark, sf_dir).collect()
    }
    assert set(nd) <= set(plain)
    for k, n in nd.items():
        assert n <= plain[k]
    assert sum(nd.values()) <= sum(plain.values())


SF_001 = "/root/testdata/sf0.01"


def test_ann_lsh_recall_sf001(spark):
    """Multi-probe LSH recall vs brute force at sf0.01 — the bucket
    occupancy that makes LSH meaningful needs more vectors than sf0.001
    (VERDICT r2 #8). Threshold 0.8; measured ~0.91."""
    brute = REGISTRY["llm_sim_search"].fn(spark, SF_001).collect()
    lsh = REGISTRY["llm_sim_search_lsh"].fn(spark, SF_001).collect()
    brute_top = {}
    for r in brute:
        brute_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, top in brute_top.items():
        got = {r["neighbor_id"] for r in lsh if r["query_id"] == q}
        hits += len(got & top)
        total += len(top)
    assert total > 0
    assert hits / total >= 0.8, f"ANN recall {hits/total:.2f} < 0.8 at sf0.01"


def test_semdedup_precision_and_recall_vs_bruteforce(spark, sf_dir):
    """SemDedup invariants: (1) precision 1 — every flagged duplicate truly
    has a lower-id vector with cosine >= threshold somewhere in the corpus
    (within-cluster pairs are computed exactly); (2) recall vs the exact
    all-pairs ground truth is bounded below (k-means blocking only misses
    cross-cluster pairs); (3) deterministic across invocations."""
    import numpy as np

    sem = REGISTRY["llm_semdedup"].fn(spark, sf_dir).collect()
    flagged = {r["vec_id"] for r in sem if r["is_dup"]}

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    m = np.array([rows[i]["embedding"] for i in order], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    truth = set()
    for j in range(1, len(ids)):
        if (cos[j, :j] >= 0.35).any():
            truth.add(int(ids[j]))
    assert flagged <= truth, f"false positives: {sorted(flagged - truth)[:5]}"
    if truth:
        recall = len(flagged & truth) / len(truth)
        assert recall >= 0.5, f"semdedup recall {recall:.2f} < 0.5 ({len(truth)} true dups)"

    again = {r["vec_id"] for r in REGISTRY["llm_semdedup"].fn(spark, sf_dir).collect() if r["is_dup"]}
    assert flagged == again


def test_approx_percentile_accuracy(spark, sf_dir, ddb):
    approx = {
        r["l_returnflag"]: ([r["q25"], r["q50"], r["q75"]], r["approx_p90"])
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    exact = {
        r[0]: (list(r[1]), r[2])
        for r in ddb.execute(
            "SELECT l_returnflag, quantile_cont(l_quantity, [0.25, 0.5, 0.75]),"
            " quantile_cont(l_extendedprice, 0.9) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, (eq, ep90) in exact.items():
        aq, ap90 = approx[flag]
        for a, b in zip(aq, eq):
            assert abs(a - b) <= max(1.0, 0.02 * b), f"{flag} quantile {a} vs {b}"
        assert abs(ap90 - ep90) <= 0.02 * ep90


def test_ngram_df_cap_drops_hot_shingles(spark):
    """A shingle shared by k docs emits k(k-1)/2 candidate pairs; postings
    with df > cap must be dropped BEFORE the self-join."""
    from sdp_spark.operators.llm import _capped_postings

    rows = [(d, "the quick brown") for d in range(30)] + [
        (1, "rare trigram one"),
        (2, "rare trigram one"),
    ]
    sh = spark.createDataFrame(rows, "doc_id INT, shingle STRING")
    capped = _capped_postings(sh, 10)
    assert {r["shingle"] for r in capped.collect()} == {"rare trigram one"}
    # nothing dropped when every df is under the cap
    assert _capped_postings(sh, 50).count() == len(rows)


def test_simhash_no_bit_explode(spark, sf_dir):
    """Signature build must not explode tokens x 64 bit rows (64x blow-up);
    the 64 vote sums are aggregate expressions in one groupBy(doc_id)."""
    df = REGISTRY["llm_dedup_simhash"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "sequence(0, 63" not in plan


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF returned sims must be exact (match brute force per pair) and the
    probed-cell candidates must recover a fair share of the true top-5."""
    brute = REGISTRY["llm_sim_search"].fn(spark, sf_dir).collect()
    ivf = REGISTRY["llm_sim_search_ivf"].fn(spark, sf_dir).collect()
    brute_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute}
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_sims:
            assert abs(brute_sims[key] - r["cos_sim"]) < 1e-9
    brute_top: dict[int, set] = {}
    for r in brute:
        brute_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, top in brute_top.items():
        got = {r["neighbor_id"] for r in ivf if r["query_id"] == q}
        hits += len(got & top)
        total += len(top)
    assert total > 0
    assert hits / total >= 0.2, f"IVF recall {hits/total:.2f} too low"


def test_embed_lsh_dedup_precision_and_recall(spark, sf_dir):
    """Multi-probe hyperplane LSH embedding dedup: every emitted pair is
    exact-rescored (precision 1.0 vs the brute-force pair set at the same
    threshold), and multi-probe OR-amplification holds recall well above
    the exact-bucket baseline (measured 0.85 at sf0.001; the 6x6-bit
    multi-probe collision model predicts ~0.87 at cos 0.4)."""
    from pyspark.sql import functions as F

    from sdp_spark.sources.fixtures import table

    got = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["llm_dedup_embed_lsh"].fn(spark, sf_dir).collect()
    }
    emb = table(spark, sf_dir, "embeddings").withColumn(
        "dvec", F.col("embedding").cast("array<double>")
    )
    emb = emb.withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("dvec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("dvec").alias("va"), F.col("norm").alias("na"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("dvec").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x)
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= 0.4)
        .collect()
    }
    assert truth, "fixture should contain pairs above the threshold"
    assert got <= truth, "LSH emitted a pair the brute-force set rejects (precision < 1)"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, f"embed-LSH recall {recall:.2f} below multi-probe expectation"


def test_sketch_rollup_accuracy(spark, sf_dir, ddb):
    """HLL sketch estimates (per-group and the merged ALL row) must land
    within the lgK=14 error envelope (<1% at these cardinalities; 5%
    asserted for headroom) of exact COUNT(DISTINCT), and the ALL row must
    come out of the merge consistent with the group rows."""
    rows = {r["l_returnflag"]: r for r in REGISTRY["agg_sketch_rollup"].fn(spark, sf_dir).collect()}
    exact = dict(
        ddb.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    exact["ALL"] = ddb.execute("SELECT COUNT(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert set(rows) == set(exact)
    for k, true_n in exact.items():
        est = rows[k]["est_distinct_orders"]
        assert abs(est - true_n) / true_n < 0.05, f"{k}: est {est} vs exact {true_n}"


def test_kmeans_assignment_is_argmin_and_deterministic(spark, sf_dir):
    """Every point's cluster must be the argmin over the FINAL centroids
    (recomputed here from the assignment itself — Lloyd's fixed-point
    property after the update step isn't exact mid-run, so instead verify
    (a) assignments are internally consistent: recomputing centroids from
    the output and reassigning moves few points; (b) determinism: two runs
    produce identical assignments; (c) shape: K clusters at most, distances
    non-negative."""
    import math

    out = REGISTRY["llm_cluster_kmeans"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    clusters = {r["cluster"] for r in rows}
    from sdp_spark.operators.llm import _KM_K

    assert clusters <= set(range(_KM_K))
    assert all(r["dist_to_centroid"] >= 0 for r in rows)

    again = REGISTRY["llm_cluster_kmeans"].fn(spark, sf_dir).collect()
    assert {(r["vec_id"], r["cluster"]) for r in rows} == {
        (r["vec_id"], r["cluster"]) for r in again
    }

    # internal consistency: centroids recomputed from the output assignment
    # re-attract >= 95% of their own members (Lloyd's near-fixed-point)
    from sdp_spark.sources.fixtures import table as _t

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in _t(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    }
    assign = {r["vec_id"]: r["cluster"] for r in rows}
    dim = len(next(iter(vecs.values())))
    sums = {}
    counts = {}
    for vid, c in assign.items():
        acc = sums.setdefault(c, [0.0] * dim)
        for i, x in enumerate(vecs[vid]):
            acc[i] += x
        counts[c] = counts.get(c, 0) + 1
    cents = {c: [s / counts[c] for s in acc] for c, acc in sums.items()}
    stable = 0
    for vid, c in assign.items():
        best = min(
            cents,
            key=lambda k: (
                math.fsum((x - y) * (x - y) for x, y in zip(vecs[vid], cents[k])),
                k,
            ),
        )
        stable += best == c
    assert stable / len(assign) >= 0.95, f"only {stable}/{len(assign)} stable"


def test_sink_compact_collapses_file_count(spark, sf_dir):
    """Compaction must actually reduce the file count to the target while
    the content aggregate stays lossless (the SQL oracle pins values; this
    pins the file-layout property the oracle can't see)."""
    import glob
    import os

    from sdp_spark.operators import scans as S

    REGISTRY["sink_compact"].fn(spark, sf_dir).collect()
    src = S._small_files_dir(spark, sf_dir)
    n_src = len(glob.glob(os.path.join(src, "part-*")))
    assert n_src == S._COMPACT_SRC_FILES
    n_out = len(glob.glob(os.path.join(S._LAST_COMPACT_OUT, "part-*")))
    assert n_out == S._COMPACT_TARGET_FILES, f"compacted to {n_out} files"


def test_csv_malformed_quarantine_count(spark, sf_dir):
    """PERMISSIVE mode must quarantine exactly the staged corrupt lines,
    and DROPMALFORMED must agree with the filtered PERMISSIVE read."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from sdp_spark.operators.scans import _CSV_BAD_LINES
    from sdp_spark.sources.fixtures import cache_dir

    REGISTRY["scan_csv_malformed"].fn(spark, sf_dir)  # ensure staged
    bad_dir = cache_dir(sf_dir, "nation_csv_malformed")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = spark.read.csv(
        bad_dir, schema=schema, header=True, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    ).cache()
    try:
        n_corrupt = df.filter(F.col("_corrupt").isNotNull()).count()
        assert n_corrupt == len(_CSV_BAD_LINES), "every staged bad line must quarantine"
        dropm = spark.read.csv(
            bad_dir,
            schema=T.StructType(schema.fields[:3]),
            header=True,
            mode="DROPMALFORMED",
        )
        # collect(), not count(): count() prunes every column from the CSV
        # parse, so type failures are never detected and nothing drops
        assert len(dropm.collect()) == df.filter(F.col("_corrupt").isNull()).count()
    finally:
        df.unpersist()


def test_url_normalize_pins_canon_value(spark, sf_dir):
    """The canonical URL itself (not just distinct counts) must match the
    documented normalization: tracking params stripped, fragment stripped,
    and trailing '?'/'&' separators trimmed (ADVICE r4: the single-arg
    rtrim left '...?id=4&' for even doc_ids)."""
    from pyspark.sql import functions as F

    from sdp_spark.operators.corpus import _TRACKING_RE
    from sdp_spark.sources.fixtures import table

    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&id="), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("&ref=home#top")).otherwise(F.lit("")),
    )
    canon = F.rtrim(
        F.regexp_replace(F.regexp_replace(url, "#[^#]*$", ""), _TRACKING_RE, ""),
        F.lit("?&"),
    )
    rows = {
        r["doc_id"]: r["c"]
        for r in d.select("doc_id", canon.alias("c"), "source")
        .filter(F.col("doc_id").isin(4, 5))
        .collect()
    }
    assert rows[4].endswith("/docs/4?id=4"), rows[4]
    assert rows[5].endswith("/docs/5?id=5"), rows[5]
    # no canonical URL may keep a trailing separator
    bad = d.select(canon.alias("c")).filter(F.col("c").rlike("[?&]$")).count()
    assert bad == 0


def test_kmeans_k64_arrow_assignment_matches_bruteforce(spark, sf_dir):
    """The K-ceiling lift (VERDICT r4 #3): above _KM_LITERAL_MAX the
    centroid assignment must run as the broadcast-matrix Arrow path —
    O(1)-in-K plan (no literal distance columns), exact argmin/top-2
    agreement with numpy brute force, lowest-index tie-breaks, and
    run-to-run determinism."""
    import numpy as np

    from sdp_spark.operators.llm import (
        _KM_LITERAL_MAX,
        _emb_normed,
        _km_assign,
        _kmeans_fit,
    )

    k = 64
    assert k > _KM_LITERAL_MAX
    cents = _kmeans_fit(spark, sf_dir, k=k)
    assert len(cents) == k
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec")
    out = _km_assign(emb, cents, probe2=True)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "large-K path must be Arrow-vectorized"
    assert "d63" not in plan and f"d{k - 1}" not in plan, (
        "large-K plan must not explode into K literal distance columns"
    )

    rows = out.collect()
    C = np.asarray(cents, dtype=np.float64)
    for r in rows:
        d = ((C - np.array(r["dvec"], dtype=np.float64)) ** 2).sum(axis=1)
        o = np.argsort(d, kind="stable")
        assert int(o[0]) == r["cluster"], f"vec {r['vec_id']} argmin mismatch"
        assert int(o[1]) == r["cluster2"], f"vec {r['vec_id']} top-2 mismatch"
        assert abs(d[o[0]] - r["dmin"]) < 1e-6

    again = _km_assign(emb, cents, probe2=True).collect()
    assert {(r["vec_id"], r["cluster"], r["cluster2"]) for r in rows} == {
        (r["vec_id"], r["cluster"], r["cluster2"]) for r in again
    }


def test_semdedup_k64_precision_and_recall(spark, sf_dir):
    """llm_semdedup's documented raise-K-at-scale path must actually hold
    its invariants at K=64 (Arrow assignment path): precision stays exactly
    1.0 (within-block cosine is exact) and recall vs brute-force ground
    truth stays useful despite the smaller blocks."""
    import numpy as np

    from sdp_spark.operators.corpus import _semdedup_frame

    sem = _semdedup_frame(spark, sf_dir, k=64).collect()
    flagged = {r["vec_id"] for r in sem if r["is_dup"]}

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    m = np.array([rows[i]["embedding"] for i in order], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    truth = set()
    for j in range(1, len(ids)):
        if (cos[j, :j] >= 0.35).any():
            truth.add(int(ids[j]))
    assert flagged <= truth, f"false positives at K=64: {sorted(flagged - truth)[:5]}"
    if truth:
        recall = len(flagged & truth) / len(truth)
        assert recall >= 0.5, f"K=64 recall {recall:.2f} < 0.5"

    again = {
        r["vec_id"] for r in _semdedup_frame(spark, sf_dir, k=64).collect() if r["is_dup"]
    }
    assert flagged == again


def test_bm25_scores_match_term_docset(spark, sf_dir):
    """fulltext_bm25 must rank exactly the docs filter_fulltext matches
    (same matched-postings source), with strictly positive scores (the
    Lucene-style idf is non-negative and tf >= 1)."""
    bm = {r["doc_id"]: r["bm25"] for r in REGISTRY["fulltext_bm25"].fn(spark, sf_dir).collect()}
    ft = {r["doc_id"] for r in REGISTRY["filter_fulltext"].fn(spark, sf_dir).collect()}
    assert set(bm) == ft
    assert all(v > 0 for v in bm.values())


def test_substring_dedup_detects_planted_spans(spark, tmp_path):
    """Recall evidence for llm_dedup_substring: two docs sharing a verbatim
    35-token run must flag has_dup (W=20, S=10 guarantees any >=29-token
    shared run aligns in some window); a doc with unique text must not."""
    import pandas as pd_

    shared = " ".join(f"shared{i}" for i in range(35))
    docs = pd_.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "intro one two three " + shared + " tail a b c",
                "different lead tokens here " + shared,
                " ".join(f"unique{i}" for i in range(60)),
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [100] * 3,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in REGISTRY["llm_dedup_substring"].fn(spark, sf).collect()}
    assert out[1]["has_dup"] and out[2]["has_dup"]
    assert not out[3]["has_dup"]
    assert out[1]["n_dup_spans"] >= 1 and out[1]["n_spans"] > out[1]["n_dup_spans"]


def test_pca_fit_invariants_and_projection(spark, sf_dir):
    """llm_embed_pca: components orthonormal, explained variance ratios
    descending and in (0, 1]; projected variance ordering matches; fit is
    deterministic run-to-run (cache cleared between fits)."""
    import numpy as np

    from sdp_spark.operators.corpus import _PCA_CACHE, _pca_fit

    _PCA_CACHE.clear()
    mean1, comps1, evr1 = _pca_fit(spark, sf_dir)
    _PCA_CACHE.clear()
    mean2, comps2, evr2 = _pca_fit(spark, sf_dir)
    assert np.allclose(mean1, mean2) and np.allclose(comps1, comps2)

    ident = comps1 @ comps1.T
    assert np.allclose(ident, np.eye(len(comps1)), atol=1e-8), "not orthonormal"
    assert all(evr1[i] >= evr1[i + 1] - 1e-12 for i in range(len(evr1) - 1))
    assert all(0 < r <= 1 for r in evr1)

    pdf = REGISTRY["llm_embed_pca"].fn(spark, sf_dir).toPandas()
    variances = [pdf[f"pc{i + 1}"].var() for i in range(len(comps1))]
    # projected variance must fall with component rank (rounding noise 1e-6)
    assert all(variances[i] >= variances[i + 1] - 1e-4 for i in range(len(variances) - 1))
    # pc1 must carry more variance than a raw coordinate's average share
    emb = np.array(
        [list(r["embedding"]) for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()]
    )
    total_var = np.trace(np.cov(emb.T, bias=True))
    assert variances[0] > total_var / emb.shape[1]


def test_quantize_error_bound_and_no_clipping(spark, sf_dir):
    """llm_embed_quantize: max-abs scaling can never clip; quantized range
    stays in int8; RMSE is bounded by the quantization-step bound
    (scale/254 per dim, so well under 0.01 on unit-ish embeddings)."""
    rows = REGISTRY["llm_embed_quantize"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["n_clipped"] == 0 for r in rows)
    assert all(-127 <= r["q_min"] <= r["q_max"] <= 127 for r in rows)
    assert all(0 <= r["rmse"] < 0.01 for r in rows)


def test_mix_epochs_copies_bounded_and_unique(spark, sf_dir):
    """llm_mix_epochs: copy indexes are dense 1..n per doc, capped at the
    epoch ceiling; per-source mean copies stays within the weight's
    floor/ceil envelope (the fractional hash decides per doc)."""
    import collections

    rows = REGISTRY["llm_mix_epochs"].fn(spark, sf_dir).collect()
    per_doc = collections.defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r["copy_idx"])
    for doc, idxs in per_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), doc
        assert len(idxs) <= 4


def test_approx_topk_exact_at_capacity(spark, sf_dir):
    """agg_approx_topk: with capacity >> distinct tokens the sketch is
    exact — every returned count equals the exact count, and the returned
    set contains every token whose exact count strictly exceeds the 10th
    largest exact count (ties at the boundary may go either way)."""
    from pyspark.sql import functions as F

    got = REGISTRY["agg_approx_topk"].fn(spark, sf_dir).collect()
    assert len(got) == 10
    from sdp_spark.sources.fixtures import table

    exact = {
        r["token"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in got:
        assert exact[r["token"]] == r["n"], r
    kth = sorted(exact.values(), reverse=True)[9]
    must_have = {t for t, n in exact.items() if n > kth}
    assert must_have <= {r["token"] for r in got}


def test_kmeans_distributed_fit_matches_driver_fit(spark, sf_dir, monkeypatch):
    """_kmeans_fit's two physical paths (driver-side numpy below
    _KM_FIT_SAMPLE, distributed Lloyd's above) must converge to the same
    centroids on the same data — same seeds, same iteration count, same
    empty-cluster rule; only the float summation order differs."""
    import numpy as np

    import sdp_spark.operators.llm as llm

    llm._KM_CACHE.clear()
    driver_cents = llm._kmeans_fit(spark, sf_dir)
    llm._KM_CACHE.clear()
    monkeypatch.setattr(llm, "_KM_FIT_SAMPLE", 0)  # force distributed path
    dist_cents = llm._kmeans_fit(spark, sf_dir)
    llm._KM_CACHE.clear()
    assert len(driver_cents) == len(dist_cents)
    assert np.allclose(
        np.array(driver_cents), np.array(dist_cents), rtol=1e-9, atol=1e-12
    )


def test_pagerank_invariants(spark, sf_dir):
    """graph_pagerank: rank mass conserved (sum == |V| within tolerance
    — (1-d) base + d-damped redistribution preserves total on a graph
    with no dangling nodes; bipartite undirected => none), deterministic
    at the rounded output precision, and every rank positive."""
    got = REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    n = len(got)
    total = sum(r["rank"] for r in got)
    assert abs(total - n) < 1e-3 * n
    assert all(r["rank"] > 0 for r in got)
    again = {r["node"]: r["rank"] for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()}
    assert {r["node"]: r["rank"] for r in got} == again


def test_pagerank_hub_gets_more_rank(spark, sf_dir):
    """A supplier connected to more customers must not rank below one
    with strictly fewer connections (monotone on the fixture's bipartite
    graph after full propagation)."""
    from sdp_spark.operators.graphs import _trade_edges

    deg = {
        r["supp"]: r["d"]
        for r in _trade_edges(spark, sf_dir)
        .groupBy("supp")
        .agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("d"))
        .collect()
    }
    ranks = {
        r["node"]: r["rank"]
        for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
        if r["node"].startswith("s:")
    }
    ds = sorted(set(deg.values()))
    if len(ds) < 2:
        pytest.skip(
            "degenerate fixture: uniform supplier degree distribution — "
            "hub-monotonicity has nothing to assert"
        )
    import statistics

    lo_d, hi_d = ds[0], ds[-1]
    lo_ranks = [ranks[f"s:{k}"] for k, d in deg.items() if d == lo_d]
    hi_ranks = [ranks[f"s:{k}"] for k, d in deg.items() if d == hi_d]
    assert statistics.mean(hi_ranks) >= statistics.mean(lo_ranks)


def test_connected_components_partition_of_nodes(spark, sf_dir):
    """graph_connected_components: the histogram is a partition of the
    node set — Σ(comp_size × n_components) == |V| of the one-week graph —
    and the fixpoint is deterministic run-to-run."""
    from pyspark.sql import functions as F

    from sdp_spark.operators.graphs import _CC_HI, _CC_LO
    from sdp_spark.sources.fixtures import table

    got = REGISTRY["graph_connected_components"].fn(spark, sf_dir).collect()
    assert got, "no components found"
    covered = sum(r["comp_size"] * r["n_components"] for r in got)

    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    e = (
        l.join(
            o.filter((F.col("o_orderdate") >= _CC_LO) & (F.col("o_orderdate") < _CC_HI)),
            l.l_orderkey == o.o_orderkey,
        )
        .select("l_suppkey", "o_custkey")
        .distinct()
    )
    n_nodes = (
        e.select(F.col("l_suppkey").alias("k")).distinct().count()
        + e.select(F.col("o_custkey").alias("k")).distinct().count()
    )
    assert covered == n_nodes
    again = REGISTRY["graph_connected_components"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_triangle_count_bounds(spark, sf_dir):
    """graph_triangle_count: 0 ≤ triangles ≤ C(n_edges, 3) and the count
    is stable across runs (pure relational plan, no sampling)."""
    row = REGISTRY["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    t, e = row["n_triangles"], row["n_edges"]
    assert 0 <= t <= e * (e - 1) * (e - 2) / 6
    again = REGISTRY["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert (t, e) == (again["n_triangles"], again["n_edges"])


def test_interpolate_linear_bounds_and_passthrough(spark, sf_dir):
    """ts_interpolate_linear: observed days pass through exactly; every
    interpolated value lies within [min(prev,next), max(prev,next)] of its
    user's neighbouring observed bars (lerp never extrapolates)."""
    rows = REGISTRY["ts_interpolate_linear"].fn(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_interp = 0
    for series in by_user.values():
        series.sort(key=lambda r: r["day"])
        observed = [(i, r["day_sum"]) for i, r in enumerate(series) if r["day_sum"] is not None]
        obs_idx = [i for i, _ in observed]
        for i, r in enumerate(series):
            if r["day_sum"] is not None:
                assert abs(r["interp_sum"] - r["day_sum"]) < 1e-9
                continue
            n_interp += 1
            import bisect

            j = bisect.bisect_left(obs_idx, i)
            prev_v = observed[j - 1][1] if j > 0 else None
            next_v = observed[j][1] if j < len(observed) else None
            cands = [v for v in (prev_v, next_v) if v is not None]
            assert cands, "gap with no neighbours"
            assert min(cands) - 1e-9 <= r["interp_sum"] <= max(cands) + 1e-9
    # the fixture has real gaps at every sf — the lerp branch must be hit
    assert n_interp > 0


def test_dq_profile_metric_sanity(spark, sf_dir):
    """dq_profile_table: per-table n_rows consistent across that table's
    columns, n_nulls/n_distinct within [0, n_rows], and exactly one of the
    (num, str) min/max pairs populated per column."""
    rows = REGISTRY["dq_profile_table"].fn(spark, sf_dir).collect()
    by_table = {}
    for r in rows:
        tbl = r["col_name"].split(".")[0]
        by_table.setdefault(tbl, []).append(r)
    for tbl, cols in by_table.items():
        assert len({r["n_rows"] for r in cols}) == 1, f"{tbl}: n_rows drift"
        for r in cols:
            assert 0 <= r["n_nulls"] <= r["n_rows"]
            assert 0 < r["n_distinct"] <= r["n_rows"]
            has_num = r["min_num"] is not None
            has_str = r["min_str"] is not None
            assert has_num != has_str, f"{r['col_name']}: min/max pair mixup"
            if has_num:
                assert r["min_num"] <= r["max_num"]
            else:
                assert r["min_str"] <= r["max_str"]


def test_repetition_ngram_detects_loops(spark, tmp_path):
    """llm_repetition_ngram on constructed docs: a phrase-looped doc fails
    the Gopher gate, a distinct-text doc passes, and a single-token doc is
    handled (0 bigrams, clean score) — the sequence(0,-1) guard."""
    docs = [
        (1, "spam ham " * 50, "en", "w", 400),          # pure loop
        (2, " ".join(f"w{i}" for i in range(100)), "en", "w", 400),
        (3, "solo", "en", "w", 4),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in REGISTRY["llm_repetition_ngram"].fn(spark, sf).collect()}
    assert not out[1]["passes"] and out[1]["dup_bigram_frac"] > 0.9
    assert out[2]["passes"] and out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_bigrams"] == 0 and out[3]["passes"]


def test_histogram_partitions_rows(spark, sf_dir):
    """agg_histogram_equiwidth: bins cover every row exactly once, ids in
    [0, 19], and bin_lo is strictly increasing with bin id."""
    from sdp_spark.sources.fixtures import table

    rows = sorted(
        REGISTRY["agg_histogram_equiwidth"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert sum(r["n"] for r in rows) == table(spark, sf_dir, "orders").count()
    assert all(0 <= r["bin"] <= 19 for r in rows)
    los = [r["bin_lo"] for r in rows]
    assert los == sorted(los) and len(set(los)) == len(los)


def test_winsorize_clamp_fractions(spark, sf_dir):
    """dq_winsorize: PERCENTILE_DISC fences clamp at most ~5% of each
    group per side (discrete percentile guarantee) and never go negative."""
    from pyspark.sql import functions as F

    from sdp_spark.sources.fixtures import table

    sizes = {
        r["o_orderpriority"]: r["c"]
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in REGISTRY["dq_winsorize"].fn(spark, sf_dir).collect():
        n = sizes[r["o_orderpriority"]]
        assert 0 <= r["n_lo"] <= 0.05 * n + 1
        assert 0 <= r["n_hi"] <= 0.05 * n + 1
        assert r["sum_wins"] is not None and r["sum_raw"] is not None


def test_bfs_distance_histogram_shape(spark, sf_dir):
    """graph_shortest_path_bfs: exactly one node at hops 0; hop levels are
    contiguous from 0 (a BFS frontier can't skip a level); reachable total
    never exceeds the one-week node universe."""
    rows = sorted(
        REGISTRY["graph_shortest_path_bfs"].fn(spark, sf_dir).collect(),
        key=lambda r: r["hops"],
    )
    assert rows[0]["hops"] == 0 and rows[0]["n_nodes"] == 1
    assert [r["hops"] for r in rows] == list(range(len(rows)))
    cc = REGISTRY["graph_connected_components"].fn(spark, sf_dir).collect()
    n_universe = sum(r["comp_size"] * r["n_components"] for r in cc)
    assert sum(r["n_nodes"] for r in rows) <= n_universe


def test_rolling_corr_range_and_frame(spark, sf_dir):
    """win_rolling_corr: coefficient in [-1, 1] when defined, frame count
    in [1, 30], and each user's first event (n == 1) has NULL corr (zero
    variance in a single-row frame)."""
    rows = REGISTRY["win_rolling_corr"].fn(spark, sf_dir).collect()
    assert rows
    defined = 0
    for r in rows:
        assert 1 <= r["n"] <= 30
        if r["trend_corr"] is not None:
            defined += 1
            assert -1.0 - 1e-9 <= r["trend_corr"] <= 1.0 + 1e-9
        if r["n"] == 1:
            assert r["trend_corr"] is None
    assert defined > 0


def test_dup_cluster_stats_identity(spark, sf_dir):
    """llm_dup_cluster_stats: per histogram row n_docs == size×clusters
    and n_removable == n_docs − n_clusters (keep-one accounting)."""
    rows = REGISTRY["llm_dup_cluster_stats"].fn(spark, sf_dir).collect()
    assert rows, "fixture should contain prefix-duplicate clusters"
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]


def test_matview_incremental_reruns_and_totals(spark, sf_dir):
    """catalog_matview_incremental: rerunning in one session is idempotent
    (DROP+rebuild semantics) and the merged view accounts for every order
    exactly once — the IVM invariant the oracle certifies, restated as a
    row-count identity."""
    from sdp_spark.sources.fixtures import table

    r1 = REGISTRY["catalog_matview_incremental"].fn(spark, sf_dir).collect()
    r2 = REGISTRY["catalog_matview_incremental"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert sum(r["n_orders"] for r in r1) == table(spark, sf_dir, "orders").count()


def test_entropy_bounds(spark, sf_dir):
    """agg_entropy: 0 ≤ H ≤ log2(n_types) per user (uniform upper bound)."""
    import math

    rows = REGISTRY["agg_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_types"]) + 1e-6


def test_mad_outlier_fences(spark, sf_dir):
    """dq_mad_outlier: med/mad positive on the price column, outlier count
    below the group size, and at least one group flags something (the
    k=2.0 threshold is chosen to be live on this fixture)."""
    from pyspark.sql import functions as F

    from sdp_spark.sources.fixtures import table

    sizes = {
        r["o_orderpriority"]: r["c"]
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    rows = REGISTRY["dq_mad_outlier"].fn(spark, sf_dir).collect()
    assert any(r["n_outliers"] > 0 for r in rows)
    for r in rows:
        assert r["med"] > 0 and r["mad"] > 0
        assert 0 <= r["n_outliers"] < sizes[r["o_orderpriority"]]


def test_weighted_percentile_is_weighted(spark, sf_dir):
    """agg_weighted_percentile: the revenue-weighted median is a real
    observed quantity in [1, 50], and recomputing it driver-side from the
    raw rows gives the same value (definition check, one small group)."""
    rows = {r["l_returnflag"]: r["w_median"] for r in
            REGISTRY["agg_weighted_percentile"].fn(spark, sf_dir).collect()}
    assert rows and all(1 <= v <= 50 for v in rows.values())
    from sdp_spark.sources.fixtures import table

    li = (
        table(spark, sf_dir, "lineitem")
        .filter("l_returnflag = 'A'")
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    pairs = sorted((r["l_quantity"], r["l_extendedprice"]) for r in li)
    tot = sum(w for _, w in pairs)
    # cumulative including ties (RANGE frame): group by value first
    from itertools import groupby

    cum = 0.0
    expect = None
    for q, grp in groupby(pairs, key=lambda p: p[0]):
        cum += sum(w for _, w in grp)
        if cum * 2 >= tot:
            expect = q
            break
    assert rows["A"] == expect


def test_seasonal_error_accounting(spark, sf_dir):
    """ts_seasonal_error: mae × n_scored ≈ total_abs_err (within display
    rounding) and nothing scores before day 8 of a user's span."""
    rows = REGISTRY["ts_seasonal_error"].fn(spark, sf_dir).collect()
    assert rows
    scored_any = False
    for r in rows:
        if r["n_scored"] == 0:
            assert r["mae"] is None
            continue
        scored_any = True
        assert r["mae"] >= 0
        assert abs(r["mae"] * r["n_scored"] - r["total_abs_err"]) <= 0.0002 * r["n_scored"] + 0.01
    assert scored_any


def test_cusum_reflection_identity(spark, sf_dir):
    """query_outbreak_cusum: the window lowering must equal the literal
    recurrence S_t = max(0, S_{t-1} + u_t) replayed driver-side, and both
    alert branches must be live on the fixture."""
    rows = REGISTRY["query_outbreak_cusum"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r["alert"] for r in rows) and any(not r["alert"] for r in rows)
    for r in rows:
        assert r["cusum"] >= -1e-9
    # replay the recurrence per type from daily counts and baseline stats
    from collections import defaultdict

    from sdp_spark.operators.analytics import _CUSUM_K, _CUSUM_SPLIT
    from sdp_spark.sources.fixtures import table
    from pyspark.sql import functions as F

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").cast("double").alias("c"))
        .collect()
    )
    base, score = defaultdict(list), defaultdict(list)
    for r in daily:
        (base if str(r["d"].date()) < _CUSUM_SPLIT else score)[r["event_type"]].append(
            (r["d"], r["c"])
        )
    got = {(r["event_type"], r["day"]): r["cusum"] for r in rows}
    for et, obs in score.items():
        b = [c for _, c in base[et]]
        n = len(b)
        mu = sum(b) / n
        sigma = (sum(x * x for x in b) / n - mu * mu) ** 0.5
        s = 0.0
        for d, c in sorted(obs):
            s = max(0.0, s + (c - mu - _CUSUM_K * sigma))
            assert abs(got[(et, str(d.date()))] - s) < 1e-3, (et, d, s)


def test_skew_kurtosis_matches_numpy_moments(spark, sf_dir):
    """agg_skew_kurtosis: population g1/g2 agree with a direct numpy
    moment computation per group (the built-ins are NOT the contract —
    they bias-correct differently per engine)."""
    import numpy as np

    from sdp_spark.sources.fixtures import table

    got = {r["l_returnflag"]: r for r in
           REGISTRY["agg_skew_kurtosis"].fn(spark, sf_dir).collect()}
    pdf = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=np.float64)
        m1 = x.mean()
        m2 = ((x - m1) ** 2).mean()
        g1 = ((x - m1) ** 3).mean() / m2**1.5
        g2 = ((x - m1) ** 4).mean() / m2**2 - 3
        assert abs(got[flag]["skewness"] - g1) < 1e-4
        assert abs(got[flag]["kurtosis_excess"] - g2) < 1e-4
        assert got[flag]["n_rows"] == len(x)


def test_km_fit_sample_cap_derives_from_driver_heap(spark, monkeypatch):
    """VERDICT r8: the fit-sample cap must be a FUNCTION of driver
    memory, not a constant — 1% of the live heap at ~1 KiB/vector,
    bounded above, with the _KM_FIT_SAMPLE override taking precedence
    (how the sibling test forces the distributed branch)."""
    import sdp_spark.operators.llm as llm

    cap = llm._km_fit_sample_cap(spark)
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    expected = min(
        llm._KM_FIT_SAMPLE_MAX,
        int(heap * llm._KM_FIT_MEM_FRAC) // llm._KM_FIT_BYTES_PER_VEC,
    )
    assert cap == expected
    assert 0 < cap <= llm._KM_FIT_SAMPLE_MAX
    # the budget arithmetic scales with the heap (a 1 GiB driver stays
    # in the ~10k range; growth is linear until the absolute max)
    assert (1 << 30) * llm._KM_FIT_MEM_FRAC // llm._KM_FIT_BYTES_PER_VEC == 10485
    # override wins — the escape hatch the dual-path equality test uses
    monkeypatch.setattr(llm, "_KM_FIT_SAMPLE", 7)
    assert llm._km_fit_sample_cap(spark) == 7
