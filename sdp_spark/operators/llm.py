"""LLM-data-pipeline operators — SURVEY.md §2.12 + training-data extras.

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed), text analysis (stats,
TF-IDF, language-ID heuristic, quality scoring, fingerprinting) over the
`documents` / `embeddings` fixtures.

Scale notes (the whole point of these ops):
- Exact dedup: hash-groupBy — shuffle carries (hash, doc_id), never text.
- MinHash-LSH: shingle→minhash→band→bucket-join. Candidate generation is a
  self-join on band buckets (tiny keys), never an all-pairs product; the
  exact-Jaccard verify only touches candidate pairs. This is the 100 TB
  near-dedup path (all-pairs is O(n²) and dead on arrival).
- Brute-force cosine is the correctness baseline (O(Q×N), broadcast the Q
  queries); the LSH-bucketed variant is the scale path (candidates only
  within matching hyperplane-sign buckets).
- Everything below is built-in functions / higher-order lambdas — no Python
  in any hot path except where explicitly noted.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdp_spark.functions.num import DEC, KNUTH, KNUTH_MOD, dround, sql_dround
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table, wide_table

_SEC = "2.12 llm ops"


def _docs_tokens(spark: SparkSession, sf_dir: str, wide: bool = False) -> DataFrame:
    # wide=True routes through the landing-file parallelism guard
    # (fixtures.wide_table) — use it for consumers with heavy PER-ROW work
    # before their first shuffle (shingling, n-gram assembly). Consumers
    # whose next step is a shuffle anyway (explode → groupBy) stay narrow:
    # for those the extra exchange only adds latency.
    t = wide_table if wide else table
    return t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))


_EMB_CACHE: dict[tuple[str, str], DataFrame] = {}


def _emb_normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with double-cast vector + L2 norm — the shared preamble of
    every similarity/dedup consumer (dot-product math wants doubles; the
    fold order matches DuckDB's list_sum for oracle parity). wide_table for
    the same reason as _docs_tokens: per-row O(dim) arithmetic. Memoized
    cached per (app, sf): the norm fold is an INTERPRETED higher-order
    expression, so every consumer re-deriving it pays the eval again —
    one cached materialization serves kmeans/semdedup/ANN/dedup_embed
    (released by sdp_spark.unpersist_all)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EMB_CACHE:
        emb = wide_table(spark, sf_dir, "embeddings").withColumn(
            "dvec", F.col("embedding").cast("array<double>")
        )
        _EMB_CACHE[key] = emb.withColumn(
            "norm",
            F.sqrt(
                F.aggregate(F.transform("dvec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
            ),
        ).cache()
    return _EMB_CACHE[key]


# Row count of the embeddings frame, memoized beside _EMB_CACHE. A count is
# a property of the DATA (valid across cache eviction/rebuild), so it is not
# registered in unpersist_all; it exists so occupancy/geometry decisions
# (serve-side coalesce below, the sqrt-N IVF cell count) pay ONE cheap job
# per session instead of one per invocation.
_EMB_N: dict[tuple[str, str], int] = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EMB_N:
        _EMB_N[key] = _emb_normed(spark, sf_dir).count()
    return _EMB_N[key]


# Minimum candidate rows per task for broadcast-probe SERVE keys (each row
# is O(|queries|·dim) fold work). Below this, task scheduling dominates the
# work — the r14-driver-flagged llm_sim_search +20% was exactly the 2k-row
# candidate scan split 32 ways (~60 rows/task; measured back-to-back in one
# session: 32 parts 0.35-0.55 s, 4 parts 0.31 s). Any N ≥ 512·cores keeps
# full core width, so this is occupancy-adaptive, not a local[32] constant.
_SERVE_MIN_ROWS = 512


# Memoized cached DataFrames keyed by (spark app, sf_dir): repeated operator
# invocations in one session reuse ONE cached lineage instead of stacking a
# fresh cache per call (storage-memory leak otherwise).
_SH_CACHE: dict[tuple[str, str], DataFrame] = {}
_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cached_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SH_CACHE:
        _SH_CACHE[key] = _shingles(_docs_tokens(spark, sf_dir, wide=True)).cache()
    return _SH_CACHE[key]


def _cached_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + shingle counts, cached once per (app, sf_dir):
    the final plan consumes this from four subtrees (band self-join sides +
    two size joins) — uncached, the 16-permutation aggregation recomputes
    per subtree."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIG_CACHE:
        sh = _cached_shingles(spark, sf_dir)
        _SIG_CACHE[key] = sh.groupBy("doc_id").agg(
            *[
                F.min(F.xxhash64(F.lit(p), F.col("shingle"))).alias(f"h{p}")
                for p in range(_NUM_PERM)
            ],
            F.count("*").alias("n_sh"),
        ).cache()
    return _SIG_CACHE[key]


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_exact",
    oracle="""
    SELECT sha256(lower(trim(text))) AS text_hash,
           MIN(doc_id) AS keeper_doc,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    section=_SEC,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash; keep the lowest doc_id.
    Shuffle key is the 256-bit hash — text never moves after the map side."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_doc"), F.count("*").alias("n_copies"))
    )


_NUM_PERM = 16  # minhash permutations
_BAND_R = 2  # rows per band -> 8 bands; P(candidate | j=0.5) ~ 0.90


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id -> exploded distinct n-word shingles (docs with >= n tokens)."""
    slots = ", ".join(f"toks[i+{j}]" for j in range(n))
    return (
        df.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}),"
                    f" i -> concat_ws(' ', {slots}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


# Exact-duplicate cluster map for the near-dedup collapse prefix, memoized
# per (app, sf_dir) like the shingle/signature caches it sits beside.
_CLUSTER_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cached_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ck, rep): exact-duplicate cluster id (text hash) and the
    min-doc_id representative, restricted to docs that are in the MinHash
    pipeline at all (>= 3 tokens, i.e. present in the signature table).
    One shuffle keyed on the 64-bit ck — text itself never shuffles."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CLUSTER_CACHE:
        sig = _cached_signatures(spark, sf_dir)
        clusters = (
            _docs_tokens(spark, sf_dir, wide=True)
            .select("doc_id", F.xxhash64("text").alias("ck"))
            .join(sig.select("doc_id"), "doc_id")
        )
        _CLUSTER_CACHE[key] = clusters.withColumn(
            "rep", F.min("doc_id").over(Window.partitionBy("ck"))
        ).cache()
    return _CLUSTER_CACHE[key]


# Duplicate-density gate for the exact-collapse prefix: below this fraction
# of non-representative docs the collapse's extra join stages cost more than
# the O(copies²) candidate rows they avoid (measured both ways, SCALING.md
# round-6). Decision memoized per (app, sf_dir) — one 1-row aggregate over
# the cached cluster map, then free.
_NEAR_COLLAPSE_MIN_DUP_FRAC = 0.05
_COLLAPSE_DECISION: dict[tuple[str, str], bool] = {}


@register(
    "llm_dedup_near",
    # Promoted from rows-only (VERDICT r6 #6): the brute-force exact-Jaccard
    # pair join IS a valid oracle because the emitted set is deterministic
    # (fixed seeds/permutations) and verified-measured to equal brute force
    # at sf0.001 AND sf0.01 AND sf0.1 (0 missed / 0 extra at each; the
    # banding miss probability that forces rows-only in the general case
    # does not bite on these corpora — their true pairs are all at jaccard
    # high enough that 8 bands of 2 always collide). The pytest recall
    # floor (test_llm_ops) still guards the general-case contract.
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, s.shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 3) t,
           UNNEST(list_transform(generate_series(1, len(toks) - 2),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s(shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           FLOOR(CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE FLOOR(CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
                * 10000 + 0.5) / 10000 >= 0.5
    """,
    section=_SEC,
)
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection: 3-word shingles → 16-permutation MinHash →
    8 bands of 2 → bucket self-join for candidates → exact-Jaccard verify
    (>= 0.5) on candidates only.

    Adaptive exact-collapse prefix (round 6): when exact duplicates are
    dense (≥ 5% of docs), identical texts collapse to one min-doc_id
    representative BEFORE banding, the LSH pipeline runs on representatives
    only, and pairs re-expand afterward. Cross-cluster pairs inherit the
    representatives' jaccard (identical text ⇒ identical shingle set ⇒
    identical jaccard vs any third doc); within-cluster pairs are jaccard
    1.0 by definition and always band-collide — so both branches emit the
    IDENTICAL pair set, pinned by
    test_near_dedup_collapse_equals_uncollapsed. The point is the 100 TB
    shape: a web crawl carries million-copy boilerplate clusters, and an
    uncollapsed bucket self-join emits O(copies²) candidate rows per
    cluster — the collapse bounds the self-join by UNIQUE texts, turning
    the duplicate density that melts LSH into the thing that makes it
    cheaper (measured: 10×-replicated corpus 5.1 → 2.9 s; SCALING.md). On a
    low-dup corpus the collapse's ~5 extra join stages are pure overhead
    (measured 0.85 → 2.7 s at sf0.1), hence the density gate — the same
    bounded-driver-state adaptivity as the k-means sampled fit.

    Oracle: brute-force exact-Jaccard pairs (j >= 0.5). LSH banding is
    probabilistic in general, but on the fixture corpora the emitted set
    equals brute force exactly (measured 0 missed / 0 extra at sf0.001,
    sf0.01, sf0.1), so the key is driver-hash-checkable; the pytest
    precision=1 + recall-floor invariants still pin the general contract.
    """
    if _collapse_dense(spark, sf_dir):
        return _near_dedup_collapsed(spark, sf_dir)
    return _minhash_band_verify(
        _cached_signatures(spark, sf_dir), _cached_shingles(spark, sf_dir)
    )


def _collapse_dense(spark: SparkSession, sf_dir: str) -> bool:
    """The shared duplicate-density gate for the exact-collapse prefixes
    (MinHash and n-gram paths): one memoized 1-row aggregate over the
    cached cluster map per (app, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _COLLAPSE_DECISION:
        stats = (
            _cached_clusters(spark, sf_dir)
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("doc_id") != F.col("rep")).cast("long")).alias("dups"),
            )
            .first()
        )
        _COLLAPSE_DECISION[key] = (
            stats["n"] > 0
            and stats["dups"] / stats["n"] >= _NEAR_COLLAPSE_MIN_DUP_FRAC
        )
    return _COLLAPSE_DECISION[key]


def _near_dedup_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collapse branch of llm_dedup_near (see its docstring): band +
    verify over exact-dup representatives, then re-expansion to member
    pairs. Callable directly so the equality test can exercise it on a
    corpus below the density gate."""
    members = _cached_clusters(spark, sf_dir)
    rep_ids = members.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    # BOTH pipeline inputs restrict to representatives here: this branch
    # only runs when dups are dense (the gate), and then the shingle
    # pre-filter pays for itself — the verify stage shuffles the whole
    # posting table into its candidate joins, and dropping the ≥ 5%
    # (often 90%) duplicate postings first shrinks that shuffle by the
    # duplication factor. (On a SPARSE corpus the same pre-filter is pure
    # overhead — measured 3× the pipeline cost — which is exactly why the
    # sparse branch never does it.)
    sig = _cached_signatures(spark, sf_dir)
    sh = _cached_shingles(spark, sf_dir)
    rep_pairs = _minhash_band_verify(
        sig.join(rep_ids, "doc_id"), sh.join(rep_ids, "doc_id")
    )
    # re-expand: rep-level pairs → all member pairs (output-size-bounded
    # joins), plus within-cluster pairs at jaccard 1.0. Disjoint clusters ⇒
    # no pair is emitted twice.
    ma = members.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("m_a"))
    mb = members.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("m_b"))
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("m_a", "m_b").alias("doc_a"),
            F.greatest("m_a", "m_b").alias("doc_b"),
            "jaccard",
        )
    )
    x, y = members.alias("x"), members.alias("y")
    within = (
        x.join(
            y,
            (F.col("x.ck") == F.col("y.ck"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionAll(within)


def _minhash_band_verify(sig: DataFrame, sh: DataFrame) -> DataFrame:
    """Band → bucket self-join → exact-Jaccard verify (>= 0.5) over whatever
    doc population ``sig``/``sh`` carry. llm_dedup_near feeds it exact-dup
    representatives; the collapse-equality test feeds it the full corpus."""
    # bands: hash r consecutive signature slots together
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * _BAND_R + i}") for i in range(_BAND_R)]
                        ).alias("bucket"),
                    )
                    for b in range(_NUM_PERM // _BAND_R)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact-Jaccard verification restricted to candidates
    sizes = sig.select("doc_id", "n_sh")
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            dround(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


# Posting-list cap for the shingle self-join: a shingle shared by k docs
# emits k(k-1)/2 candidate pairs, so ONE boilerplate 3-gram with df in the
# millions melts the join at 100 TB. Shingles with df > cap carry ~zero
# near-dup signal (they are corpus-wide boilerplate) and are dropped BEFORE
# the self-join — candidate count per shingle is bounded by cap². Fixture max
# df is 25 (sf0.1), so at tested scales nothing is dropped; the oracle
# mirrors the cap so the contract stays exact at any df.
_NGRAM_DF_CAP = 100


def _capped_postings(sh: DataFrame, cap: int) -> DataFrame:
    """Drop shingles with document frequency > cap. The hot set is tiny
    (heavy-hitters), so it is excluded with a broadcast anti-join — the full
    posting list is never re-shuffled."""
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


_CAPPED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cached_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df-capped postings, cached once per (app, sf_dir): the ngram-Jaccard
    self-join consumes this from BOTH sides, and keeper resolution /
    train-corpus re-execute the pair plan — uncached, the df aggregation +
    anti-join reruns per subtree per invocation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CAPPED_CACHE:
        _CAPPED_CACHE[key] = _capped_postings(
            _cached_shingles(spark, sf_dir), _NGRAM_DF_CAP
        ).cache()
    return _CAPPED_CACHE[key]


# The deterministic candidate-pair query, shared verbatim by the
# llm_dedup_ngram_jaccard oracle and (as a CTE) by the keeper-resolution /
# near-deduped-corpus oracles downstream.
_NGRAM_PAIRS_SQL = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s.shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 3) t,
           UNNEST(list_transform(generate_series(1, len(toks) - 2),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s(shingle)
    ), capped AS (
      SELECT doc_id, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                        HAVING COUNT(*) <= {_NGRAM_DF_CAP})
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           FLOOR(CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.3
    """


@register(
    "llm_dedup_ngram_jaccard",
    oracle=_NGRAM_PAIRS_SQL,
    section=_SEC,
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard over all pairs sharing >= 1
    non-boilerplate shingle (df <= _NGRAM_DF_CAP; the Jaccard universe is the
    capped shingle set on both sides). The shingle equi-join IS the candidate
    pruning — disjoint docs never pair; the df cap bounds per-shingle fan-out
    at cap². Deterministic → full SQL oracle (unlike the MinHash variant).

    Dup-dense corpora take the same adaptive exact-collapse prefix as
    llm_dedup_near (shared density gate): the shingle self-join runs over
    exact-dup representatives only, pairs re-expand to members afterward.
    IMPORTANT exactness detail: the df cap stays computed on the FULL
    corpus (matching the SQL oracle) — only the self-join population
    collapses, so the shingle universe, every jaccard value, and the
    emitted pair set are identical to the uncollapsed plan (pinned by
    test_ngram_collapse_equals_uncollapsed; oracle-checked at the dense
    10× fixture, SCALING.md). The collapse flows through to
    llm_dedup_near_resolve / llm_pipeline_train_corpus_nd, which consume
    this pair plan."""
    if _collapse_dense(spark, sf_dir):
        return _ngram_pairs_collapsed(spark, sf_dir)
    return _ngram_pair_core(_cached_capped(spark, sf_dir))


def _ngram_pair_core(sh: DataFrame) -> DataFrame:
    """The capped-postings self-join + Jaccard filter over whatever doc
    population ``sh`` carries (full corpus, or exact-dup reps)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        sh_a.join(sh_b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a"
        )
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .filter(jac >= 0.3)
        .select("doc_a", "doc_b", dround(jac, 4).alias("jaccard"))
    )


def _ngram_pairs_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse branch of llm_dedup_ngram_jaccard: identical texts have
    identical capped shingle sets (the df cap is a full-corpus property,
    shared by all copies), so the self-join runs on min-doc_id reps and
    pairs re-expand exactly — cross pairs inherit the reps' jaccard,
    within-cluster pairs are 1.0. Membership is restricted to docs with at
    least one capped shingle (a cluster whose shingles were all df-capped
    away is absent from BOTH plans — all-or-none per cluster, since copies
    share one shingle set)."""
    sh = _cached_capped(spark, sf_dir)
    members = _cached_clusters(spark, sf_dir).join(
        sh.select("doc_id").distinct(), "doc_id"
    )
    rep_ids = members.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    rep_pairs = _ngram_pair_core(sh.join(rep_ids, "doc_id"))
    ma = members.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("m_a"))
    mb = members.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("m_b"))
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("m_a", "m_b").alias("doc_a"),
            F.greatest("m_a", "m_b").alias("doc_b"),
            "jaccard",
        )
    )
    x, y = members.alias("x"), members.alias("y")
    within = (
        x.join(
            y,
            (F.col("x.ck") == F.col("y.ck"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionAll(within)


# DuckDB twin of the connected-components resolution: symmetrize the pair
# list into edges, take the transitive closure with a recursive CTE, then
# keeper = min(doc in component).
_NEAR_RESOLVE_SQL = f"""
    WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    resolved AS (
      SELECT node AS doc_id, LEAST(node, MIN(r)) AS keeper_doc
      FROM reach GROUP BY node
    )
    SELECT doc_id, keeper_doc,
           COUNT(*) OVER (PARTITION BY keeper_doc) AS cluster_size,
           doc_id = keeper_doc AS is_keeper
    FROM resolved
    """

_MAX_CC_ITERS = 25

# Memoized converged label assignments per (app, sf_dir): keeper resolution
# is consumed twice per sweep (its own key + the near-deduped train corpus)
# and the propagation loop's per-round actions are the dominant cost.
_RESOLVE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _propagate_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative min-label propagation to convergence; returns (node, label).
    The pair GRAPH is ~0.1% of the corpus (only near-duplicates appear), so
    the loop runs at a narrow shuffle width — per-round overhead is fixed
    cost, not data cost; the corpus-side plans keep the session's width.
    The width is pinned BEFORE the first localCheckpoint and restored after
    convergence (scoped conf, same discipline as streaming state sizing)."""
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        if _collapse_dense(spark, sf_dir):
            # Collapse-aware resolution: propagate over the REP-level pair
            # graph (the collapsed plan BEFORE expansion — smaller than the
            # member graph by the duplication factor squared), then project
            # labels onto members. Exact because cluster members form a
            # clique (within-pairs at jaccard 1.0) whose minimum is the rep,
            # and reps are cluster minima — so min-label over the member
            # graph == min-label over the rep graph, projected. Members of
            # size-1 clusters with no cross pair are non-nodes in BOTH
            # formulations; size>=2 clusters with no cross pair label as
            # their own rep.
            sh = _cached_capped(spark, sf_dir)
            members = _cached_clusters(spark, sf_dir).join(
                sh.select("doc_id").distinct(), "doc_id"
            )
            rep_ids = members.filter(F.col("doc_id") == F.col("rep")).select(
                "doc_id"
            )
            pairs = _ngram_pair_core(sh.join(rep_ids, "doc_id")).select(
                "doc_a", "doc_b"
            )
            rep_labels = _propagate_loop(pairs)
            w = Window.partitionBy("ck")
            return (
                members.withColumn("sz", F.count(F.lit(1)).over(w))
                .join(
                    rep_labels.select(
                        F.col("node").alias("rep"), F.col("label").alias("rl")
                    ),
                    "rep",
                    "left",
                )
                .filter(F.col("rl").isNotNull() | (F.col("sz") >= 2))
                .select(
                    F.col("doc_id").alias("node"),
                    F.coalesce("rl", "rep").alias("label"),
                )
            )
        pairs = llm_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
        return _propagate_loop(pairs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def _propagate_loop(pairs: DataFrame) -> DataFrame:
    """The min-label propagation loop over an undirected pair list;
    see _propagate_labels for the convergence/width discipline (the caller
    owns the scoped shuffle-width conf)."""
    edges = (
        pairs.unionAll(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # Convergence probe folded into the round's single action (r15, the
    # graphs.py CC idiom): labels only ever DECREASE, so Σ(labels) is
    # strictly decreasing until the fixpoint — the lazy checkpoint is
    # materialized by the probe agg, ONE job per round where the eager
    # checkpoint + changed-count pair ran two.
    mass = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(_MAX_CC_ITERS):
        nbr = (
            edges.join(labels, F.col("dst") == F.col("node"))
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        merged = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        new_mass = merged.agg(F.sum("label")).collect()[0][0]
        labels = merged
        if new_mass == mass:
            return labels
        mass = new_mass
    raise RuntimeError(
        f"near-dup label propagation did not converge in {_MAX_CC_ITERS} rounds"
    )


@register("llm_dedup_near_resolve", oracle=_NEAR_RESOLVE_SQL, section=_SEC)
def llm_dedup_near_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup KEEPER RESOLUTION: candidate pairs (deterministic n-gram
    Jaccard, llm_dedup_ngram_jaccard) → connected components → one keeper
    (min doc_id) per duplicate cluster. This is the stage every production
    dedup pipeline needs after pair generation — a pair list alone leaves
    the transitive closure to the user (doc A~B, B~C must drop 2 docs, not
    un-pair them).

    Distributed algorithm: iterative min-label propagation over the
    symmetrized edge list — per iteration ONE shuffle keyed on node id
    (join edges⋈labels + min-aggregate), converging in O(component
    diameter) rounds; dup clusters are short-diameter in practice (near-dup
    similarity is near-transitive). Each round localCheckpoints (truncates
    lineage — iterative plans otherwise grow exponentially) and the
    convergence check is a metadata-only count; row data never reaches the
    driver. At 1000-executor scale the same loop runs with the edge list
    hash-partitioned; for adversarial long-chain graphs swap the iteration
    body for large-star/small-star (O(log n) rounds) — the surrounding
    contract (pairs in, doc_id→keeper_doc out) is unchanged."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _RESOLVE_CACHE:
        labels = _RESOLVE_CACHE[key]
    else:
        labels = _propagate_labels(spark, sf_dir)
        _RESOLVE_CACHE[key] = labels
    w = Window.partitionBy("keeper_doc")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("keeper_doc")
    ).select(
        "doc_id",
        "keeper_doc",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("keeper_doc")).alias("is_keeper"),
    )


def _md5_hex_fold_sql(expr: str, start: int, length: int) -> str:
    """DuckDB: integer value of md5(expr)[start:start+length] (hex)."""
    return (
        f"list_reduce(list_transform("
        f"string_split(substring(md5({expr}), {start}, {length}), ''),"
        f" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
        f" (a, b) -> a * 16 + b)"
    )


# SimHash oracle: the 64 per-bit vote sums and signature-assembly terms are
# generated here (the same loop the Spark side runs) so the two can't drift.
# Bit 63's power of two is Long.MIN_VALUE — emitted as the literal because
# DuckDB range-checks 1<<63 while two's-complement assembly needs it.
_SIMHASH_BITSUMS = ",\n             ".join(
    f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{b}"
    for b in range(64)
)
_SIMHASH_SIG_TERMS = " + ".join(
    (
        f"CASE WHEN b{b} > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        if b == 63
        else f"CASE WHEN b{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) "
        f"ELSE CAST(0 AS BIGINT) END"
    )
    for b in range(64)
)
_SIMHASH_SQL = f"""
    WITH tok AS (
      SELECT doc_id, t AS token, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ), th AS (
      SELECT doc_id, cnt,
             (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
               * 4294967296 + lo AS th
      FROM (SELECT doc_id, cnt,
                   {_md5_hex_fold_sql("token", 1, 8)} AS hi,
                   {_md5_hex_fold_sql("token", 9, 8)} AS lo
            FROM tok)
    ), sums AS (
      SELECT doc_id,
             {_SIMHASH_BITSUMS}
      FROM th GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, {_SIMHASH_SIG_TERMS} AS simhash FROM sums
    ), bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * 16)) & 65535 AS chunk
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b ON a.band = b.band AND a.chunk = b.chunk
                              AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""


@register("llm_dedup_simhash", oracle=_SIMHASH_SQL, section=_SEC)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dedup: 64-bit signature from token-hash bit votes, then
    4×16-bit band blocking and Hamming-distance (<= 8) verification via
    bit_count(xor). The 64 per-bit vote sums are 64 conditional-sum
    aggregate expressions over the token rows — ONE groupBy(doc_id) with no
    row blow-up (an earlier shape exploded tokens×64; same signatures,
    pinned by the determinism test). Per-token 64-bit hash = md5 bits 0-63
    assembled two's-complement from two 32-bit hex halves — engine-portable
    (unlike xxhash64), which is what lets the full band-join pipeline carry
    a generated DuckDB hash oracle. Promoted from rows-only in round 8."""
    toks = _docs_tokens(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("token")
    )
    hi = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(F.md5("token"), 9, 8), 16, 10).cast("bigint")
    th64 = (
        hi - F.when(hi >= F.lit(2147483648), F.lit(4294967296)).otherwise(F.lit(0))
    ) * F.lit(4294967296) + lo
    tok_w = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("th", th64)
    )
    bit_sums = tok_w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(th >> {b}) & 1") == 1, F.col("cnt")).otherwise(
                    -F.col("cnt")
                )
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    # assemble the signature: bit b set iff vote sum positive; CAST(1) << 63
    # is Long.MIN_VALUE, summing distinct powers of two never overflows
    sig_expr = None
    for b in range(64):
        term = F.when(
            F.col(f"b{b}") > 0, F.expr(f"CAST(1 AS BIGINT) << {b}")
        ).otherwise(F.lit(0).cast("bigint"))
        sig_expr = term if sig_expr is None else sig_expr + term
    sig = bit_sums.select("doc_id", sig_expr.alias("simhash"))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("band"),
    ).withColumn("chunk", F.expr("(simhash >> (band * 16)) & 65535"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "chunk"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "chunk"
    )
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 8)
    )


@register(
    "llm_dedup_embed",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           FLOOR(list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
                    * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))))
                 * 10000 + 0.5) / 10000 AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum(list_transform(generate_series(1, 64),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
             * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x)))) >= 0.35
    """,
    section=_SEC,
)
def llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs within the same cluster label with
    cosine >= 0.35 (above the within-label p99 of the loose synthetic
    clusters). The label equi-join is the blocking key (at 100 TB the
    blocking key comes from LSH buckets instead — see llm_sim_search_lsh)."""
    emb = _emb_normed(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("dvec").alias("va"), F.col("norm").alias("na"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("dvec").alias("vb"), F.col("norm").alias("nb"), "label"
    )
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x)
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= 0.35)
        .select("vec_a", "vec_b", dround(F.col("cos"), 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "llm_sim_search",
    oracle="""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(CAST(c.embedding AS DOUBLE[]), x -> x * x)))),
                   4) AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id <= 10
    )
    SELECT query_id, neighbor_id, neighbor_label, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM scored) t
    WHERE rn <= 5
    """,
    section=_SEC,
)
def llm_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=5) for 10 query vectors — the correctness
    baseline for ANN. Queries broadcast; candidates never shuffle; per-query
    top-k via row_number on (rounded sim, id) for determinism."""
    emb = _emb_normed(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") <= 10).select(
            F.col("vec_id").alias("query_id"), F.col("dvec").alias("qv"), F.col("norm").alias("qn")
        )
    )
    # The session cache carries wide_table's defaultParallelism partitioning
    # (right for the O(N²) fold consumers like llm_knn_graph); this serve key
    # probes only |queries|·N pairs, so at small N the wide cache scan is
    # mostly task-scheduling overhead. Coalesce (narrow — merges cached
    # blocks, no shuffle) to ≥_SERVE_MIN_ROWS candidates per task; a no-op
    # at any N ≥ _SERVE_MIN_ROWS·cores.
    n_parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            _emb_count(spark, sf_dir) // _SERVE_MIN_ROWS,
        ),
    )
    c = emb.coalesce(n_parts).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("dvec").alias("cv"),
        F.col("norm").alias("cn"),
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(dot / (F.col("qn") * F.col("cn")), 4))
        .select("query_id", "neighbor_id", "neighbor_label", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")
    )


def _hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (md5-seeded, no RNG state)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"sdp:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


_LSH_TABLES = 6  # OR-amplification: candidate if ANY table's bucket matches
# (r13: 4 -> 6. The recall ladder at sf0.1 is 4:0.836 / 6:0.964 /
# 8:0.982 — candidates scale linearly with tables, so 6 is the knee of
# recall-per-candidate; the oracle SQL regenerates from this constant,
# so Spark and DuckDB move in lockstep and the key stays hash-green.)
_LSH_PLANES = 4  # per-table sign bits -> 16 buckets per table


def _sql_lsh_hashed(n_tables: int, n_planes: int) -> str:
    """The `hashed` CTE body shared by every LSH oracle: per-table
    sign-bit buckets over the SAME md5-seeded hyperplanes the Spark side
    uses (exact 0.001-grid doubles whose repr round-trips), as literal-
    plane left-to-right dot folds — identical doubles, identical signs,
    identical buckets cross-engine."""
    planes = _hyperplanes(n_tables * n_planes)

    def lit(row: list[float]) -> str:
        return "[" + ", ".join(repr(w) for w in row) + "]"

    tables = []
    for t in range(n_tables):
        bits = [
            f"(CASE WHEN list_sum(list_transform(generate_series(1, 64), "
            f"i -> dvec[i] * ({lit(planes[t * n_planes + i])})[i])) > 0 "
            f"THEN {2 ** i} ELSE 0 END)"
            for i in range(n_planes)
        ]
        tables.append(
            f"SELECT vec_id, dvec, norm, {t} AS tbl, "
            + " + ".join(bits)
            + " AS bkt FROM emb"
        )
    return "\n      UNION ALL\n      ".join(tables)


def _sql_lsh_probes(n_planes: int) -> str:
    """Multi-probe list: the exact bucket plus every 1-bit flip."""
    return "[h.bkt, " + ", ".join(
        f"xor(h.bkt, {2 ** i})" for i in range(n_planes)
    ) + "]"


def _lsh_oracle_sql() -> str:
    """DuckDB twin of llm_sim_search_lsh: hashed buckets, query-side
    multi-probe, distinct candidates, exact rescore, top-5."""
    hashed = _sql_lsh_hashed(_LSH_TABLES, _LSH_PLANES)
    probe_list = _sql_lsh_probes(_LSH_PLANES)
    rescore = sql_dround(
        "list_sum(list_transform(generate_series(1, 64),"
        " i -> q.dvec[i] * n.dvec[i])) / (q.norm * n.norm)",
        4,
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))) AS norm
      FROM embeddings
    ), hashed AS (
      {hashed}
    ), probes AS (
      SELECT h.vec_id AS query_id, h.tbl, pb.bkt
      FROM hashed h, UNNEST({probe_list}) AS pb(bkt)
      WHERE h.vec_id <= 10
    ), cands AS (
      SELECT DISTINCT p.query_id, h.vec_id AS neighbor_id
      FROM probes p JOIN hashed h ON p.tbl = h.tbl AND p.bkt = h.bkt
      WHERE p.query_id <> h.vec_id
    ), rescored AS (
      SELECT c.query_id, c.neighbor_id, {rescore} AS cos_sim
      FROM cands c
      JOIN emb q ON c.query_id = q.vec_id
      JOIN emb n ON c.neighbor_id = n.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM rescored) t
    WHERE rn <= 5
    """


@register("llm_sim_search_lsh", oracle=_lsh_oracle_sql(), section=_SEC)
def llm_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multi-table random-hyperplane LSH (4 tables × 4
    sign-bits) with query-side MULTI-PROBE (Lv et al., VLDB'07): each query
    probes its exact bucket plus every 1-bit-flip bucket, so a near
    neighbor is found if at most one plane disagrees in any table —
    P(candidate | cos=0.5) ≈ 0.97 vs ≈ 0.59 exact-probe, with ZERO extra
    corpus rows (the probe fan-out is on the tiny broadcast query side
    only; the corpus keeps one row per table). At 100 TB the (table,
    bucket) key is the shuffle/partition key and the brute-force rescoring
    touches only candidates. PROMOTED to a full hash oracle (round 8):
    the md5-seeded hyperplanes are exact-literal doubles DuckDB replays,
    so buckets, probes, candidates and rescored sims are all
    deterministic cross-engine; the recall ≥ 0.8 pytest vs llm_sim_search
    still guards the general-case ANN contract."""
    planes = _hyperplanes(_LSH_TABLES * _LSH_PLANES)
    emb = _emb_normed(spark, sf_dir)
    buckets = []
    for t in range(_LSH_TABLES):
        bucket = F.lit(0)
        for i in range(_LSH_PLANES):
            pl = F.array(*[F.lit(w) for w in planes[t * _LSH_PLANES + i]])
            dot_p = F.aggregate(
                F.zip_with("dvec", pl, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            bucket = bucket + F.when(dot_p > 0, F.lit(2**i)).otherwise(F.lit(0))
        buckets.append(F.struct(F.lit(t).alias("tbl"), bucket.alias("bkt")))
    hashed = emb.select(
        "vec_id", "dvec", "norm", F.explode(F.array(*buckets)).alias("tb")
    ).select("vec_id", "dvec", "norm", "tb.tbl", "tb.bkt")

    probes = F.array(
        F.col("bkt"),
        *[F.col("bkt").bitwiseXOR(F.lit(2**i)) for i in range(_LSH_PLANES)],
    )
    q = F.broadcast(
        hashed.filter(F.col("vec_id") <= 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
            "tbl",
            F.explode(probes).alias("bkt"),
        )
    )
    c = hashed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("dvec").alias("cv"), F.col("norm").alias("cn"), "tbl", "bkt"
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    cands = (
        q.join(c, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cos_sim", dround(dot / (F.col("qn") * F.col("cn")), 4)).select(
        "query_id", "neighbor_id", "cos_sim"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


# IVF geometry (r14, VERDICT r13 work list #3): K = ceil(sqrt(N)) clamped
# to [8, 256] — the FAISS sqrt-N law every other IVF family here follows —
# and nprobe = max(2, ceil(K/4)). The r13 shape (K=8, nprobe=2 FIXED) spent
# the same 25%-of-corpus candidate budget on 8 coarse cells and plateaued
# at recall@5 0.891 at sf0.1; sqrt-N cells spend it on finer, better-
# targeted neighborhoods: measured 0.745 -> 0.909 (sf0.01) and
# 0.891 -> 1.000 (sf0.1) at unchanged candidates/query. Both engines
# derive K and nprobe from COUNT(*) with the identical ceil/clamp chain.
_IVF_K = 8  # legacy fixed K — now ONLY the IVF-PQ coarse quantizer's size
_IVF_K_MIN, _IVF_K_MAX = 8, 256
_IVF_GEO_SQL = (
    f"SELECT GREATEST({_IVF_K_MIN}, LEAST({_IVF_K_MAX},"
    " CAST(CEIL(SQRT(COUNT(*))) AS INT))) AS k FROM emb"
)


def _ivf_geometry(n: int) -> tuple[int, int]:
    """(K, nprobe) from the corpus size — the Python twin of the oracle's
    geo CTE; math.sqrt/ceil are the same IEEE ops as DuckDB's."""
    import math

    k = max(_IVF_K_MIN, min(_IVF_K_MAX, math.ceil(math.sqrt(n))))
    return k, max(2, math.ceil(k / 4.0))


def _ivf_ranked_expr(cents: list):
    """Map-side cell ranking: cos(v, c_i) against every collected centroid
    with the SAME sequential fold the oracle's list_sum uses, sorted as K
    literal similarity structs — ascending on (-sim, cent_id) = sim desc,
    cent_id asc. Pure codegen per row, ZERO shuffle (VERDICT r6 #3).
    Shared by llm_sim_search_ivf and llm_ann_search_filtered."""
    sims = []
    for r in cents:
        cvec = F.array(*[F.lit(float(x)) for x in r["dvec"]])
        cdot = F.aggregate(
            F.zip_with("dvec", cvec, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sim = cdot / (F.col("norm") * F.lit(float(r["norm"])))
        sims.append(
            F.struct(
                (-sim).alias("negsim"), F.lit(int(r["vec_id"])).alias("k")
            )
        )
    return F.array_sort(F.array(*sims))


@register(
    "llm_sim_search_ivf",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
      FROM embeddings
    ), geo AS (
      SELECT k, GREATEST(2, CAST(CEIL(k / 4.0) AS INT)) AS nprobe
      FROM ({_IVF_GEO_SQL}) g
    ), cent AS (
      SELECT vec_id AS cent_id, dvec AS cvec, norm AS cnorm FROM emb
      WHERE vec_id < (SELECT k FROM geo)
    ), scored_cells AS (
      SELECT e.vec_id, c.cent_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(generate_series(1, 64),
                         i -> e.dvec[i] * c.cvec[i])) / (e.norm * c.cnorm) DESC,
                        c.cent_id
             ) AS rn
      FROM emb e CROSS JOIN cent c
    ), assign AS (
      SELECT vec_id, cent_id AS cell FROM scored_cells WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cent_id AS cell FROM scored_cells
      WHERE vec_id <= 10 AND rn <= (SELECT nprobe FROM geo)
    ), cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE p.query_id <> a.vec_id
    ), rescored AS (
      SELECT c.query_id, c.neighbor_id,
             FLOOR(list_sum(list_transform(generate_series(1, 64),
                     i -> q.dvec[i] * n.dvec[i])) / (q.norm * n.norm)
                   * 10000 + 0.5) / 10000 AS cos_sim
      FROM cands c
      JOIN emb q ON c.query_id = q.vec_id
      JOIN emb n ON c.neighbor_id = n.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM rescored) t
    WHERE rn <= 5
    """,
    section=_SEC,
)
def llm_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize every vector to its nearest of K
    centroid cells, probe the query's nprobe nearest cells, exact-rescore
    only vectors in probed cells. Deterministic seed centroids (first K
    vec_ids) stand in for k-means — the Spark plumbing (driver-resident
    centroid table, literal-expression argmax assignment, cell-key
    equi-join, candidate-only rescoring) is exactly the production IVF
    shape. K and nprobe follow _ivf_geometry's sqrt-N law (r14 — see
    the comment above the register call): the same candidate budget the
    fixed K=8 spent on coarse cells now buys finer neighborhoods, and
    recall-per-candidate keeps improving as the corpus (and with it K)
    grows. At 100 TB: cell id is the partition key; each query touches
    nprobe/K of the corpus. Unlike the LSH variant this one is
    deterministic end-to-end → full SQL oracle (fold order of the 64-dim
    dot product matches DuckDB's list_sum; K/nprobe derive from COUNT(*)
    through the identical ceil/clamp chain in both engines).

    Cell assignment is ZERO-SHUFFLE (VERDICT r6 #3): the K centroid
    vectors are collected to the driver (K x dim doubles — exactly the
    state a production IVF coarse quantizer keeps driver-side) and the
    top-nprobe cells per vector come from an array_sort over K literal
    similarity structs, pure codegen per row. The previous shape —
    crossJoin(broadcast centroids) + row_number over Window.partitionBy
    (vec_id) — scored the same N x K pairs but then SHUFFLED them by
    vec_id just to rank; this computes the same argmax map-side."""
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    k_cells, nprobe = _ivf_geometry(emb.count())
    # vec_id is 0-based: strict < picks exactly K centroids (0..K-1); the
    # query set keeps vec_id <= 10 to match llm_sim_search's query universe.
    # Bounded driver collect: K rows of dim-64 doubles.
    cents = (
        emb.filter(F.col("vec_id") < k_cells)
        .select("vec_id", "dvec", "norm")
        .orderBy("vec_id")
        .collect()
    )
    assigned = emb.withColumn("ranked", _ivf_ranked_expr(cents))
    assign = assigned.select(
        "vec_id", F.col("ranked")[0]["k"].alias("cell"), "dvec", "norm"
    )
    probes = (
        assigned.filter(F.col("vec_id") <= 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.transform(F.slice("ranked", 1, nprobe), lambda s: s["k"])
            ).alias("cell"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    cands = (
        F.broadcast(probes)
        .join(assign, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "qv",
            "qn",
            F.col("dvec").alias("cv"),
            F.col("norm").alias("cn"),
        )
        # a neighbor reachable via both probed cells appears twice; dedup it
        # on the SAME query_id partitioning the final top-k window needs
        # (hashpartitioning(query_id) satisfies the dedup's clustered-
        # distribution requirement — subset rule), so candidate dedup and
        # ranking share ONE shuffle instead of two
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    rescored = cands.withColumn("cos_sim", dround(dot / (F.col("qn") * F.col("cn")), 4)).select(
        "query_id", "neighbor_id", "cos_sim"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return rescored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


@register(
    "llm_ann_search_filtered",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dvec,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
      FROM embeddings
    ), geo AS (
      SELECT k, GREATEST(2, CAST(CEIL(k / 4.0) AS INT)) AS nprobe
      FROM ({_IVF_GEO_SQL}) g
    ), cent AS (
      SELECT vec_id AS cent_id, dvec AS cvec, norm AS cnorm FROM emb
      WHERE vec_id < (SELECT k FROM geo)
    ), scored_cells AS (
      SELECT e.vec_id, e.label, c.cent_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(generate_series(1, 64),
                         i -> e.dvec[i] * c.cvec[i])) / (e.norm * c.cnorm) DESC,
                        c.cent_id
             ) AS rn
      FROM emb e CROSS JOIN cent c
    ), assign AS (
      SELECT vec_id, label, cent_id AS cell FROM scored_cells WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, label, cent_id AS cell FROM scored_cells
      WHERE vec_id <= 10 AND rn <= (SELECT nprobe FROM geo)
    ), cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a
        ON p.cell = a.cell AND p.label = a.label
      WHERE p.query_id <> a.vec_id
    ), rescored AS (
      SELECT c.query_id, c.neighbor_id, n.label,
             FLOOR(list_sum(list_transform(generate_series(1, 64),
                     i -> q.dvec[i] * n.dvec[i])) / (q.norm * n.norm)
                   * 10000 + 0.5) / 10000 AS cos_sim
      FROM cands c
      JOIN emb q ON c.query_id = q.vec_id
      JOIN emb n ON c.neighbor_id = n.vec_id
    )
    SELECT query_id, neighbor_id, label, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM rescored) t
    WHERE rn <= 5
    """,
    section=_SEC,
)
def llm_ann_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN — top-5 among vectors sharing the query's `label`,
    the metadata-constrained search every production vector platform
    fields ('nearest neighbors WHERE tenant/lang/split = X'). The naive
    shapes both fail: POST-filtering a plain top-k returns < k (or
    nothing) once the filter is selective, and PRE-filtering the corpus
    before indexing needs one index per predicate value. The production
    answer — metadata lives IN the index and the predicate prunes the
    posting lists during traversal (FAISS IDSelector / Qdrant payload
    filters) — maps onto Spark exactly: `label` is a column on the
    posting-list frame, and the predicate joins as PART OF THE
    EQUI-JOIN KEY (cell AND label), so filtered-out candidates never
    reach the rescorer. No post-hoc filter node: Catalyst hashes both
    columns in one exchange, and selectivity REDUCES the shuffle.
    Same sqrt-N geometry + assignment expression as llm_sim_search_ivf
    (_ivf_ranked_expr, _ivf_geometry); fully hash-oracled — the whole
    chain is deterministic SQL in both engines."""
    emb = _emb_normed(spark, sf_dir).select(
        "vec_id", "dvec", "norm", "label"
    )
    k_cells, nprobe = _ivf_geometry(emb.count())
    cents = (
        emb.filter(F.col("vec_id") < k_cells)
        .select("vec_id", "dvec", "norm")
        .orderBy("vec_id")
        .collect()
    )
    assigned = emb.withColumn("ranked", _ivf_ranked_expr(cents))
    assign = assigned.select(
        "vec_id",
        F.col("ranked")[0]["k"].alias("cell"),
        "dvec",
        "norm",
        "label",
    )
    probes = (
        assigned.filter(F.col("vec_id") <= 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.transform(F.slice("ranked", 1, nprobe), lambda s: s["k"])
            ).alias("cell"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
            "label",
        )
    )
    cands = (
        F.broadcast(probes)
        .join(assign, ["cell", "label"])  # predicate IS the join key
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            "qv",
            "qn",
            F.col("dvec").alias("cv"),
            F.col("norm").alias("cn"),
        )
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    rescored = cands.withColumn(
        "cos_sim", dround(dot / (F.col("qn") * F.col("cn")), 4)
    ).select("query_id", "neighbor_id", "label", "cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs — the
# classic GPT-2-style split without lookaheads (portable to RE2/Java regex).
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@register(
    "llm_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
           FLOOR(CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS bpe_per_word
    FROM documents
    """,
    section=_SEC,
)
def llm_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace vs BPE-ish regex pre-tokenizer (letter /
    digit / punctuation runs): the cost model for LLM training data ("how
    many tokens is this corpus?"). Pure codegen regexp — no Python."""
    d = _docs_tokens(spark, sf_dir)
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)"))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        dround(n_bpe.cast("double") / F.size("toks"), 4).alias("bpe_per_word"),
    )


@register(
    "llm_text_stats",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           FLOOR(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) * 10000 + 0.5) / 10000
             AS chars_per_token
    FROM documents
    """,
    section=_SEC,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/char statistics (whitespace tokenizer)."""
    d = _docs_tokens(spark, sf_dir)
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        dround(F.col("n_chars").cast("double") / F.size("toks"), 4).alias("chars_per_token"),
    )


@register(
    "llm_tfidf_topterms",
    oracle="""
    WITH tok AS (
      SELECT source, t.token FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    ), tf AS (
      SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT source) AS df FROM tok GROUP BY 1
    ), scored AS (
      SELECT tf.source, tf.token, tf.tf, df.df,
             ROUND(tf.tf * ln(20.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token)
    )
    SELECT source, token, tf, df, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY tfidf DESC, token) AS rn FROM scored) t
    WHERE rn <= 5
    """,
    section=_SEC,
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per source (20 sources = the corpus)."""
    tok = _docs_tokens(spark, sf_dir).select("source", F.explode("toks").alias("token"))
    tf = tok.groupBy("source", "token").agg(F.count("*").alias("tf"))
    # df as a count-window over the tf frame (r15; the repo's certified
    # df-lookup shape): tf has exactly one row per occurring (source,
    # token), so COUNT(*) OVER (PARTITION BY token) == the old
    # countDistinct(source) groupBy — same BIGINT, and the corpus is
    # tokenized+exploded ONCE instead of twice (the old plan re-scanned
    # documents for the df side and paid a broadcast barrier; guide
    # §1.2/§2.4).
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    ).withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(20.0) / F.col("df")), 6)
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "token", "tf", "df", "tfidf")
    )


_STOPWORDS = "('the', 'a', 'of', 'and', 'is', 'in', 'to', 'it')"


@register(
    "llm_lang_filter",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE lang IN ('en', 'es')
      AND n_chars BETWEEN 100 AND 500
      AND len(string_split(text, ' ')) >= 15
      AND len(list_filter(string_split(text, ' '), t -> t IN {_STOPWORDS}))
          * 1.0 / len(string_split(text, ' ')) < 0.5
    """,
    section=_SEC,
)
def llm_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/language filter pipeline: lang allowlist + length band +
    token-count floor + stopword-ratio cap (one Catalyst Filter, fully
    pushed down past the tokenize projections)."""
    d = _docs_tokens(spark, sf_dir)
    stop_ratio = F.size(F.expr(f"filter(toks, t -> t IN {_STOPWORDS})")) / F.size("toks")
    return (
        d.filter(
            F.col("lang").isin("en", "es")
            & F.col("n_chars").between(100, 500)
            & (F.size("toks") >= 15)
            & (stop_ratio < 0.5)
        ).select("doc_id", "lang", "n_chars")
    )


@register(
    "llm_langid",
    oracle=f"""
    SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '), t -> t IN {_STOPWORDS}))::INTEGER AS en_hits,
           len(list_filter(string_split(text, ' '),
               t -> t IN ('el', 'la', 'de', 'los', 'y', 'que')))::INTEGER AS es_hits,
           CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN {_STOPWORDS}))
                     >= len(list_filter(string_split(text, ' '),
                            t -> t IN ('el', 'la', 'de', 'los', 'y', 'que'))) + 1
                THEN 'en' ELSE 'unknown' END AS predicted_lang
    FROM documents
    """,
    section=_SEC,
)
def llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-list voting (an n-gram/function-word
    scorer — the classic pre-fastText heuristic). Codegen lambdas only."""
    d = _docs_tokens(spark, sf_dir)
    en_hits = F.size(F.expr(f"filter(toks, t -> t IN {_STOPWORDS})"))
    es_hits = F.size(F.expr("filter(toks, t -> t IN ('el', 'la', 'de', 'los', 'y', 'que'))"))
    return d.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        es_hits.alias("es_hits"),
        F.when(en_hits >= es_hits + 1, "en").otherwise("unknown").alias("predicted_lang"),
    )


# DuckDB twin of _quality_expr over the documents view — shared by the
# llm_quality_score and llm_curriculum_order oracles.
_QUALITY_SQL = f"""
    WITH feat AS (
      SELECT doc_id,
             LEAST(CAST(n_chars AS DOUBLE) / 400, 1.0) AS len_score,
             len(list_filter(string_split(text, ' '), t -> t IN {_STOPWORDS}))
               * 1.0 / len(string_split(text, ' ')) AS stop_ratio,
             len(list_distinct(string_split(text, ' ')))
               * 1.0 / len(string_split(text, ' ')) AS diversity
      FROM documents
    )
    SELECT doc_id,
           FLOOR((0.4 * len_score + 0.3 * (1 - ABS(stop_ratio - 0.4)) + 0.3 * diversity)
                 * 10000 + 0.5) / 10000 AS quality
    FROM feat
"""


def _quality_expr():
    """The shared quality formula (length band + stopword-ratio centering
    + lexical diversity) as a column over _docs_tokens rows — one
    definition serving llm_quality_score and llm_curriculum_order so the
    two can never drift."""
    n_tokens = F.size("toks")
    len_score = F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0))
    stop_ratio = F.size(F.expr(f"filter(toks, t -> t IN {_STOPWORDS})")) / n_tokens
    diversity = F.size(F.array_distinct("toks")) / n_tokens
    return dround(
        0.4 * len_score + 0.3 * (1 - F.abs(stop_ratio - 0.4)) + 0.3 * diversity, 4
    )


@register(
    "llm_quality_score",
    oracle=_QUALITY_SQL,
    section=_SEC,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + stopword-ratio centering + lexical
    diversity, one weighted score per doc."""
    d = _docs_tokens(spark, sf_dir)
    return d.select("doc_id", _quality_expr().alias("quality"))


_FP_P = (1 << 31) - 1  # Mersenne prime M31

# Portable per-token 48-bit hash: integer value of the first 12 hex chars
# of md5(token). md5 is bit-identical in every engine (unlike xxhash64,
# whose seed/variant is Spark-private), which is what lets the ordered
# Karp-Rabin fold below carry a DuckDB list_reduce oracle.
_FP_TOKHASH_SQL = (
    "list_reduce(list_transform(string_split(substring(md5(t), 1, 12), ''),"
    " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
    " (a, b) -> a * 16 + b)"
)


@register(
    "llm_fingerprint",
    oracle=f"""
    WITH th AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            t -> {_FP_TOKHASH_SQL} % {_FP_P}) AS ths
      FROM documents
    )
    SELECT doc_id,
           list_reduce(ths, (a, b) -> (a * 131 + b) % {_FP_P}) * {_FP_P}
           + list_reduce(ths, (a, b) -> (a * 1031 + b) % {_FP_P}) AS fingerprint
    FROM th
    """,
    section=_SEC,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash over the token
    stream (Karp-Rabin style), folded with a higher-order aggregate —
    order-sensitive, unlike the bag-of-shingles MinHash.

    Two independent (multiplier, Mersenne-prime) folds are combined so the
    fingerprint space is ~2^62 (a single 2^31 residue would birthday-collide
    at corpus scale) while every intermediate stays well under int64
    (ANSI-mode overflow-safe). Per-token hash = first 48 bits of md5 —
    engine-portable, so the ordered fold (Spark higher-order aggregate ==
    DuckDB list_reduce; both seed acc with the first pre-modded element)
    carries a full hash oracle. Promoted from rows-only in round 8.
    Rides wide_table: the per-token md5 fold is heavy per-row map work
    before any shuffle — a single parquet split would serialize it."""
    d = _docs_tokens(spark, sf_dir, wide=True)
    p = _FP_P
    th = lambda t: F.pmod(F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("bigint"), p)

    def fold(mult: int):
        return F.aggregate(
            "toks",
            F.lit(0).cast("bigint"),
            lambda acc, t: F.pmod(acc * mult + th(t), p),
        )

    fp = fold(131) * F.lit(p) + fold(1031)
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "llm_pipeline_e2e",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, text, lang, source, n_chars
      FROM documents
      WHERE lang IN ('en', 'es', 'de') AND n_chars >= 80
    ), deduped AS (
      SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang, MIN(text) AS text
      FROM filtered
      GROUP BY sha256(lower(trim(text)))
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {{avg_tokens}} AS avg_tokens
    FROM deduped
    GROUP BY lang
    """.replace("{avg_tokens}",
                "FLOOR(CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(30,8))) AS DOUBLE)"
                " / COUNT(*) * 100 + 0.5) / 100"),
    section=_SEC,
)
def llm_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline slice: quality/language filter →
    exact dedup (keep lowest doc_id per normalized-text hash) → per-language
    token accounting. One declarative plan: Catalyst fuses filter into the
    scan, dedup is a hash-groupBy, accounting is a second tiny aggregate —
    the composability argument for building each stage as a DataFrame op."""
    d = table(spark, sf_dir, "documents")
    filtered = d.filter(F.col("lang").isin("en", "es", "de") & (F.col("n_chars") >= 80))
    deduped = (
        filtered.groupBy(F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("lang").alias("lang"),
            F.min("text").alias("text"),
        )
    )
    toks = F.size(F.split("text", " ")).cast(DEC)
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        dround(F.sum(toks).cast("double") / F.count(F.lit(1)), 2).alias("avg_tokens"),
    )


@register(
    "llm_pipeline_train_corpus",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, text, lang
      FROM documents
      WHERE lang IN ('en', 'es') AND n_chars BETWEEN 100 AND 500
    ), keepers AS (
      SELECT doc_id, text, lang
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text)))
                      ORDER BY doc_id) AS rn
            FROM filtered) t
      WHERE rn = 1
    ), labeled AS (
      SELECT doc_id, lang,
             CASE WHEN (doc_id * {KNUTH}) % {KNUTH_MOD} < {KNUTH_MOD} * 0.9 THEN 'train'
                  ELSE 'heldout' END AS split,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe
      FROM keepers
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS token_budget
    FROM labeled
    GROUP BY lang, split
    """,
    section=_SEC,
)
def llm_pipeline_train_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full training-corpus build as ONE declarative plan: language+length
    filter → exact dedup keeping the LOWEST doc_id (row_number over the
    normalized-text hash, not MIN-of-everything — keeps row integrity) →
    deterministic hash split → per-(lang, split) BPE token budget. The
    composability flagship: filter fuses into the scan, dedup is one
    hash-shuffle on the 32-byte text hash, the split label is pure codegen
    arithmetic (same Knuth hash as sample_systematic), and the final
    accounting shuffles only (lang, split) group states. The near-dup
    resolution stage is OFF here (pure single-plan path); the _nd twin
    turns it on."""
    return _train_corpus_plan(spark, sf_dir, near_dedup=False)


@register(
    "llm_pipeline_train_corpus_nd",
    oracle=f"""
    WITH near_dups AS (
      SELECT doc_id FROM ({_NEAR_RESOLVE_SQL}) r WHERE NOT is_keeper
    ), filtered AS (
      SELECT doc_id, text, lang
      FROM documents
      WHERE lang IN ('en', 'es') AND n_chars BETWEEN 100 AND 500
        AND doc_id NOT IN (SELECT doc_id FROM near_dups)
    ), keepers AS (
      SELECT doc_id, text, lang
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text)))
                      ORDER BY doc_id) AS rn
            FROM filtered) t
      WHERE rn = 1
    ), labeled AS (
      SELECT doc_id, lang,
             CASE WHEN (doc_id * {KNUTH}) % {KNUTH_MOD} < {KNUTH_MOD} * 0.9 THEN 'train'
                  ELSE 'heldout' END AS split,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe
      FROM keepers
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS token_budget
    FROM labeled
    GROUP BY lang, split
    """,
    section=_SEC,
)
def llm_pipeline_train_corpus_nd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-corpus build with the near-dup resolution stage ON: corpus-wide
    keeper resolution (llm_dedup_near_resolve) feeds an anti-join that drops
    every non-keeper near-duplicate BEFORE the exact-dedup/split/accounting
    plan. The anti-join side is the (small) non-keeper id set — broadcast in
    practice — so the extra stage costs one map-side filter on the corpus,
    plus the bounded label-propagation rounds over the pair graph."""
    return _train_corpus_plan(spark, sf_dir, near_dedup=True)


def _train_corpus_plan(spark: SparkSession, sf_dir: str, near_dedup: bool) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    filtered = d.filter(
        F.col("lang").isin("en", "es") & F.col("n_chars").between(100, 500)
    ).select("doc_id", "text", "lang")
    if near_dedup:
        non_keepers = (
            llm_dedup_near_resolve(spark, sf_dir)
            .filter(~F.col("is_keeper"))
            .select("doc_id")
        )
        filtered = filtered.join(F.broadcast(non_keepers), "doc_id", "left_anti")
    w = Window.partitionBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).orderBy("doc_id")
    keepers = filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    bucket = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(KNUTH_MOD)
    labeled = keepers.select(
        "doc_id",
        "lang",
        F.when(bucket < KNUTH_MOD * 0.9, "train").otherwise("heldout").alias("split"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")).alias("n_bpe"),
    )
    return labeled.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_bpe").cast("bigint")).alias("token_budget"),
    )


_NGC_TOPK = 20


@register(
    "llm_ngram_counts",
    oracle=f"""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
    ), bi AS (
      SELECT source,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    ), cnt AS (
      SELECT source, bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bi GROUP BY 1, 2
    )
    SELECT source, bigram, n
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n DESC, bigram) AS rn FROM cnt) q
    WHERE rn <= {_NGC_TOPK}
    """,
    section=_SEC,
)
def llm_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram frequency analysis: top-{K} word bigrams per source —
    the language-model-adjacent corpus report (boilerplate detection, domain
    drift, tokenizer-vocab candidates all start from this table). Plan:
    assemble bigrams per row (codegen transform over the token array),
    explode, ONE partial-agg groupBy on (source, bigram) — the map-side
    combine absorbs the explode fan-out before the shuffle — then the
    standard window top-k (WindowGroupLimit pushes the rank filter into the
    sort at scale). Deterministic ties by bigram text → full SQL oracle."""
    d = _docs_tokens(spark, sf_dir)
    bi = (
        d.filter(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], ' ', toks[i+1]))"
                )
            ).alias("bigram"),
        )
    )
    cnt = bi.groupBy("source", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _NGC_TOPK)
        .select("source", "bigram", "n")
    )


_KM_K = 8
_KM_ITERS = 4
# Widest K the literal-distance-column plan is allowed to compile. Above
# this, assignment switches to the broadcast-matrix Arrow path: a K-wide
# expression tree grows O(K x dim) literal nodes and cannot compile at the
# K ~ 1e5-1e8 a 100 TB corpus needs (VERDICT r4 "what's wrong" #3).
_KM_LITERAL_MAX = 16

# Converged centroids memoized per (app, sf_dir, k): plain Python lists
# (K x dim floats) — llm_cluster_kmeans and llm_semdedup consume one fit.
_KM_CACHE: dict[tuple[str, str, int], list] = {}


def _km_dist_cols(df: DataFrame, cents: list) -> DataFrame:
    """Append d0..d{K-1} squared-distance columns (zip_with fold, no UDF).
    Small-K only — gated by _KM_LITERAL_MAX in _km_assign."""
    cols = []
    for k, c in enumerate(cents):
        lit = F.array(*[F.lit(x) for x in c])
        cols.append(
            F.aggregate(
                F.zip_with("dvec", lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias(f"d{k}")
        )
    return df.select("vec_id", "dvec", *cols)


def _km_assign(
    emb: DataFrame,
    cents: list,
    probe2: bool = False,
    probe_n: int | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid: (vec_id, dvec) ->
    (vec_id, dvec, cluster, dmin[, cluster2]). Ties break to the lowest
    centroid index on both paths. With probe_n set, returns
    (vec_id, dvec, cells array<int>) — the top-probe_n nearest cells,
    the generalized multi-assignment the k-NN graph build replicates
    into (probe2 stays the common 2-cell fast path).

    Physical strategy by K (this is the K-ceiling lift):
    - K <= _KM_LITERAL_MAX: K literal distance columns + argmin over an
      array — pure codegen, zero Python, the fastest shape for a handful
      of centroids (IVF coarse quantizer, small semantic shards).
    - K > _KM_LITERAL_MAX: centroids ship as ONE sc.broadcast numpy matrix
      (the canonical Spark broadcast-variable pattern) and a vectorized
      scalar pandas UDF computes the full B x K distance matrix per Arrow
      batch with a single matmul, then a stable argsort for the top-2.
      Plan size is O(1) in K, per-row cost is BLAS-speed, NO join and NO
      shuffle — at K=1e5, the join-then-groupBy-argmin alternative would
      materialize N x K rows; this path never does.
    """
    k = len(cents)
    if probe_n is not None and probe_n > k:
        # a bare assert is stripped under python -O, and past the gate the
        # literal path's F.slice / the pandas path's argsort would silently
        # truncate to k cells — an under-replicated index, not an error
        # (ADVICE r12 #3)
        raise ValueError(
            f"probe_n={probe_n} exceeds centroid count k={k}"
        )
    if k <= _KM_LITERAL_MAX:
        if probe_n is not None:
            ranked = F.array_sort(
                F.array(
                    *[
                        F.struct(F.col(f"d{i}").alias("d"), F.lit(i).alias("k"))
                        for i in range(k)
                    ]
                )
            )
            return _km_dist_cols(emb, cents).select(
                "vec_id",
                "dvec",
                F.transform(
                    F.slice(ranked, 1, probe_n), lambda s: s["k"].cast("int")
                ).alias("cells"),
            )
        arr = F.array(*[F.col(f"d{i}") for i in range(k)])
        out = _km_dist_cols(emb, cents).withColumn(
            "cluster", (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        ).withColumn("dmin", F.array_min(arr))
        cols = ["vec_id", "dvec", "cluster", "dmin"]
        if probe2:
            # lexicographic struct sort = lowest-distance-then-lowest-index
            ranked = F.array_sort(
                F.array(
                    *[
                        F.struct(F.col(f"d{i}").alias("d"), F.lit(i).alias("k"))
                        for i in range(k)
                    ]
                )
            )
            out = out.withColumn("cluster2", ranked[1]["k"].cast("int"))
            cols.append("cluster2")
        return out.select(*cols)

    import numpy as np

    cmat = np.asarray(cents, dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast((cmat, (cmat * cmat).sum(axis=1)))

    if probe_n is not None:
        _pn = probe_n

        @F.pandas_udf("array<int>")
        def _assign_n(dvec: pd.Series) -> pd.Series:
            import numpy as _np
            import pandas as _pd

            cm, cn = bc.value
            x = _np.array([list(v) for v in dvec], dtype=_np.float64)
            if len(x) == 0:
                return _pd.Series([], dtype=object)
            d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cm.T) + cn[None, :]
            ordn = _np.argsort(d, axis=1, kind="stable")[:, :_pn].astype("int32")
            return _pd.Series([row.tolist() for row in ordn])

        return emb.select("vec_id", "dvec", _assign_n("dvec").alias("cells"))

    @F.pandas_udf("cluster int, dmin double, cluster2 int")
    def _assign(dvec: pd.Series) -> pd.DataFrame:
        import numpy as _np
        import pandas as _pd

        cm, cn = bc.value
        x = _np.array([list(v) for v in dvec], dtype=_np.float64)
        if len(x) == 0:
            return _pd.DataFrame({"cluster": [], "dmin": [], "cluster2": []})
        # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 — one B x K matmul per batch
        d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cm.T) + cn[None, :]
        _np.maximum(d, 0.0, out=d)
        # stable sort -> lowest-index tie-break, matching the literal path
        ord2 = _np.argsort(d, axis=1, kind="stable")[:, :2]
        rows = _np.arange(len(x))
        return _pd.DataFrame(
            {
                "cluster": ord2[:, 0].astype("int32"),
                "dmin": d[rows, ord2[:, 0]],
                "cluster2": ord2[:, 1].astype("int32"),
            }
        )

    out = emb.withColumn("_a", _assign("dvec"))
    cols = [
        "vec_id",
        "dvec",
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.dmin").alias("dmin"),
    ]
    if probe2:
        cols.append(F.col("_a.cluster2").alias("cluster2"))
    return out.select(*cols)


# Driver-side fit cap: None -> derived from the live driver heap by
# _km_fit_sample_cap (an int here overrides it — tests pin both paths).
# A 100 TB deployment inherits the cap as a FUNCTION of
# spark.driver.memory, not a constant a bigger corpus silently outgrows:
# the sampled fit pulls N x 64 float64 (512 B/vector) plus the N x K
# distance matrix temporaries (~1 KiB/vector budgeted), and the cap
# spends at most 1% of the driver heap on it (a 1 GiB driver fits ~10k
# vectors, the 128 GiB bench driver ~1M — bounded by the absolute max).
_KM_FIT_SAMPLE: int | None = None
_KM_FIT_MEM_FRAC = 0.01
_KM_FIT_BYTES_PER_VEC = 1024
_KM_FIT_SAMPLE_MAX = 1_000_000


def _km_fit_sample_cap(spark: SparkSession) -> int:
    """Max vectors the driver-side Lloyd's fit may collect: 1% of the
    JVM driver heap at ~1 KiB/vector, bounded above; overridable via
    _KM_FIT_SAMPLE for tests."""
    if _KM_FIT_SAMPLE is not None:
        return _KM_FIT_SAMPLE
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    return min(
        _KM_FIT_SAMPLE_MAX,
        int(heap * _KM_FIT_MEM_FRAC) // _KM_FIT_BYTES_PER_VEC,
    )


def _kmeans_fit(spark: SparkSession, sf_dir: str, k: int | None = None) -> list:
    """Run Lloyd's to _KM_ITERS and return the K x dim centroid list
    (deterministic: seeded from the K lowest vec_ids, lowest-index
    tie-breaks). K defaults to _KM_K; any K works — assignment picks the
    literal-codegen or broadcast-Arrow strategy per _km_assign.

    Fit strategy by N (mirrors _km_assign's dual physical path; the
    threshold is _km_fit_sample_cap — 1% of the live driver heap, so a
    bigger corpus on a small driver falls through to the distributed
    branch instead of OOMing the collect):
    - N <= cap: collect the vectors ONCE and run Lloyd's in
      numpy on the driver. Same algorithm (argmin squared distance,
      lowest-index ties, empty clusters keep their centroid), but the
      4-iteration loop costs matrix ops instead of 4 multi-stage Spark
      jobs — at fixture scale that was ~6 s of pure job-scheduling
      overhead for 2,000 rows. This is also the 100 TB design: a coarse
      quantizer is trained on a BOUNDED sample (how FAISS trains IVF
      centroids), never on the full corpus. Float summation ORDER
      differs from the distributed path (numpy pairwise vs fold/F.avg),
      so a vector ulp-equidistant from two centroids could assign
      differently across paths; the test pinning both paths equal
      certifies the fixture, not bit-identity on arbitrary data.
    - N > cap: distributed Lloyd's — assignment via
      _km_assign, per-dim mean via posexplode + two-level agg (partial
      map-side combine, K x dim rows on the wire), K x dim driver state.
    See llm_cluster_kmeans for the distributed-shape notes."""
    k = _KM_K if k is None else k
    key = (spark.sparkContext.applicationId, sf_dir, k)
    if key in _KM_CACHE:
        return _KM_CACHE[key]
    # _emb_normed is a memoized cached frame, so each of the fit jobs
    # re-reads the materialized cache, not the parquet+normalize lineage
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec")
    n = emb.count()
    if n <= _km_fit_sample_cap(spark):
        import numpy as np

        mat = np.array(
            [r["dvec"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
        )
        cmat = mat[:k].copy()
        for _ in range(_KM_ITERS):
            # N x K squared distances via |x|^2 - 2 x.c + |c|^2 (one
            # matmul; an (N, K, dim) difference tensor would be ~400 MB
            # at the sample cap). argmin takes the FIRST minimum =
            # lowest centroid index, matching _km_assign's tie rule
            d = (
                (mat * mat).sum(axis=1, keepdims=True)
                - 2.0 * (mat @ cmat.T)
                + (cmat * cmat).sum(axis=1)[None, :]
            )
            assign = d.argmin(axis=1)
            for c in range(len(cmat)):
                members = mat[assign == c]
                if len(members):
                    cmat[c] = members.mean(axis=0)
        cents = [row.tolist() for row in cmat]
    else:
        cents = [
            r["dvec"]
            for r in emb.orderBy("vec_id").limit(k).select("dvec").collect()
        ]
        for _ in range(_KM_ITERS):
            assigned = _km_assign(emb, cents)
            upd = (
                assigned.select("cluster", F.posexplode("dvec").alias("dim", "x"))
                .groupBy("cluster", "dim")
                .agg(F.avg("x").alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
                )
                .select("cluster", F.col("dm.m").alias("cent"))
                .collect()
            )
            # empty clusters keep their previous centroid (standard Lloyd's)
            for r in upd:
                cents[r["cluster"]] = r["cent"]
    _KM_CACHE[key] = cents
    return cents


@register("llm_cluster_kmeans", oracle=None, section=_SEC)
def llm_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the corpus
    partitioner behind semantic sharding, IVF coarse quantizers, and
    diversity-balanced sampling. Classic Spark shape: centroids live on the
    driver as K x dim literals (KBs — constant-folded into codegen, the
    broadcast-variable pattern without the RDD API); assignment is a
    per-row argmin over K squared distances (zip_with fold, no UDF); the
    update step is ONE narrow shuffle per iteration (posexplode to
    (cluster, dim) pairs -> partial-agg avg -> K x dim rows collected).
    Fixed _KM_ITERS iterations, deterministic seed (lowest vec_ids) and
    lowest-index tie-breaks -> bit-stable output across runs/partitionings.
    At 100 TB: per-iteration cost is one map over the corpus + a K*dim-card
    aggregate (map-side combine collapses it); K and dim bound driver state,
    corpus size never does. K is parameterized: small K compiles to literal
    distance columns, large K (> _KM_LITERAL_MAX) assigns via a broadcast
    numpy centroid matrix + Arrow-batched matmul (see _km_assign) — the
    documented "raise K at 100 TB" path is executable, not aspirational.
    rows-only oracle (iterative refinement is not SQL-expressible sanely);
    tests pin determinism, argmin consistency, and the K=64 Arrow path."""
    cents = _kmeans_fit(spark, sf_dir)
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec")
    out = _km_assign(emb, cents)
    return out.select(
        "vec_id", "cluster", dround(F.sqrt(F.col("dmin")), 4).alias("dist_to_centroid")
    )


_HIST_BUCKET_W = 100


@register(
    "llm_doc_len_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(n_chars / {_HIST_BUCKET_W}) * {_HIST_BUCKET_W} AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           FLOOR(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)
                 * 100 + 0.5) / 100 AS avg_tokens
    FROM documents
    GROUP BY 1
    """,
    section=_SEC,
)
def llm_doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document length distribution — the first diagnostic plot of any
    corpus audit (truncation cliffs, boilerplate spikes, and tokenizer
    budget planning all read off it). Fixed-width buckets via pure integer
    arithmetic (portable to any engine, unlike engine-specific
    width_bucket): one partial-agg groupBy on the bucket id, so the shuffle
    carries at most n_buckets rows per task regardless of corpus size."""
    d = _docs_tokens(spark, sf_dir)
    bucket = (F.floor(F.col("n_chars") / _HIST_BUCKET_W) * _HIST_BUCKET_W).cast("bigint")
    return (
        d.select(bucket.alias("bucket_lo"), F.size("toks").alias("n_toks"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            dround(F.sum("n_toks").cast("double") / F.count("*"), 2).alias("avg_tokens"),
        )
    )


@register(
    "llm_dedup_softnorm",
    oracle="""
    SELECT sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                      ' +', ' ', 'g'))) AS norm_hash,
           MIN(doc_id) AS keeper_doc,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    section=_SEC,
)
def llm_dedup_softnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup (the C4/RefinedWeb recipe): lower,
    strip punctuation, collapse whitespace, THEN hash — catches the
    re-crawls that differ only in casing/markup debris, which byte-exact
    dedup (llm_dedup_exact) misses. Same scale shape as exact dedup: the
    normalization is per-row codegen, only the 32-byte hash + doc_id
    shuffle to the groupBy — document text never moves."""
    d = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        d.select(F.sha2(norm, 256).alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keeper_doc"), F.count("*").alias("n_copies"))
    )


_PREFIX_TOKENS = 20


@register(
    "llm_dedup_prefix",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             sha256(array_to_string(list_slice(string_split(text, ' '), 1, {_PREFIX_TOKENS}), ' '))
               AS prefix_hash
      FROM documents
    )
    SELECT prefix_hash, MIN(doc_id) AS keeper_doc, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM p
    GROUP BY prefix_hash
    HAVING COUNT(*) > 1
    """,
    section=_SEC,
)
def llm_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix dedup: documents sharing their first N tokens (truncated
    re-crawls, paginated copies, and templated intros collapse onto one
    prefix even when tails diverge — a standard web-corpus pass between
    exact and near dedup). Hash of the 20-token prefix is the group key;
    only clusters with >1 member survive. Shuffle carries (hash, doc_id)
    pairs — at 100 TB the prefix slice itself stays map-side."""
    d = table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split("text", " "), 1, _PREFIX_TOKENS), " ")
    return (
        d.select(F.sha2(prefix, 256).alias("prefix_hash"), "doc_id")
        .groupBy("prefix_hash")
        .agg(F.min("doc_id").alias("keeper_doc"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "llm_hard_negatives",
    oracle="""
    WITH scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id,
             FLOOR(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(CAST(c.embedding AS DOUBLE[]), x -> x * x))))
                   * 10000 + 0.5) / 10000 AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.label <> c.label
      WHERE q.vec_id <= 10
    )
    SELECT query_id, query_label, negative_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, negative_id) AS rn
          FROM scored) t
    WHERE rn <= 5
    """,
    section=_SEC,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k=5 OTHER-labelled vectors most similar to it — the
    negatives a contrastive loss learns the most from (near-duplicates of
    the query that must nevertheless be pushed apart). Same brute-force
    plan family as llm_sim_search (queries broadcast, candidates never
    shuffle, per-query top-k via row_number on rounded sim) with the
    label-inequality predicate replacing self-exclusion.

    100 TB path: swap the broadcast-vs-all scoring for the IVF cell join
    (llm_sim_search_ivf) and apply the label filter AFTER cell probing —
    mining cost then scales with nprobe/K of the corpus per query, and
    the per-query top-k is still one partial-agg exchange."""
    emb = _emb_normed(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") <= 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        F.col("dvec").alias("cv"),
        F.col("norm").alias("cn"),
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        q.join(c, F.col("query_label") != F.col("neg_label"))
        .withColumn("cos_sim", dround(dot / (F.col("qn") * F.col("cn")), 4))
        .select("query_id", "query_label", "negative_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("negative_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")
    )


@register(
    "llm_curriculum_order",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL}),
    phased AS (
      SELECT doc_id, quality,
             CAST(NTILE(4) OVER (ORDER BY quality, doc_id) AS INTEGER) AS phase
      FROM q
    )
    SELECT doc_id, quality, phase,
           CAST(ROW_NUMBER() OVER (
                 PARTITION BY phase
                 ORDER BY (doc_id * {KNUTH}) % {KNUTH_MOD}, doc_id
               ) AS INTEGER) AS position
    FROM phased
    """,
    section=_SEC,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: documents bucketed into 4
    quality phases (easy/clean last — phases ascend by the shared
    _quality_expr score) with a DETERMINISTIC within-phase shuffle. The
    shuffle is the Knuth multiplicative hash of doc_id, not rand(): the
    same doc gets the same position on every run, engine, and
    partitioning — the reproducibility contract a 100 TB curriculum
    build needs (a backfill must not reorder an epoch already served).

    Scale note: the global NTILE is a single-partition sort over one
    (score, id) pair per doc — fine for metadata-sized inputs; at true
    corpus scale swap it for fixed quality thresholds (pure codegen
    filter, zero exchanges) and keep the same hash positions, which are
    embarrassingly parallel per phase."""
    d = _docs_tokens(spark, sf_dir)
    q = d.select("doc_id", _quality_expr().alias("quality"))
    w_phase = Window.orderBy(F.col("quality"), F.col("doc_id"))
    hash_pos = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(KNUTH_MOD)
    q = q.withColumn("phase", F.ntile(4).over(w_phase))
    w_pos = Window.partitionBy("phase").orderBy(hash_pos, F.col("doc_id"))
    return q.select(
        "doc_id",
        "quality",
        "phase",
        F.row_number().over(w_pos).alias("position"),
    )


@register("llm_ann_recall_eval", oracle=None, section=_SEC)
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@5 of each approximate index (IVF-Flat,
    multi-probe hyperplane LSH, PQ+ADC, IVF-PQ, NSW beam search) against
    the exact brute-force top-5, per
    query, plus the macro average — the monitor a production vector
    platform runs after every index rebuild ('did the ANN quality
    regress?'), shipped as a first-class operator instead of a test-only
    assertion.

    Composes the five registry index operators (no reimplementation can
    drift);
    the comparison is a (query_id, neighbor_id) semi-join + per-query
    count — metadata-sized regardless of corpus scale, since every input
    is already a top-k. rows-only oracle (the IVF/LSH results are Spark
    plans DuckDB cannot replay); tests pin recall bounds and method
    coverage."""
    exact = llm_sim_search(spark, sf_dir).select("query_id", "neighbor_id")
    k = 5

    def recall_of(method: str, df: DataFrame) -> DataFrame:
        hit = exact.join(
            df.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "semi"
        )
        return (
            exact.select("query_id")
            .distinct()
            .join(
                hit.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                F.lit(method).alias("method"),
                "query_id",
                dround(
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / k, 4
                ).alias("recall_at_5"),
            )
        )

    per_q = (
        recall_of("ivf", llm_sim_search_ivf(spark, sf_dir))
        .unionAll(recall_of("ivfpq", llm_sim_search_ivfpq(spark, sf_dir)))
        .unionAll(recall_of("lsh", llm_sim_search_lsh(spark, sf_dir)))
        .unionAll(recall_of("pq", llm_sim_search_pq(spark, sf_dir)))
        .unionAll(recall_of("nsw", llm_sim_search_nsw(spark, sf_dir)))
    )
    macro = per_q.groupBy("method").agg(
        # query_id -1 = the macro-average row (real vec_ids start at 0)
        F.lit(-1).cast("bigint").alias("query_id"),
        dround(F.avg("recall_at_5"), 4).alias("recall_at_5"),
    ).select("method", "query_id", "recall_at_5")
    return per_q.unionAll(macro).orderBy("method", "query_id")


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half): 64 dims -> 8 subspaces
# x 4-bit codes. The third ANN path beside IVF-Flat (cell pruning) and
# hyperplane LSH (bucket hashing): PQ attacks MEMORY — 64 float32 dims
# (256 B) compress to 8 codes (8 B, 32x), so a 100 TB embedding corpus's
# index fits executor RAM and distance evaluation becomes 8 table lookups
# (ADC; Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011).
# ---------------------------------------------------------------------------

_PQ_M = 8      # subspaces
_PQ_DSUB = 8   # dims per subspace (8 x 8 = 64)
_PQ_KS = 16    # centroids per subspace -> 4-bit codes
_PQ_POOL = 100  # ADC candidate pool per query before exact rescore
_PQ_CACHE: dict[tuple[str, str], list] = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    """Per-subspace K=16 codebooks fit by the SAME driver-side Lloyd's as
    _kmeans_fit's sampled branch (seeds = the K lowest vec_ids' subvectors,
    argmin with lowest-index ties, empty clusters keep their centroid, 4
    iterations) over L2-NORMALIZED vectors, so ADC's squared-L2 ranking is
    monotone in cosine (|a-b|^2 = 2 - 2 cos on the unit sphere). The fit
    sample is bounded by _km_fit_sample_cap (1% of driver heap) — PQ
    codebooks, like IVF coarse quantizers, are trained on a bounded sample
    by design (how FAISS does it); encoding below is distributed."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PQ_CACHE:
        return _PQ_CACHE[key]
    emb = _emb_normed(spark, sf_dir)
    cap = _km_fit_sample_cap(spark)
    rows = (
        emb.select("vec_id", "dvec", "norm").orderBy("vec_id").limit(cap).collect()
    )
    mat = np.array([r["dvec"] for r in rows], dtype=np.float64)
    mat /= np.array([r["norm"] for r in rows], dtype=np.float64)[:, None]
    books = []
    for m in range(_PQ_M):
        sub = mat[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
        cmat = sub[:_PQ_KS].copy()
        for _ in range(_KM_ITERS):
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cmat.T)
                + (cmat * cmat).sum(axis=1)[None, :]
            )
            assign = d.argmin(axis=1)
            for c in range(len(cmat)):
                members = sub[assign == c]
                if len(members):
                    cmat[c] = members.mean(axis=0)
        books.append([row.tolist() for row in cmat])
    _PQ_CACHE[key] = books
    return books


def _pq_encode_udf(spark: SparkSession, books: list):
    """Arrow-batched PQ encoder: (dvec, norm) -> 8 subspace code ints,
    codebooks shipped once as a broadcast variable, numpy matmul per
    batch (the _km_assign K>16 strategy — a codegen unroll would be 128
    fold expressions and risk the interpreted-fallback cliff SCALING.md
    documents). Shared by the PQ and IVF-PQ index builds."""
    import numpy as np

    bc = spark.sparkContext.broadcast(
        [np.asarray(b, dtype=np.float64) for b in books]
    )
    m_sub, d_sub = _PQ_M, _PQ_DSUB

    @F.pandas_udf("array<int>")
    def _encode(dvec: pd.Series, norm: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        cbs = bc.value
        x = _np.array([list(v) for v in dvec], dtype=_np.float64)
        if len(x) == 0:
            return _pd.Series([], dtype=object)
        x /= _np.asarray(norm, dtype=_np.float64)[:, None]
        codes = _np.empty((len(x), m_sub), dtype=_np.int32)
        for m in range(m_sub):
            sub = x[:, m * d_sub : (m + 1) * d_sub]
            cm = cbs[m]
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cm.T)
                + (cm * cm).sum(axis=1)[None, :]
            )
            codes[:, m] = d.argmin(axis=1)
        return _pd.Series([c.tolist() for c in codes])

    return _encode


def _pq_query_luts(spark: SparkSession, emb: DataFrame, books: list) -> DataFrame:
    """Driver-side ADC tables for the bounded query set (10 x 8 x 16
    doubles each), shipped as one broadcast-able literal frame. Shared
    by the PQ and IVF-PQ search paths."""
    import numpy as np

    qrows = (
        emb.filter(F.col("vec_id") <= 10)
        .select("vec_id", "dvec", "norm")
        .collect()
    )
    lut_rows = []
    for r in qrows:
        qv = np.array(r["dvec"], dtype=np.float64) / r["norm"]
        flat = []
        for m in range(_PQ_M):
            qs = qv[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            cm = np.asarray(books[m])
            flat.extend(((cm - qs[None, :]) ** 2).sum(axis=1).tolist())
        lut_rows.append((r["vec_id"], flat))
    return spark.createDataFrame(lut_rows, "query_id long, lut array<double>")


@register("llm_sim_search_pq", oracle=None, section=_SEC)
def llm_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: encode every (normalized) corpus vector as 8
    4-bit codes, rank candidates per query by ADC (asymmetric distance —
    the query stays exact; each corpus vector's distance is the sum of 8
    precomputed subspace-table lookups), take the top-100 pool, then
    exact-rescore the pool and emit the brute-force-comparable top-5
    (query_id, neighbor_id, cos_sim).

    Scale plan: encoding is ONE Arrow-batched pandas UDF pass with the
    8 x 16 codebooks in a broadcast variable (numpy matmul per batch —
    the _km_assign K>16 strategy; a codegen unroll would be 128 fold
    expressions and risk the interpreted-fallback cliff SCALING.md
    documents). The 10 queries' 8x16 ADC tables are computed driver-side
    (130 doubles each) and ship as one broadcast literal frame; ADC
    evaluation is a pure codegen fold over the code array — the corpus
    never shuffles and only (query, id, adc) pool rows move. Exact
    rescore touches pool ids only (the IVF idiom). rows-only oracle
    (k-means codebooks are not SQL-replayable); pytest pins recall@5
    against the exact baseline and the 32x compression arithmetic;
    `llm_ann_recall_eval` tracks the same recall per round in
    BENCH_DETAIL."""
    books = _pq_codebooks(spark, sf_dir)
    emb = _emb_normed(spark, sf_dir)
    m_sub = _PQ_M
    coded = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _pq_encode_udf(spark, books)("dvec", "norm").alias("codes"),
    )
    luts = _pq_query_luts(spark, emb, books)

    adc = F.expr(
        f"aggregate(sequence(0, {m_sub - 1}), cast(0.0 as double),"
        f" (a, m) -> a + element_at(lut, m * {_PQ_KS}"
        f" + element_at(codes, m + 1) + 1))"
    )
    # rerank pool scales with the corpus (20%, floor _PQ_POOL) — the
    # r13 alignment with IVF-PQ's measured doctrine: a FIXED pool
    # shrinks relative to the ADC-scanned corpus as it grows, and 4-bit
    # quantization noise squeezes true neighbors below the cut before
    # the exact rescore can save them (sf0.1 recall@5: 0.709 fixed-100
    # -> 0.927 scaled). The rescore stays O(pool) per query — trivial
    # beside the full-corpus ADC scan this family already pays.
    pool_n = max(_PQ_POOL, emb.count() // 5)
    pool_w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    pool = (
        coded.join(F.broadcast(luts), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc)
        .withColumn("rn", F.row_number().over(pool_w))
        .filter(F.col("rn") <= pool_n)
        .select("query_id", "neighbor_id")
    )
    # exact rescore of the pool only (the IVF idiom)
    cand = pool.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("dvec").alias("cv"),
            F.col("norm").alias("cn"),
        ),
        "neighbor_id",
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") <= 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = cand.join(q, "query_id").withColumn(
        "cos_sim", F.round(dot / (F.col("qn") * F.col("cn")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


# The composed index probes DEEPER than IVF-flat (5 of 8 cells vs 2):
# compressed candidates are ~32x cheaper to rank, so production IVF-PQ
# spends the saved I/O on nprobe.
_IVFPQ_NPROBE = 5
# Boundary replication (SPANN, Chen et al. NeurIPS 2021 — "closure
# assignment"): each corpus vector is indexed in its NASSIGN nearest
# cells, not just one. Balanced trained cells make single-assignment
# recall track the probed corpus share (a boundary vector's true
# neighbors straddle the cell edge); the measured sf0.1 ladder at
# recall@5 is 0.764 (trained, 1-assign, nprobe 4) -> 0.909 (2-assign)
# -> 0.945 (2-assign, nprobe 5), vs 0.891 for the untrained r10 build.
# Replication costs 2x index size — but the index is PQ codes, so it is
# still 16x smaller than raw vectors.
_IVFPQ_NASSIGN = 2
_IVFPQ_CACHE: dict[tuple[str, str], tuple] = {}


def _ivfpq_model(spark: SparkSession, sf_dir: str) -> tuple:
    """(centroids, residual codebooks) for the composed index — the
    production IVF-PQ refinement: codebooks are trained on RESIDUALS
    v - centroid(v), which are smaller and more isotropic than raw
    vectors, so the same 8x4-bit budget quantizes them with less error
    (Jegou et al. 2011 §V.A). Same bounded driver-side fit as
    _pq_codebooks (sample cap, deterministic seeds, lowest-index ties,
    4 Lloyd iterations). The coarse quantizer is spherical k-means
    (Lloyd on the unit sphere: assign by dot product, re-mean,
    renormalize) seeded from the first _IVF_K normalized vectors —
    trained centroids balance the inverted lists, which caps the skew a
    single hot cell can put on one executor and makes the probed-share
    math uniform; the recall lift comes from composing this with
    boundary replication and nprobe 5 (see _IVFPQ_NASSIGN — measured
    sf0.1 recall@5 0.891 -> 0.945)."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _IVFPQ_CACHE:
        return _IVFPQ_CACHE[key]
    emb = _emb_normed(spark, sf_dir)
    cap = _km_fit_sample_cap(spark)
    rows = (
        emb.select("vec_id", "dvec", "norm").orderBy("vec_id").limit(cap).collect()
    )
    mat = np.array([r["dvec"] for r in rows], dtype=np.float64)
    mat /= np.array([r["norm"] for r in rows], dtype=np.float64)[:, None]
    cmat = mat[:_IVF_K].copy()
    for _ in range(_KM_ITERS):
        assign = (mat @ cmat.T).argmax(axis=1)
        for c in range(_IVF_K):
            members = mat[assign == c]
            if len(members):
                mu = members.mean(axis=0)
                nrm = np.sqrt((mu * mu).sum())
                if nrm > 0:
                    cmat[c] = mu / nrm
    assign = (mat @ cmat.T).argmax(axis=1)
    resid = mat - cmat[assign]
    books = []
    for m in range(_PQ_M):
        sub = resid[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
        cb = sub[:_PQ_KS].copy()
        for _ in range(_KM_ITERS):
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cb.T)
                + (cb * cb).sum(axis=1)[None, :]
            )
            a = d.argmin(axis=1)
            for c in range(len(cb)):
                members = sub[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    _IVFPQ_CACHE[key] = (cmat, books)
    return _IVFPQ_CACHE[key]


def _ivfpq_encode_udf(spark: SparkSession, cmat, books):
    """Residual PQ encoder: (dvec, norm, cell) -> 8 code ints over
    v/||v|| - centroid[cell]. One Arrow pass, centroids + codebooks in a
    broadcast variable."""
    import numpy as np

    bc = spark.sparkContext.broadcast(
        (np.asarray(cmat, dtype=np.float64),
         [np.asarray(b, dtype=np.float64) for b in books])
    )
    m_sub, d_sub = _PQ_M, _PQ_DSUB

    @F.pandas_udf("array<int>")
    def _encode(dvec: pd.Series, norm: pd.Series, cell: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        cm, cbs = bc.value
        x = _np.array([list(v) for v in dvec], dtype=_np.float64)
        if len(x) == 0:
            return _pd.Series([], dtype=object)
        x /= _np.asarray(norm, dtype=_np.float64)[:, None]
        x -= cm[_np.asarray(cell, dtype=_np.int64)]
        codes = _np.empty((len(x), m_sub), dtype=_np.int32)
        for m in range(m_sub):
            sub = x[:, m * d_sub : (m + 1) * d_sub]
            cb = cbs[m]
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cb.T)
                + (cb * cb).sum(axis=1)[None, :]
            )
            codes[:, m] = d.argmin(axis=1)
        return _pd.Series([c.tolist() for c in codes])

    return _encode


@register("llm_sim_search_ivfpq", oracle=None, section=_SEC)
def llm_sim_search_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN index — the billion-vector production shape
    (FAISS IVFxxx,PQyy; Jegou et al. 2011 §V): the IVF coarse quantizer
    prunes the search to nprobe cells, PQ/ADC ranks ONLY the vectors in
    probed cells from their 8-byte codes, and the pooled top-100 gets an
    exact rescore. The two halves already exist separately
    (`llm_sim_search_ivf` = cell pruning with exact rescoring of every
    cell member; `llm_sim_search_pq` = ADC over the ENTIRE corpus);
    composing them is what makes 100 TB work: per query the engine
    touches nprobe/K of the corpus AND reads 32x-compressed codes
    instead of raw vectors — neither half alone bounds both I/O and
    candidate count. Compressed candidates being ~32x cheaper, the
    composed index probes DEEPER (nprobe 5 vs IVF-flat's 2) and still
    reads less raw I/O. Recall stays bounded by probed-cell coverage
    (a full-corpus ADC scan like `llm_sim_search_pq` is not the fair
    bar for a pruned index), so three production refinements that
    raise that coverage are replayed here: the coarse quantizer is
    spherical k-means (trained, balanced inverted lists); each corpus
    vector is REPLICATED into its 2 nearest cells (SPANN-style
    boundary replication, see _IVFPQ_NASSIGN); and codes are PER-CELL
    RESIDUALS v/||v|| - centroid(v) — smaller, more isotropic vectors
    the same 8x4-bit budget quantizes with less error, ranked via
    per-(query, cell) ADC tables. Measured recall@5 at sf0.1: 0.945
    vs IVF-flat's 0.891 and the r10 untrained single-assign 0.891.

    Plan: centroid assignment is the IVF key's zero-shuffle codegen
    argmax (K literal similarity structs, array_sort); encoding is ONE
    Arrow pass with broadcast centroids + codebooks; probes x cells
    is a broadcast equi-join on the cell id; ADC is a pure codegen fold
    over per-(query, cell) lookup tables; only (query, id, adc) pool
    rows ever move, and the exact rescore joins just the pooled ids
    back to raw vectors. rows-only oracle (k-means codebooks are not
    SQL-replayable); recall@5 is pinned in pytest and tracked per-round
    beside ivf/lsh/pq in BENCH_DETAIL via `llm_ann_recall_eval`."""
    import numpy as np

    cmat, books = _ivfpq_model(spark, sf_dir)
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    sims = []
    for k, cv in enumerate(cmat):
        cvec = F.array(*[F.lit(float(x)) for x in cv])
        cdot = F.aggregate(
            F.zip_with("dvec", cvec, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        # trained centroids are unit-norm by construction, so cosine
        # needs only the row norm
        sim = cdot / F.col("norm")
        sims.append(F.struct((-sim).alias("negsim"), F.lit(int(k)).alias("k")))
    ranked = F.array_sort(F.array(*sims))
    assigned = emb.withColumn("ranked", ranked)
    # inverted lists: cell id + 8x4-bit codes per corpus vector — the
    # compressed index a 100 TB deployment holds in executor RAM. Each
    # vector is replicated into its _IVFPQ_NASSIGN nearest cells
    # (boundary replication); residual codes are encoded PER CELL, so
    # the two copies carry different codes against their own centroids.
    coded = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.transform(
                F.slice("ranked", 1, _IVFPQ_NASSIGN), lambda s: s["k"]
            )
        ).alias("cell"),
        "dvec",
        "norm",
    ).select(
        "neighbor_id",
        "cell",
        _ivfpq_encode_udf(spark, cmat, books)("dvec", "norm", "cell").alias(
            "codes"
        ),
    )
    probes = (
        assigned.filter(F.col("vec_id") <= 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.transform(F.slice("ranked", 1, _IVFPQ_NPROBE), lambda s: s["k"])
            ).alias("cell"),
        )
    )
    # per-(query, cell) ADC tables: the residual LUT depends on BOTH the
    # query and the probed cell (||(q - c)_sub - codeword||^2) — 11
    # queries x 8 cells x 128 doubles, one broadcast-able literal frame
    qrows = (
        emb.filter(F.col("vec_id") <= 10)
        .select("vec_id", "dvec", "norm")
        .collect()
    )
    lut_rows = []
    for r in qrows:
        qv = np.array(r["dvec"], dtype=np.float64) / r["norm"]
        for cell in range(_IVF_K):
            qr = qv - cmat[cell]
            flat = []
            for m in range(_PQ_M):
                qs = qr[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
                cb = np.asarray(books[m])
                flat.extend(((cb - qs[None, :]) ** 2).sum(axis=1).tolist())
            lut_rows.append((r["vec_id"], cell, flat))
    luts = spark.createDataFrame(
        lut_rows, "query_id long, cell int, lut array<double>"
    )
    adc = F.expr(
        f"aggregate(sequence(0, {_PQ_M - 1}), cast(0.0 as double),"
        f" (a, m) -> a + element_at(lut, m * {_PQ_KS}"
        f" + element_at(codes, m + 1) + 1))"
    )
    # the rerank pool scales with the corpus (20% of it, floor 100): a
    # FIXED pool shrinks relative to the probed candidates as the corpus
    # grows, and ADC quantization noise then squeezes true neighbors out
    # before the exact rescore can save them (measured at sf0.1:
    # fixed-100 pool recall 0.745 < IVF-flat's 0.891; the scaled pool
    # keeps the composed index at/above IVF-flat at every sf —
    # 0.85/0.84/0.89 vs 0.84/0.75/0.89). Production FAISS exposes exactly this as
    # the reranking budget; at billion scale it is set absolute (e.g.
    # 10-100k), far below 20%, because nprobe/K already bounds the
    # candidate share.
    pool_n = max(_PQ_POOL, emb.count() // 5)
    pool_w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    pool = (
        F.broadcast(probes)
        .join(coded, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(luts), ["query_id", "cell"])
        .withColumn("adc", adc)
        # boundary replication can surface the same (query, neighbor)
        # from both of the neighbor's cells with two different residual
        # ADCs — keep the tighter one deterministically (min), then
        # rank. The explicit repartition(query_id) makes ONE exchange
        # serve both steps: HashPartitioning(query_id) satisfies the
        # groupBy's ClusteredDistribution(query_id, neighbor_id) AND
        # the window's ClusteredDistribution(query_id); a bare groupBy
        # would hash on (query_id, neighbor_id) and force a second
        # exchange for the window.
        .repartition("query_id")
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("adc").alias("adc"))
        .withColumn("rn", F.row_number().over(pool_w))
        .filter(F.col("rn") <= pool_n)
        .select("query_id", "neighbor_id")
    )
    cand = pool.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("dvec").alias("cv"),
            F.col("norm").alias("cn"),
        ),
        "neighbor_id",
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") <= 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = cand.join(q, "query_id").withColumn(
        "cos_sim", F.round(dot / (F.col("qn") * F.col("cn")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Graph-based ANN (NSW beam search) — the fourth index family beside
# cell-pruning (IVF), bucket-hashing (LSH), and compression (PQ)
# ---------------------------------------------------------------------------

_NSW_K = 8      # out-degree of the neighbor graph
_NSW_BEAM = 16   # beam width per query
_NSW_ROUNDS = 3  # EXPANSION rounds after the r14 round-0 entry prune
# (score all K ~ sqrt(N) per-cell entries, keep the beam, THEN expand):
# the pruned start sits 1-2 hops from the true top-5 on the NNDescent-
# refined graph, so the measured recall@5 ladder is 1.0 at TWO rounds
# on every fixture (sf0.001/0.01/0.1, the 90%-dup 10x AND the 90%-dup
# 100x); 3 keeps one round of slack above the knee. Each round is a
# blocking checkpoint + 3 joins — the dominant cost of the corpus-size-
# independent serve wall — so round-0 + 3 expansions matches the r13
# job count (4 rounds) while covering more graph per job.
_KNNG_IVF_NASSIGN = 3  # cells each vector lands in (boundary replication)
_KNNG_REFINE_ROUNDS = 2   # NNDescent rounds over the cell-built edges
_KNNG_REFINE_DEGREE = 16  # intermediate out-degree during build+refine
# (VERDICT r12 next-round #3: at the final degree 8 the 2-hop frontier
# saturates at edge recall ~0.69 on the near-uniform sf0.1 sphere — too
# few hub paths in high intrinsic dimension; building and refining at
# degree 16 and truncating to 8 at the end measures 0.60 -> 0.75 -> 0.83
# over the two rounds, and each round stays O(N * (2*16)^2) = linear)

# Spherical-k-means cell centroids memoized per (app, sf_dir, k): unit-norm
# K x dim float lists — the parametric-K sibling of _ivfpq_model's coarse
# quantizer (that one is pinned at _IVF_K and carries PQ codebooks).
_SPH_CACHE: dict[tuple[str, str, int], list] = {}


def _spherical_cells(spark: SparkSession, sf_dir: str, k: int) -> list:
    """Unit-norm spherical-k-means centroids (Lloyd on the sphere:
    assign by dot product, re-mean, renormalize; deterministic lowest-
    vec_id seeds, _KM_ITERS rounds, same bounded sample cap as every
    other fit). Cosine neighborhoods are what the k-NN graph needs, so
    its cells must partition DIRECTIONS, not raw magnitudes — the
    fixture embeddings are near-uniform on the sphere (the hard case:
    every cell-pruning family's recall there is coverage-bound, which
    is why the build replicates into 3 cells rather than 2)."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir, k)
    if key in _SPH_CACHE:
        return _SPH_CACHE[key]
    emb = _emb_normed(spark, sf_dir)
    cap = _km_fit_sample_cap(spark)
    rows = (
        emb.select("vec_id", "dvec", "norm").orderBy("vec_id").limit(cap).collect()
    )
    mat = np.array([r["dvec"] for r in rows], dtype=np.float64)
    mat /= np.array([r["norm"] for r in rows], dtype=np.float64)[:, None]
    # k has a floor of 8 at every call site, but the collected sample can
    # be smaller (a tiny corpus, or a pinned _km_fit_sample_cap): seeding
    # takes mat[:k] so cmat would hold < k rows and cmat[c] below would
    # raise IndexError (ADVICE r12 #1) — clamp to the sample
    k = min(k, len(mat))
    cmat = mat[:k].copy()
    for _ in range(_KM_ITERS):
        assign = (mat @ cmat.T).argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                mu = members.mean(axis=0)
                nrm = np.sqrt((mu * mu).sum())
                if nrm > 0:
                    cmat[c] = mu / nrm
    _SPH_CACHE[key] = [row.tolist() for row in cmat]
    return _SPH_CACHE[key]


def _knng_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dvec=UNIT vector, cells=top-_KNNG_IVF_NASSIGN cell ids)
    for the graph build and its search-entry map. Assignment runs on
    unit vectors against unit centroids: Euclidean argmin == cosine
    argmax there (|x-c|^2 = 2 - 2 x.c), so _km_assign's two physical
    paths (literal codegen / broadcast matmul) serve the spherical
    quantizer unchanged. K ~ sqrt(N), floor 8 / cap 256.

    Memoized per (app, sf_dir) as an eager localCheckpoint (r14,
    guide §1.2): the assignment is an ArrowEvalPython subtree (broadcast
    matmul in a pandas UDF), and every UNCACHED reference re-paid the
    Python-boundary evaluation — twice per _cell_topk_edges call (src
    AND dst of the per-cell self-join), again in _nsw_entries, again in
    the index persist. Bounded state: N x (dvec + NASSIGN ints) narrow
    rows, same discipline as _VEC_GROUPS_CACHE; evicted by
    ann_index_build(force=True) alongside the other component memos. The
    key carries the embeddings file's fingerprint so an in-place rewrite
    of the same path retires the checkpointed assignment."""
    from sdp_spark.sources.fixtures import table_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        table_fingerprint(sf_dir, "embeddings"),
    )
    if key in _KNNG_ASSIGNED_CACHE:
        return _KNNG_ASSIGNED_CACHE[key]
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    n = _emb_count(spark, sf_dir)
    k_cells = max(8, min(256, int(n ** 0.5)))
    cents = _spherical_cells(spark, sf_dir, k_cells)
    unit = F.transform("dvec", lambda x: x / F.col("norm"))
    _KNNG_ASSIGNED_CACHE[key] = _km_assign(
        emb.select("vec_id", unit.alias("dvec")),
        cents,
        # the fit clamps k to its sample (ADVICE r12 #1), so a tiny
        # corpus can return fewer than NASSIGN centroids
        probe_n=min(_KNNG_IVF_NASSIGN, len(cents)),
    ).localCheckpoint(eager=True)
    return _KNNG_ASSIGNED_CACHE[key]


# Exact-duplicate VECTOR groups, memoized per (app, sf_dir): (vec_id, gid)
# with gid = the group's global-min vec_id. The ANN build's collapse gate
# rides these the way the text-dedup chain rides _cached_clusters.
_VEC_GROUPS_CACHE: dict[tuple[str, str], DataFrame] = {}
# Cell-assigned corpus per (app, sf_dir) — see _knng_assigned.
_KNNG_ASSIGNED_CACHE: dict[tuple[str, str], DataFrame] = {}
_VEC_DUP_DENSE: dict[tuple[str, str], bool] = {}
# Refined k-NN edge lists per (app, sf, k_out) — see _ivf_knn_edges.
_KNN_EDGES_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _vec_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _VEC_GROUPS_CACHE:
        emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec")
        g = emb.groupBy("dvec").agg(F.min("vec_id").alias("gid"))
        _VEC_GROUPS_CACHE[key] = (
            emb.join(g, "dvec")
            .select("vec_id", "gid")
            .localCheckpoint(eager=True)
        )
    return _VEC_GROUPS_CACHE[key]


def _vec_dup_dense(spark: SparkSession, sf_dir: str) -> bool:
    """Duplicate-density gate for the ANN-graph collapse prefix — the
    _collapse_dense doctrine applied to vectors: below the shared 5%
    fraction the collapse's extra joins cost more than the O(copies^2)
    per-cell candidate rows they avoid; above it (crawl-scale corpora
    are routinely dup-heavy) the clone cliques make the per-cell
    self-join output-bound and the collapse is the difference between
    finishing and not (measured: the 90%-dup 100x fixture's plain build
    did not finish in 10 min; collapsed, seconds)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _VEC_DUP_DENSE:
        stats = _vec_groups(spark, sf_dir).agg(
            F.count("*").alias("n"),
            F.sum((F.col("vec_id") != F.col("gid")).cast("long")).alias("dups"),
        ).first()
        _VEC_DUP_DENSE[key] = (
            stats["n"] > 0
            and stats["dups"] / stats["n"] >= _NEAR_COLLAPSE_MIN_DUP_FRAC
        )
    return _VEC_DUP_DENSE[key]


def _ivf_knn_edges(spark: SparkSession, sf_dir: str, k_out: int = _NSW_K):
    """IVF-bootstrapped approximate k-NN edge list — the scale-safe graph
    BUILD the exact `llm_knn_graph` cannot be (VERDICT r11 next-round
    #4: the NSW search plan is corpus-size-independent, but an exact
    all-pairs edge source is quadratic and was the one LLM-tier
    component that would not survive 100x).

    Shape: spherical-k-means coarse cells (K ~ sqrt(N), floor 8 /
    cap 256 — the FAISS NNDescent-alternative everybody ships first),
    each vector REPLICATED into its _KNNG_IVF_NASSIGN nearest cells
    (the boundary-replication move IVF-PQ certifies: a vector's true
    neighbors straddling a cell boundary stay joinable), candidates =
    per-cell self-join, exact cosine rescore of candidates only,
    per-source top-k_out. Candidate pairs number
    ~ NASSIGN^2 * N^2 / K = O(N^1.5) at K ~ sqrt(N) vs the
    exact build's N^2 — and K's growth keeps per-cell lists (and thus
    per-task memory) flat as the corpus grows. K > _KM_LITERAL_MAX on
    every fixture, so this exercises the broadcast-matmul assignment
    path (`_km_assign`), the one a 100 TB K actually uses.

    Deterministic: the k-means fit is the cached deterministic-seed
    `_kmeans_fit`; ties in assignment break to the lowest centroid
    index; cosine is the shared 4 dp fold; ranking tiebreaks on
    neighbor_id. Returns (vec_id, neighbor_id, cos_sim, rnk)."""
    key = (spark.sparkContext.applicationId, sf_dir, k_out)
    if key in _KNN_EDGES_CACHE:
        return _KNN_EDGES_CACHE[key]
    k_inner = max(k_out, _KNNG_REFINE_DEGREE)
    if _vec_dup_dense(spark, sf_dir):
        # refinement runs INSIDE the collapse, at DIRECTION grain (the
        # collapse doctrine: clone cliques carry one direction's worth of
        # information — a member-grain 2-hop pass over 90%-clone corpora
        # re-pays the O(copies) blowup the collapse exists to avoid;
        # measured 61 s member-grain vs 23 s direction-grain at the
        # dup-dense 10x, identical member-grain output)
        refined = _collapsed_edges(
            spark, sf_dir, k_inner, None, None, refine=True
        )
    else:
        both = _knng_assigned(spark, sf_dir).select(
            "vec_id", "dvec", F.explode("cells").alias("cell")
        )
        refined = _nndescent_refine(
            spark, sf_dir, _cell_topk_edges(both, both, k_inner), k_inner
        )
    # memoized per (app, sf, k): the graph is consumed by llm_knn_graph_ivf,
    # the NSW search, the recall eval AND the index persist in one session —
    # one checkpointed build serves all (bounded: k_out*N narrow rows;
    # released by sdp_spark.unpersist_all)
    _KNN_EDGES_CACHE[key] = (
        refined.filter(F.col("rnk") <= k_out).localCheckpoint(eager=True)
    )
    return _KNN_EDGES_CACHE[key]


def _nndescent_refine(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame,
    k_out: int,
    rounds: int = _KNNG_REFINE_ROUNDS,
) -> DataFrame:
    """NNDescent-style edge refinement (Dong, Moses & Li, WWW 2011: "a
    neighbor of a neighbor is likely a neighbor") over an approximate
    k-NN edge list: per round, candidates = the UNDIRECTED 2-hop
    neighborhood (one self-join of the undirected edge list on the
    shared pivot) unioned with the current edges, exact-rescored on the
    unit vectors, per-source top-k_out retaken. VERDICT r12 next-round
    #3: the IVF cell build's edge recall vs the exact graph bottomed at
    0.60 at sf0.1 (near-uniform sphere, the coverage-bound hard case) —
    2-hop expansion recovers the cross-cell edges boundary replication
    misses.

    Cost per round: the undirected list has <= 2*k_out*N rows, so the
    pivot self-join emits <= (2*k_out)^2 * N candidate pairs — O(N*k^2),
    LINEAR in corpus size (vs the build's O(N^1.5) candidates), and the
    rescore is two narrow hash joins onto the cached unit vectors + one
    per-source window on the same vec_id partitioning the build already
    uses. Deterministic end to end: candidates are a set (distinct),
    cosine is the shared 4 dp fold on unit vectors, ranking tiebreaks on
    neighbor_id."""
    emb = _emb_normed(spark, sf_dir)
    unit = emb.select(
        "vec_id",
        F.transform("dvec", lambda x: x / F.col("norm")).alias("uv"),
    )
    # Pair scoring via mapInArrow over the ID pairs (r15, guide §4.2/§8
    # "shuffle keys, not payloads"): the old shape attached both unit
    # vectors by two joins and ran the interpreted zip_with fold per pair
    # (~2M pairs/round = the whole refine's CPU). Now only the 16-byte id
    # pairs cross the Arrow boundary; each task loads the unit-vector
    # matrix ONCE from a per-invocation executor-written side file
    # (nothing persists across invocations), gathers rows by searchsorted
    # id, and accumulates the dot PER DIMENSION (acc += A[:,i]·B[:,i]
    # from 0.0) — the identical IEEE left-fold order over the identical
    # unit values (numpy x/norm == the JVM transform division), so the
    # doubles are bit-identical. dround + the ranking window stay JVM.
    import tempfile

    side = tempfile.mkdtemp(prefix="sdp_refine_unit_")
    unit.coalesce(1).write.mode("overwrite").parquet(side)

    def _pair_dots(batches):
        import glob as _glob
        import os as _os

        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(
            sorted(_glob.glob(_os.path.join(side, "part-*.parquet")))
        )
        ids = tbl["vec_id"].to_numpy()
        order = _np.argsort(ids)
        sid = ids[order]
        U = _np.asarray(
            tbl["uv"].combine_chunks().flatten(), dtype=_np.float64
        ).reshape(len(ids), -1)[order]
        dim = U.shape[1]
        out_schema = _pa.schema(
            [
                ("vec_id", _pa.int64()),
                ("neighbor_id", _pa.int64()),
                ("dot", _pa.float64()),
            ]
        )
        for b in batches:
            if b.num_rows == 0:
                continue
            va_ids = b.column("vec_id").to_numpy()
            vb_ids = b.column("neighbor_id").to_numpy()
            ia = _np.searchsorted(sid, va_ids)
            ib = _np.searchsorted(sid, vb_ids)
            # every pair id must be a unit-frame id (edges derive from the
            # assigned corpus) — a miss would silently mis-gather
            assert (sid[ia] == va_ids).all() and (sid[ib] == vb_ids).all()
            A = U[ia]
            B = U[ib]
            acc = _np.zeros(len(va_ids))
            for i in range(dim):
                acc += A[:, i] * B[:, i]
            yield _pa.record_batch(
                [
                    _pa.array(va_ids, _pa.int64()),
                    _pa.array(vb_ids, _pa.int64()),
                    _pa.array(acc, _pa.float64()),
                ],
                schema=out_schema,
            )

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    # the incoming cell build is referenced 3+ times by round 1 (see the
    # per-round note below) — materialize it once
    ranked = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        cur = ranked.select("vec_id", "neighbor_id")
        und = cur.unionByName(
            cur.select(
                F.col("neighbor_id").alias("vec_id"),
                F.col("vec_id").alias("neighbor_id"),
            )
        )
        hop2 = und.alias("x").join(
            und.alias("y"),
            F.col("x.neighbor_id") == F.col("y.vec_id"),
        ).select(
            F.col("x.vec_id").alias("vec_id"),
            F.col("y.neighbor_id").alias("neighbor_id"),
        )
        cand = (
            cur.unionByName(hop2)
            .filter(F.col("vec_id") != F.col("neighbor_id"))
            .repartition("vec_id")
            .distinct()
        )
        scored = cand.mapInArrow(
            _pair_dots, "vec_id bigint, neighbor_id bigint, dot double"
        ).select("vec_id", "neighbor_id", dround(F.col("dot"), 4).alias("cos_sim"))
        # checkpoint per round: the next round references this frame
        # three+ times (und twice, cand once, scored's join input) — an
        # unchecked lineage would re-run the whole prior round per
        # reference (the NSW frontier-checkpoint doctrine; bounded state,
        # <= k_out * N narrow rows)
        ranked = (
            scored.withColumn(
                "rnk", F.row_number().over(w).cast("bigint")
            )
            .filter(F.col("rnk") <= k_out)
            .localCheckpoint(eager=True)
        )
    return ranked


def _collapsed_edges(
    spark: SparkSession,
    sf_dir: str,
    k_out: int,
    src_pred,
    dst_pred,
    refine: bool = False,
) -> DataFrame:
    """The duplicate-collapse branch of the ANN-graph build/insert: score
    DIRECTIONS (exact-duplicate groups), expand to members arithmetically
    — the _near_dedup_collapsed doctrine applied to vectors. A clone
    clique's per-cell self-join is O(copies^2) in candidate rows while
    its information content is one direction; so the cell machinery runs
    at gid grain (one row per distinct direction), and member-grain
    edges reconstruct exactly:

    - clone-mates (same gid, cos 1.0 — identical unit vectors) come
      first under the (cos desc, id asc) order, and only the k_out
      smallest member ids per gid can ever appear in any top-k_out, so
      the dst side pre-limits to those;
    - cross-direction candidates = the gid's top-k_out neighbor
      DIRECTIONS expanded to each one's k_out smallest members — the
      k-th nearest member always belongs to one of the k nearest
      directions, so the expansion is lossless for the top-k_out.

    src_pred/dst_pred (column predicates on vec_id, or None) restrict
    the two roles — the full build passes None/None; incremental
    insertion passes arriving/indexed. On a dup-free corpus this
    reduces to the plain branch computation (every group is a
    singleton), pinned by the equality pytest."""
    groups = _vec_groups(spark, sf_dir)
    src_members = groups.filter(src_pred) if src_pred is not None else groups
    dst_members = groups.filter(dst_pred) if dst_pred is not None else groups
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    unit = F.transform("dvec", lambda x: x / F.col("norm"))

    def rep_frame(members, cents):
        gids = members.select("gid").distinct()
        rep = emb.join(gids, emb.vec_id == gids.gid).select(
            F.col("gid").alias("vec_id"), unit.alias("dvec")
        )
        return _km_assign(
            rep, cents, probe_n=min(_KNNG_IVF_NASSIGN, len(cents))
        ).select("vec_id", "dvec", F.explode("cells").alias("cell"))

    n_dst = dst_members.select("gid").distinct().count()
    k_cells = max(8, min(256, int(n_dst ** 0.5)))
    cents = _spherical_cells(spark, sf_dir, k_cells)
    rep_edges = _cell_topk_edges(
        rep_frame(src_members, cents), rep_frame(dst_members, cents), k_out
    )
    if refine:
        # NNDescent over the DIRECTION graph: gids are themselves vec_ids
        # (each group's min member), so the refine helper's unit-vector
        # lookups work unchanged at gid grain, and the member expansion
        # below rides the refined direction list
        rep_edges = _nndescent_refine(spark, sf_dir, rep_edges, k_out)
    # dst-side member cap: ties at equal cos break on neighbor_id asc,
    # so only each gid's k_out+1 smallest ids can surface anywhere
    wg = Window.partitionBy("gid").orderBy("vec_id")
    dst_top = (
        dst_members.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= k_out + 1)
        .select(F.col("vec_id").alias("neighbor_id"), "gid")
    )
    mates = (
        src_members.join(dst_top, "gid")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", F.lit(1.0).alias("cos_sim"))
    )
    cross = (
        src_members.join(
            rep_edges.select(
                F.col("vec_id").alias("gid"),
                F.col("neighbor_id").alias("ngid"),
                "cos_sim",
            ),
            "gid",
        )
        .join(dst_top.withColumnRenamed("gid", "ngid"), "ngid")
        .select("vec_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        mates.unionByName(cross)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k_out)
    )


def _cell_topk_edges(
    src_frame: DataFrame, dst_frame: DataFrame, k_out: int
) -> DataFrame:
    """Per-cell candidate join + exact rescore + per-source top-k_out
    over (vec_id, dvec=UNIT vector, cell) frames. Shared by the full
    graph build (src == dst == whole corpus) and incremental insertion
    (src = arriving vectors, dst = the indexed corpus)."""
    a = src_frame.select("cell", "vec_id", F.col("dvec").alias("va"))
    b = dst_frame.select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.col("dvec").alias("vb"),
    )

    # Per-cell scoring via cogrouped applyInPandas (guide §4.2): the old
    # per-pair zip_with/aggregate fold evaluated INTERPRETED (~58 µs/pair
    # — the whole build's CPU at O(N^1.5) candidate pairs). Each side now
    # crosses the Arrow boundary ONCE per cell (not once per pair) and the
    # dot accumulates PER DIMENSION across rows (acc += A[:,i]·B[:,i], acc
    # init 0.0) — the identical IEEE left-fold order, bit-identical
    # doubles, vectorized. Unit vectors: the dot IS the cosine. Cell sizes
    # are bounded by the K ~ sqrt(N) geometry (per-cell lists stay flat as
    # the corpus grows); the acc buffer is additionally chunked to ~32 MB.
    # dround + dedup + the ranking window stay in the JVM below.
    def _cell_scores(left, right):
        import numpy as _np
        import pandas as _pd

        if len(left) == 0 or len(right) == 0:
            return _pd.DataFrame(
                {
                    "vec_id": _pd.Series([], dtype="int64"),
                    "neighbor_id": _pd.Series([], dtype="int64"),
                    "cos": _pd.Series([], dtype="float64"),
                }
            )
        qid = left["vec_id"].to_numpy()
        A = _np.stack(left["va"].to_numpy()).astype(_np.float64, copy=False)
        nid = right["neighbor_id"].to_numpy()
        B = _np.stack(right["vb"].to_numpy()).astype(_np.float64, copy=False)
        n = len(nid)
        dim = A.shape[1]
        out = []
        chunk = max(1, (1 << 22) // max(1, n))
        for s in range(0, len(qid), chunk):
            qi = qid[s : s + chunk]
            Ai = A[s : s + chunk]
            m = len(qi)
            acc = _np.zeros((m, n))
            for i in range(dim):
                acc += Ai[:, i : i + 1] * B[:, i]
            rid = _np.repeat(qi, n)
            cid = _np.tile(nid, m)
            mask = rid != cid
            out.append(
                _pd.DataFrame(
                    {
                        "vec_id": rid[mask],
                        "neighbor_id": cid[mask],
                        "cos": acc.ravel()[mask],
                    }
                )
            )
        return _pd.concat(out, ignore_index=True)

    scored = (
        a.groupBy("cell")
        .cogroup(b.groupBy("cell"))
        .applyInPandas(_cell_scores, "vec_id bigint, neighbor_id bigint, cos double")
        .select("vec_id", "neighbor_id", dround(F.col("cos"), 4).alias("cos_sim"))
    )
    # a pair sharing BOTH cells scores twice with the same value — the
    # (vec_id, neighbor_id) groupBy is the dedup, and its narrow-row
    # exchange doubles as the ranking window's partitioning
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.repartition("vec_id")
        .groupBy("vec_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k_out)
    )


@register("llm_knn_graph_ivf", oracle=None, section=_SEC)
def llm_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph via IVF cell-bucketed candidates — the
    100 TB replacement for `llm_knn_graph`'s exact all-pairs build, and
    since r12 the edge source of `llm_sim_search_nsw`. Semantics, cost
    model and determinism: see _ivf_knn_edges. rows-only oracle (the
    k-means cells are not SQL-replayable); pytest pins edge recall vs
    the exact graph and the sub-quadratic candidate bound, and the NSW
    recall row in `llm_ann_recall_eval` certifies the composed
    lifecycle (approximate build -> beam search) end to end."""
    return _ivf_knn_edges(spark, sf_dir, k_out=_NSW_K).orderBy(
        "vec_id", "rnk"
    )


@register("llm_ann_insert_incremental", oracle=None, section=_SEC)
def llm_ann_insert_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN-index maintenance — attach ARRIVING vectors to an
    already-indexed corpus without rebuilding it: the last 20% of
    vec_ids play the day's new arrivals, the first 80% the standing
    index. Each arrival reuses the TRAINED coarse quantizer (production
    inserts never refit per batch — the quantizer is versioned index
    state), lands in its 3 nearest cells, candidate-joins ONLY the
    indexed vectors in those cells, and takes its exact-rescored top-8
    as its edge list (these, unioned with their reverses, are exactly
    the links an NSW insert adds). Per-insert cost is
    O(NASSIGN * cell size) — independent of total corpus growth when K
    tracks sqrt(N) — which is what makes a daily-ingest vector platform
    affordable: the O(N^1.5) full build (`llm_knn_graph_ivf`) runs at
    bootstrap, THIS runs every batch thereafter.

    Output: (vec_id, neighbor_id, cos_sim, rnk) for arriving vectors
    only. Deterministic: split = floor(0.8 * max vec_id), cached
    deterministic-seed quantizer, lowest-index ties, 4 dp cosine,
    neighbor_id tiebreak. rows-only oracle (k-means cells are not SQL-
    replayable); pytest pins edge recall vs the arrivals' true top-k
    among the indexed set, the old/new partition discipline, and
    determinism."""
    emb = _emb_normed(spark, sf_dir)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    split = int(max_id * 0.8)
    if _vec_dup_dense(spark, sf_dir):
        return _collapsed_edges(
            spark,
            sf_dir,
            _NSW_K,
            F.col("vec_id") >= split,
            F.col("vec_id") < split,
        ).orderBy("vec_id", "rnk")
    both = _knng_assigned(spark, sf_dir).select(
        "vec_id", "dvec", F.explode("cells").alias("cell")
    )
    arriving = both.filter(F.col("vec_id") >= split)
    indexed = both.filter(F.col("vec_id") < split)
    return _cell_topk_edges(arriving, indexed, _NSW_K).orderBy(
        "vec_id", "rnk"
    )


@register("llm_sim_search_nsw", oracle=None, section=_SEC)
def llm_sim_search_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN — beam search over a navigable-small-world
    neighbor graph (Malkov et al., Information Systems 2014; the single-
    layer core of HNSW, today's dominant production ANN family): from
    one entry vertex PER CELL (see the entries block below), each round
    expands the per-query beam's out-neighbors, scores ONLY those
    candidates, and keeps the best BEAM; after T rounds the answer is
    the top-5 of everything visited. Search cost is
    K + T x BEAM x degree score evaluations per query (K ~ sqrt(N)
    entry seeds) — effectively independent of corpus size, which is the
    family's 100 TB claim (the other families prune by geometry or
    compress; graphs prune by CONNECTIVITY).

    The graph is the IVF-bootstrapped approximate k=8 graph
    (`llm_knn_graph_ivf` / _ivf_knn_edges — O(N^1.5) candidate pairs at
    K ~ sqrt(N) cells, replacing the exact O(N^2) build that was the
    family's one scale-qualified component, VERDICT r11 #4), made
    UNDIRECTED by unioning reversed edges — Malkov's NSW links are
    bidirectional, and the reverse edges are what let the beam escape a
    cell-local minimum the approximate build introduces (out-degree
    stays <= 2k). The SEARCH path this key certifies is the per-query
    plan: per round, one equi-join of the (query, beam) frame onto the
    edge list, one narrow-row scoring join, one top-BEAM window — all
    metadata-sized.

    Deterministic: entries = per-cell min vec_id; cosine is the shared
    fold rounded to 4 dp; every ranking tiebreaks on neighbor_id; fixed
    round count (no data-dependent convergence). rows-only oracle
    (graph traversal is not replayable SQL); recall@5 is pinned in
    pytest and tracked in BENCH_DETAIL via `llm_ann_recall_eval`."""
    return _nsw_beam_search(
        spark, sf_dir, _nsw_und_edges(spark, sf_dir), _nsw_entries(spark, sf_dir)
    )


# Undirected in-plan edge set, memoized per (app, sf): the persisted index
# pre-merges this at BUILD time (r14a edges_undirected table) because it is
# a per-index-version artifact, but the in-plan search re-paid the
# union + distinct + eager checkpoint on EVERY call. Same lifecycle as
# _KNN_EDGES_CACHE it derives from (released by unpersist_all; evicted by
# ann_index_build(force=True) beside its source).
_NSW_UND_CACHE: dict[tuple[str, str], DataFrame] = {}


def _nsw_und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NSW_UND_CACHE:
        knn = _ivf_knn_edges(spark, sf_dir, k_out=_NSW_K).select(
            F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
        )
        _NSW_UND_CACHE[key] = (
            knn.unionByName(
                knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    return _NSW_UND_CACHE[key]


def _nsw_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node) — one beam-search entry vertex per IVF cell (lowest member
    vec_id by primary cell). See the entries block in _nsw_beam_search's
    docstring for why multi-entry is load-bearing on dup-dense corpora."""
    return (
        _knng_assigned(spark, sf_dir)
        .select("vec_id", F.col("cells")[0].alias("cell"))
        .groupBy("cell")
        .agg(F.min("vec_id").alias("node"))
        .select("node")
    )


def _nsw_beam_search(
    spark: SparkSession, sf_dir: str, edges: DataFrame, entries: DataFrame
) -> DataFrame:
    """The NSW beam-search SEARCH path over a prepared index: `edges` is
    the UNDIRECTED (src, dst) link list, `entries` the (node) seed set.
    Factored out of llm_sim_search_nsw (r13) so the persisted-index
    search (`llm_ann_search_persisted`) runs the IDENTICAL plan over
    parquet-read index state — search ≡ in-plan search is structural,
    not copy-paste. Semantics and determinism: see llm_sim_search_nsw."""
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    return _nsw_beam_search_frames(spark, emb, edges, entries)


def _nsw_beam_search_frames(
    spark: SparkSession,
    emb: DataFrame,
    edges: DataFrame,
    entries: DataFrame,
    queries: DataFrame | None = None,
) -> DataFrame:
    """The beam-search core over an explicit (vec_id, dvec, norm) corpus
    frame — lets delta-search run the same plan over a corpus augmented
    with an arrival batch. `queries` (query_id, qv, qn) overrides the
    default standing query set (vec_id <= 10); every frame in the loop
    is keyed by query_id, so a 1000-query batch runs THE SAME number of
    Spark jobs as one query — the per-query independence
    llm_ann_search_batch certifies."""
    if queries is None:
        queries = emb.filter(F.col("vec_id") <= 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("dvec").alias("qv"),
            F.col("norm").alias("qn"),
        )
    # ONE ENTRY PER CELL (lowest member vec_id), not a single global
    # entry: graph navigability is what a single entry rides, and a
    # duplicate-dense corpus destroys it — every clone's top-k edges
    # are its clones, the graph fragments into cliques, and beam search
    # from one entry never leaves the entry's clique (measured on the
    # 90%-dup 10x fixture: recall@5 0.09 single-entry vs 1.0 per-cell).
    # Entry count is K ~ sqrt(N) — bounded seed work per query, the
    # multi-entry discipline HNSW gets from its layer hierarchy.
    frontier = queries.select("query_id").crossJoin(
        F.broadcast(entries)
    ).localCheckpoint(eager=True)
    qdot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cframe = emb.select(
        F.col("vec_id").alias("node"),
        F.col("dvec").alias("cv"),
        F.col("norm").alias("cn"),
    )
    # per-round scored frames accumulate in a Python list and union ONCE
    # after the loop (ADVICE r11: the previous shape re-unioned the
    # growing visited frame with distinct() + eager checkpoint every
    # round — O(rounds^2) materialized rows and 3 blocking jobs/round).
    # Only the frontier checkpoints: each round's scored frame then roots
    # at a checkpointed frontier, so lineage depth stays constant anyway.
    round_frames = []
    bw = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("node")
    )

    def score(cand: DataFrame) -> DataFrame:
        # Eagerly checkpoint the SCORED frame (r15): it has two consumers
        # — this round's beam window AND the final visited union. The
        # union previously re-executed every round's scoring joins a
        # second time at assembly (the plan's only multiply-referenced
        # subtree, §1.2); the checkpoint also truncates the next round's
        # lineage, which is what the old beam-side checkpoint existed for.
        return (
            cand.join(cframe, "node")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                "node",
                dround(qdot / (F.col("qn") * F.col("cn")), 4).alias(
                    "cos_sim"
                ),
            )
            .localCheckpoint(eager=True)
        )

    def top_beam(scored: DataFrame) -> DataFrame:
        return (
            scored.withColumn("rn", F.row_number().over(bw))
            .filter(F.col("rn") <= _NSW_BEAM)
            .select("query_id", "node")
        )

    # Round 0 (r14): SCORE the per-cell entries and prune to the beam
    # BEFORE any edge expansion. The old shape expanded all K ~ sqrt(N)
    # entries in round 1 — per query K*degree candidate rows, ~75% of the
    # whole search's row volume, and the term that made the 28.6k-query
    # batch serve spill at the dup-dense 100x (K=256 capped there:
    # 28.6k x 256 x 16 ≈ 117M round-1 rows). Every entry is still
    # SCORED (the visited union keeps them, so clique-escape coverage
    # is intact); only the expansion starts from the best BEAM entries —
    # which is what beam search means. Recall@5 re-measured at 1.0 for
    # nsw at every sf after the change.
    scored0 = score(frontier)
    round_frames.append(scored0)
    frontier = top_beam(scored0)
    for _ in range(_NSW_ROUNDS):
        nbrs = frontier.join(edges, frontier.node == edges.src).select(
            "query_id", F.col("dst").alias("node")
        )
        cand = frontier.unionByName(nbrs).distinct()
        scored = score(cand)
        round_frames.append(scored)
        frontier = top_beam(scored)
    visited = round_frames[0]
    for fr in round_frames[1:]:
        visited = visited.unionByName(fr)
    visited = visited.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("node")
    )
    return (
        visited.filter(F.col("query_id") != F.col("node"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", F.col("node").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", F.col("cos_sim").desc(), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# ANN index LIFECYCLE: persist trained index state, serve searches from it
# ---------------------------------------------------------------------------

# Bump when the on-disk index layout or the build algorithm changes (r13a:
# NNDescent-refined edges; r14a: pre-merged undirected edge tables — the
# serve paths' per-search union+distinct+checkpoint over the directed list
# moved to build/update time, where it runs once per index version instead
# of once per search).
_ANN_INDEX_VERSION = "r14a"


def _ann_index_path(sf_dir: str) -> str:
    from sdp_spark.sources.fixtures import cache_dir

    return cache_dir(sf_dir, f"ann_index_{_ANN_INDEX_VERSION}")


def ann_index_build(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Build the ANN index ONCE and persist its trained state as parquet
    tables (VERDICT r12 next-round #1: every sim-search key trained its
    quantizer and built its graph inside the query plan, then discarded
    them — `llm_ann_insert_incremental`'s docstring promises "versioned
    index state", this is that state). Four tables under a VERSIONED
    directory:

    - centroids(cell, centroid): the trained spherical-k-means coarse
      quantizer — what future batches (incremental inserts, new query
      routing) assign against without refitting;
    - assignments(vec_id, cells): each indexed vector's replicated cell
      ids — the IVF posting-list side of the index;
    - edges(vec_id, neighbor_id, cos_sim, rnk): the NNDescent-refined
      k=8 NSW edge list, written PARTITIONED by pmod(vec_id, 16) (the
      sink_partitioned layout primitive): per-source neighbor lookups
      prune to one directory instead of scanning the graph;
    - entries(node): the per-cell beam-search seed vertices.

    A _MANIFEST.json with per-table row counts commits the build LAST —
    readers treat the index as present only when the manifest exists, so
    a crashed half-written build is rebuilt, never served (the streaming
    file-sink commit-marker discipline). Idempotent: an existing manifest
    short-circuits unless `force` (the registry key forces, so its bench
    timing measures a real build, never a cached no-op). Returns the
    index directory."""
    import json
    import os
    import shutil

    path = _ann_index_path(sf_dir)
    manifest = os.path.join(path, "_MANIFEST.json")
    if os.path.exists(manifest):
        if not force:
            return path
        shutil.rmtree(path, ignore_errors=True)
        # force promises "a real build, never a cached no-op" — but the
        # component builders (_spherical_cells / _ivf_knn_edges /
        # _vec_groups) memoize per applicationId, so without eviction
        # every rebuild after the first reused the checkpointed edges
        # and fitted centroids and the published build wall
        # under-reported the true cost (ADVICE r13 #4)
        app = spark.sparkContext.applicationId
        for cache in (
            _SPH_CACHE,
            _KNN_EDGES_CACHE,
            _NSW_UND_CACHE,
            _VEC_GROUPS_CACHE,
            _VEC_DUP_DENSE,
            _KNNG_ASSIGNED_CACHE,
        ):
            for k in [k for k in cache if k[0] == app and k[1] == sf_dir]:
                cache.pop(k, None)
    os.makedirs(path, exist_ok=True)
    cents = _spherical_cells(
        spark,
        sf_dir,
        max(8, min(256, int(_emb_count(spark, sf_dir) ** 0.5))),
    )
    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    assignments = _knng_assigned(spark, sf_dir).select("vec_id", "cells")
    edges = _ivf_knn_edges(spark, sf_dir, k_out=_NSW_K)
    entries = _nsw_entries(spark, sf_dir)
    counts: dict[str, int] = {}
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    counts["centroids"] = len(cents)
    assignments.write.mode("overwrite").parquet(
        os.path.join(path, "assignments")
    )
    (
        edges.withColumn("bucket", F.pmod(F.col("vec_id"), F.lit(16)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "edges"))
    )
    # Pre-merged UNDIRECTED edge list (r14): the serve paths consume the
    # graph undirected, and every search used to pay the union + distinct
    # + eager checkpoint to derive it — a per-SEARCH cost for a
    # per-INDEX-VERSION artifact. Build-once/serve-many applies to the
    # derived form too: dedup here, serve with a bare scan.
    knn = edges.select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    (
        knn.unionByName(
            knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .withColumn("bucket", F.pmod(F.col("src"), F.lit(16)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "edges_undirected"))
    )
    entries.write.mode("overwrite").parquet(os.path.join(path, "entries"))
    for name in ("assignments", "edges", "edges_undirected", "entries"):
        counts[name] = spark.read.parquet(os.path.join(path, name)).count()
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": _ANN_INDEX_VERSION, "tables": counts}, f)
    os.replace(tmp, manifest)  # atomic commit marker
    return path


@register("llm_ann_index_persist", oracle=None, section=_SEC)
def llm_ann_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the trained ANN index (see ann_index_build) and return its
    manifest as rows — (component, n_rows), one per persisted table. A
    production vector platform builds once and serves many: this key
    certifies the BUILD+PERSIST half of that lifecycle;
    `llm_ann_search_persisted` certifies the serve half. rows-only
    oracle (k-means training state is not SQL-replayable); pytest pins
    manifest-vs-table count agreement, crash-marker semantics, and that
    the persisted search needs zero build work."""
    import json

    path = ann_index_build(spark, sf_dir, force=True)
    with open(f"{path}/_MANIFEST.json") as f:
        counts = json.load(f)["tables"]
    return spark.createDataFrame(
        sorted(counts.items()),
        "component string, n_rows bigint",
    ).orderBy("component")


@register("llm_ann_search_persisted", oracle=None, section=_SEC)
def llm_ann_search_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 similarity search served FROM THE PERSISTED INDEX with zero
    build work: reads the parquet edge list + entry seeds that
    ann_index_build committed (bootstrapping the index first if absent)
    and runs the identical `_nsw_beam_search` plan `llm_sim_search_nsw`
    runs over its in-plan build — the output is EXACTLY equal (pytest-
    pinned), but the serve path's cost is the beam search alone: no
    k-means fit, no cell self-join, no refinement. This is the
    build-once/serve-many split a 100 TB vector platform runs on —
    BENCH_DETAIL tracks both keys so the build-vs-serve wall ratio is a
    per-round artifact. rows-only oracle (graph traversal is not
    replayable SQL)."""
    import os

    path = ann_index_build(spark, sf_dir)
    # the persisted index already stores the graph undirected and deduped
    # (r14): serving is a bare scan — no union, no distinct shuffle. The
    # eager checkpoint stays: the beam loop consumes the frame once per
    # round, and pinning it beats six parquet re-reads.
    edges = (
        spark.read.parquet(os.path.join(path, "edges_undirected"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    entries = spark.read.parquet(os.path.join(path, "entries")).select("node")
    return _nsw_beam_search(spark, sf_dir, edges, entries)


@register("llm_ann_index_update", oracle=None, section=_SEC)
def llm_ann_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental UPDATE of the persisted index — the daily-batch write
    path of the build-once/serve-many lifecycle (ann_index_build is the
    bootstrap, llm_ann_search_persisted the serve path, THIS the
    every-batch maintenance that `llm_ann_insert_incremental` certifies
    in-plan): a deterministic arrival batch (every 5th standing vector
    re-ingested under a fresh vec_id past max_id — the re-crawl/clone
    shape a daily ingest actually sees) is assigned against the
    PERSISTED centroids (read from parquet — the versioned quantizer is
    never refit), candidate-joins ONLY the indexed members of its
    3 nearest cells (posting lists from the persisted assignments
    table), and its exact-rescored top-8 edges + cell assignments are
    written back as DELTA tables beside the base index
    (mode=overwrite — re-running a batch replaces its delta, the
    idempotent-redelivery discipline of the streaming sinks; an
    undirected pre-merged twin `edges_delta_undirected` is written
    alongside (r14) so the delta serve path is a bare scan-union with
    no per-search distinct — storing only the arrival->indexed
    direction in `edges_delta` still keeps connectivity, the reverse
    direction materializes in the undirected twin).

    Per-arrival cost is O(NASSIGN * cell size) — flat as the corpus
    grows with K ~ sqrt(N) — and NOTHING here rescans or refits the
    standing index: pytest poisons every build/fit entry point after
    the bootstrap and this key must still run. On duplicate-dense
    corpora (the crawl-daily shape) the attach runs at DIRECTION grain
    — arrivals collapse by exact vector, score against the index's
    direction table, and member edges expand arithmetically (the
    _collapsed_edges doctrine; without it the clone-stuffed posting
    lists make the candidate join output-bound — measured 250.7 s at
    the 90%-dup 100x vs seconds collapsed). Output: the arrivals' edge
    lists (vec_id, neighbor_id, cos_sim, rnk). rows-only oracle; pytest
    pins determinism, the zero-refit property, the delta-table counts,
    forced-collapse == plain on the dup-free fixture, and that each
    cloned arrival's top-1 neighbor is its source vector at cos 1.0."""
    import os

    path = ann_index_build(spark, sf_dir)
    emb = _emb_normed(spark, sf_dir)
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
    if _vec_dup_dense(spark, sf_dir):
        edges, assigned = _ann_update_collapsed(
            spark, sf_dir, path, arrivals, cents, _NSW_K
        )
    else:
        assigned = _km_assign(
            arrivals.select("vec_id", "dvec"),
            cents,
            probe_n=min(_KNNG_IVF_NASSIGN, len(cents)),
        )
        arr_cells = assigned.select(
            "vec_id", "dvec", F.explode("cells").alias("cell")
        )
        indexed = (
            spark.read.parquet(os.path.join(path, "assignments"))
            .select("vec_id", F.explode("cells").alias("cell"))
            .join(
                emb.select("vec_id", unit.alias("dvec")),
                "vec_id",
            )
            .select("vec_id", "dvec", "cell")
        )
        edges = _cell_topk_edges(arr_cells, indexed, _NSW_K)
    edges = edges.localCheckpoint(eager=True)
    assigned.select("vec_id", "cells").write.mode("overwrite").parquet(
        os.path.join(path, "assignments_delta")
    )
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges_delta"))
    # pre-merged undirected twin (r14, same doctrine as the base index's
    # edges_undirected): the delta serve path unions base + delta scans
    # with NO serve-time distinct — every delta edge joins an arrival
    # (> max_id) to an indexed id, so the two undirected sets are
    # disjoint by construction and dedup is needed only WITHIN the delta
    dk = edges.select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    (
        dk.unionByName(
            dk.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .write.mode("overwrite")
        .parquet(os.path.join(path, "edges_delta_undirected"))
    )
    # The delta gets the SAME commit-marker discipline the base build
    # got for exactly this reason (ADVICE r13 #2): a crash between the
    # two writes above leaves directories the serve path must treat as
    # absent, so the marker commits LAST and atomically.
    import json

    tmp = os.path.join(path, "_DELTA_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": _ANN_INDEX_VERSION,
                "tables": {
                    "edges_delta": edges.count(),
                    "edges_delta_undirected": spark.read.parquet(
                        os.path.join(path, "edges_delta_undirected")
                    ).count(),
                    "assignments_delta": assigned.count(),
                },
            },
            f,
        )
    os.replace(tmp, os.path.join(path, "_DELTA_MANIFEST.json"))
    return edges.orderBy("vec_id", "rnk")


def _ann_update_collapsed(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    arrivals: DataFrame,
    cents: list,
    k_out: int,
):
    """Direction-grain attach of an arrival batch to the persisted index
    (the dup-dense branch of llm_ann_index_update — _collapsed_edges'
    doctrine with the dst side read FROM the persisted tables, no
    refit): arrivals group by exact raw vector and map onto the index's
    direction table (gid = each group's min standing vec_id) via one
    raw-vector equi-join; ONE representative per arrival direction
    assigns (persisted centroids) and scores against the index's
    DIRECTION-grain posting lists (the gid's own persisted assignment
    row represents its clones — identical vectors assign identically);
    member edges reconstruct exactly: clone-mates of a matched
    direction at cos 1.0 (only each gid's k_out+1 smallest member ids
    can surface), plus each direction's top-k_out neighbor directions
    expanded to THEIR k_out+1 smallest members. Candidates are
    O(directions * cell direction-count), not O(arrivals * clone-
    stuffed cell size). Arrival-only directions (no standing clone) get
    no mates and score like singletons. Returns (member-grain edges,
    per-arrival cell assignments)."""
    import os

    emb = _emb_normed(spark, sf_dir)
    groups = _vec_groups(spark, sf_dir)
    dirs = (
        emb.join(groups, "vec_id")
        .filter(F.col("vec_id") == F.col("gid"))
        .select("gid", F.col("dvec").alias("rvec"))
    )
    # map each arrival to its direction: standing gid when the raw
    # vector exists in the index, else the arrival group's min vec_id
    amap = arrivals.join(F.broadcast(dirs), "rvec", "left")
    wg = Window.partitionBy("rvec")
    amap = amap.withColumn(
        "agid", F.coalesce(F.col("gid"), F.min("vec_id").over(wg))
    )
    reps = (
        amap.withColumn(
            "rn", F.row_number().over(wg.orderBy("vec_id"))
        )
        .filter(F.col("rn") == 1)
        .select("agid", "dvec")
    )
    rep_assigned = _km_assign(
        reps.withColumnRenamed("agid", "vec_id"),
        cents,
        probe_n=min(_KNNG_IVF_NASSIGN, len(cents)),
    )
    # every arrival inherits its rep's cells (identical vectors assign
    # identically) — this is also the delta-assignments output
    assigned = amap.select("vec_id", "agid").join(
        rep_assigned.select(F.col("vec_id").alias("agid"), "cells"),
        "agid",
    ).select("vec_id", "cells", "agid")
    # index side at DIRECTION grain: the gid's own persisted row
    unit = F.transform("dvec", lambda x: x / F.col("norm"))
    dir_cells = (
        spark.read.parquet(os.path.join(path, "assignments"))
        .join(groups, "vec_id")
        .filter(F.col("vec_id") == F.col("gid"))
        .join(emb.select("vec_id", unit.alias("uv")), "vec_id")
        .select(
            F.col("gid").alias("vec_id"),
            F.col("uv").alias("dvec"),
            F.explode("cells").alias("cell"),
        )
    )
    rep_cells = rep_assigned.select(
        "vec_id", "dvec", F.explode("cells").alias("cell")
    )
    rep_edges = _cell_topk_edges(rep_cells, dir_cells, k_out)
    # per indexed direction: only the k_out+1 smallest member ids can
    # ever appear in a top-k_out under the (cos desc, id asc) order
    wm = Window.partitionBy("gid").orderBy("vec_id")
    dst_top = (
        groups.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= k_out + 1)
        .select(F.col("vec_id").alias("neighbor_id"), "gid")
    )
    mates = (
        amap.select("vec_id", "agid")
        .join(dst_top.withColumnRenamed("gid", "agid"), "agid")
        .select("vec_id", "neighbor_id", F.lit(1.0).alias("cos_sim"))
    )
    cross = (
        amap.select("vec_id", "agid")
        .join(
            rep_edges.select(
                F.col("vec_id").alias("agid"),
                F.col("neighbor_id").alias("ngid"),
                "cos_sim",
            ),
            "agid",
        )
        .join(dst_top.withColumnRenamed("gid", "ngid"), "ngid")
        .select("vec_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    edges = (
        mates.unionByName(cross)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k_out)
    )
    return edges, assigned


@register("llm_ann_search_delta", oracle=None, section=_SEC)
def llm_ann_search_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve over base index + today's delta — the question a platform
    answers between nightly rebuilds: 'is this morning's ingest already
    searchable?' Reads the persisted BASE edge list and the
    llm_ann_index_update DELTA (running the update first if its commit
    marker is absent — a crashed half-written delta is regenerated,
    never served), unions them undirected (the delta stores only
    arrival->indexed edges; the reverse direction is generated at
    read, exactly how the base search undirects its own edges), and
    runs the SAME _nsw_beam_search plan every other serve path runs.
    The seed set is the base index's entries unchanged: arrivals are
    reachable because every arrival carries undirected edges to its
    nearest INDEXED directions, so any beam that nears those standing
    neighbors hops to the arrival — the standard NSW reachability
    argument, not seed extension (ADVICE r13 #3). Still zero
    build/fit work — both inputs are parquet state. Output shape =
    llm_sim_search_nsw (query_id, neighbor_id, cos_sim); because the
    standing queries (vec_id <= 10) have exact clones in the arrival
    batch when their id % 5 == 3, the search MUST surface those
    arrivals at cos 1.0 — pytest pins that plus determinism and the
    zero-build property. rows-only oracle."""
    import os

    path = _ann_index_path(sf_dir)
    # gate on the delta's COMMIT MARKER, not directory existence — a
    # crash mid-update leaves partial parquet the serve path must treat
    # as absent (ADVICE r13 #2; the update overwrites both directories)
    if not os.path.exists(os.path.join(path, "_DELTA_MANIFEST.json")):
        llm_ann_index_update(spark, sf_dir)
    # both sides are stored undirected + deduped (r14) and are disjoint
    # by construction (delta edges always touch an arrival id > max_id):
    # the serve-time union needs NO distinct shuffle — scan, union, pin
    edges = (
        spark.read.parquet(os.path.join(path, "edges_undirected"))
        .select("src", "dst")
        .unionByName(
            spark.read.parquet(
                os.path.join(path, "edges_delta_undirected")
            ).select("src", "dst")
        )
        .localCheckpoint(eager=True)
    )
    entries = spark.read.parquet(os.path.join(path, "entries")).select(
        "node"
    )
    return _nsw_beam_search_over(
        spark, sf_dir, edges, entries, include_arrivals=True
    )


@register("llm_ann_search_batch", oracle=None, section=_SEC)
def llm_ann_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH serve from the persisted index — the offline half of a
    vector platform's traffic (VERDICT r13 work list #5): recommendation
    backfills, dataset-vs-dataset decontamination, nightly re-ranks all
    arrive as query SETS, not single lookups. The query batch here is
    every 7th corpus vector plus the standing queries (~N/7 + 11 — ~286
    at sf0.1, ~28.6k at the 100x fixture), and the WHOLE batch runs
    through ONE _nsw_beam_search_frames plan: every frame in the beam
    loop is keyed by query_id, so the batch costs the same fixed per-round job
    count as a single query — per-query work rides the executor
    parallelism, not the driver's plan count. This is the throughput
    argument for graph-ANN-on-Spark: serve QPS scales with cluster
    width because queries are ROWS, not jobs.

    Per-query independence is structural (no frame mixes query_ids
    outside its own partition key), so the batch's answers for the
    standing queries EQUAL llm_ann_search_persisted's single-serve
    answers row-for-row — pytest pins that plus determinism. Zero
    build/fit work: reads the same persisted parquet state the
    single-serve path reads. rows-only oracle (graph traversal is not
    replayable SQL). Output: (query_id, neighbor_id, cos_sim), exact
    top-5 per batch query."""
    import os

    path = ann_index_build(spark, sf_dir)
    edges = (
        spark.read.parquet(os.path.join(path, "edges_undirected"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    entries = spark.read.parquet(os.path.join(path, "entries")).select("node")
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    batch = emb.filter(
        (F.col("vec_id") <= 10) | (F.col("vec_id") % 7 == 1)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("dvec").alias("qv"),
        F.col("norm").alias("qn"),
    )
    return _nsw_beam_search_frames(spark, emb, edges, entries, queries=batch)


def _nsw_beam_search_over(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame,
    entries: DataFrame,
    include_arrivals: bool = False,
) -> DataFrame:
    """_nsw_beam_search generalized to a corpus AUGMENTED with the
    synthesized arrival batch (vec_id + max_id + 1, same vectors) so
    delta-search results can score and return arrival nodes. With
    include_arrivals=False this is exactly _nsw_beam_search."""
    if not include_arrivals:
        return _nsw_beam_search(spark, sf_dir, edges, entries)
    emb = _emb_normed(spark, sf_dir).select("vec_id", "dvec", "norm")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    arrivals = emb.filter(F.col("vec_id") % 5 == 3).select(
        (F.col("vec_id") + F.lit(int(max_id) + 1)).alias("vec_id"),
        "dvec",
        "norm",
    )
    aug = emb.unionByName(arrivals).localCheckpoint(eager=True)
    return _nsw_beam_search_frames(spark, aug, edges, entries)
