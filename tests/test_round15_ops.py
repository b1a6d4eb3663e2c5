"""Round-15 optimization pins: the Arrow-vectorized scoring paths must be
BIT-IDENTICAL to the JVM zip_with/aggregate folds they replaced (per-
dimension accumulation == the interpreted left fold, IEEE-754 doubles),
and the TF-IDF count-window df must equal the old countDistinct groupBy.
These tests recompute the OLD expression inline and require eqNullSafe
equality on the raw doubles — stricter than the 4-dp rounded oracle."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _fold_dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def test_knn_graph_arrow_dot_bit_identical_to_jvm_fold(spark, sf_dir):
    """Recompute every emitted (vec_id, neighbor_id) edge's cosine with the
    old JVM fold and require exact equality on the 4-dp values AND that the
    raw fold reproduces them under the same dround — i.e. the Arrow per-dim
    accumulation changed nothing, not even the last ulp before rounding."""
    from sdp_spark.functions.num import dround
    from sdp_spark.operators.llm import _emb_normed

    out = REGISTRY["llm_knn_graph"].fn(spark, sf_dir).select(
        "vec_id", "neighbor_id", "cos_sim"
    )
    emb = _emb_normed(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_id"), F.col("dvec").alias("va"), F.col("norm").alias("na"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("dvec").alias("vb"), F.col("norm").alias("nb"))
    ref = out.join(a, "vec_id").join(b, "neighbor_id").withColumn(
        "ref_cos", dround(_fold_dot("va", "vb") / (F.col("na") * F.col("nb")), 4)
    )
    mismatches = ref.filter(~F.col("cos_sim").eqNullSafe(F.col("ref_cos"))).count()
    assert mismatches == 0


def test_cell_topk_cogroup_matches_jvm_fold(spark, sf_dir):
    """_cell_topk_edges (cogrouped-Arrow scoring) must emit the identical
    (vec_id, neighbor_id, cos_sim, rnk) set as the old JVM-fold join."""
    from sdp_spark.functions.num import dround
    from sdp_spark.operators.llm import _NSW_K, _cell_topk_edges, _knng_assigned

    both = _knng_assigned(spark, sf_dir).select(
        "vec_id", "dvec", F.explode("cells").alias("cell")
    )
    new = _cell_topk_edges(both, both, _NSW_K)

    # the pre-r15 shape, inline
    a = both.select("cell", "vec_id", F.col("dvec").alias("va"))
    b = both.select(
        "cell", F.col("vec_id").alias("neighbor_id"), F.col("dvec").alias("vb")
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", dround(_fold_dot("va", "vb"), 4).alias("cos_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    old = (
        scored.repartition("vec_id")
        .groupBy("vec_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _NSW_K)
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_refine_pair_dots_bit_identical(spark, sf_dir):
    """The refined edge list's cosines must equal the JVM fold over the
    same unit vectors (the _nndescent_refine Arrow pair-scoring path)."""
    from sdp_spark.functions.num import dround
    from sdp_spark.operators.llm import _NSW_K, _emb_normed, _ivf_knn_edges

    edges = _ivf_knn_edges(spark, sf_dir, k_out=_NSW_K).select(
        "vec_id", "neighbor_id", "cos_sim"
    )
    emb = _emb_normed(spark, sf_dir)
    unit = emb.select(
        "vec_id", F.transform("dvec", lambda x: x / F.col("norm")).alias("uv")
    )
    ref = (
        edges.join(unit.withColumnRenamed("uv", "va"), "vec_id")
        .join(
            unit.select(F.col("vec_id").alias("neighbor_id"), F.col("uv").alias("vb")),
            "neighbor_id",
        )
        .withColumn("ref_cos", dround(_fold_dot("va", "vb"), 4))
    )
    assert ref.filter(~F.col("cos_sim").eqNullSafe(F.col("ref_cos"))).count() == 0


def test_tfidf_window_df_equals_countdistinct(spark, sf_dir):
    """df via COUNT(*) OVER (PARTITION BY token) on the tf frame must equal
    the old countDistinct(source) groupBy, value- and dtype-exact."""
    from sdp_spark.operators.llm import _docs_tokens

    out = REGISTRY["llm_tfidf_topterms"].fn(spark, sf_dir)
    tok = _docs_tokens(spark, sf_dir).select(
        "source", F.explode("toks").alias("token")
    )
    old_df = tok.groupBy("token").agg(F.countDistinct("source").alias("ref_df"))
    joined = out.join(old_df, "token")
    assert joined.filter(F.col("df") != F.col("ref_df")).count() == 0
    assert dict(out.dtypes)["df"] == "bigint"


def test_propagate_loop_sum_probe_fixpoint(spark, sf_dir):
    """The Σ(label) stall probe must land on the true min-label fixpoint:
    one more propagate round over the returned labels changes nothing."""
    from sdp_spark.operators.llm import _propagate_labels, llm_dedup_ngram_jaccard

    labels = _propagate_labels(spark, sf_dir)
    pairs = llm_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst")
    # llm_dedup_near may run the collapse branch at some fixtures; the
    # rep-graph projection makes labels a fixpoint of the MEMBER graph too,
    # so one more min-propagate round must be a no-op either way.
    nbr = (
        edges.join(labels, F.col("dst") == F.col("node"))
        .groupBy("src")
        .agg(F.min("label").alias("nbr_label"))
        .withColumnRenamed("src", "node")
    )
    moved = (
        labels.join(nbr, "node", "left")
        .filter(
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            )
            != F.col("label")
        )
        .count()
    )
    assert moved == 0
