"""Physical-plan assertions: the scale properties the engine claims
(pushdown, pruning, broadcast, zero-exchange bucketed joins, top-k) must be
visible in the plans, not just asserted in docstrings."""

from __future__ import annotations

import pytest

from sdp_spark.plans.registry import load_all

REGISTRY = load_all()


def _plan(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_flagship_pushdown_and_single_shuffle(spark, sf_dir):
    plan = _plan(spark, REGISTRY["agg_groupby"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    simple = _plan(spark, REGISTRY["agg_groupby"].fn(spark, sf_dir), "simple")
    # r14: a round-robin exchange below the partial aggregate fans the
    # single-row-group fixture scan out to every core (the input-skew
    # parallelism guard, OPTIMIZATION_r14.md #4); the DATA shuffle — by
    # the 6 grouping keys — must still happen exactly once.
    assert simple.count("Exchange hashpartitioning") == 1, (
        "flagship should hash-shuffle exactly once (the 6-group aggregate)"
    )
    assert simple.count("Exchange") <= 2, (
        "flagship allows at most the parallelism guard + the aggregate exchange"
    )


def test_partition_pruning_visible(spark, sf_dir):
    plan = _plan(spark, REGISTRY["scan_partition_pruned"].fn(spark, sf_dir))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    # partition column must not be read from data files
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_orderstatus" not in read_schema


def test_broadcast_join_no_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, REGISTRY["join_broadcast"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    # the only hash-partition exchange allowed is the final 25-group aggregate
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_zero_exchange_without_broadcast(spark, sf_dir):
    """With auto-broadcast off, the bucketed join must plan as SortMergeJoin
    over pre-bucketed scans with NO shuffle on either side — the pay-once
    layout property that makes repeated fact⋈fact joins cheap at scale."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, REGISTRY["join_bucketed"].fn(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin")[1]
    assert "Exchange hashpartitioning(c_custkey" not in join_part
    assert "Exchange hashpartitioning(o_custkey" not in join_part


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = _plan(spark, REGISTRY["topk"].fn(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_for_exists(spark, sf_dir):
    plan = _plan(spark, REGISTRY["join_semi"].fn(spark, sf_dir), "simple")
    assert "LeftSemi" in plan


def test_theta_range_join_not_cartesian(spark, sf_dir):
    plan = _plan(spark, REGISTRY["join_theta_range"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("key", ["project_select", "filter_basic", "fn_math"])
def test_no_python_udf_in_relational_paths(spark, sf_dir, key):
    """Relational/scalar-family operators must stay JVM-side (codegen), with
    no BatchEvalPython / ArrowEvalPython stages."""
    plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
    assert "EvalPython" not in plan


def test_whole_stage_codegen_covers_flagship(spark, sf_dir):
    plan = _plan(spark, REGISTRY["agg_groupby"].fn(spark, sf_dir), "codegen")
    assert "WholeStageCodegen" in plan


def test_fulltext_bool_zero_exchange(spark, sf_dir):
    """Boolean-mode fulltext is a row-level codegen predicate: no shuffle,
    no inverted index, filter reaches the scan."""
    plan = _plan(spark, REGISTRY["filter_fulltext_bool"].fn(spark, sf_dir), "simple")
    assert "Exchange" not in plan
    assert "array_contains" in plan
    # `*`-prefixed operators + codegen ids == whole-stage codegen spans
    assert "codegen id" in _plan(
        spark, REGISTRY["filter_fulltext_bool"].fn(spark, sf_dir), "formatted"
    )


def test_fulltext_natural_single_doc_shuffle(spark, sf_dir):
    """Natural-mode fulltext: exactly one single-key doc_id shuffle (the
    final relevance agg); every other exchange carries only query-term
    postings or rides broadcast (df/N sides)."""
    import re

    plan = _plan(spark, REGISTRY["filter_fulltext"].fn(spark, sf_dir), "simple")
    # single-key doc_id exchange appears once ((doc_id, token) pre-agg is a
    # different, matched-rows-only shuffle)
    assert len(re.findall(r"hashpartitioning\(doc_id#\d+L?, \d", plan)) == 1
    assert plan.count("BroadcastExchange") >= 2


def test_ivf_broadcast_and_topk_pushdown(spark, sf_dir):
    """IVF: probes broadcast (candidates never shuffle for the cell
    equi-join); per-query top-5 uses the WindowGroupLimit pushdown; and
    (VERDICT r6 #3) cell ASSIGNMENT is zero-shuffle — the literal-argmax
    rewrite leaves the final top-k ranking window as the plan's ONLY
    shuffle (the old crossJoin+row_number shape had a second,
    N x K-row hashpartitioning(vec_id) exchange just to rank cells)."""
    plan = _plan(spark, REGISTRY["llm_sim_search_ivf"].fn(spark, sf_dir), "simple")
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_join_hint_forces_shuffled_hash(spark, sf_dir):
    """The SHUFFLE_HASH hint must override Catalyst's default choice."""
    plan = _plan(spark, REGISTRY["join_hinted"].fn(spark, sf_dir), "simple")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("key", ["project_enum_check", "project_set_check", "fn_time_year"])
def test_type_semantics_ops_zero_exchange(spark, sf_dir, key):
    """ENUM/SET/TIME-YEAR mapping ops are pure per-row projections: a single
    codegen Project over the scan — no exchange, no Python eval."""
    plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
    assert "Exchange" not in plan, f"{key} must not shuffle"
    assert "Python" not in plan, f"{key} must stay JVM-side"
    # NB: higher-order fns (forall in set_check) eval JVM-interpreted, not
    # whole-stage-codegen — still no Exchange and no Python, which is the
    # scale property being pinned here.


def test_near_resolve_no_cartesian(spark, sf_dir):
    """The keeper-resolution output plan must contain no all-pairs product
    (candidate generation is the shingle equi-join, propagation is key
    joins)."""
    plan = _plan(spark, REGISTRY["llm_dedup_near_resolve"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan


def test_insert_ignore_anti_join_shape(spark, sf_dir):
    """INSERT IGNORE plans the key-conflict check as a (broadcast) anti
    join, not a cartesian filter."""
    from sdp_spark.operators.scans import sink_insert_ignore  # noqa: F401

    # inspect the pre-write plan by rebuilding the merge expression
    from sdp_spark.sources.fixtures import table
    from pyspark.sql import functions as F

    orders = table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    incoming = orders.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    merged = incoming.join(target, "o_orderkey", "left_anti")
    plan = _plan(spark, merged, "simple")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_range_bucketed_join_is_hash_not_nested_loop(spark, sf_dir):
    """The bucketed interval join's whole point: the derived month-bucket
    equi key makes Catalyst plan a hash/merge join with the range residual —
    never a nested-loop/cartesian over orders x lineitem."""
    plan = _plan(spark, REGISTRY["join_range_bucketed"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_capstone_queries_broadcast_dims_and_topk(spark, sf_dir):
    """Q3/Q10 shapes: dimension sides broadcast, top-k plans as
    TakeOrderedAndProject (no global sort)."""
    for key in ("query_shipping_priority", "query_returned_items"):
        plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan, key
        assert "TakeOrderedAndProject" in plan, key


def test_autoincrement_no_global_sort(spark, sf_dir):
    """Dense-id assignment must never plan a single-partition global sort:
    the window partitions by bucket id (rangepartitioning / SinglePartition
    windows only appear if a global orderBy sneaks in)."""
    from sdp_spark.operators.scans import _autoincrement_ids

    plan = _plan(spark, _autoincrement_ids(spark, sf_dir), "simple")
    assert "rangepartitioning" not in plan.lower(), "global sort in id assignment"
    assert "SinglePartition" not in plan, "single-partition window in id assignment"


def test_cross_split_dedup_broadcast_anti(spark, sf_dir):
    plan = _plan(spark, REGISTRY["llm_cross_split_dedup"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_zscore_broadcast_no_fact_shuffle(spark, sf_dir):
    """win_zscore must never hash-shuffle the fact on its 3-value group key:
    the stats side broadcasts, the fact stays unshuffled."""
    plan = _plan(spark, REGISTRY["win_zscore"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan, "low-cardinality window would bottleneck at scale"


def test_aqe_skew_join_split_kicks_in(spark, sf_dir):
    """Skew-resilience evidence for the 100-TB claim (VERDICT r4 #6): over
    a deliberately hot-keyed build side (one key holding ~83% of rows), AQE
    must split the skewed shuffle partition — the executed plan shows
    SortMergeJoin(skew=true) and a skewed AQEShuffleRead — while the result
    stays exactly correct. Thresholds are scaled down to fixture size; on a
    cluster the defaults (256MB threshold, factor 5) encode the same rule.

    Scale note proven by construction here: the skew split applies when the
    join feeds a non-hash-distributed consumer (global agg / sink); a
    downstream groupBy on the join key inhibits OptimizeSkewedJoin because
    splitting would break the required hash distribution — the salted-join
    operator (join_salted) is the engine's answer for THAT shape.
    """
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") < 250000, F.lit(0)).otherwise(F.col("id") % 64).alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        right = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("w")
        )
        out = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )
        row = out.collect()[0]
        assert row["n"] == 300000 and row["sv"] == 89999700000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not kick in:\n{plan[:2000]}"
        assert any(
            "AQEShuffleRead" in line and "skewed" in line for line in plan.splitlines()
        ), "expected a skewed AQEShuffleRead node"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_files_cluster_both_dims(spark, sf_dir):
    """sink_zorder's physical claim: after the Morton-key range-partitioned
    sorted write, EVERY parquet file's min/max bounding box is tight on
    BOTH dimensions (each zkey block spans <= a quarter of each dim's
    0..255 range, vs ~the full range for an unclustered write) — so a
    selective filter on either column prunes most files by footer stats."""
    from pyspark.sql import functions as F

    from sdp_spark.sources.fixtures import cache_dir

    # materialize the layout (idempotent per cache_dir)
    REGISTRY["sink_zorder"].fn(spark, sf_dir).collect()
    out = cache_dir(sf_dir, "orders_zorder")
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("xb") - F.min("xb")).alias("span_x"),
            (F.max("yb") - F.min("yb")).alias("span_y"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(per_file) >= 8, "range partitioning should emit many files"
    avg_x = sum(r["span_x"] for r in per_file) / len(per_file)
    avg_y = sum(r["span_y"] for r in per_file) / len(per_file)
    # z-curve bound: 16 zkey blocks -> top-2 bits of each dim fixed per
    # block => per-block span <= 64; range boundaries straddle blocks, so
    # allow 2x slack — still far below the ~255 span of an unsorted write
    assert avg_x < 128 and avg_y < 128, (avg_x, avg_y)


def test_found_rows_page_is_topk_plus_broadcast_count(spark, sf_dir):
    """limit_found_rows: the page must plan as TakeOrderedAndProject (per-
    partition heap, never a global sort) and the total as a broadcast
    1-row aggregate — the scan is read twice but sorted zero times."""
    plan = _plan(spark, REGISTRY["limit_found_rows"].fn(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row count rides a broadcast
    assert "Sort " not in plan, "no global sort allowed"


def test_ohlc_single_partial_final_aggregate(spark, sf_dir):
    """agg_ohlc_resample: one exchange (bar states), map-side combine
    visible as partial min_by/max_by, and no window operator."""
    plan = _plan(spark, REGISTRY["agg_ohlc_resample"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min_by" in plan and "partial_max_by" in plan
    assert "Window" not in plan


def test_scd2_pointintime_is_hash_join_one_version_per_fact(spark, sf_dir):
    """join_scd2_pointintime: the equi conjunct must plan a (broadcast)
    hash join with the validity range as residual — never BNLJ/cartesian —
    and validity windows partition time, so each fact matches exactly one
    dimension version."""
    df = REGISTRY["join_scd2_pointintime"].fn(spark, sf_dir)
    plan = _plan(spark, df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    total = df.count()
    distinct_orders = df.select("o_orderkey").distinct().count()
    assert total == distinct_orders, "a fact matched more than one version"


def test_q18_semi_join_on_aggregate(spark, sf_dir):
    """query_large_volume_cust: the IN-over-aggregated-subquery must plan
    as a LEFT SEMI join against the HAVING-filtered aggregate — never a
    cartesian/BNLJ — and the threshold filter must sit on the DECIMAL sum."""
    plan = _plan(spark, REGISTRY["query_large_volume_cust"].fn(spark, sf_dir), "simple")
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q5_q7_broadcast_dims_no_cartesian(spark, sf_dir):
    """Q5/Q7 shapes: every dimension rides a broadcast, the cross-dimension
    predicates (same-nation equality / nation-pair disjunction) evaluate as
    residuals on hash joins — never a cartesian or nested-loop plan."""
    for key in ("query_local_supplier_volume", "query_volume_shipping"):
        plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan, key
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key


def test_q19_extracts_pushable_conjuncts(spark, sf_dir):
    """Q19 shape: from the OR-of-ANDs, Catalyst must extract the
    single-side implications and push them below the join — the part scan
    sees a brand IN-list and the lineitem scan sees the quantity bound."""
    plan = _plan(spark, REGISTRY["query_disjunctive_parts"].fn(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    part_pushed = [ln for ln in pushed if "p_brand" in ln]
    fact_pushed = [ln for ln in pushed if "l_quantity" in ln]
    assert part_pushed, "brand disjunction not pushed to the part scan"
    assert fact_pushed, "quantity bound not pushed to the lineitem scan"


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """Q22 shape: NOT EXISTS lowers to an anti join, the scalar average is
    a broadcast (1-row) input, and the dormancy date pushes to the orders
    scan."""
    df = REGISTRY["query_dormant_customers"].fn(spark, sf_dir)
    simple = _plan(spark, df, "simple")
    assert "LeftAnti" in simple
    assert "CartesianProduct" not in simple
    formatted = _plan(spark, df)
    assert any(
        "PushedFilters" in ln and "o_orderdate" in ln
        for ln in formatted.splitlines()
    ), "dormancy date not pushed to the orders scan"


def test_runtime_bloom_filter_injected_on_fact_scan(spark, sf_dir):
    """join_runtime_bloom: the optimizer must plant a bloom_filter_agg on
    the selective dim side and a might_contain predicate on the FACT side
    — and the frozen plan must survive the operator's conf restore."""
    df = REGISTRY["join_runtime_bloom"].fn(spark, sf_dir)
    plan = _plan(spark, df, "formatted")
    assert "might_contain" in plan, "runtime bloom filter not injected"
    assert "bloom_filter_agg" in plan, "bloom build side missing"
    # and the session confs were restored (fixture-scale pins don't leak)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_dpp_prunes_fact_partitions_at_runtime(spark, sf_dir):
    """join_dpp: the fact scan's PartitionFilters must carry a
    dynamicpruningexpression fed by the dim-side broadcast — runtime
    directory pruning, not a static filter."""
    plan = _plan(spark, REGISTRY["join_dpp"].fn(spark, sf_dir))
    assert "dynamicpruningexpression" in plan, "no DPP on the fact scan"
    assert "BroadcastHashJoin" in plan


def test_existence_join_planned(spark, sf_dir):
    """join_existence: the projected EXISTS must plan as ONE ExistenceJoin
    hash join, not a per-row subquery."""
    plan = _plan(spark, REGISTRY["join_existence"].fn(spark, sf_dir), "simple")
    assert "ExistenceJoin" in plan
    assert plan.count("Join") >= 1 and "CartesianProduct" not in plan


# Exchange-count budgets for the composed capstones: a plan that suddenly
# shuffles more than its budget has lost a broadcast or gained an extra
# stage — the regression a bench run on a noisy sandbox cannot detect.
# Budgets are CURRENT counts (asserted <=), not aspirations.
_CAPSTONE_EXCHANGE_BUDGET = {
    "query_shipping_priority": 2,
    "query_returned_items": 3,
    "query_late_orders": 2,
    "query_cust_order_counts": 3,
    "query_large_volume_cust": 4,
    "query_local_supplier_volume": 3,
    "query_volume_shipping": 3,
    "query_promo_effect": 1,
    "query_top_supplier": 2,
    "query_disjunctive_parts": 1,
    "query_dormant_customers": 2,
    "query_forecast_revenue": 1,
    "query_small_qty_orders": 1,
    "query_outbreak_ears": 3,
    # all three EARS variants ride ONE daily-count + window chain (the
    # variant pivot is a stack() Generate, not a per-variant recompute):
    # count agg + window repartition + final sort, same as the C2 key.
    "query_outbreak_ears_family": 3,
    # serfling core (daily agg + moments/resid rollups off the
    # checkpointed daily) + one burden/onset rollup + final sort;
    # the coef/sigma/onset frames all broadcast
    "ts_excess_burden": 5,
    "ts_epidemic_onset": 5,
    "query_market_share": 2,
    "query_product_profit": 2,
    "query_shipmode_priority": 2,
    "query_parts_supplier_cnt": 2,
    "query_waiting_suppliers": 2,
    # Q2/Q20 scan the offer/fact CTE twice by decorrelation design — the
    # per-group aggregate and its correlated threshold share a shuffle key.
    "query_min_cost_supplier": 5,
    # Q11's scale-free threshold needs COUNT(DISTINCT partkey) — the
    # distinct-expand adds one exchange to the totals branch.
    "query_important_stock": 3,
    "query_dominant_suppliers": 5,
}


def test_q21_decorrelates_to_semi_and_anti(spark, sf_dir):
    """query_waiting_suppliers: both correlated subqueries (EXISTS / NOT
    EXISTS over lineitem with outer references to l1 AND o) must lower to
    left-semi / left-anti hash joins on orderkey — never a per-row
    re-execution and never a cartesian."""
    plan = _plan(spark, REGISTRY["query_waiting_suppliers"].fn(spark, sf_dir), "simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("key,budget", sorted(_CAPSTONE_EXCHANGE_BUDGET.items()))
def test_capstone_exchange_budget(spark, sf_dir, key, budget):
    plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
    n = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n <= budget, f"{key}: {n} exchanges (budget {budget}) — lost a broadcast?"
    assert "CartesianProduct" not in plan, key


def test_interval_overlap_join_not_cartesian(spark, sf_dir):
    """The bin-and-verify interval join's whole point: Catalyst must see an
    EQUI join on the bucket key (hash shuffle or broadcast), never a
    nested-loop over the interval theta predicate."""
    plan = _plan(
        spark, REGISTRY["join_interval_overlap"].fn(spark, sf_dir), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dq_anomaly_iqr_broadcasts_fences(spark, sf_dir):
    """The per-group fence table is tiny (one row per priority) — it must
    join back onto the orders scan as a broadcast, keeping the outlier
    filter map-side."""
    plan = _plan(spark, REGISTRY["dq_anomaly_iqr"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan


def test_quality_c4_single_scan_no_shuffle(spark, sf_dir):
    """C4 filtering is per-row lambda codegen: no Exchange, no Python."""
    plan = _plan(spark, REGISTRY["llm_quality_c4"].fn(spark, sf_dir), "simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_repetition_ngram_zero_shuffle_no_python(spark, sf_dir):
    """llm_repetition_ngram claims a pure map-side codegen pipeline: no
    exchange, no Python evaluation anywhere in the plan."""
    plan = _plan(spark, REGISTRY["llm_repetition_ngram"].fn(spark, sf_dir), "simple")
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_interpolate_single_window_shared_sort(spark, sf_dir):
    """ts_interpolate_linear: both window directions (backward fill anchor,
    forward fill anchor) must evaluate in ONE Window operator over one
    user_id sort — not two sorts or two shuffles."""
    plan = _plan(spark, REGISTRY["ts_interpolate_linear"].fn(spark, sf_dir), "simple")
    assert plan.count("Window") == 1
    import re

    # exactly one single-key user_id exchange feeds the window (the daily
    # aggregate's (user_id, day) exchange is a different, compound key)
    assert len(re.findall(r"Exchange hashpartitioning\(user_id#\d+L, \d+\)", plan)) == 1


def test_rolling_corr_single_window(spark, sf_dir):
    """win_rolling_corr: all five sufficient-statistic sliding sums plus
    the frame count share one Window operator / one user_id shuffle."""
    plan = _plan(spark, REGISTRY["win_rolling_corr"].fn(spark, sf_dir), "simple")
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_histogram_broadcasts_minmax(spark, sf_dir):
    """agg_histogram_equiwidth: the 1-row min/max aggregate must broadcast
    into the binning pass (BroadcastNestedLoopJoin over a single row), and
    the binning side must not shuffle before its partial aggregate."""
    plan = _plan(spark, REGISTRY["agg_histogram_equiwidth"].fn(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_weighted_percentile_collapses_before_window(spark, sf_dir):
    """agg_weighted_percentile: the fact rows collapse to per-(group,
    value) weight partials BEFORE any window — the sort runs over the
    value histogram, never the fact table — and both window specs share
    one single-key l_returnflag exchange (the other l_returnflag
    exchanges are the collapse aggregate's and the final min's)."""
    plan = _plan(spark, REGISTRY["agg_weighted_percentile"].fn(spark, sf_dir), "simple")
    import re

    # the collapse: a hash aggregate keyed on (l_returnflag, l_quantity)
    # sits below the window's sort
    win_at = plan.index("Window")
    assert re.search(
        r"HashAggregate\(keys=\[l_returnflag#\d+, l_quantity#\d+\]", plan[win_at:]
    ), "window must consume the collapsed (group, value) partials"
    assert len(re.findall(r"Exchange hashpartitioning\(l_returnflag#\d+, \d+\)", plan)) <= 2


def test_cusum_windows_share_sort(spark, sf_dir):
    """query_outbreak_cusum: the running sum and running min share one
    (event_type, d) window sort — the reflection identity costs one
    shuffle, not two."""
    plan = _plan(spark, REGISTRY["query_outbreak_cusum"].fn(spark, sf_dir), "simple")
    # two cascaded Window nodes (min(cu) depends on cu) over ONE Sort — no
    # exchange or re-sort between them
    assert plan.count("Window") == 2
    assert plan.count("Sort") == 1


# --- round 8 additions -----------------------------------------------------


def test_drift_psi_single_scan_no_join(spark, sf_dir):
    """PSI is one conditional-agg pass: exactly one parquet scan of orders,
    no join operator anywhere in the plan."""
    plan = _plan(spark, REGISTRY["dq_drift_psi"].fn(spark, sf_dir), "simple")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_changepoint_windows_share_one_sort(spark, sf_dir):
    """Both changepoint frames ride the same (event_type, ts, event_id)
    sort: one window exchange, one sort."""
    plan = _plan(spark, REGISTRY["ts_changepoint_meanshift"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 1


def test_market_basket_broadcasts_dims_no_cartesian(spark, sf_dir):
    """Pair generation must stay keyed on l_orderkey (never all-pairs); the
    item totals and the single-row order count ride broadcasts; top-100 is
    TakeOrdered, not a global sort."""
    plan = _plan(spark, REGISTRY["agg_market_basket"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_sample_importance_zero_shuffle_no_python(spark, sf_dir):
    """Importance sampling is a pure codegen row predicate."""
    plan = _plan(spark, REGISTRY["llm_sample_importance"].fn(spark, sf_dir), "simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_winnow_zero_join_single_shuffle(spark, sf_dir):
    """Winnowing is per-row array work; the only exchange is the final
    distinct over the already-thinned fingerprints."""
    plan = _plan(spark, REGISTRY["llm_winnow_fingerprint"].fn(spark, sf_dir), "simple")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_boilerplate_join_keyed_not_cartesian(spark, sf_dir):
    plan = _plan(spark, REGISTRY["llm_boilerplate_ngrams"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cdc_chunk_no_generator_filter_pushdown(spark, sf_dir):
    """The chunker's heavy array pipeline must evaluate ONCE, above the
    parallelizing exchange: an inner posexplode lets Catalyst infer a
    size(chunks) > 0 filter and push the whole chunk expression below the
    repartition onto the single scan split (a measured 36x slowdown at
    sf0.1). posexplode_outer + explicit null filter keeps the scan-side
    Filter free of the md5 window hashing."""
    plan = _plan(spark, REGISTRY["llm_cdc_chunk"].fn(spark, sf_dir), "simple")
    scan_side = plan.split("Exchange")[-1]  # everything below the exchange
    assert "md5" not in scan_side, "chunk hashing leaked below the exchange"
    assert "Generate posexplode" in plan


def test_feature_hash_two_exchanges_no_join(spark, sf_dir):
    """The hashing-trick vectorizer is explode + one (doc, dim) partial
    agg + one per-doc window: exactly two hash exchanges beyond the
    wide_table repartition, no join, no Python."""
    plan = _plan(spark, REGISTRY["llm_embed_feature_hash"].fn(spark, sf_dir), "simple")
    assert "Join" not in plan and "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_quality_classifier_weights_are_literals(spark, sf_dir):
    """The classifier's weights must fold into the aggregation as codegen
    literals — no weight-table join, no extra shuffle beyond the
    vectorizer's own two."""
    plan = _plan(
        spark, REGISTRY["llm_quality_classifier_linear"].fn(spark, sf_dir), "simple"
    )
    assert "Join" not in plan and "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_patch_grid_no_joins_two_exchanges(spark, sf_dir):
    """mm_patch_grid is metadata-only arithmetic: no join of any kind,
    exactly the shape-agg exchange plus the presentation sort."""
    plan = _plan(spark, REGISTRY["mm_patch_grid"].fn(spark, sf_dir), "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_spatial_cell_ops_broadcast_offsets(spark, sf_dir):
    """Moran's I and the hotspot scan must join the tiny cell frame
    against the offset table via BROADCAST — a sort-merge there would
    shuffle per neighbor probe; and the point->cell collapse must be a
    partial-agg (hash aggregate), never a sort-based one."""
    for key in ("agg_moran_grid", "query_spatial_hotspot"):
        plan = _plan(spark, REGISTRY[key].fn(spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan, key
        assert "SortMergeJoin" not in plan, key


def test_fulltext_phrase_single_exchange_no_join(spark, sf_dir):
    """The phrase operator's Spark side is one corpus explode + one
    per-doc count: the adjacency pairing runs inside codegen (no
    positional self-join), and the only exchange is the count agg
    (top-k is TakeOrderedAndProject, not a global sort)."""
    plan = _plan(spark, REGISTRY["filter_fulltext_phrase"].fn(spark, sf_dir), "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "TakeOrderedAndProject" in plan


def test_holt_is_arrow_grouped_map(spark, sf_dir):
    """ts_holt_linear's recursion runs as ONE Arrow grouped-map over the
    pre-aggregated daily frame — FlatMapGroupsInPandas (Arrow batch),
    never row-at-a-time BatchEvalPython, and the daily partial-agg is
    the only data-scale exchange upstream of it."""
    plan = _plan(spark, REGISTRY["ts_holt_linear"].fn(spark, sf_dir), "simple")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_txn_changes_single_keyed_join_no_bnlj(spark, sf_dir):
    """The change feed diffs two snapshots with ONE join keyed on the
    table key — never a nested-loop/cartesian pairing — and the
    changed-row filter stays a plain Filter above it (row-local, no
    second exchange beyond the join's own key partitioning)."""
    plan = _plan(spark, REGISTRY["dml_txn_changes"].fn(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    join_line = next(
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    )
    assert "a_key" in join_line and "b_key" in join_line, join_line


def test_txn_time_travel_versions_never_join(spark, sf_dir):
    """AS OF v1 + AS OF v2 union their partial aggs — no join between
    versions, and each side is a map-side partial agg before the single
    group-key exchange."""
    plan = _plan(
        spark, REGISTRY["dml_txn_time_travel"].fn(spark, sf_dir), "simple"
    )
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node
    assert "Union" in plan
    assert plan.count("partial_count") >= 2  # one partial agg per version


def test_catalog_privileges_broadcast_only(spark, sf_dir):
    """The privilege catalog is dictionary-scale: every join rides a
    broadcast (no shuffle joins, no cartesian beyond the deliberate
    10x10 grant expansion which itself must be a broadcast NLJ, not a
    shuffle)."""
    plan = _plan(spark, REGISTRY["catalog_privileges"].fn(spark, sf_dir), "simple")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
