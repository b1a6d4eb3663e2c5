"""Graph operators over the trade network — SURVEY.md §2 superset.

The reference's surveillance platform (CDCgov/SDP, README.md:2) feeds
case/contact networks into downstream analysis; the deployed MySQL 5.6
engine (mysql-persistent-template.json:68) can only express joins, so
users run iterative graph metrics OUTSIDE the database. Here they are
first-class: the supplier↔customer bipartite graph is derived from
lineitem→orders (an edge = "supplier shipped to customer at least once")
and the operators run as declarative DataFrame iterations — the same
per-round join+aggregate shape as `llm_dedup_near_resolve`'s label
propagation (llm.py), which is this engine's third iterative exhibit
alongside the recursive CTE (subqueries.py).

Scale notes: edges materialize ONCE as a distinct pair set (one shuffle);
each PageRank round is edges⋈ranks (hash join on src, ranks side is
|V| rows — at 100 TB still orders smaller than edges) + one groupBy(dst)
partial-agg. localCheckpoint per round truncates lineage so the 5-round
plan doesn't exponentiate. No collect() in any loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.functions.num import dround
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.15 graph"


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier→customer edges via lineitem⋈orders. One
    orderkey shuffle + one distinct shuffle; at 100 TB the distinct is
    the dominant exchange and is exactly the dedup any edge-list build
    pays."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("supp"), F.col("o_custkey").alias("cust"))
        .distinct()
    )


@register(
    "graph_degree",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (
      SELECT supp, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY supp
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM deg GROUP BY degree ORDER BY degree
    """,
    section=_SEC,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier side of the trade graph — the
    first question asked of any network (hub detection, skew audit
    before an iterative algorithm: a power-law hub is exactly the key
    that needs salting in the join below). Pure relational lowering:
    edge distinct → per-node count → histogram; three partial-agg
    exchanges, each output orders smaller than its input."""
    deg = (
        _trade_edges(spark, sf_dir)
        .groupBy("supp")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_suppliers"))
        .orderBy("degree")
    )


_PR_ITERS = 5
_PR_DAMP = 0.85
# Broadcast-hint gate for the per-round rank join: past this many nodes the
# hinted broadcast would OOM the driver instead of degrading gracefully
# (ADVICE r5) — fall back to an un-hinted (shuffle) join above it.
_PR_BCAST_MAX_NODES = 2_000_000


@register("graph_pagerank", oracle=None, section=_SEC)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected bipartite trade graph, _PR_ITERS
    fixed rounds, damping {0.85} — the canonical iterative graph metric,
    expressed as pure DataFrame rounds (no RDD, no GraphX): contribs =
    ranks ⋈ edges on src (rank/out_degree), new rank = (1-d) +
    d·Σ contribs per dst, missing-inbound nodes fall back to (1-d) via
    a left join. localCheckpoint per round keeps the plan depth
    constant. Node namespace prefixes ('s:'/'c:') keep the two key
    spaces disjoint.

    rows-only oracle: 5 chained float joins aren't SQL-replayable at
    exact-hash fidelity; pytest pins the invariants instead —
    determinism at 6 dp across runs, total rank mass = |V| within 1e-6,
    and hub monotonicity (higher degree ⇒ rank not lower on the
    fixture's near-uniform graph). Output ranks round via dround(6) so
    float-sum association order can't leak into the hash."""
    e = _trade_edges(spark, sf_dir)
    # undirected: both directions, namespaced ids
    fwd = e.select(
        F.concat(F.lit("s:"), F.col("supp")).alias("src"),
        F.concat(F.lit("c:"), F.col("cust")).alias("dst"),
    )
    rev = e.select(
        F.concat(F.lit("c:"), F.col("cust")).alias("src"),
        F.concat(F.lit("s:"), F.col("supp")).alias("dst"),
    )
    edges = fwd.unionAll(rev)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    edges = edges.join(outdeg, "src").localCheckpoint(eager=False)
    ranks = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("rank")
    )
    # Broadcast only while |V| is broadcast-safe (~16 bytes/row of rank
    # state, so 2M nodes ≈ tens of MB). Above the gate, fall back to an
    # un-hinted join: AQE/stats pick shuffle-hash, and the eager
    # checkpoint means edges re-shuffle per round — correct, just the
    # web-scale price (pre-bucketing edges by src would amortize it).
    use_bcast = ranks.count() <= _PR_BCAST_MAX_NODES
    for _ in range(_PR_ITERS):
        # ranks is |V| rows — broadcast (gated above) so the edge list
        # NEVER shuffles: each round is one map-side hash join over
        # edges + one partial-agg exchange of per-dst sums. Undirected
        # graph ⇒ every node has an inbound edge, so contribs covers
        # ALL nodes and no dangling-node left join is needed. Eager
        # localCheckpoint cuts the round's lineage (a lazy one would
        # nest 5 broadcasts into one action).
        rhs = F.broadcast(ranks) if use_bcast else ranks
        ranks = (
            edges.join(rhs, edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("odeg")).alias("c"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(1.0 - _PR_DAMP) + F.lit(_PR_DAMP) * F.sum("c")
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", dround("rank", 6).alias("rank")).orderBy(
        F.col("rank").desc(), "node"
    )
