"""Full-text search — MySQL 5.6 InnoDB FULLTEXT ``MATCH ... AGAINST``
analogue (the deployed engine supports FULLTEXT on InnoDB as of 5.6;
[ENGINE] pinned at mysql-persistent-template.json:68).

Two modes, like the reference engine:

- natural-language mode → per-doc relevance score over the query terms.
  MySQL's internal ranking formula is undocumented/engine-specific; the
  portable semantics ("docs containing query terms, ranked by TF×IDF-style
  relevance, non-matching docs absent") are reproduced with an explicit
  TF × ln((N+1)/(df+1)) weight so the score is cross-engine exact.
- boolean mode → ``+term -term`` required/excluded predicates.

Scale notes: the inverted shape (token → doc postings) is built by an
explode + groupBy — the same distributed inverted-index construction as
llm_tfidf_topterms. The per-term df lookup is a broadcast join (query terms
are a handful of rows); the scan never re-shuffles by token for boolean
mode, which is a pure codegen array predicate pushed at the row level.
Per-term weights are snapped to the 1e-8 grid and summed as DECIMAL so
relevance is order-independent (AQE/partitioning re-plans at 100 TB cannot
change results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.functions.num import DEC
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.13 fulltext"

# natural-language query: MATCH(text) AGAINST('query spark join')
_FT_TERMS = ("query", "spark", "join")
_FT_IN = "('" + "', '".join(_FT_TERMS) + "')"


# Matched-term postings (doc_id, token, tf), cached per (app, sf_dir): tf
# and df both consume it, so the corpus is tokenized ONCE, not once per
# subtree (at 100 TB each uncached subtree is a full corpus explode).
_TF_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cached_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TF_CACHE:
        d = table(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
        tok = d.select("doc_id", F.explode("toks").alias("token"))
        matched = tok.filter(F.col("token").isin(*_FT_TERMS))
        _TF_CACHE[key] = (
            matched.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).cache()
        )
    return _TF_CACHE[key]


@register(
    "filter_fulltext",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
           UNNEST(toks) AS t(token)
    ), tfq AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token IN {_FT_IN} GROUP BY 1, 2
    ), dfq AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df
      FROM tok WHERE token IN {_FT_IN} GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tfq.doc_id,
           CAST(ROUND(SUM(CAST(
                  FLOOR(tfq.tf * ln((n.n_docs + 1.0) / (dfq.df + 1.0))
                        * 100000000 + 0.5) / 100000000
                AS DECIMAL(30,8))), 6) AS DOUBLE) AS relevance
    FROM tfq JOIN dfq USING (token) CROSS JOIN n
    GROUP BY 1
    """,
    section=_SEC,
)
def filter_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH(text) AGAINST('query spark join') in natural-language mode:
    docs containing >= 1 query term, scored SUM_term tf × ln((N+1)/(df+1)).
    Postings for the query terms only (filter pushed below the tf agg); the
    cached tf postings feed BOTH the per-doc scores and the df counts (one
    corpus tokenization), df = COUNT(*) per token over tf — each (doc,
    token) appears once, so it equals COUNT(DISTINCT doc). df/N sides are
    broadcast; the corpus shuffles once, by (doc_id, token), and only for
    rows matching the query terms."""
    d = table(spark, sf_dir, "documents")
    tf = _cached_tf(spark, sf_dir)
    dfc = tf.groupBy("token").agg(F.count("*").alias("df"))
    ndf = d.agg(F.count("*").alias("n_docs"))
    # per-term weight snapped to the 1e-8 grid, summed exactly as DECIMAL —
    # relevance is identical under any aggregation order
    w = (
        F.floor(
            F.col("tf")
            * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            * 100000000
            + 0.5
        )
        / 100000000
    )
    return (
        tf.join(F.broadcast(dfc), "token")
        .crossJoin(F.broadcast(ndf))
        .withColumn("w", w.cast(DEC))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).cast("double").alias("relevance"))
    )


@register(
    "filter_fulltext_bool",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE list_contains(string_split(text, ' '), 'stream')
      AND NOT list_contains(string_split(text, ' '), 'window')
    """,
    section=_SEC,
)
def filter_fulltext_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH(text) AGAINST('+stream -window' IN BOOLEAN MODE): required /
    excluded terms as row-level array predicates — one codegen Filter, no
    inverted index, no shuffle."""
    d = table(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    return d.filter(
        F.array_contains("toks", "stream") & ~F.array_contains("toks", "window")
    ).select("doc_id", "lang", "n_chars")
