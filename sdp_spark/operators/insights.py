"""Insight analytics — round-8 batch 19: surveillance baselines, time-series
diagnostics, behavioral segmentation, categorical statistics, declarative
data-quality expectations, and graph node similarity.

Capability rationale (reference = CDCgov/SDP, an OpenShift/Ansible IaC
deployment of a MySQL-backed surveillance platform — SURVEY.md §0): the
platform's job is public-health surveillance analytics over an event
stream plus star-schema context tables. This module adds the remaining
classical surveillance/BI layers a MySQL analyst would hand-write:

- `query_outbreak_histlimits` — CDC's *historical limits* aberration
  method (the third classical detector beside EARS C2
  `analytics.py:query_outbreak_ears` and CUSUM
  `analytics.py:query_outbreak_cusum`): today's count vs mean+2σ of the
  SAME-WEEKDAY baseline from prior weeks, i.e. a seasonal baseline where
  EARS uses a moving one.
- `ts_autocorr` / `ts_decompose_seasonal` — the series diagnostics run
  before choosing any detector (how periodic is the signal; what is the
  trend/weekday-season/residual split).
- `ts_max_drawdown` — running peak-to-trough of a cumulative measure.
- `agg_rfm_segmentation` / `agg_chi2_independence` — behavioral quintile
  segmentation and the χ² contingency audit between categoricals.
- `dq_expectations_suite` — a Great-Expectations-style declarative
  expectation pass (not-null / unique / in-set / range / regex) evaluated
  in ONE aggregate over the table.
- `graph_common_neighbors` — neighbor-set Jaccard similarity over the
  trade graph (`graphs.py:_trade_edges`).
- `sample_hash_group` — deterministic per-group top-k sampling by
  portable hash order (the reproducible substitute for reservoir
  sampling at cluster scale).

Cross-engine determinism: every score is derived from EXACT integer or
DECIMAL window/group sums and divided/rounded once at the end
(`num.py` dround convention), so Spark and DuckDB emit bit-identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdp_spark.functions.num import DEC, dround, dsum, sql_dround, sql_dsum
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.16 insight analytics"

# Shared daily-count CTE (same shape as analytics.py EARS_SCORED_SQL's
# `daily`): one (type, day) partial+final count collapses the event
# stream to metadata scale before any window work. dow is a portable
# epoch-day mod-7 (Spark dayofweek is 1=Sun..7, DuckDB's is 0=Sun..6 —
# the mod avoids both).
_DAILY_SQL = """
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared memoized rollup (analytics.events_daily); count("*") is
    # already BIGINT, so the frame is identical to the local groupBy this
    # replaced
    from sdp_spark.operators.analytics import events_daily

    return events_daily(spark, sf_dir)


_HL_Z = 2.0
_HL_MIN_BASE = 3

# Full scored frame (event_type, day_s, n, n_base, hl_score, alert) —
# shared verbatim by the batch capstone's oracle and the streaming twin's
# (stream_histlimits_alerts filters it to firing alerts, pinning the live
# path to the batch recurrence the same way EARS/CUSUM pairs do).
HISTLIM_SCORED_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    keyed AS (
      SELECT event_type, day, n,
             date_diff('day', DATE '1970-01-01', day) % 7 AS dow
      FROM daily
    ), based AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS sum_b,
             SUM(n * n) OVER w AS sumsq_b,
             COUNT(*) OVER w AS n_base
      FROM keyed
      WINDOW w AS (PARTITION BY event_type, dow ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), stats AS (
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, n,
             CAST(n_base AS BIGINT) AS n_base,
             CAST(sum_b AS DOUBLE) / n_base AS mu,
             (CAST(sumsq_b AS DOUBLE)
              - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE) / n_base)
               / (n_base - 1) AS var
      FROM based WHERE n_base >= {_HL_MIN_BASE}
    )
    SELECT event_type, day_s, n, n_base,
           {sql_dround("(n - mu) / sqrt(var)", 4)} AS hl_score,
           {sql_dround("(n - mu) / sqrt(var)", 4)} > {_HL_Z} AS alert
    FROM stats WHERE var > 0
"""


def histlimits_scored(daily: DataFrame) -> DataFrame:
    """Historical-limits scoring over a (event_type, day, n) daily-count
    frame: same-weekday prior-weeks baseline, exact BIGINT moments,
    rounded z, alert above 2σ. Shared by the batch capstone and the
    streaming twin (the stream==batch equality is structural, like
    `ears_c2_scored` / `cusum_scored` in analytics.py)."""
    keyed = daily.withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7
    )
    w = (
        Window.partitionBy("event_type", "dow")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    based = keyed.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("sum_b"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sumsq_b"),
        F.count("*").over(w).alias("n_base"),
    ).filter(F.col("n_base") >= _HL_MIN_BASE)
    mu = F.col("sum_b").cast("double") / F.col("n_base")
    var = (
        F.col("sumsq_b").cast("double")
        - F.col("sum_b").cast("double") * F.col("sum_b").cast("double")
        / F.col("n_base")
    ) / (F.col("n_base") - 1)
    z = dround((F.col("n") - mu) / F.sqrt(var), 4)
    return (
        based.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "n",
            F.col("n_base").cast("bigint").alias("n_base"),
            var.alias("var"),
            z.alias("hl_score"),
            (z > _HL_Z).alias("alert"),
        )
        .filter(F.col("var") > 0)
        .drop("var")
    )


@register(
    "query_outbreak_histlimits",
    oracle=f"""
    SELECT event_type, day_s, n, n_base, hl_score, alert
    FROM ({HISTLIM_SCORED_SQL}) t
    ORDER BY event_type, day_s
    """,
    section=_SEC,
)
def query_outbreak_histlimits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC *historical limits* aberration detection: each day's event count
    is z-scored against the mean/sd of the SAME WEEKDAY over all prior
    weeks (a seasonal baseline, vs EARS C2's moving 7-day one — the
    published method compares against comparable historical periods so a
    weekly cycle never masquerades as an outbreak). Requires >= 3 baseline
    points and nonzero variance; alerts above 2σ.

    Determinism: baseline moments are exact BIGINT window sums (counts and
    squared counts); mean/var/z are derived from them with the identical
    IEEE expression on both engines and rounded once (`dround`).

    Scale: the (type, day) rollup is the only event-scale exchange; the
    seasonal window then partitions by (type, dow) over metadata-sized
    input with O(1) running-sum state per row. Exactly the EARS plan with
    a different partition key."""
    return histlimits_scored(_daily(spark, sf_dir)).orderBy(
        "event_type", "day_s"
    )


_ACF_MAX_LAG = 7
_ACF_MIN_PAIRS = 10


@register(
    "ts_autocorr",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
      SELECT a.event_type,
             date_diff('day', b.day, a.day) AS lag,
             a.n AS x, b.n AS y
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type
       AND date_diff('day', b.day, a.day) BETWEEN 1 AND {_ACF_MAX_LAG}
    ), moments AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
           {sql_dround(
               "CAST(n_pairs * sxy - sx * sy AS DOUBLE)"
               " / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)"
               "        * CAST(n_pairs * syy - sy * sy AS DOUBLE))", 4)} AS acf
    FROM moments
    WHERE n_pairs >= {_ACF_MIN_PAIRS}
      AND (n_pairs * sxx - sx * sx) > 0 AND (n_pairs * syy - sy * sy) > 0
    ORDER BY event_type, lag
    """,
    section=_SEC,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 per event type — the periodicity diagnostic run before choosing
    a surveillance baseline (a spike at lag 7 says "use the weekday
    baseline of `query_outbreak_histlimits`, not EARS' moving window").
    Pearson r between (n_t, n_{{t-lag}}) over calendar-aligned day pairs.

    Determinism: all five moments are exact BIGINT sums over integer
    counts; the r quotient casts the two variance factors to double
    BEFORE multiplying (their product can exceed int64 at scale while
    each factor cannot), so both engines evaluate the identical IEEE
    expression.

    Scale: the self-join runs on the metadata-sized daily rollup (|days|
    rows per type), not on events; per (type, lag) the moment agg is one
    partial+final exchange. At 100 TB the daily rollup IS the reduction."""
    daily = _daily(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    lag = F.datediff(F.col("a.day"), F.col("b.day"))
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & lag.between(1, _ACF_MAX_LAG),
    ).select(
        F.col("a.event_type").alias("event_type"),
        lag.alias("lag"),
        F.col("a.n").alias("x"),
        F.col("b.n").alias("y"),
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    var_x = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    acf = dround(num / F.sqrt(var_x.cast("double") * var_y.cast("double")), 4)
    return (
        m.filter(
            (F.col("n_pairs") >= _ACF_MIN_PAIRS) & (var_x > 0) & (var_y > 0)
        )
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            acf.alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@register(
    "ts_decompose_seasonal",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    keyed AS (
      SELECT event_type, day, n,
             date_diff('day', DATE '1970-01-01', day) % 7 AS dow
      FROM daily
    ), trended AS (
      SELECT event_type, day, dow, n,
             SUM(n) OVER w AS sum7, COUNT(*) OVER w AS cnt7
      FROM keyed
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), detrended AS (
      SELECT event_type, day, dow, n, sum7,
             7 * n - sum7 AS detr7
      FROM trended WHERE cnt7 = 7
    ), seasonal AS (
      SELECT event_type, day, n, sum7, detr7,
             SUM(detr7) OVER (PARTITION BY event_type, dow) AS s_detr7,
             COUNT(*) OVER (PARTITION BY event_type, dow) AS cnt_d
      FROM detrended
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, n,
           {sql_dround("CAST(sum7 AS DOUBLE) / 7.0", 4)} AS trend,
           {sql_dround("CAST(s_detr7 AS DOUBLE) / (7.0 * cnt_d)", 4)} AS seasonal,
           {sql_dround(
               "CAST(detr7 * cnt_d - s_detr7 AS DOUBLE) / (7.0 * cnt_d)", 4)}
             AS residual
    FROM seasonal
    ORDER BY event_type, day_s
    """,
    section=_SEC,
)
def ts_decompose_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily series: trend =
    centered 7-day moving average; weekday seasonal = mean detrended
    value per (type, weekday); residual = observation - trend - seasonal
    — the STL-lite every surveillance/BI series gets before anomaly
    thresholds are set on the residual.

    Determinism trick: the detrended value n - sum7/7 is irrational in
    binary, so summing it across engines would drift. Instead the
    integer `detr7 = 7n - sum7` is carried EXACTLY through the seasonal
    group sums, and each output is a single integer-ratio division
    rounded once: trend = sum7/7, seasonal = Σdetr7/(7·cnt),
    residual = (detr7·cnt - Σdetr7)/(7·cnt).

    Scale: one event-scale rollup, then two windows over the daily frame
    — the first a 7-row moving frame per type, the second a whole-
    partition sum over (type, weekday); both metadata-sized."""
    keyed = _daily(spark, sf_dir).withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7
    )
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = keyed.select(
        "event_type",
        "day",
        "dow",
        "n",
        F.sum("n").over(w7).alias("sum7"),
        F.count("*").over(w7).alias("cnt7"),
    ).filter(F.col("cnt7") == 7)
    detrended = trended.withColumn("detr7", F.lit(7) * F.col("n") - F.col("sum7"))
    wd = Window.partitionBy("event_type", "dow")
    seasonal = detrended.select(
        "event_type",
        "day",
        "n",
        "sum7",
        "detr7",
        F.sum("detr7").over(wd).alias("s_detr7"),
        F.count("*").over(wd).alias("cnt_d"),
    )
    return seasonal.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "n",
        dround(F.col("sum7").cast("double") / 7.0, 4).alias("trend"),
        dround(F.col("s_detr7").cast("double") / (7.0 * F.col("cnt_d")), 4).alias(
            "seasonal"
        ),
        dround(
            (F.col("detr7") * F.col("cnt_d") - F.col("s_detr7")).cast("double")
            / (7.0 * F.col("cnt_d")),
            4,
        ).alias("residual"),
    ).orderBy("event_type", "day_s")


@register(
    "ts_max_drawdown",
    oracle=f"""
    WITH curve AS (
      SELECT event_type, ts, event_id, value,
             SUM(CAST(value AS DECIMAL(30,8))) OVER w AS equity
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), peaked AS (
      SELECT event_type, value, equity,
             MAX(equity) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM curve
    )
    SELECT event_type,
           CAST(ROUND(MAX(peak - equity), 2) AS DOUBLE) AS max_drawdown,
           CAST(ROUND(MAX(peak), 2) AS DOUBLE) AS peak_equity,
           {sql_dsum("value")} AS final_equity,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM peaked
    GROUP BY event_type
    ORDER BY event_type
    """,
    section=_SEC,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative value curve per event type:
    running equity = exact-decimal cumulative sum of `value` in (ts,
    event_id) order; running peak = cumulative max of equity; drawdown =
    peak - equity; report the per-type maximum — the peak-to-trough risk
    statistic, and for surveillance the deepest sustained dip of a
    cumulative measure.

    Determinism: the entire curve lives in DECIMAL(30,8) — cumulative
    sums over a uniquely-ordered frame are exact and order-independent,
    and MAX of exact decimals is exact; the single rounding happens at
    output.

    Scale: one hash partition + sort per event_type; both windows share
    the same sort order (one exchange, O(1) running state per row); the
    final agg collapses to |types| rows."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = e.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.sum(F.col("value").cast(DEC)).over(w).alias("equity"),
    )
    peaked = curve.withColumn("peak", F.max("equity").over(w))
    return (
        peaked.groupBy("event_type")
        .agg(
            F.round(F.max(F.col("peak") - F.col("equity")), 2)
            .cast("double")
            .alias("max_drawdown"),
            F.round(F.max("peak"), 2).cast("double").alias("peak_equity"),
            dsum("value").alias("final_equity"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS mon_dec
      FROM orders GROUP BY o_custkey
    ), rec AS (
      -- recency staged in its own CTE: a window expression may not appear
      -- inside another window's ORDER BY (DuckDB parser rule — the same
      -- trap ADVICE r7 flagged on llm_curriculum_order)
      SELECT o_custkey,
             CAST(date_diff('day', last_day, MAX(last_day) OVER ()) AS INTEGER)
               AS recency_days,
             frequency, mon_dec
      FROM cust
    ), scored AS (
      SELECT o_custkey, recency_days, frequency, mon_dec,
             CAST(NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey)
                  AS INTEGER) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey) AS INTEGER)
               AS f_score,
             CAST(NTILE(5) OVER (ORDER BY mon_dec, o_custkey) AS INTEGER)
               AS m_score
      FROM rec
    )
    SELECT o_custkey, recency_days, frequency,
           CAST(ROUND(mon_dec, 2) AS DOUBLE) AS monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    ORDER BY o_custkey
    """,
    section=_SEC,
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, Recency (days since last order,
    relative to the dataset's latest order date), Frequency (order
    count), Monetary (exact-decimal spend), each quintile-scored with
    NTILE(5) (5 = best: most recent / most frequent / highest spend) and
    concatenated into the classic '555' segment code — the behavioral
    segmentation every CRM/BI deployment of the reference's MySQL engine
    hand-writes.

    Determinism: quintile boundaries depend on sort order, so every
    NTILE orders by (metric, custkey) — a total order; Monetary sorts on
    the EXACT decimal sum, never the rounded double.

    Scale: per-customer rollup is one hash exchange; the three NTILEs
    are single-partition sorts over |customers| — at 100 TB replace with
    approx-quantile threshold classification (percentile_approx on the
    three metrics, then a map-side CASE); the output contract is
    unchanged. Emitted per-customer (the segment table a mart stores)."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("mon_dec"),
    )
    w_all = Window.partitionBy()
    rec = F.datediff(F.max("last_day").over(w_all), F.col("last_day"))
    scored = cust.select(
        "o_custkey",
        rec.cast("int").alias("recency_days"),
        "frequency",
        "mon_dec",
    )
    scored = scored.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), "o_custkey"))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "o_custkey"))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("mon_dec", "o_custkey"))
        .cast("int")
        .alias("m_score"),
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round("mon_dec", 2).cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("o_custkey")


@register(
    "agg_chi2_independence",
    oracle=f"""
    WITH obs AS (
      SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), marg AS (
      SELECT o_orderpriority, o_orderstatus, n,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS row_tot,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS col_tot,
             SUM(n) OVER () AS tot
      FROM obs
    ), ex AS (
      SELECT o_orderpriority, o_orderstatus, n,
             CAST(row_tot * col_tot AS DOUBLE) / tot AS expected
      FROM marg
    )
    SELECT o_orderpriority, o_orderstatus, n,
           {sql_dround("expected", 4)} AS expected,
           {sql_dround("(n - expected) * (n - expected) / expected", 6)}
             AS chi2_term,
           {sql_dround("(n - expected) / sqrt(expected)", 4)} AS pearson_resid
    FROM ex
    ORDER BY o_orderpriority, o_orderstatus
    """,
    section=_SEC,
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² contingency audit between order priority and order status:
    observed cell counts vs independence-expected counts
    (row_total·col_total/N), with each cell's χ² contribution and
    Pearson standardized residual — the categorical-association check an
    analyst runs before trusting a segmentation (large |residual| cells
    are where the two dimensions interact). Emitted per cell so the
    driver hash certifies every term (a single global χ² would sum
    doubles in engine-dependent order; the per-cell terms are pure
    IEEE expressions over exact integer marginals).

    Scale: one hash agg to |cells| rows (|priorities|×|statuses|, tiny);
    the marginal windows run on that metadata-sized frame. The bigint
    product row_tot·col_tot stays exact to ~3·10⁹ rows per side."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n")
    )
    marg = obs.select(
        "*",
        F.sum("n").over(Window.partitionBy("o_orderpriority")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("o_orderstatus")).alias("col_tot"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("tot")
    ex = marg.withColumn("expected", expected)
    diff = F.col("n") - F.col("expected")
    return ex.select(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        dround("expected", 4).alias("expected"),
        dround(diff * diff / F.col("expected"), 6).alias("chi2_term"),
        dround(diff / F.sqrt("expected"), 4).alias("pearson_resid"),
    ).orderBy("o_orderpriority", "o_orderstatus")


@register(
    "dq_expectations_suite",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS f_null,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS f_uniq,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
                  AS BIGINT) AS f_set,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS f_pos,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                            AND o_orderdate < TIMESTAMP '2001-01-01'
                           THEN 0 ELSE 1 END) AS BIGINT) AS f_range,
             CAST(SUM(CASE WHEN regexp_matches(o_orderpriority,
                                               '^[1-5]-[A-Z ]+$')
                           THEN 0 ELSE 1 END) AS BIGINT) AS f_regex
      FROM orders
    ), rows_out AS (
      SELECT 'expect_custkey_not_null' AS expectation, n, f_null AS n_failed FROM agg
      UNION ALL
      SELECT 'expect_orderkey_unique', n, f_uniq FROM agg
      UNION ALL
      SELECT 'expect_status_in_set', n, f_set FROM agg
      UNION ALL
      SELECT 'expect_totalprice_positive', n, f_pos FROM agg
      UNION ALL
      SELECT 'expect_orderdate_in_range', n, f_range FROM agg
      UNION ALL
      SELECT 'expect_priority_format', n, f_regex FROM agg
    )
    SELECT expectation, n AS n_rows, n_failed,
           {sql_dround("1.0 - CAST(n_failed AS DOUBLE) / n", 6)} AS pass_rate,
           n_failed = 0 AS passed
    FROM rows_out
    ORDER BY expectation
    """,
    section=_SEC,
)
def dq_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Great-Expectations
    pattern) over `orders`, evaluated in ONE aggregate pass: not-null
    (custkey), uniqueness (orderkey, via count - count distinct), value
    in-set (status), range (positive totalprice; orderdate in
    [1995-01-01, 2001-01-01) — the fixture runs to 2001-08, so this
    expectation FAILS with a real failed-row count), and regex format
    (priority 'N-WORD'). Each expectation emits (n_rows, n_failed,
    pass_rate, passed) — the contract a DQ gate consumes.

    Scale: one partial-agg exchange computes every expectation
    simultaneously (conditional sums fuse into a single scan +
    aggregate; the distinct-count is the only expression with a
    per-key state). The unpivot to report rows runs on ONE row."""
    o = table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.count("*") - F.count("o_custkey")).cast("bigint").alias("f_null"),
        (F.count("*") - F.count_distinct("o_orderkey")).cast("bigint").alias("f_uniq"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0).otherwise(1)
        )
        .cast("bigint")
        .alias("f_set"),
        F.sum(F.when(F.col("o_totalprice") > 0, 0).otherwise(1))
        .cast("bigint")
        .alias("f_pos"),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp")),
                0,
            ).otherwise(1)
        )
        .cast("bigint")
        .alias("f_range"),
        F.sum(
            F.when(F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"), 0).otherwise(1)
        )
        .cast("bigint")
        .alias("f_regex"),
    )
    rows_out = agg.selectExpr(
        """stack(6,
            'expect_custkey_not_null', f_null,
            'expect_orderkey_unique', f_uniq,
            'expect_status_in_set', f_set,
            'expect_totalprice_positive', f_pos,
            'expect_orderdate_in_range', f_range,
            'expect_priority_format', f_regex
        ) AS (expectation, n_failed)""",
        "n",
    )
    return rows_out.select(
        "expectation",
        F.col("n").alias("n_rows"),
        "n_failed",
        dround(1.0 - F.col("n_failed").cast("double") / F.col("n"), 6).alias(
            "pass_rate"
        ),
        (F.col("n_failed") == 0).alias("passed"),
    ).orderBy("expectation")


_CN_TOPK = 20


@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), deg AS (
      SELECT supp, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY supp
    ), pairs AS (
      SELECT e1.supp AS s1, e2.supp AS s2, CAST(COUNT(*) AS BIGINT) AS common
      FROM edges e1 JOIN edges e2
        ON e1.cust = e2.cust AND e1.supp < e2.supp
      GROUP BY 1, 2
    )
    SELECT p.s1, p.s2, p.common,
           {sql_dround(
               "CAST(p.common AS DOUBLE)"
               " / (d1.degree + d2.degree - p.common)", 6)} AS jaccard
    FROM pairs p
    JOIN deg d1 ON p.s1 = d1.supp
    JOIN deg d2 ON p.s2 = d2.supp
    ORDER BY jaccard DESC, p.s1, p.s2
    LIMIT {_CN_TOPK}
    """,
    section=_SEC,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node similarity by neighbor-set Jaccard over the supplier→customer
    trade graph (`graphs.py:_trade_edges`): supplier pairs sharing the
    most customers relative to their combined reach — link prediction /
    'suppliers like this one' (and, for surveillance, facilities with
    overlapping catchment populations). Top-20 by Jaccard with a
    deterministic (s1, s2) tiebreak.

    Scale: the pair generation joins the edge list WITH ITSELF ON THE
    SHARED NEIGHBOR — work is Σ_cust deg(cust)², the standard co-
    occurrence bound, not |V|² all-pairs; a hub customer is the skew key
    and gets capped/salted at true scale (docstring contract: cap
    per-neighbor fanout, the Jaccard of uncapped pairs is unchanged).
    Degrees broadcast (|suppliers| rows) so the rescore is map-side."""
    from sdp_spark.operators.graphs import _trade_edges

    # one lazy checkpoint: the lineitem⋈orders⋈distinct edge build is
    # referenced THREE times below (both sides of the shared-neighbor
    # self-join + the degree frame) — uncheckpointed, the data-scale
    # pass ran three times per invocation (guide §1.2; the
    # _week_edges_packed pattern)
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = edges.groupBy("supp").agg(F.count("*").cast("bigint").alias("degree"))
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    pairs = (
        e1.join(
            e2,
            (F.col("e1.cust") == F.col("e2.cust"))
            & (F.col("e1.supp") < F.col("e2.supp")),
        )
        .groupBy(
            F.col("e1.supp").alias("s1"),
            F.col("e2.supp").alias("s2"),
        )
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    d1 = deg.alias("d1")
    d2 = deg.alias("d2")
    scored = (
        pairs.join(F.broadcast(d1), F.col("s1") == F.col("d1.supp"))
        .join(F.broadcast(d2), F.col("s2") == F.col("d2.supp"))
        .select(
            "s1",
            "s2",
            "common",
            dround(
                F.col("common").cast("double")
                / (F.col("d1.degree") + F.col("d2.degree") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.col("jaccard").desc(), "s1", "s2").limit(_CN_TOPK)


_SHG_K = 5


@register(
    "sample_hash_group",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('smp:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT source, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked WHERE sample_rank <= {_SHG_K}
    ORDER BY source, sample_rank
    """,
    section=_SEC,
)
def sample_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling: keep k=5 documents per source,
    chosen by portable md5 order over a salted key — the reproducible,
    coordination-free substitute for per-group reservoir sampling (the
    hash order is a fixed random permutation, so the k smallest hashes
    ARE a uniform-without-replacement sample, identical on every engine,
    partitioning, and rerun — the property a 1000-executor job needs
    that `rand()` cannot give).

    Scale: one hash partition by group + per-group top-k; no global
    sort, no driver state. With heavy skew, pre-aggregate per partition
    (each partition keeps its local k smallest hashes, then re-rank) —
    the classic two-level top-k."""
    d = table(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= _SHG_K)
        .select("source", "doc_id", F.col("sample_rank").cast("int"))
        .orderBy("source", "sample_rank")
    )


@register(
    "agg_markov_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           {sql_dround(
               "CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)", 6)}
             AS p
    FROM pairs
    ORDER BY prev_type, next_type
    """,
    section=_SEC,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    P(next_type | prev_type) estimated from adjacent event pairs within
    each user's (ts, event_id)-ordered stream — the behavioral model
    behind funnel drop-off and next-action prediction, and for
    surveillance the symptom-progression matrix. Transition probability
    is a single exact-integer ratio per cell (pair count over
    prev-row marginal), rounded once.

    Scale: the lag window is one hash partition by user + sort; the
    pair count collapses to |types|² cells, and the marginal is a
    window over that metadata-sized frame. No self-join — adjacency
    comes from the lag, so the event table is read once."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    row_tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        dround(F.col("n").cast("double") / row_tot, 6).alias("p"),
    ).orderBy("prev_type", "next_type")


@register(
    "agg_time_to_event",
    oracle=f"""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, s.s_ts, MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.s_ts
      GROUP BY e.user_id, s.s_ts
    ), lat AS (
      SELECT user_id, date_diff('second', s_ts, p_ts) AS delta_s
      FROM p
    )
    SELECT CAST(FLOOR(CAST(delta_s AS DOUBLE) / 86400) AS INTEGER)
             AS latency_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {sql_dround("SUM(delta_s) / CAST(COUNT(*) AS DOUBLE) / 60.0", 4)}
             AS avg_latency_min
    FROM lat
    GROUP BY 1
    ORDER BY latency_days
    """,
    section=_SEC,
)
def agg_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event (conversion latency) distribution: for each user,
    seconds from their FIRST signup to their first purchase AT OR AFTER
    it, bucketed into whole-day latency classes with per-bucket user
    counts and mean latency — the funnel-velocity histogram (and, in
    surveillance terms, the onset-to-report delay distribution that
    calibrates reporting-lag corrections).

    Determinism: the latency is an integer second count (Spark
    unix_timestamp floor-difference == DuckDB date_diff('second')
    boundary count); bucket and mean derive from exact integer sums.

    Scale: two conditional scans collapse to per-user single rows
    before the join (both sides pre-aggregated, purchase side joins
    against the broadcast-able signup frame); the histogram agg is
    metadata-sized. No window over raw events."""
    e = table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id", "s_ts")
        .agg(F.min("ts").alias("p_ts"))
    )
    delta_s = F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts")
    lat = p.select(delta_s.alias("delta_s"))
    return (
        lat.groupBy(
            F.floor(F.col("delta_s").cast("double") / 86400)
            .cast("int")
            .alias("latency_days")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            dround(
                F.sum("delta_s") / F.count("*").cast("double") / 60.0, 4
            ).alias("avg_latency_min"),
        )
        .orderBy("latency_days")
    )


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), sdeg AS (
      SELECT supp, COUNT(*) AS sd FROM edges GROUP BY supp
    ), cdeg AS (
      SELECT cust, COUNT(*) AS cd FROM edges GROUP BY cust
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(sd) AS sx, SUM(cd) AS sy, SUM(sd * cd) AS sxy,
             SUM(sd * sd) AS sxx, SUM(cd * cd) AS syy
      FROM edges e JOIN sdeg ON e.supp = sdeg.supp
                   JOIN cdeg ON e.cust = cdeg.cust
    )
    SELECT n AS n_edges,
           {sql_dround("CAST(sx AS DOUBLE) / n", 4)} AS mean_supp_degree,
           {sql_dround("CAST(sy AS DOUBLE) / n", 4)} AS mean_cust_degree,
           {sql_dround(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
               "        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))",
               6)} AS assortativity
    FROM m
    WHERE (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
      AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
    """,
    section=_SEC,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-degree assortativity of the bipartite trade graph: Pearson
    correlation between supplier degree and customer degree ACROSS
    EDGES — do high-reach suppliers trade with high-reach customers
    (assortative, r>0) or with the long tail (disassortative, r<0)?
    The one-number structure diagnostic run before an iterative graph
    algorithm (hub-hub wiring predicts skewed join keys).

    Determinism: per-edge degree moments are exact BIGINT sums; every
    factor is cast to double BEFORE the cross-factor multiplications
    (their products overflow int64 at cluster scale), so both engines
    evaluate the identical IEEE expression.

    Scale: two degree aggs + two broadcast-able joins back to the edge
    list (degree tables are |V|-sized), then one global moment agg —
    map-side partial everywhere, single final row."""
    from sdp_spark.operators.graphs import _trade_edges

    # r14 (guide §1.2): edges feeds THREE consumers (both degree aggs and
    # the moment pass) and each used to re-run the lineitem⋈orders join +
    # distinct. One lazy localCheckpoint runs the edge build once.
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    sdeg = edges.groupBy("supp").agg(F.count("*").alias("sd"))
    cdeg = edges.groupBy("cust").agg(F.count("*").alias("cd"))
    m = (
        edges.join(F.broadcast(sdeg), "supp")
        .join(F.broadcast(cdeg), "cust")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("sd").alias("sx"),
            F.sum("cd").alias("sy"),
            F.sum(F.col("sd") * F.col("cd")).alias("sxy"),
            F.sum(F.col("sd") * F.col("sd")).alias("sxx"),
            F.sum(F.col("cd") * F.col("cd")).alias("syy"),
        )
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    var_x = n_d * F.col("sxx") - sx_d * F.col("sx")
    var_y = n_d * F.col("syy") - sy_d * F.col("sy")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    return (
        m.filter((var_x > 0) & (var_y > 0))
        .select(
            F.col("n").alias("n_edges"),
            dround(sx_d / F.col("n"), 4).alias("mean_supp_degree"),
            dround(sy_d / F.col("n"), 4).alias("mean_cust_degree"),
            dround(num / F.sqrt(var_x * var_y), 6).alias("assortativity"),
        )
    )


_ZIPF_TOPN = 1000


@register(
    "llm_zipf_slope",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), freq AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      FROM words WHERE word <> '' GROUP BY word
    ), ranked AS (
      SELECT word, f,
             ROW_NUMBER() OVER (ORDER BY f DESC, word) AS r
      FROM freq
    ), terms AS (
      SELECT {sql_dround("ln(r)", 8)} AS lx, {sql_dround("ln(f)", 8)} AS ly
      FROM ranked WHERE r <= {_ZIPF_TOPN}
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(lx AS DECIMAL(30,8))) AS sx,
             SUM(CAST(ly AS DECIMAL(30,8))) AS sy,
             SUM(CAST({sql_dround("lx * ly", 8)} AS DECIMAL(30,8))) AS sxy,
             SUM(CAST({sql_dround("lx * lx", 8)} AS DECIMAL(30,8))) AS sxx
      FROM terms
    )
    SELECT n AS n_ranks,
           {sql_dround(
               "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
               " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))",
               4)} AS zipf_slope,
           {sql_dround(
               "(CAST(sy AS DOUBLE)"
               " - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
               "    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
               "   * CAST(sx AS DOUBLE)) / n", 4)} AS zipf_intercept
    FROM sums
    """,
    section=_SEC,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of log(freq)
    vs log(rank) over the top-1000 word types — natural text sits near
    slope −1, so a strong departure is a corpus-health signal
    (template/boilerplate floods flatten the head; OCR noise fattens
    the tail). The corpus-level companion to the per-doc quality
    filters (`llm_quality_gopher`, `llm_repetition_ngram`).

    Determinism: each log term is deterministically rounded to 8
    decimals, then all OLS moments accumulate in DECIMAL (exact,
    order-independent — a raw double Σ of 1000 logs would drift across
    engine aggregation orders); the closed-form slope/intercept is one
    IEEE expression over the exact sums. Rank ties break on the word
    itself.

    Scale: word counting is the standard explode+agg (shuffles tokens
    once, combiner-reduced); the rank window runs on the vocabulary,
    and the top-1000 head is constant-sized regardless of corpus."""
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), "word"))
        .alias("r"),
    ).filter(F.col("r") <= _ZIPF_TOPN)
    lx = dround(F.log(F.col("r").cast("double")), 8)
    ly = dround(F.log(F.col("f").cast("double")), 8)
    terms = ranked.select(lx.alias("lx"), ly.alias("ly"))
    sums = terms.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("lx").cast(DEC)).alias("sx"),
        F.sum(F.col("ly").cast(DEC)).alias("sy"),
        F.sum(dround(F.col("lx") * F.col("ly"), 8).cast(DEC)).alias("sxy"),
        F.sum(dround(F.col("lx") * F.col("lx"), 8).cast(DEC)).alias("sxx"),
    )
    n_d = F.col("n")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    slope = (n_d * F.col("sxy").cast("double") - sx_d * sy_d) / (
        n_d * F.col("sxx").cast("double") - sx_d * sx_d
    )
    return sums.select(
        F.col("n").alias("n_ranks"),
        dround(slope, 4).alias("zipf_slope"),
        dround((sy_d - slope * sx_d) / n_d, 4).alias("zipf_intercept"),
    )


@register(
    "agg_survival_km",
    oracle=f"""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.s_ts
      GROUP BY e.user_id
    ), horizon AS (
      SELECT MAX(CAST(ts AS TIMESTAMP)) AS h_ts FROM events
    ), subjects AS (
      SELECT s.user_id,
             CASE WHEN p.p_ts IS NOT NULL
                  THEN CAST(FLOOR(CAST(date_diff('second', s.s_ts, p.p_ts)
                                       AS DOUBLE) / 86400) AS INTEGER)
                  ELSE CAST(FLOOR(CAST(date_diff('second', s.s_ts, horizon.h_ts)
                                       AS DOUBLE) / 86400) AS INTEGER)
             END AS dur,
             CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS evt
      FROM s LEFT JOIN p ON s.user_id = p.user_id, horizon
    ), days AS (
      SELECT dur AS day, CAST(COUNT(*) AS BIGINT) AS leaving,
             CAST(SUM(evt) AS BIGINT) AS d
      FROM subjects GROUP BY dur
    ), risk AS (
      SELECT day, d,
             (SELECT COUNT(*) FROM subjects)
               - COALESCE(SUM(leaving) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM days
    ), terms AS (
      SELECT day, CAST(n_risk AS BIGINT) AS n_risk, d,
             {sql_dround("ln(1.0 - CAST(d AS DOUBLE) / n_risk)", 8)} AS lt
      FROM risk WHERE d > 0 AND d < n_risk
    )
    SELECT day, n_risk, d AS n_events,
           {sql_dround(
               "exp(CAST(SUM(CAST(lt AS DECIMAL(30,8))) OVER ("
               "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               " AS DOUBLE))", 6)} AS km_survival
    FROM terms
    ORDER BY day
    """,
    section=_SEC,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of signup→purchase conversion with
    right-censoring: subjects are signed-up users; the event is their
    first purchase at/after signup; non-converters are censored at the
    observation horizon (the stream's max timestamp). At each whole-day
    event time, S(t) multiplies by (1 − d/n_risk), with censored
    subjects leaving the risk set after their censor day (standard
    same-day convention: still at risk on it) — the estimator behind
    every time-to-outcome surveillance analysis (onset-to-report,
    exposure-to-case). Days where everyone at risk fails are excluded
    (S would hit exact 0; the fixture never produces one).

    Determinism: durations are integer second-counts bucketed to days;
    the risk set is an exact integer cumulative subtraction; the KM
    product is computed as exp of a DECIMAL-summed series of
    8-decimal-rounded log terms — the same order-independence trick as
    `llm_zipf_slope` (a raw running product of doubles would drift
    across engine orders).

    Scale: subjects collapse to one row per user before anything else;
    the life table is |distinct days| rows — the windows run on
    metadata. The only event-scale work is the two conditional scans."""
    e = table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    h = e.agg(F.max("ts").alias("h_ts"))
    subjects = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(h))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.floor(
                    (F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts")).cast(
                        "double"
                    )
                    / 86400
                ),
            )
            .otherwise(
                F.floor(
                    (F.unix_timestamp("h_ts") - F.unix_timestamp("s_ts")).cast(
                        "double"
                    )
                    / 86400
                )
            )
            .cast("int")
            .alias("dur"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("evt"),
        )
    )
    n_total = subjects.count()
    days = subjects.groupBy(F.col("dur").alias("day")).agg(
        F.count("*").cast("bigint").alias("leaving"),
        F.sum("evt").cast("bigint").alias("d"),
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = days.select(
        "day",
        "d",
        (
            F.lit(n_total) - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    terms = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "day",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "d",
        dround(F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")), 8).alias(
            "lt"
        ),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        "day",
        "n_risk",
        F.col("d").alias("n_events"),
        dround(
            F.exp(F.sum(F.col("lt").cast(DEC)).over(w_cum).cast("double")), 6
        ).alias("km_survival"),
    ).orderBy("day")


_RR_Z = 1.96
_RR_V = 150  # severity threshold: exposure/outcome need value > 150
_RR_EXPR = "(CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d))"
_RR_SE = "sqrt(1.0/a - 1.0/(a + b) + 1.0/c - 1.0/(c + d))"


@register(
    "agg_relative_risk",
    oracle=f"""
    WITH flags AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'error' AND value > {_RR_V} THEN 1 ELSE 0 END)
               AS exposed,
             MAX(CASE WHEN event_type = 'purchase' AND value > {_RR_V} THEN 1
                 ELSE 0 END) AS outcome
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT CAST(SUM(exposed * outcome) AS BIGINT) AS a,
             CAST(SUM(exposed * (1 - outcome)) AS BIGINT) AS b,
             CAST(SUM((1 - exposed) * outcome) AS BIGINT) AS c,
             CAST(SUM((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
      FROM flags
    )
    SELECT a, b, c, d,
           {sql_dround(_RR_EXPR, 4)} AS relative_risk,
           {sql_dround(f"exp(ln({_RR_EXPR}) - {_RR_Z} * {_RR_SE})", 4)}
             AS rr_ci_lo,
           {sql_dround(f"exp(ln({_RR_EXPR}) + {_RR_Z} * {_RR_SE})", 4)}
             AS rr_ci_hi,
           {sql_dround(
               "(CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)", 4)}
             AS odds_ratio
    FROM cells
    WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    """,
    section=_SEC,
)
def agg_relative_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort 2×2 analysis: does exposure (user ever hit a SEVERE error,
    value > 150) change the probability of the outcome (user ever makes
    a high-value purchase, value > 150)? The severity threshold keeps
    all four cells populated at every fixture scale (unthresholded
    flags saturate — every user has ~67 events of each type).
    Emits the contingency cells, relative risk with its 95% Wald CI
    (exp(ln RR ± 1.96·SE), SE = sqrt(1/a − 1/(a+b) + 1/c − 1/(c+d))),
    and the odds ratio — the epidemiologist's first table for any
    exposure-outcome question, computed exactly the way a cohort study
    reports it. Degenerate tables (an empty cell) emit nothing rather
    than ±inf.

    Determinism: the four cells are exact integer conditional sums; RR,
    CI and OR are single IEEE expressions over them, rounded once.

    Scale: one per-user conditional-max rollup (partial-agg friendly),
    then a single-row reduction — nothing downstream of the first
    exchange exceeds driver-trivial size."""
    e = table(spark, sf_dir, "events")
    flags = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "error") & (F.col("value") > _RR_V), 1
            ).otherwise(0)
        ).alias("exposed"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > _RR_V),
                1,
            ).otherwise(0)
        ).alias("outcome"),
    )
    cells = flags.agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("bigint").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome")))
        .cast("bigint")
        .alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome"))
        .cast("bigint")
        .alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome")))
        .cast("bigint")
        .alias("d"),
    )
    a_d = F.col("a").cast("double")
    c_d = F.col("c").cast("double")
    rr = (a_d / (F.col("a") + F.col("b"))) / (c_d / (F.col("c") + F.col("d")))
    se = F.sqrt(
        1.0 / F.col("a")
        - 1.0 / (F.col("a") + F.col("b"))
        + 1.0 / F.col("c")
        - 1.0 / (F.col("c") + F.col("d"))
    )
    return (
        cells.filter(
            (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
        )
        .select(
            "a",
            "b",
            "c",
            "d",
            dround(rr, 4).alias("relative_risk"),
            dround(F.exp(F.log(rr) - _RR_Z * se), 4).alias("rr_ci_lo"),
            dround(F.exp(F.log(rr) + _RR_Z * se), 4).alias("rr_ci_hi"),
            dround(
                (a_d * F.col("d")) / (F.col("b").cast("double") * F.col("c")), 4
            ).alias("odds_ratio"),
        )
    )


_TBA_PCT = 0.5  # budget = 50% of total corpus tokens


@register(
    "llm_token_budget_alloc",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ), tok AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS avail
      FROM words WHERE word <> '' GROUP BY source
    ), tot AS (
      SELECT CAST(FLOOR({_TBA_PCT} * SUM(avail)) AS BIGINT) AS budget,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM tok
    ), ranked AS (
      SELECT source, avail,
             ROW_NUMBER() OVER (ORDER BY avail, source) AS i,
             COALESCE(SUM(avail) OVER (ORDER BY avail, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix_prev,
             LAG(avail) OVER (ORDER BY avail, source) AS prev_avail
      FROM tok
    ), levels AS (
      SELECT (CAST(tot.budget AS DOUBLE) - prefix_prev) / (tot.k - i + 1)
               AS level, prev_avail, avail
      FROM ranked, tot
    ), waterline AS (
      SELECT MIN(level) AS level FROM levels
      WHERE level <= avail AND (prev_avail IS NULL OR level > prev_avail)
    )
    SELECT t.source, t.avail,
           {sql_dround(
               "CASE WHEN w.level IS NULL THEN CAST(t.avail AS DOUBLE)"
               "     ELSE LEAST(CAST(t.avail AS DOUBLE), w.level) END", 2)}
             AS allocated,
           (w.level IS NOT NULL AND CAST(t.avail AS DOUBLE) > w.level)
             AS capped
    FROM tok t, waterline w
    ORDER BY t.source
    """,
    section=_SEC,
)
def llm_token_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across corpus sources: given
    a training budget of 50% of total tokens, allocate each source
    min(available, L) where the waterline L is chosen so allocations
    exactly exhaust the budget — the capped-proportional mixture rule
    that keeps small sources intact while clipping dominant ones (the
    allocation step between `llm_domain_mix` diagnostics and
    `llm_sample_temperature` reweighting). The waterline has a closed
    form: sort sources by size ascending; for prefix i, the candidate
    level is (budget − Σ_{{j<i}} avail_j)/(k−i+1), and the valid
    candidate is the one falling between its neighbors' sizes.

    Determinism: token counts are exact integers; the level is a single
    rational-over-integer IEEE division; LEAST/compare on identical
    doubles. No iteration — the closed form replaces the usual binary
    search, so the whole allocation is one window pass over |sources|.

    Scale: token counting is the only corpus-scale stage (explode+agg,
    combiner-reduced); everything after runs on |sources| rows."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("avail"))
    )
    tot = tok.agg(
        F.floor(_TBA_PCT * F.sum("avail")).cast("bigint").alias("budget"),
        F.count("*").cast("bigint").alias("k"),
    )
    w_ord = Window.orderBy("avail", "source")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    ranked = tok.select(
        "source",
        "avail",
        F.row_number().over(w_ord).alias("i"),
        F.coalesce(F.sum("avail").over(w_prev), F.lit(0)).alias("prefix_prev"),
        F.lag("avail").over(w_ord).alias("prev_avail"),
    )
    levels = ranked.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("budget").cast("double") - F.col("prefix_prev"))
            / (F.col("k") - F.col("i") + 1)
        ).alias("level"),
        "prev_avail",
        "avail",
    )
    waterline = levels.filter(
        (F.col("level") <= F.col("avail"))
        & (F.col("prev_avail").isNull() | (F.col("level") > F.col("prev_avail")))
    ).agg(F.min("level").alias("level"))
    alloc = F.when(
        F.col("level").isNull(), F.col("avail").cast("double")
    ).otherwise(F.least(F.col("avail").cast("double"), F.col("level")))
    return (
        tok.crossJoin(F.broadcast(waterline))
        .select(
            "source",
            "avail",
            dround(alloc, 2).alias("allocated"),
            (
                F.col("level").isNotNull()
                & (F.col("avail").cast("double") > F.col("level"))
            ).alias("capped"),
        )
        .orderBy("source")
    )


# Shared bigram CTE for the collocation / language-model keys: tokens are
# position-indexed AFTER empty-token filtering (re-ranked, so adjacency
# means consecutive non-empty words), bigrams join idx -> idx+1 within a
# doc. The Spark side builds the same pairs with a zero-join array
# expression (transform over sequence) — no positional self-join at all.
_BIGRAM_SQL = """
    WITH toks0 AS (
      SELECT doc_id, t.word, t.pos
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS word,
                           generate_subscripts(string_split(text, ' '), 1)
                             AS pos) t
      WHERE t.word <> ''
    ), toks AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
      FROM toks0
    ), bigrams AS (
      SELECT a.doc_id, a.word AS w1, b.word AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
    )
"""


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) consecutive-word pairs via a pure array
    expression: filter empties, then transform(sequence(...)) zips each
    word with its successor — the whole pairing runs inside codegen with
    ZERO joins/windows (the oracle's positional self-join is the
    relational spelling of the same thing). Docs with < 2 tokens emit
    nothing, matching the join semantics."""
    d = table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("ws")
    ).filter(F.size("ws") >= 2)
    return w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(element_at(ws, i) AS w1,"
                "             element_at(ws, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "llm_pmi_collocations",
    oracle=f"""
    {_BIGRAM_SQL},
    bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigrams GROUP BY 1, 2
    ), uni AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY word
    ), tot AS (
      SELECT (SELECT SUM(c) FROM uni) AS n1, (SELECT SUM(c12) FROM bgc) AS n2
    )
    SELECT b.w1, b.w2, b.c12,
           {sql_dround(
               "ln((CAST(b.c12 AS DOUBLE) * tot.n1 * tot.n1)"
               " / (CAST(tot.n2 AS DOUBLE) * u1.c * u2.c))", 4)} AS pmi
    FROM bgc b
    JOIN uni u1 ON b.w1 = u1.word
    JOIN uni u2 ON b.w2 = u2.word, tot
    WHERE b.c12 >= {_PMI_MIN_COUNT}
    ORDER BY ln((CAST(b.c12 AS DOUBLE) * tot.n1 * tot.n1)
                / (CAST(tot.n2 AS DOUBLE) * u1.c * u2.c)) DESC, b.w1, b.w2
    LIMIT {_PMI_TOPK}
    """,
    section=_SEC,
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-50 word
    pairs whose co-occurrence beats independence the hardest —
    PMI = ln(P(w1,w2) / (P(w1)·P(w2))) with a min-count-5 support floor
    (raw PMI promotes hapax noise without it). The classic phrase /
    multi-word-expression detector a tokenizer-training or boilerplate
    analysis runs over a corpus.

    Determinism: counts are exact; PMI is ONE fixed IEEE expression
    (c12·N1²)/(N2·c1·c2) inside a single ln on both engines — never
    algebraically re-associated, so ordering and rounding agree
    bit-for-bit; ties order by (w1, w2).

    Scale: bigram and unigram counting are combiner-reduced explodes;
    the scoring join keys on single words against the vocabulary
    (orders smaller than the corpus — broadcast-able), and top-50 is a
    TakeOrdered, no global sort."""
    bg = _bigrams(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("word")
    )
    # r14 (guide §1.2): uni feeds THREE consumers (both scoring lookups and
    # the unigram total) and bgc TWO (the scored pairs and the bigram
    # total); each reference used to re-tokenize the corpus. Two lazy
    # localCheckpoints on the vocabulary-sized count tables run each
    # corpus-scale explode exactly once.
    uni = (
        toks.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c12"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("c").alias("n1")).crossJoin(
        bgc.agg(F.sum("c12").alias("n2"))
    )
    u1 = uni.withColumnRenamed("word", "w1").withColumnRenamed("c", "c1")
    u2 = uni.withColumnRenamed("word", "w2").withColumnRenamed("c", "c2")
    scored = (
        bgc.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
    )
    pmi_raw = F.log(
        (F.col("c12").cast("double") * F.col("n1") * F.col("n1"))
        / (F.col("n2").cast("double") * F.col("c1") * F.col("c2"))
    )
    return (
        scored.select(
            "w1", "w2", "c12", pmi_raw.alias("pmi_raw"),
            dround(pmi_raw, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi_raw").desc(), "w1", "w2")
        .limit(_PMI_TOPK)
        .select("w1", "w2", "c12", "pmi")
    )


@register(
    "llm_bigram_perplexity",
    oracle=f"""
    {_BIGRAM_SQL},
    bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigrams GROUP BY 1, 2
    ), cond AS (
      SELECT w1, w2, c12,
             SUM(c12) OVER (PARTITION BY w1) AS c1f
      FROM bgc
    ), terms AS (
      SELECT b.doc_id,
             {sql_dround(
                 "ln(CAST(c.c12 AS DOUBLE) / c.c1f)", 8)} AS lt
      FROM bigrams b JOIN cond c ON b.w1 = c.w1 AND b.w2 = c.w2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {sql_dround(
               "exp(-CAST(SUM(CAST(lt AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*))",
               4)} AS ppl
    FROM terms GROUP BY doc_id
    ORDER BY doc_id
    """,
    section=_SEC,
)
def llm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under a corpus-trained bigram language
    model: PP(doc) = exp(−mean ln P(w_i | w_{{i−1}})), with MLE
    conditionals c(w1,w2)/c(w1·) from the corpus itself (every doc
    bigram has support, so no smoothing term distorts the score) — the
    principled upgrade over `llm_perplexity_proxy` for quality
    filtering: template floods score near 1, incoherent word soup
    scores near the branching factor.

    Determinism: conditionals are exact-integer ratios; each log term
    is rounded to 8 decimals and the per-doc mean accumulates in
    DECIMAL (order-independent), with one exp/round at the end — the
    `llm_zipf_slope` summation discipline.

    Scale: the model is |distinct bigrams| rows (vocabulary-bound); the
    per-doc scoring joins doc bigrams against it on the bigram key —
    one corpus-scale shuffle, combiner-reduced counting before it, and
    the w1-marginal is a window over the model table, not the corpus."""
    # r14 (guide §1.2): the bigram stream feeds BOTH the model build and
    # the per-doc scoring join — one lazy localCheckpoint runs the
    # tokenize+explode pass once instead of twice.
    bg = _bigrams(spark, sf_dir).localCheckpoint(eager=False)
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    cond = bgc.withColumn(
        "c1f", F.sum("c12").over(Window.partitionBy("w1"))
    )
    terms = bg.join(cond, ["w1", "w2"]).select(
        "doc_id",
        dround(F.log(F.col("c12").cast("double") / F.col("c1f")), 8).alias("lt"),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            dround(
                F.exp(
                    -F.sum(F.col("lt").cast(DEC)).cast("double") / F.count("*")
                ),
                4,
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_balanced_class",
    oracle="""
    WITH sizes AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), kk AS (
      SELECT MIN(n) AS k FROM sizes
    ), ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT lang, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked CROSS JOIN kk WHERE sample_rank <= kk.k
    ORDER BY lang, sample_rank
    """,
    section=_SEC,
)
def sample_balanced_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced class downsampling — equal rows per class (here: per
    language), k = the MINORITY class size, members chosen by portable
    md5 order over a salted key (the `sample_hash_group` idiom: the hash
    order is a fixed random permutation, so the k smallest hashes are a
    uniform-without-replacement sample, identical on every engine,
    partitioning, and rerun). The classifier-training counterpart of
    proportional stratified sampling (`llm_sample_stratified` keeps
    class shares; THIS equalizes them — what a language-ID or quality-
    classifier head trains on so the majority class cannot drown the
    loss).

    Scale: one count-per-class agg (broadcast 1-row k), one hash
    partition by class + per-class top-k rank — no global sort, no
    driver state; with heavy class skew the per-partition local-top-k
    pre-aggregation bounds the rank shuffle exactly as in
    sample_hash_group."""
    d = table(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count("*").alias("n"))
    kk = sizes.agg(F.min("n").alias("k"))
    rank_key = F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(rank_key, "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .crossJoin(F.broadcast(kk))
        .filter(F.col("sample_rank") <= F.col("k"))
        .select("lang", "doc_id", F.col("sample_rank").cast("int"))
        .orderBy("lang", "sample_rank")
    )


def _concordance_oracle() -> str:
    """DuckDB oracle for query_detector_concordance (analytics.py): the
    seven component detectors' CERTIFIED oracle texts embedded as CTEs
    (llm_ann_recall_eval doctrine — compose registered operators, never
    reimplement), normalized to (det, event_type, day, alert) and
    replayed through the identical pair/aggregate arithmetic the Spark
    side runs. Built HERE because histlimits registers in this module —
    the last of the seven to load."""
    from sdp_spark.plans.registry import REGISTRY

    comp = {
        k: REGISTRY[k].oracle
        for k in (
            "query_outbreak_cusum",
            "query_outbreak_ears",
            "query_outbreak_ears_family",
            "query_outbreak_ewma",
            "query_outbreak_farrington",
            "query_outbreak_histlimits",
            "query_outbreak_serfling",
        )
    }
    assert all(comp.values()), "component detector oracle missing"

    def sel(det: str, src: str, daycol: str, where: str = "") -> str:
        return (
            f"SELECT '{det}' AS det, event_type,"
            f" CAST({daycol} AS VARCHAR) AS day,"
            f" CAST(alert AS BOOLEAN) AS alert FROM {src}{where}"
        )

    norm = "\n      UNION ALL ".join(
        [
            sel("cusum", "det_cusum", "day"),
            sel("ears", "det_ears", "day_s"),
            sel("ears_c1", "det_fam", "day_s", " WHERE variant = 'c1'"),
            sel("ears_c3", "det_fam", "day_s", " WHERE variant = 'c3'"),
            sel("ewma", "det_ewma", "day"),
            sel("farrington", "det_farr", "day"),
            sel("histlimits", "det_hist", "day_s"),
            sel("serfling", "det_serf", "day"),
        ]
    )
    jac = sql_dround(
        "CASE WHEN n_alert_a + n_alert_b - n_alert_both = 0"
        " THEN CAST(1.0 AS DOUBLE)"
        " ELSE CAST(n_alert_both AS DOUBLE)"
        " / (n_alert_a + n_alert_b - n_alert_both) END",
        4,
    )
    agree = sql_dround(
        "CAST(n_scored_both - n_alert_a - n_alert_b + 2 * n_alert_both"
        " AS DOUBLE) / n_scored_both",
        4,
    )
    return f"""
    WITH det_cusum AS ({comp["query_outbreak_cusum"]}),
    det_ears AS ({comp["query_outbreak_ears"]}),
    det_fam AS ({comp["query_outbreak_ears_family"]}),
    det_ewma AS ({comp["query_outbreak_ewma"]}),
    det_farr AS ({comp["query_outbreak_farrington"]}),
    det_hist AS ({comp["query_outbreak_histlimits"]}),
    det_serf AS ({comp["query_outbreak_serfling"]}),
    norm AS (
      {norm}
    ),
    pairs AS (
      SELECT a.det AS det_a, b.det AS det_b,
             a.alert AS alert_a, b.alert AS alert_b
      FROM norm a JOIN norm b
        ON a.event_type = b.event_type AND a.day = b.day
      WHERE a.det < b.det
    ),
    agg AS (
      SELECT det_a, det_b,
        CAST(COUNT(*) AS BIGINT) AS n_scored_both,
        CAST(SUM(CASE WHEN alert_a THEN 1 ELSE 0 END) AS BIGINT)
          AS n_alert_a,
        CAST(SUM(CASE WHEN alert_b THEN 1 ELSE 0 END) AS BIGINT)
          AS n_alert_b,
        CAST(SUM(CASE WHEN alert_a AND alert_b THEN 1 ELSE 0 END)
          AS BIGINT) AS n_alert_both
      FROM pairs GROUP BY det_a, det_b
    )
    SELECT det_a, det_b, n_scored_both, n_alert_a, n_alert_b,
           n_alert_both, {jac} AS jaccard, {agree} AS pct_agree
    FROM agg ORDER BY det_a, det_b
    """


def _register_detector_concordance() -> None:
    """Deferred registration (module-load-order contract): analytics.py
    defines the fn; the oracle needs histlimits, registered above."""
    from sdp_spark.operators.analytics import (
        _SEC as _ANALYTICS_SEC,
        query_detector_concordance,
    )

    register(
        "query_detector_concordance",
        oracle=_concordance_oracle(),
        section=_ANALYTICS_SEC,
    )(query_detector_concordance)


_register_detector_concordance()
