"""Window functions — SURVEY.md §2.5.

Reference note: MySQL 5.6 / MariaDB 10.1 have NO window functions (they
arrive in 8.0 / 10.2) — platform users emulate them with self-joins and
session variables. The engine provides them natively (pyspark.sql.Window)
as the idiomatic superset; they also back join_asof and top-k-per-group.

Scale notes: each window = one shuffle on partitionBy keys + per-partition
sort. user_id / orderkey partitions are small and numerous → good balance;
never use a global (unpartitioned) orderBy window on big data — every
windowed query here carries a partitionBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdp_spark.functions.num import DEC, dround, sql_dround
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.5 window"


@register(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
    FROM orders
    """,
    section=_SEC,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


@register(
    "win_rank",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey)
    """,
    section=_SEC,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.round("c_acctbal", 2).desc(), F.col("c_custkey")
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id)     OVER w AS prev_event,
           LEAD(event_id)    OVER w AS next_event,
           LAG(event_id, 2, -1) OVER w AS prev2_or_neg1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    section=_SEC,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.lag("event_id", 2, -1).over(w).alias("prev2_or_neg1"),
    )


@register(
    "win_running",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))) OVER w, 2) AS DOUBLE) AS running_sum,
           {sql_dround(
               'CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)'
               ' / COUNT(*) OVER w', 4)} AS running_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    section=_SEC,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec_sum = F.sum(F.col("value").cast(DEC)).over(w)
    return e.select(
        "user_id",
        "event_id",
        F.round(dec_sum, 2).cast("double").alias("running_sum"),
        dround(dec_sum.cast("double") / F.count(F.lit(1)).over(w), 4).alias("running_avg"),
    )


@register(
    "win_sliding_rows",
    oracle=f"""
    SELECT user_id, event_id,
           {sql_dround(
               'CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)'
               ' / COUNT(*) OVER w', 4)} AS moving_avg4,
           COUNT(*) OVER w AS win_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    section=_SEC,
)
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    dec_sum = F.sum(F.col("value").cast(DEC)).over(w)
    return e.select(
        "user_id",
        "event_id",
        dround(dec_sum.cast("double") / F.count(F.lit(1)).over(w), 4).alias("moving_avg4"),
        F.count("*").over(w).alias("win_n"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))) OVER (
                 PARTITION BY user_id ORDER BY epoch_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS sum_last_hour
    FROM (SELECT user_id, event_id, value,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_sec
          FROM events) t
    """,
    section=_SEC,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: all events of the trailing hour
    (value-based frame, not row-count-based)."""
    e = table(spark, sf_dir, "events")
    e = e.withColumn("epoch_sec", F.unix_timestamp(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("epoch_sec").rangeBetween(-3600, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 2).cast("double").alias("sum_last_hour"),
    )


@register(
    "win_topk_group",
    oracle="""
    SELECT c_nationkey, c_custkey, bal
    FROM (SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS bal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey) AS rn
          FROM customer) t
    WHERE rn <= 3
    """,
    section=_SEC,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the building block reused by llm_sim_search and
    tfidf top terms. row_number (not rank) + unique tiebreaker → exactly k."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.round("c_acctbal", 2).desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "win_first_last",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER w AS last_event_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    section=_SEC,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event_so_far"),
    )


@register(
    "win_cume_dist",
    oracle=f"""
    SELECT c_nationkey, c_custkey,
           {sql_dround('CUME_DIST() OVER w', 6)} AS cd,
           {sql_dround('PERCENT_RANK() OVER w', 6)} AS pr
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, 2), c_custkey)
    """,
    section=_SEC,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank — distribution functions over a window."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.round("c_acctbal", 2), F.col("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        dround(F.cume_dist().over(w), 6).alias("cd"),
        dround(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "win_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey) AS INTEGER) AS quartile,
           CAST(NTILE(10) OVER (PARTITION BY c_nationkey
                ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey) AS INTEGER) AS decile_in_nation
    FROM customer
    """,
    section=_SEC,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (global quartiles + per-nation deciles). Scale note:
    an unpartitioned ntile forces a single-partition sort — fine for dim
    tables, wrong for facts (use percent_rank + floor there); the
    partitioned form parallelizes per key."""
    c = table(spark, sf_dir, "customer")
    w_global = Window.orderBy(F.round("c_acctbal", 2).desc(), F.col("c_custkey"))
    w_nation = Window.partitionBy("c_nationkey").orderBy(
        F.round("c_acctbal", 2).desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        F.ntile(4).over(w_global).alias("quartile"),
        F.ntile(10).over(w_nation).alias("decile_in_nation"),
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           FIRST_VALUE(o_orderkey) OVER w  AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    section=_SEC,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value within a running frame (NULL until the frame holds n rows)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@register(
    "win_sessionize",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tts, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), lagged AS (
      SELECT *, CASE WHEN us - LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM lagged
    )
    SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(tts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(tts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
    section=_SEC,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap > 30 min starts a new session) — the
    window-function counterpart of stream_session, and the classic
    lag+cumsum idiom MySQL 5.6 users emulate with session variables.
    Gap math runs on integer epoch-microseconds so the break predicate is
    bit-identical across engines (no float epoch, no truncation drift).
    Two window passes + one aggregate, all partitioned by user_id — one
    shuffle at scale; per-user partitions are small and numerous, the shape
    window execution wants."""
    from sdp_spark.functions.num import dsum

    e = table(spark, sf_dir, "events").withColumn("us", F.unix_micros(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    brk = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.withColumn("brk", brk).withColumn(
        "session_id", F.sum("brk").over(cum).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        dsum("value").alias("sum_value"),
    )


@register(
    "win_zscore",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           FLOOR((l_quantity - AVG(l_quantity) OVER w)
                 / STDDEV_SAMP(l_quantity) OVER w * 10000 + 0.5) / 10000 AS qty_z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
    section=_SEC,
)
def win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization (z-score) — the feature-engineering idiom
    behind outlier flags and normalized model inputs. The SQL spelling is a
    whole-partition window (see oracle), but the PHYSICAL plan here is
    tiny-agg + broadcast join back: l_returnflag has 3 distinct values, so
    a window partitioned on it would funnel the entire fact through 3
    tasks at scale. Instead the per-group mean/std reduce map-side to a
    3-row table that broadcasts back onto the unshuffled fact — the fact
    never moves, which is the only formulation that survives a
    low-cardinality group key at 100 TB. dround(4) absorbs the last-ulp
    differences of the two engines' variance formulas."""
    l = table(spark, sf_dir, "lineitem")
    stats = F.broadcast(
        l.groupBy("l_returnflag").agg(
            F.avg("l_quantity").alias("_mu"),
            F.stddev_samp("l_quantity").alias("_sd"),
        )
    )
    z = (F.col("l_quantity") - F.col("_mu")) / F.col("_sd")
    return l.join(stats, "l_returnflag").select(
        "l_returnflag", "l_orderkey", "l_linenumber", dround(z, 4).alias("qty_z")
    )


@register(
    "win_gap_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ), anchored AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
               AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len,
             strftime(MIN(d), '%Y-%m-%d') AS island_start
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           MIN(island_start) AS first_island_start
    FROM islands GROUP BY user_id
    """,
    section=_SEC,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active days
    (streaks) — the classic sessionize-by-calendar idiom behind retention
    and engagement metrics, unanswerable in one pass without window
    functions (MySQL 5.6 users resort to variables). The standard trick:
    day - row_number(day) is constant within a consecutive run, so the
    difference is the island anchor; two partitioned windows + two grouped
    aggregates, all keyed by user_id — one shuffle lineage at scale, no
    self-joins."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("island_start"),
    )
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.min("island_start").alias("first_island_start"),
    )


def _daily_scaffold(e):
    """Shared calendar-densify core for the per-user time-series ops
    (ts_gap_fill / ts_interpolate_linear / ts_seasonal_error): exact
    decimal daily bars + per-user count, a per-user min..max day span,
    the exploded calendar scaffold, and the left join back — so silent
    days appear as NULL-bar rows. One partial+final hash agg, a narrow
    per-user explode, one join; any fix to the scaffold (tz, interval,
    span semantics) lands in every consumer at once."""
    from sdp_spark.functions.num import dsum

    daily = e.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        dsum("value").alias("day_sum"), F.count("*").cast("int").alias("n_events")
    )
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("mind"), F.max("d").alias("maxd")
    )
    scaffold = span.select(
        "user_id",
        F.explode(F.sequence("mind", "maxd", F.expr("interval 1 day"))).alias("d"),
    )
    return scaffold.join(daily, ["user_id", "d"], "left")


@register(
    "ts_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS day_sum,
             CAST(COUNT(*) AS INTEGER) AS n_events
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(d) AS mind, MAX(d) AS maxd FROM daily GROUP BY 1
    ), scaffold AS (
      SELECT user_id, UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY)) AS d
      FROM span
    ), j AS (
      SELECT s.user_id, s.d, daily.day_sum,
             COALESCE(daily.n_events, 0) AS n_events
      FROM scaffold s
      LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day, n_events, day_sum,
           LAST_VALUE(day_sum IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_sum
    FROM j
    """,
    section=_SEC,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling + forward-fill (LOCF) — densify a per-user daily
    series so downstream windows/joins see every calendar day, carrying the
    last observed value across silent days. MySQL users emulate this with a
    calendar helper table; Spark-first it is `sequence(min_day, max_day)`
    exploded per user (the scaffold is generated WHERE the user's rows
    already live — no global calendar broadcast-join needed), a left join
    back to the observed bars, and `last(ignorenulls=True)` over an
    unbounded-preceding row frame for the fill.

    Plan: the daily bars are one partial+final hash agg; the scaffold
    explode is narrow (per-user span ≤ days in range); the fill window
    shuffles by user_id once and sorts each user's ≤|days| rows. At 100 TB
    state per user stays calendar-bounded — the series length, not the
    event count."""
    e = table(spark, sf_dir, "events")
    j = _daily_scaffold(e).withColumn("n_events", F.coalesce("n_events", F.lit(0)))
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events",
        "day_sum",
        F.last("day_sum", ignorenulls=True).over(w).alias("filled_sum"),
    )


@register(
    "win_sliding_median",
    oracle=f"""
    SELECT event_id, user_id,
           {sql_dround('median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)', 6)}
             AS med7
    FROM events
    """,
    section=_SEC,
)
def win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over a 7-row frame per user — the robust-statistics
    twin of the moving average (`win_sliding_rows`): outlier-resistant
    smoothing for surveillance counts. Spark has no median window
    function, so the frame is materialized as a bounded array
    (collect_list over ROWS BETWEEN 6 PRECEDING) and the median computed
    by sort + middle pick — with the even-count interpolation (mean of
    the two middles) matching the oracle's median() semantics exactly.

    Scale: the collected frame is ≤ 7 elements by construction — state
    per row is O(frame), never O(partition); one user-key shuffle + sort,
    like every other window here."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = ((n + 2) / 2).cast("int")  # = n/2 + 1 for even n
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (F.element_at(arr, (n / 2).cast("int")) + F.element_at(arr, mid_hi)) / 2.0
    )
    return e.select("event_id", "user_id", dround(med, 6).alias("med7"))


_EWMA_ALPHA = 0.3
_EWMA_SPAN = 20


@register(
    "win_ewma",
    oracle=f"""
    WITH framed AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS arr
      FROM events
    )
    SELECT event_id, user_id,
           {sql_dround(
             f"list_sum(list_transform(generate_series(1, len(arr)), "
             f"i -> arr[i] * pow(1.0 - {_EWMA_ALPHA}, len(arr) - i))) "
             f"/ list_sum(list_transform(generate_series(1, len(arr)), "
             f"i -> pow(1.0 - {_EWMA_ALPHA}, len(arr) - i)))", 6)} AS ewma
    FROM framed
    """,
    section=_SEC,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha=0.3),
    TRUNCATED to the trailing 20 rows — the un-truncated recurrence
    y_i = a*x_i + (1-a)*y_(i-1) is inherently sequential (and its
    closed form overflows pow(1-a, -i) on long partitions), while weights
    beyond 20 lags are < (1-a)^20 ≈ 8e-4 of the current one; the
    truncated, weight-normalized form is the scale-safe equivalent
    (pandas' adjust=True over a bounded span). The frame array is ≤ 20
    elements; the weighted fold is the same left-to-right sum in both
    engines, so the doubles agree bit-for-bit before the final rounding.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    a = _EWMA_ALPHA
    framed = e.select(
        "event_id", "user_id", F.collect_list("value").over(w).alias("arr")
    ).withColumn("n", F.size("arr"))
    num = F.expr(
        f"aggregate(sequence(1, n), cast(0.0 as double), "
        f"(s, i) -> s + element_at(arr, i) * power(1.0 - {a}, n - i))"
    )
    den = F.expr(
        f"aggregate(sequence(1, n), cast(0.0 as double), "
        f"(s, i) -> s + power(1.0 - {a}, n - i))"
    )
    return framed.select(
        "event_id", "user_id", dround(num / den, 6).alias("ewma")
    )


@register(
    "win_ratio_to_report",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           {sql_dround(
             "o_totalprice / (SUM(CAST(o_totalprice AS DECIMAL(30,8))) "
             "OVER (PARTITION BY o_custkey))::DOUBLE", 8)} AS share
    FROM orders
    """,
    section=_SEC,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT: each order's share of its customer's total — the
    percent-of-total window idiom (Oracle names it; MySQL 5.6 users run
    two queries and a join). One unbounded-frame SUM per partition; the
    denominator aggregates in DECIMAL so every row of a partition divides
    by the SAME exact total regardless of partition order — with a double
    sum the shares wouldn't reproduce under AQE re-plans, and at 100 TB
    they must. One custkey shuffle, O(1) state per partition."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_custkey",
        dround(F.col("o_totalprice") / total, 8).alias("share"),
    )


@register(
    "win_fill_forward",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN FLOOR(value * 100 + 0.5) / 100 END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS last_purchase
    FROM events
    WHERE user_id % 97 = 0
    ORDER BY user_id, CAST(ts AS TIMESTAMP), event_id
    """,
    section=_SEC,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-forward / LOCF (last observation carried forward): each
    event carries the most recent purchase value seen so far for its
    user — `last_value(... IGNORE NULLS)` over an ordered per-user
    window, the canonical sparse→dense propagation (sensor readings,
    price marks, session attributes). MySQL 5.6 needs the
    session-variable trick for this; here it's one window with a
    growing frame whose state is O(1) per partition (the last non-null),
    and the partition key distributes users across the cluster.
    Deterministic: (ts, event_id) is a total order per user, and the
    carried value is rounded BEFORE propagation so both engines carry
    the identical double."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = F.when(
        F.col("event_type") == "purchase", dround(F.col("value"), 2)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.last(marked, ignorenulls=True).over(w).alias("last_purchase"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS day_sum
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(d) AS mind, MAX(d) AS maxd FROM daily GROUP BY 1
    ), scaffold AS (
      SELECT user_id, UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY)) AS d
      FROM span
    ), j AS (
      SELECT s.user_id, s.d, daily.day_sum
      FROM scaffold s
      LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    ), anch AS (
      SELECT user_id, d, day_sum,
        LAST_VALUE(day_sum IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_sum,
        LAST_VALUE(CASE WHEN day_sum IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        FIRST_VALUE(day_sum IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_sum,
        FIRST_VALUE(CASE WHEN day_sum IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM j
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day, day_sum,
      FLOOR((CASE
        WHEN day_sum IS NOT NULL THEN day_sum
        WHEN prev_sum IS NULL THEN next_sum
        WHEN next_sum IS NULL THEN prev_sum
        ELSE prev_sum + (next_sum - prev_sum)
             * (CAST(date_diff('day', prev_d, d) AS DOUBLE)
                / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
      END) * 10000 + 0.5) / 10000 AS interp_sum
    FROM anch
    """,
    section=_SEC,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densify + LINEAR interpolation — the companion to
    `ts_gap_fill`'s step-function LOCF: silent days get the straight line
    between the neighbouring observed daily bars (the estimate every
    epi-curve / rate chart actually wants), observed days pass through
    unchanged. Same scaffold as ts_gap_fill (per-user `sequence` explode,
    no global calendar join), then TWO anchored windows per user — last
    non-null (value, date) looking back, first non-null looking forward —
    and a pure-codegen lerp expression.

    Determinism: the daily bars are exact decimal sums (num.dsum), so both
    engines lerp IDENTICAL doubles with the identical expression tree;
    dround(4) floors the result so the hash can't see association order.

    Plan: one partial+final hash agg (bars), narrow per-user explode, one
    shuffle on user_id that BOTH window directions reuse (forward frame is
    the same partitioning, Spark sorts once ascending and evaluates the
    following-frame window on the same sorted run). State per user is
    calendar-bounded — series length, not event count — so a 100 TB event
    log with a 10-year span is ≤3,653 rows per user in the window stage."""
    e = table(spark, sf_dir, "events")
    j = _daily_scaffold(e)
    back = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("day_sum").isNotNull(), F.col("d"))
    anch = j.select(
        "user_id",
        "d",
        "day_sum",
        F.last("day_sum", ignorenulls=True).over(back).alias("prev_sum"),
        F.last(obs_d, ignorenulls=True).over(back).alias("prev_d"),
        F.first("day_sum", ignorenulls=True).over(fwd).alias("next_sum"),
        F.first(obs_d, ignorenulls=True).over(fwd).alias("next_d"),
    )
    lerp = (
        F.when(F.col("day_sum").isNotNull(), F.col("day_sum"))
        .when(F.col("prev_sum").isNull(), F.col("next_sum"))
        .when(F.col("next_sum").isNull(), F.col("prev_sum"))
        .otherwise(
            F.col("prev_sum")
            + (F.col("next_sum") - F.col("prev_sum"))
            * (
                F.datediff("d", "prev_d").cast("double")
                / F.datediff("next_d", "prev_d").cast("double")
            )
        )
    )
    return anch.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "day_sum",
        dround(lerp, 4).alias("interp_sum"),
    )


@register(
    "win_rolling_corr",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, ts,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS DECIMAL(10,0)) AS x,
             CAST(value AS DECIMAL(18,4)) AS y
      FROM events
    ), w AS (
      SELECT event_id, user_id,
        CAST(COUNT(*) OVER fr AS BIGINT) AS n,
        SUM(x) OVER fr AS sx, SUM(y) OVER fr AS sy,
        SUM(x*y) OVER fr AS sxy, SUM(x*x) OVER fr AS sxx, SUM(y*y) OVER fr AS syy
      FROM b
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n,
      FLOOR((
        (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / NULLIF(SQRT(
            (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
          ), 0.0)
      ) * 1000000 + 0.5) / 1000000 AS trend_corr
    FROM w
    """,
    section=_SEC,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between a user's event values and
    calendar time over a trailing 30-event frame — the windowed trend-
    strength detector (corr → +1: values climbing day over day; → −1:
    decaying) behind change-point monitors. Neither engine exposes CORR
    as a window function over an arbitrary frame with exact semantics, so
    it is lowered to its five sufficient statistics — Σx, Σy, Σxy, Σx²,
    Σy² — each a DECIMAL window sum (exact ⇒ order-independent ⇒ immune
    to the segment-tree vs running-sum evaluation difference between
    engines), combined by one double-precision expression on identical
    inputs. Zero variance (constant frame) yields NULL via NULLIF.

    Plan: ONE user_id shuffle + per-user sort evaluates all five sliding
    sums in a single Window operator; everything else is map-side
    expression codegen. Decimal types are sized so no product exceeds
    p=38 in either engine (x ≤ 4 digits as days-since-2024, y is a
    2-dp measure). At 100 TB the frame state is 30 rows/user — constant."""
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_id",
        "user_id",
        "ts",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
        .cast("decimal(10,0)")
        .alias("x"),
        F.col("value").cast("decimal(18,4)").alias("y"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-29, Window.currentRow)
    )
    w = b.select(
        "event_id",
        "user_id",
        F.count("*").over(fr).cast("bigint").alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).alias("syy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return w.select(
        "event_id",
        "user_id",
        "n",
        dround(num / F.nullif(den, F.lit(0.0)), 6).alias("trend_corr"),
    )


@register(
    "ts_seasonal_error",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS day_sum
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(d) AS mind, MAX(d) AS maxd FROM daily GROUP BY 1
    ), scaffold AS (
      SELECT user_id, UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY)) AS d
      FROM span
    ), j AS (
      SELECT s.user_id, s.d, daily.day_sum
      FROM scaffold s
      LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    ), p AS (
      SELECT user_id, d, day_sum,
             LAG(day_sum, 7) OVER (PARTITION BY user_id ORDER BY d) AS pred
      FROM j
    )
    SELECT user_id,
      CAST(COUNT(*) FILTER (WHERE day_sum IS NOT NULL AND pred IS NOT NULL)
           AS BIGINT) AS n_scored,
      CAST(ROUND(SUM(CAST(ABS(day_sum - pred) AS DECIMAL(30,8))), 2) AS DOUBLE)
        AS total_abs_err,
      FLOOR(CAST(SUM(CAST(ABS(day_sum - pred) AS DECIMAL(30,8))) AS DOUBLE)
            / NULLIF(COUNT(*) FILTER (WHERE day_sum IS NOT NULL
                                        AND pred IS NOT NULL), 0)
            * 10000 + 0.5) / 10000 AS mae
    FROM p GROUP BY user_id
    """,
    section=_SEC,
)
def ts_seasonal_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: predict each day's per-user total with the
    value from 7 days earlier and score the mean absolute error — the
    baseline every real forecaster must beat, and the weekly-seasonality
    strength probe (low MAE ⟹ strong weekly cycle). LAG(7) runs over the
    CALENDAR scaffold (ts_gap_fill's densify), so "7 rows back" is
    exactly "7 days back" even across silent days; days where either side
    is unobserved simply don't score (SUM/COUNT skip the NULL pairs —
    no imputation leaks into the error).

    Determinism: actual and prediction are exact decimal day-bars, the
    |a−p| projection re-enters DECIMAL before summing, and MAE divides
    two exact quantities — the engines see identical doubles end to end.

    Plan: same single-user_id-shuffle shape as ts_interpolate_linear (bars
    agg → narrow explode → one window sort), finishing in a per-user
    partial agg. Window state is one 7-slot lag buffer per user."""
    from sdp_spark.functions.num import DEC

    e = table(spark, sf_dir, "events")
    j = _daily_scaffold(e)
    w = Window.partitionBy("user_id").orderBy("d")
    p = j.select(
        "user_id", "day_sum", F.lag("day_sum", 7).over(w).alias("pred")
    )
    scored = F.col("day_sum").isNotNull() & F.col("pred").isNotNull()
    abs_dec = F.abs(F.col("day_sum") - F.col("pred")).cast(DEC)
    n_scored = F.count(F.when(scored, F.lit(1))).cast("bigint")
    return p.groupBy("user_id").agg(
        n_scored.alias("n_scored"),
        F.round(F.sum(abs_dec), 2).cast("double").alias("total_abs_err"),
        dround(
            F.sum(abs_dec).cast("double") / F.nullif(n_scored, F.lit(0)), 4
        ).alias("mae"),
    )


@register(
    "win_cumulative_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INTEGER) AS n_types_seen
    FROM events
    """,
    section=_SEC,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count — how many distinct event types each user
    has touched as of each event (the coverage/exploration curve behind
    activation metrics and API-surface-abuse detection). Spark has no
    DISTINCT window aggregate, so the lowering is collect_set over the
    running frame → size: the set is the distinct state made explicit.
    DuckDB runs its native windowed COUNT(DISTINCT) as the oracle.

    Plan: one user_id shuffle + sort. State per row is the accumulated
    set, bounded by |event_type| (single digits here) — NOT by frame
    length, which is what makes this safe at 100 TB where a
    running-distinct over a high-cardinality column would instead call
    for a windowed HLL sketch (same plan, sketch state)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("int").alias("n_types_seen"),
    )


@register(
    "win_event_sequence",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2,
             LEAD(event_id, 2) OVER w AS end_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS start_event_id, end_id AS end_event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    ORDER BY user_id, start_event_id
    """,
    section=_SEC,
)
def win_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-CONSECUTIVE event-pattern detection — the
    MATCH_RECOGNIZE-lite a funnel cannot express: `agg_funnel` asks "did
    view, click, purchase each happen in order, anything in between
    allowed?"; this asks "did the user do view → click → purchase with
    NOTHING in between" (the high-intent signature; also the shape of
    symptom→test→diagnosis sequence checks in surveillance pipelines).
    Lowered to two LEADs over the per-user time-ordered window (ties by
    event_id — the repo's sub-microsecond convention) and one filter: no
    self-joins, no pattern automaton, one shuffle on user_id.

    At 100 TB: identical plan — the window partitions by user, so state
    is two rows deep per partition stream; longer patterns add LEADs
    (constant per-row cost), and arbitrary-gap patterns fall back to
    `agg_funnel`'s min-ts cascade."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 2).over(w).alias("end_id"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.col("end_id").alias("end_event_id"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .orderBy("user_id", "start_event_id")
    )
