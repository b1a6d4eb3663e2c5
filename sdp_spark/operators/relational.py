"""Projection, filter, predicates — SURVEY.md §2.2.

Reference semantics: SELECT expressions and WHERE predicate forms of the
deployed MySQL 5.6 engine (mysql-persistent-template.json:68), including
3-valued NULL logic.

Scale notes: every predicate here is a Catalyst `Filter` that pushes down to
the parquet scan (row-group + page skipping); projections prune columns at
the reader. Verified via .explain(): PushedFilters / ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdp_spark.functions.num import dround, sql_dround
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.2 project/filter"


@register(
    "project_select",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_dround('l_extendedprice * (1 - l_discount)')} AS revenue,
           {sql_dround('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charged,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    """,
    section=_SEC,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        dround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@register(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 30 AND l_discount < 0.05 AND l_returnflag <> 'A'
    """,
    section=_SEC,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_quantity") >= 30) & (F.col("l_discount") < 0.05) & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000)
      AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'O')
    """,
    section=_SEC,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000))
        & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderstatus") == "O"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_extendedprice BETWEEN 20000 AND 30000
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
    section=_SEC,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_extendedprice").between(20000, 30000)
        & F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "filter_in",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_nationkey NOT IN (1, 2, 3)
    """,
    section=_SEC,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") & ~F.col("c_nationkey").isin(1, 2, 3)
    ).select("c_custkey", "c_mktsegment", "c_nationkey")


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%a%' AND p_brand LIKE 'Brand#1_'
    """,
    section=_SEC,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%") & F.col("p_brand").like("Brand#1_")).select(
        "p_partkey", "p_name", "p_brand"
    )


@register(
    "filter_regexp",
    oracle="""
    SELECT p_partkey, p_type, p_brand
    FROM part
    WHERE regexp_matches(p_type, '^(STANDARD|SM.LL)$') AND regexp_matches(p_brand, '#[0-9]*[13579]$')
    """,
    section=_SEC,
)
def filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP filter: anchors, alternation, wildcard dot, char class —
    constrained to the regex subset where Java and RE2-ish dialects agree."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").rlike("^(STANDARD|SM.LL)$") & F.col("p_brand").rlike("#[0-9]*[13579]$")
    ).select("p_partkey", "p_type", "p_brand")


@register(
    "filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_np,
           CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 'null' ELSE 'set' END AS nullness
    FROM orders
    WHERE NULLIF(o_orderstatus, 'P') IS NULL
       OR (NULLIF(o_orderstatus, 'P') IS NOT NULL AND o_orderkey % 100 = 0)
    """,
    section=_SEC,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL — fixtures carry no physical NULLs, so NULLIF
    manufactures them; the predicate exercises both branches of 3VL."""
    o = table(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        F.when(status_np.isNull(), "null").otherwise("set").alias("nullness"),
    ).filter(status_np.isNull() | (status_np.isNotNull() & (F.col("o_orderkey") % 100 == 0)))


@register(
    "project_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_coalesced,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    section=_SEC,
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_coalesced"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "project_cast",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(l_linenumber AS BIGINT) AS lineno_big,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST('42' AS INTEGER) + l_linenumber AS parsed_plus
    FROM lineitem
    """,
    section=_SEC,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST/CONVERT across string/number/date. Double→int goes through
    FLOOR because MySQL/DuckDB round while Spark truncates — FLOOR pins one
    semantics on both sides."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_linenumber").cast("bigint").alias("lineno_big"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        (F.lit("42").cast("int") + F.col("l_linenumber")).alias("parsed_plus"),
    )


@register(
    "dedup_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    section=_SEC,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — partial hash-aggregate per partition, then shuffle
    on the distinct keys (map-side combine keeps the shuffle tiny)."""
    return table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "filter_collation_ci",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) = lower('Building')
       OR lower(c_name) LIKE lower('%CUSTOMER#00000001%')
    """,
    section=_SEC,
)
def filter_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive comparison — the reference server default is
    utf8_general_ci (mysql-persistent-template.json:239-243) while Spark
    and DuckDB compare binary. The engine's CI idiom: normalize both sides
    with lower() (SURVEY.md §7 hard part 1); Catalyst still pushes the
    equality through as a filter."""
    c = table(spark, sf_dir, "customer")
    return c.filter(
        (F.lower("c_mktsegment") == F.lower(F.lit("Building")))
        | F.lower("c_name").like("%customer#00000001%")
    ).select("c_custkey", "c_mktsegment")


@register(
    "project_cast_lenient",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(c_name AS BIGINT) IS NULL                    AS name_not_numeric,
           TRY_CAST(string_split(c_name, '#')[2] AS BIGINT)      AS id_num,
           COALESCE(CAST(TRY_CAST('2024-02-30' AS DATE) AS VARCHAR), 'invalid') AS feb30,
           COALESCE(CAST(TRY_CAST('2024-02-29' AS DATE) AS VARCHAR), 'invalid') AS feb29
    FROM customer
    """,
    section=_SEC,
)
def project_cast_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient casts (TRY_CAST): malformed input becomes NULL instead of a
    runtime error — the closest ANSI-mode analogue of MySQL's permissive
    CAST-with-warning (MySQL coerces 'abc'→0; divergence documented here:
    this engine yields NULL, the safer contract under ANSI). Includes an
    impossible calendar date ('2024-02-30') folding to NULL at plan time."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("try_cast(c_name AS BIGINT)").isNull().alias("name_not_numeric"),
        F.expr("try_cast(split(c_name, '#')[1] AS BIGINT)").alias("id_num"),
        F.coalesce(
            F.expr("try_cast('2024-02-30' AS DATE)").cast("string"), F.lit("invalid")
        ).alias("feb30"),
        F.coalesce(
            F.expr("try_cast('2024-02-29' AS DATE)").cast("string"), F.lit("invalid")
        ).alias("feb29"),
    )


# Knuth multiplicative hash on the primary key: portable exact integer
# arithmetic (same result on any engine), spreads sequential keys uniformly.
from sdp_spark.functions.num import KNUTH as _KNUTH  # noqa: E402
from sdp_spark.functions.num import KNUTH_MOD as _MOD  # noqa: E402


@register(
    "sample_systematic",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CASE WHEN (o_orderkey * {_KNUTH}) % {_MOD} < {_MOD} * 0.8 THEN 'train'
                WHEN (o_orderkey * {_KNUTH}) % {_MOD} < {_MOD} * 0.9 THEN 'valid'
                ELSE 'test' END AS split
    FROM orders
    WHERE (o_orderkey * {_KNUTH}) % {_MOD} < {_MOD} * 0.1
       OR (o_orderkey * {_KNUTH}) % {_MOD} >= {_MOD} * 0.8
    """,
    section=_SEC,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling + train/valid/test split labels — the
    training-data primitive rand()-based sampling can't give you: the same
    row lands in the same split on every run, every engine, any
    partitioning (a reproducibility requirement at 100 TB, where re-runs
    and backfills must not migrate rows between splits). Knuth
    multiplicative hash in exact bigint arithmetic; the filter keeps a 10%
    sample plus the 20% eval tail. Pure codegen — one Filter evaluated
    directly over the scan, zero exchanges.

    Scale caveat: key*KNUTH stays in int64 for keys < ~3.5e9; for wider id
    spaces use pmod(xxhash64(key), 2^32) — equally deterministic across
    runs/partitionings, just not expressible in the DuckDB oracle."""
    o = table(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        o.filter((bucket < _MOD * 0.1) | (bucket >= _MOD * 0.8))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.when(bucket < _MOD * 0.8, "train")
            .when(bucket < _MOD * 0.9, "valid")
            .otherwise("test")
            .alias("split"),
        )
    )


# utf8_general_ci folds case AND (for many mappings) accents: é=e, Ï=I.
# Per-codepoint translate covers the Latin-1 block the reference's charset
# actually folds; lower() handles case. (True ICU collation differs on
# multi-char folds like ß→ss — documented divergence, SURVEY §7.1.)
_ACCENTS_FROM = "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖòóôõöÙÚÛÜùúûüÇçÑñÝýÿ"
_ACCENTS_TO = "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOoooooUUUUuuuuCcNnYyy"


@register(
    "filter_collation_accent",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           lower(translate(c_name, '{_ACCENTS_FROM}', '{_ACCENTS_TO}')) AS folded_name
    FROM customer
    WHERE lower(translate(c_mktsegment, '{_ACCENTS_FROM}', '{_ACCENTS_TO}'))
          = lower(translate('BUÏLDÏNG', '{_ACCENTS_FROM}', '{_ACCENTS_TO}'))
    """,
    section=_SEC,
)
def filter_collation_accent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent+case-insensitive comparison (utf8_general_ci semantics,
    mysql-persistent-template.json:233-243): both sides normalized with
    translate(accents→base) + lower(). 'BUÏLDÏNG' matches 'BUILDING' — the
    fold happens on the literal too, so the predicate is still a constant
    equality Catalyst pushes to the scan."""

    def fold(col):
        return F.lower(F.translate(col, _ACCENTS_FROM, _ACCENTS_TO))

    c = table(spark, sf_dir, "customer")
    return c.filter(fold(F.col("c_mktsegment")) == fold(F.lit("BUÏLDÏNG"))).select(
        "c_custkey", "c_mktsegment", fold(F.col("c_name")).alias("folded_name")
    )


@register(
    "sort_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY st ASC NULLS FIRST, o_orderkey DESC
    """,
    section=_SEC,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (MySQL: NULLs first on ASC) over
    manufactured NULLs — pins SURVEY.md §7 hard part 3 (engines default
    differently, so placement is always explicit in this engine)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select("o_orderkey", st.alias("st")).orderBy(
        F.col("st").asc_nulls_first(), F.col("o_orderkey").desc()
    )


_EVENT_ENUM = ("click", "view", "purchase", "signup")


@register(
    "project_enum_check",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN event_type IN ('click', 'view', 'purchase', 'signup')
                THEN event_type ELSE '' END AS enum_val,
           CAST(CASE WHEN list_position(['click', 'view', 'purchase', 'signup'], event_type) IS NULL
                     THEN 0
                     ELSE list_position(['click', 'view', 'purchase', 'signup'], event_type)
                END AS INTEGER) AS enum_idx,
           event_type IN ('click', 'view', 'purchase', 'signup') AS is_valid
    FROM events
    """,
    section=_SEC,
)
def project_enum_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENUM column semantics (SURVEY §1.2: ENUM → StringType + domain
    check). MySQL 5.6 default (non-strict) mode, the engine the reference
    pins (mysql-persistent-template.json:68), COERCES an invalid ENUM insert
    to the empty string with index 0; valid members keep their 1-based
    declaration index (what MySQL stores internally). The events fixture's
    'error' type is outside the declared ENUM('click','view','purchase',
    'signup') domain, so both branches are exercised. The membership check
    is a codegen IN-list — a strict-mode engine raises on `is_valid = false`
    instead; both behaviors derive from the same projection."""
    e = table(spark, sf_dir, "events")
    et = F.col("event_type")
    valid = et.isin(*_EVENT_ENUM)
    idx = F.coalesce(
        F.array_position(F.array(*[F.lit(v) for v in _EVENT_ENUM]), et).cast("int"),
        F.lit(0),
    )
    return e.select(
        "event_id",
        "event_type",
        F.when(valid, et).otherwise(F.lit("")).alias("enum_val"),
        idx.alias("enum_idx"),
        valid.alias("is_valid"),
    )


_SET_DOMAIN = ("click", "view", "purchase", "signup", "promo")


@register(
    "project_set_check",
    oracle="""
    WITH base AS (
      SELECT event_id,
             event_type || ',' || CASE WHEN value > 50 THEN 'promo' ELSE 'junk' END AS raw_set
      FROM events
    ), toks AS (
      SELECT event_id, raw_set, string_split(raw_set, ',') AS t FROM base
    )
    SELECT event_id, raw_set,
           COALESCE(array_to_string(list_filter(['click','view','purchase','signup','promo'],
                                                m -> list_contains(t, m)), ','), '') AS set_norm,
           CAST(  (CASE WHEN list_contains(t, 'click')    THEN 1  ELSE 0 END)
                + (CASE WHEN list_contains(t, 'view')     THEN 2  ELSE 0 END)
                + (CASE WHEN list_contains(t, 'purchase') THEN 4  ELSE 0 END)
                + (CASE WHEN list_contains(t, 'signup')   THEN 8  ELSE 0 END)
                + (CASE WHEN list_contains(t, 'promo')    THEN 16 ELSE 0 END) AS BIGINT)
             AS set_mask,
           len(list_filter(t, x -> NOT list_contains(['click','view','purchase','signup','promo'], x))) = 0
             AS all_valid
    FROM toks
    """,
    section=_SEC,
)
def project_set_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET column semantics (SURVEY §1.2: SET → StringType + domain check,
    the multi-valued sibling of project_enum_check). MySQL 5.6 non-strict
    mode DROPS invalid members from a SET insert and stores the rest as a
    bitmask over the declaration order; the normalized rendering lists kept
    members in DECLARATION order (not input order). The raw set string is
    synthesized with one always-invalid branch ('junk') and one
    sometimes-invalid event_type ('error'), so drop/keep/mask paths are all
    exercised. Pure codegen: split + per-member array_contains terms — no
    explode, no shuffle."""
    e = table(spark, sf_dir, "events")
    raw = F.concat_ws(
        ",",
        F.col("event_type"),
        F.when(F.col("value") > 50, F.lit("promo")).otherwise(F.lit("junk")),
    )
    toks = F.split(F.col("raw_set"), ",")
    kept = [F.when(F.array_contains(toks, m), F.lit(m)) for m in _SET_DOMAIN]
    mask = None
    for i, m in enumerate(_SET_DOMAIN):
        term = F.when(F.array_contains(toks, m), F.lit(2**i)).otherwise(F.lit(0))
        mask = term if mask is None else mask + term
    domain_arr = F.array(*[F.lit(m) for m in _SET_DOMAIN])
    return e.select("event_id", raw.alias("raw_set")).select(
        "event_id",
        "raw_set",
        F.concat_ws(",", *kept).alias("set_norm"),
        mask.cast("bigint").alias("set_mask"),
        F.forall(toks, lambda x: F.array_contains(domain_arr, x)).alias("all_valid"),
    )


@register(
    "filter_collation_native",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE lower(p_name) = lower('SMALL Gizmo')
    ORDER BY p_partkey
    """,
    section=_SEC,
)
def filter_collation_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native collation comparison (COLLATE UTF8_LCASE, Spark 4) — the
    engine-level case-insensitive equality MySQL 5.6 gives every
    utf8_general_ci column by DEFAULT, which is the single most common
    porting trap for its workloads. Where `filter_collation_ci` emulates
    with lower() (the pre-collation idiom), this key certifies the real
    collation surface: the predicate stays a plain equality whose
    COMPARISON rule changes, so it remains codegen-compiled and — unlike
    a lower()-wrapped column — still eligible for pruning/stats on
    engines that index collated columns. The oracle spells the same
    semantics with lower() (DuckDB's collation syntax differs; the
    SEMANTICS, equality under case folding, is what must match)."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(
            F.expr("p_name COLLATE UTF8_LCASE = 'SMALL Gizmo' COLLATE UTF8_LCASE")
        )
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )
