"""Scalar function families — SURVEY.md §2.8.

Reference semantics: the MySQL 5.6 scalar function surface
(string/date/math/conditional), JSON extraction (5.7+ engine gap, mandated
by the `events.props` fixture), and array/map lambdas (Spark-native superset
— no nested types exist in MySQL at all).

One wide SELECT per family; the DuckDB oracle hash pins every function's
semantics (rounding mode, date arithmetic, regex dialect — the three places
engines disagree most, SURVEY.md §7 M4). All functions here are JVM
whole-stage-codegen expressions — zero Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdp_spark.functions.num import dround, sql_dround
from sdp_spark.plans.registry import register
from sdp_spark.sources.fixtures import table

_SEC = "2.8 scalar functions"


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           c_name || '#' || c_mktsegment                    AS cat,
           concat_ws('-', c_name, c_mktsegment)             AS catws,
           substring(c_name, 1, 8)                          AS sub8,
           left(c_name, 4)                                  AS l4,
           right(c_name, 4)                                 AS r4,
           upper(c_mktsegment)                              AS up,
           lower(c_mktsegment)                              AS lo,
           trim('  ' || c_name || ' ')                      AS trimmed,
           ltrim('  ' || c_name)                            AS ltrimmed,
           rtrim(c_name || '  ')                            AS rtrimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')         AS padded,
           rpad(c_mktsegment, 12, '.')                      AS rpadded,
           replace(c_name, 'Customer', 'Cust')              AS repl,
           reverse(c_mktsegment)                            AS rev,
           CAST(length(c_name) AS INTEGER)                  AS len,
           CAST(instr(c_name, '#') AS INTEGER)              AS pos_hash,
           repeat('ab', 3)                                  AS rep
    FROM customer
    """,
    section=_SEC,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("cat"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("catws"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.expr("left(c_name, 4)").alias("l4"),
        F.expr("right(c_name, 4)").alias("r4"),
        F.upper("c_mktsegment").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("c_name"))).alias("ltrimmed"),
        F.rtrim(F.concat(F.col("c_name"), F.lit("  "))).alias("rtrimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.reverse("c_mktsegment").alias("rev"),
        F.length("c_name").alias("len"),
        F.instr("c_name", "#").alias("pos_hash"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
    )


@register(
    "fn_string_regex",
    oracle="""
    SELECT p_partkey, p_type || ' ' || p_brand || ' ' || p_name AS s,
           regexp_matches(p_type || ' ' || p_brand || ' ' || p_name, 'STANDARD|PROMO') AS has_kind,
           regexp_extract(p_type || ' ' || p_brand || ' ' || p_name, '^([A-Z]+)', 1)   AS first_word,
           regexp_extract(p_type || ' ' || p_brand || ' ' || p_name, '#([0-9]+)', 1)   AS brand_num,
           regexp_replace(p_type || ' ' || p_brand || ' ' || p_name, '[AEIOU]', '_', 'g') AS devoweled,
           split_part(p_type || ' ' || p_brand || ' ' || p_name, ' ', 1)               AS part1,
           split_part(p_type || ' ' || p_brand || ' ' || p_name, ' ', 2)               AS part2
    FROM part
    """,
    section=_SEC,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    s = F.concat_ws(" ", "p_type", "p_brand", "p_name")
    return p.select(
        "p_partkey",
        s.alias("s"),
        s.rlike("STANDARD|PROMO").alias("has_kind"),
        F.regexp_extract(s, "^([A-Z]+)", 1).alias("first_word"),
        F.regexp_extract(s, "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace(s, "[AEIOU]", "_").alias("devoweled"),
        F.split_part(s, F.lit(" "), F.lit(1)).alias("part1"),
        F.split_part(s, F.lit(" "), F.lit(2)).alias("part2"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR  AS plus30,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 90 DAY AS DATE)::VARCHAR  AS minus90,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           CAST(year(o_orderdate) AS INTEGER)       AS yr,
           CAST(month(o_orderdate) AS INTEGER)      AS mo,
           CAST(day(o_orderdate) AS INTEGER)        AS dy,
           CAST(quarter(o_orderdate) AS INTEGER)    AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_mysql,
           strftime(o_orderdate, '%Y-%m')           AS ym,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 1000 AS BIGINT) AS epoch_s,
           CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS mstart
    FROM orders
    """,
    section=_SEC,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal family. DOW pinned to MySQL semantics (1=Sunday..7=Saturday):
    Spark dayofweek already matches; DuckDB dayofweek is 0=Sunday → +1 in the
    oracle. All date outputs stringified (FIXTURES.md ms-precision caveat)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.date_sub(d, 90).cast("string").alias("minus90"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("wk"),
        F.dayofweek("o_orderdate").alias("dow_mysql"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day(d).cast("string").alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("mstart"),
    )


@register(
    "fn_math",
    # r1/rk use the repo's floor-form rounding (sql_dround), not bare ROUND:
    # ROUND on a 2dp money double is the Spark-shortest-decimal vs
    # DuckDB-binary boundary class (functions/num.py, the 4201.315 case).
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05)                       AS abs_d,
           {sql_dround('l_extendedprice', 1)}           AS r1,
           {sql_dround('l_extendedprice / 1000', 0)}    AS rk,
           CAST(CEIL(l_quantity / 7) AS BIGINT)         AS ceil7,
           CAST(FLOOR(l_quantity / 7) AS BIGINT)        AS floor7,
           CAST(CAST(l_orderkey AS BIGINT) % 97 AS BIGINT) AS mod97,
           ROUND(POW(l_quantity, 2), 2)                 AS qty_sq,
           ROUND(SQRT(l_extendedprice), 4)              AS sqrt_p,
           ROUND(EXP(l_discount), 6)                    AS exp_d,
           ROUND(LN(l_extendedprice), 6)                AS ln_p,
           ROUND(LOG10(l_extendedprice), 6)             AS log10_p,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)      AS sgn,
           GREATEST(l_quantity, 25.0)                   AS gq,
           LEAST(l_quantity, 25.0)                      AS lq
    FROM lineitem
    """,
    section=_SEC,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        dround("l_extendedprice", 1).alias("r1"),
        dround(F.col("l_extendedprice") / 1000, 0).alias("rk"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil7"),
        F.floor(F.col("l_quantity") / 7).alias("floor7"),
        (F.col("l_orderkey").cast("bigint") % 97).cast("bigint").alias("mod97"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_quantity", F.lit(25.0)).alias("gq"),
        F.least("l_quantity", F.lit(25.0)).alias("lq"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT e.event_id,
           CASE e.event_type WHEN 'purchase' THEN 'buy'
                             WHEN 'view' THEN 'look'
                             ELSE 'other' END            AS kind,
           CASE WHEN e.value > 50 THEN 'high' ELSE 'low' END AS band,
           COALESCE(NULLIF(e.event_type, 'error'), 'ERR')   AS type_or_err,
           IFNULL(NULLIF(e.user_id, 1), -1)                 AS user_or_neg1
    FROM events e
    """,
    section=_SEC,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "buy")
        .when(F.col("event_type") == "view", "look")
        .otherwise("other")
        .alias("kind"),
        F.when(F.col("value") > 50, "high").otherwise("low").alias("band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR")).alias(
            "type_or_err"
        ),
        F.ifnull(F.nullif(F.col("user_id"), F.lit(1)), F.lit(-1)).alias("user_or_neg1"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')              AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           json_extract_string(props, '$.missing')        AS missing
    FROM events
    """,
    section=_SEC,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from `events.props` (MySQL 5.7+ JSON_EXTRACT analogue;
    get_json_object is codegen'd JsonPath — no Python)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "fn_array_map",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                        AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                 AS first_elem,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4)        AS vec_sum,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6)        AS vec_max,
           ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS sq_norm,
           list_contains(CAST(label_arr AS INTEGER[]), 3)         AS has3
    FROM (SELECT vec_id, embedding, [label, label % 5] AS label_arr FROM embeddings) t
    """,
    section=_SEC,
)
def fn_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambdas over the 64-dim embedding column (MySQL has no nested
    types at all — pure Spark-native superset). aggregate/transform run as
    codegen higher-order functions, not UDFs."""
    emb = table(spark, sf_dir, "embeddings")
    dvec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(dvec, 1), 6).alias("first_elem"),
        F.round(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.array_max(dvec), 6).alias("vec_max"),
        F.round(
            F.aggregate(F.transform(dvec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("sq_norm"),
        F.array_contains(
            F.array(F.col("label"), F.col("label") % 5).cast("array<int>"), 3
        ).alias("has3"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                                   AS h_md5,
           sha256(c_name)                                AS h_sha256,
           CAST(length(md5(c_name)) AS INTEGER)          AS md5_len
    FROM customer
    """,
    section=_SEC,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (MySQL MD5/SHA2) — the primitives under
    llm_dedup_exact and content addressing."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           value AS v_lookup,
           CAST(user_id AS DOUBLE) AS u_lookup,
           2 AS n_keys,
           TRUE AS has_value_key
    FROM events
    """,
    section=_SEC,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip (no nested types exist in MySQL — pure Spark
    superset): build a map from arrays, then extract typed scalars back out.
    The oracle pins the *extracted values*, proving the map ops are
    lossless."""
    e = table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("value"), F.lit("user")),
        F.array(F.col("value"), F.col("user_id").cast("double")),
    )
    return e.select(
        "event_id",
        F.element_at(m, "value").alias("v_lookup"),
        F.element_at(m, "user").alias("u_lookup"),
        F.size(m).alias("n_keys"),
        F.map_contains_key(m, "value").alias("has_value_key"),
    )


@register(
    "fn_substring_index",
    oracle="""
    WITH t AS (SELECT p_partkey, p_type || ' ' || p_brand || ' ' || p_name AS s FROM part)
    SELECT p_partkey, s,
           array_to_string(string_split(s, ' ')[1:1], ' ')  AS idx1,
           array_to_string(string_split(s, ' ')[1:2], ' ')  AS idx2,
           array_to_string(string_split(s, ' ')[-1:], ' ')  AS idx_last
    FROM t
    """,
    section=_SEC,
)
def fn_substring_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL SUBSTRING_INDEX(s, delim, n): everything before the nth
    delimiter (negative n counts from the right). DuckDB lacks it — the
    oracle emulates via list slicing, pinning MySQL's exact semantics."""
    p = table(spark, sf_dir, "part")
    s = F.concat_ws(" ", "p_type", "p_brand", "p_name")
    return p.select(
        "p_partkey",
        s.alias("s"),
        F.substring_index(s, " ", 1).alias("idx1"),
        F.substring_index(s, " ", 2).alias("idx2"),
        F.substring_index(s, " ", -1).alias("idx_last"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m,
           strftime(CAST(ts AS TIMESTAMP) - INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S')   AS minus36h,
           CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', CAST(ts AS TIMESTAMP)) AS BIGINT)
             AS hours_since_jan1,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')   AS day_start
    FROM events
    """,
    section=_SEC,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp interval arithmetic (MySQL DATE_ADD/SUB with
    MINUTE/HOUR units, TIMESTAMPDIFF) — sub-day precision, truncated to
    seconds on output (fixture is ns, FIXTURES.md)."""
    e = table(spark, sf_dir, "events")
    ts = F.col("ts")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return e.select(
        "event_id",
        F.date_format(ts + F.expr("INTERVAL 90 MINUTES"), fmt).alias("plus90m"),
        F.date_format(ts - F.expr("INTERVAL 36 HOURS"), fmt).alias("minus36h"),
        (
            F.floor(
                (F.unix_timestamp(ts) - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp")))
                / 3600
            )
        ).alias("hours_since_jan1"),
        F.date_format(F.date_trunc("day", ts), fmt).alias("day_start"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                 AS b_and,
           o_orderkey | 4096                AS b_or,
           xor(o_orderkey, 1365)            AS b_xor,
           (o_orderkey & 15) << 2           AS b_shl,
           o_orderkey >> 3                  AS b_shr,
           ~o_orderkey                      AS b_not
    FROM orders
    """,
    section=_SEC,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar operators (MySQL & | ^ << >> ~). DuckDB spells xor as
    a function; the semantics are pinned identical."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("b_and"),
        k.bitwiseOR(4096).alias("b_or"),
        k.bitwiseXOR(1365).alias("b_xor"),
        F.expr("shiftleft(o_orderkey & 15, 2)").cast("bigint").alias("b_shl"),
        F.expr("shiftright(o_orderkey, 3)").cast("bigint").alias("b_shr"),
        F.expr("~o_orderkey").alias("b_not"),
    )


@register(
    "fn_mysql_misc",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN list_position(string_split('1-URGENT,2-HIGH,3-MEDIUM,4-NOT SPECIFIED,5-LOW', ','),
                                        o_orderpriority) IS NULL THEN 0
                ELSE list_position(string_split('1-URGENT,2-HIGH,3-MEDIUM,4-NOT SPECIFIED,5-LOW', ','),
                                   o_orderpriority) END AS INTEGER) AS prio_pos,
           string_split('low,mid,high', ',')[CAST(o_orderkey % 3 + 1 AS INTEGER)] AS tier,
           hex(CAST(o_orderkey % 4096 AS BIGINT)) AS key_hex
    FROM orders
    """,
    section=_SEC,
)
def fn_mysql_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL-specific idioms: FIND_IN_SET (position in a CSV set), ELT
    (1-indexed value pick), HEX. DuckDB lacks all three — the oracle
    emulates with list functions, pinning MySQL's exact semantics."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "find_in_set(o_orderpriority, '1-URGENT,2-HIGH,3-MEDIUM,4-NOT SPECIFIED,5-LOW')"
        ).alias("prio_pos"),
        F.expr("elt(CAST(o_orderkey % 3 + 1 AS INT), 'low', 'mid', 'high')").alias("tier"),
        F.hex(F.col("o_orderkey") % 4096).alias("key_hex"),
    )


@register(
    "fn_fuzzy",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(levenshtein(c_name, 'Customer#000000010') AS INTEGER) AS edit_dist
    FROM customer
    WHERE levenshtein(c_name, 'Customer#000000010') <= 2
    """,
    section=_SEC,
)
def fn_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance (levenshtein): the
    typo-tolerant lookup MySQL users emulate with SOUNDEX/LIKE chains, and
    a building block for record-linkage dedup. JVM codegen; at scale pair
    generation must still come from blocking (LSH/shingles) — edit distance
    is the VERIFY stage, never the candidate generator."""
    c = table(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit("Customer#000000010"))
    return c.filter(dist <= 2).select("c_custkey", "c_name", dist.alias("edit_dist"))


@register(
    "fn_time_year",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) * 3600
              + EXTRACT(MINUTE FROM CAST(ts AS TIMESTAMP)) * 60
              + EXTRACT(SECOND FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS tod_sec,
           CAST((EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) * 3600
               + EXTRACT(MINUTE FROM CAST(ts AS TIMESTAMP)) * 60
               + EXTRACT(SECOND FROM CAST(ts AS TIMESTAMP)) + 5400) % 86400 AS BIGINT)
             AS tod_plus90m,
           strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS tod_s,
           CAST(EXTRACT(YEAR FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS yr,
           CAST(make_date(CAST(EXTRACT(YEAR FROM CAST(ts AS TIMESTAMP)) AS INTEGER), 1, 1)
                AS VARCHAR) AS year_start
    FROM events
    """,
    section=_SEC,
)
def fn_time_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL TIME / YEAR type mapping (SURVEY §1.2): TIME → seconds since
    midnight as LongType (arithmetic stays integer: +90min wraps mod 86400,
    exactly MySQL's TIME addition on a day-clock), the canonical 'HH:MM:SS'
    TIME rendering, and YEAR → IntegerType with a YEAR(ts) → DATE round-trip
    (make_date(yr,1,1)). All codegen expressions — no UDFs."""
    e = table(spark, sf_dir, "events")
    ts = F.col("ts")
    tod = (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast("bigint")
    return e.select(
        "event_id",
        tod.alias("tod_sec"),
        ((tod + 5400) % 86400).alias("tod_plus90m"),
        F.date_format(ts, "HH:mm:ss").alias("tod_s"),
        F.year(ts).alias("yr"),
        F.make_date(F.year(ts), F.lit(1), F.lit(1)).cast("string").alias("year_start"),
    )


@register(
    "fn_encode",
    oracle="""
    SELECT c_custkey,
           hex(c_name) AS name_hex,
           CAST(unhex(hex(c_name)) AS VARCHAR) AS name_hex_rt,
           to_base64(CAST(c_name AS BLOB)) AS name_b64,
           CAST(from_base64(to_base64(CAST(c_name AS BLOB))) AS VARCHAR) AS name_b64_rt,
           CAST(ascii(c_name) AS INTEGER) AS first_code,
           chr(CAST(ascii(c_name) AS INTEGER)) AS first_chr,
           CAST(octet_length(CAST(c_name AS BLOB)) AS INTEGER) AS n_bytes,
           CAST(octet_length(CAST(c_name AS BLOB)) * 8 AS INTEGER) AS n_bits
    FROM customer
    """,
    section=_SEC,
)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding functions (MySQL HEX/UNHEX/TO_BASE64/FROM_BASE64/
    ASCII/CHAR/OCTET_LENGTH/BIT_LENGTH): each codec is pinned by a
    round-trip so the oracle hash proves both directions, not just output
    shape. All JVM codegen; the string↔binary casts are zero-copy UTF-8."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.hex("c_name").alias("name_hex"),
        F.unhex(F.hex("c_name")).cast("string").alias("name_hex_rt"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("c_name").cast("binary"))).cast("string").alias("name_b64_rt"),
        F.ascii("c_name").alias("first_code"),
        F.expr("char(ascii(c_name))").alias("first_chr"),
        F.octet_length("c_name").alias("n_bytes"),
        F.bit_length("c_name").alias("n_bits"),
    )


_EARTH_R_KM = 6371.0


@register(
    "fn_spatial",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey * 37) % 1800 AS DOUBLE) / 10.0 - 90.0 AS lat,
             CAST((c_custkey * 7919) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
      FROM customer
    )
    SELECT c_custkey, lat, lon,
           FLOOR(sqrt((lat - 40.7) * (lat - 40.7) + (lon + 74.0) * (lon + 74.0))
                 * 10000 + 0.5) / 10000 AS dist_deg,
           FLOOR(2.0 * 6371.0 * asin(sqrt(
               sin(radians(lat - 40.7) / 2) * sin(radians(lat - 40.7) / 2)
               + cos(radians(40.7)) * cos(radians(lat))
               * sin(radians(lon + 74.0) / 2) * sin(radians(lon + 74.0) / 2)))
                 * 10000 + 0.5) / 10000 AS dist_km,
           (lat BETWEEN 0.0 AND 45.0) AND (lon BETWEEN -90.0 AND 0.0) AS in_mbr
    FROM pts
    """,
    section="2.8 scalar functions",
)
def fn_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial scalar functions (MySQL 5.6 ST_Distance / MBRContains, plus
    the 5.7 ST_Distance_Sphere superset): planar degree-space distance,
    great-circle haversine km to a fixed reference point, and a bounding-box
    containment predicate. Coordinates derive deterministically from
    c_custkey so both engines see identical doubles; every formula is pure
    IEEE arithmetic (radians/sin/cos/asin/sqrt are correctly-rounded libm
    on both JVMs and DuckDB) finished with floor-form rounding — the same
    cross-engine discipline as num.dround. All whole-stage codegen, one
    scan, no shuffle; at 100 TB this is a free-rider projection (the grid
    JOIN twin is join_spatial_grid)."""
    c = table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 37) % 1800).cast("double") / 10.0 - 90.0
    lon = ((F.col("c_custkey") * 7919) % 3600).cast("double") / 10.0 - 180.0
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    dlat = F.radians(F.col("lat") - 40.7) / 2
    dlon = F.radians(F.col("lon") + 74.0) / 2
    hav = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(F.lit(40.7))) * F.cos(F.radians("lat")) * F.sin(dlon) * F.sin(dlon)
    )
    d2 = (F.col("lat") - 40.7) * (F.col("lat") - 40.7) + (F.col("lon") + 74.0) * (
        F.col("lon") + 74.0
    )
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        dround(F.sqrt(d2), 4).alias("dist_deg"),
        dround(2.0 * _EARTH_R_KM * F.asin(F.sqrt(hav)), 4).alias("dist_km"),
        (F.col("lat").between(0.0, 45.0) & F.col("lon").between(-90.0, 0.0)).alias("in_mbr"),
    )


@register(
    "fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL AS has_k
    FROM events
    """,
    section=_SEC,
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON expansion: from_json with an explicit schema turns the
    props string into a STRUCT whose fields are real typed columns —
    the schema-on-read counterpart of fn_json's stringly get_json_object.
    Downstream expressions (arithmetic, null checks) then run on INT, not
    on string casts; at scale the struct field access is codegen and the
    JSON parse happens exactly once per row however many fields are read."""
    e = table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_typed"),
        (F.col("p.k") * 2).alias("k_doubled"),
        F.col("p.k").isNotNull().alias("has_k"),
    )


@register(
    "fn_trig",
    oracle=f"""
    SELECT p_partkey,
           {sql_dround('sin(p_size / 10.0)', 6)}  AS sin_x,
           {sql_dround('cos(p_size / 10.0)', 6)}  AS cos_x,
           {sql_dround('tan(p_size / 100.0)', 6)} AS tan_x,
           {sql_dround('atan2(p_size, 7.0)', 6)}  AS atan2_x,
           {sql_dround('radians(p_size)', 6)}     AS rad_x,
           {sql_dround('degrees(p_size / 10.0)', 6)} AS deg_x,
           {sql_dround('pi()', 6)}                AS pi_c
    FROM part
    """,
    section=_SEC,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family (SIN/COS/TAN/ATAN2/RADIANS/DEGREES/PI) — the
    remaining MySQL 5.6 math surface (geo/bearing computations on the
    platform's surveillance data; fn_spatial consumes these). Pure codegen;
    dround(6) absorbs the 1-ulp differences between Java's and libm's
    transcendental implementations (sqrt alone is IEEE-exact)."""
    p = table(spark, sf_dir, "part")
    x = F.col("p_size") / 10.0
    return p.select(
        "p_partkey",
        dround(F.sin(x), 6).alias("sin_x"),
        dround(F.cos(x), 6).alias("cos_x"),
        dround(F.tan(F.col("p_size") / 100.0), 6).alias("tan_x"),
        dround(F.atan2(F.col("p_size").cast("double"), F.lit(7.0)), 6).alias("atan2_x"),
        dround(F.radians(F.col("p_size")), 6).alias("rad_x"),
        dround(F.degrees(x), 6).alias("deg_x"),
        dround(F.lit(3.141592653589793), 6).alias("pi_c"),
    )


@register(
    "fn_convert_tz",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_wall,
           strftime(timezone('America/New_York', timezone('UTC', ts)),
                    '%Y-%m-%d %H:%M:%S') AS ny_wall,
           strftime(timezone('Asia/Kolkata', timezone('UTC', ts)),
                    '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
           strftime(timezone('UTC', timezone('America/New_York',
                    timezone('America/New_York', timezone('UTC', ts)))),
                    '%Y-%m-%d %H:%M:%S') AS roundtrip_utc
    FROM events
    """,
    section=_SEC,
)
def fn_convert_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT_TZ — MySQL 5.6's named-zone timestamp conversion ([ENGINE],
    loaded via mysql_tzinfo_to_sql): UTC wall clock → America/New_York
    (DST-aware: January fixture data renders EST, -05:00) and
    Asia/Kolkata (+05:30 — the fractional offset that catches
    half-hour-shift bugs), plus the full there-and-back round trip which
    must reproduce the input exactly. Spark: from_utc_timestamp /
    to_utc_timestamp; oracle: ICU timezone() pairs — both sides render
    strings so naive-vs-zoned type gaps can't leak into the hash.

    Pure per-row codegen (zone rules are JVM-side tables, no shuffle);
    session-timezone-independent by construction on both engines — the
    registry's UTC pin plus instant-based conversion, verified by the
    round-5 TZ=America/New_York / Asia/Kolkata driver-emulation runs."""
    e = table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    ny = F.from_utc_timestamp("ts", "America/New_York")
    kol = F.from_utc_timestamp("ts", "Asia/Kolkata")
    return e.select(
        "event_id",
        F.date_format("ts", fmt).alias("utc_wall"),
        F.date_format(ny, fmt).alias("ny_wall"),
        F.date_format(kol, fmt).alias("kolkata_wall"),
        F.date_format(F.to_utc_timestamp(ny, "America/New_York"), fmt).alias(
            "roundtrip_utc"
        ),
    )


# MySQL WEEK(d, 0): weeks start SUNDAY; days before the year's first
# Sunday are week 0. Shared formula (same arithmetic both engines):
#   fs_doy = 1 + (8 - dayofweek(jan1)) % 7      -- first Sunday's doy
#   week0  = 0 if doy < fs_doy else (doy - fs_doy) / 7 + 1
_WEEK0_SQL = (
    "CASE WHEN {doy} < 1 + (8 - ({dow_jan1})) % 7 THEN 0 "
    "ELSE CAST(FLOOR(({doy} - (1 + (8 - ({dow_jan1})) % 7)) / 7) AS BIGINT) + 1 END"
)


@register(
    "fn_week_modes",
    oracle=f"""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS d,
           {_WEEK0_SQL.format(
               doy="dayofyear(o_orderdate)",
               dow_jan1="dayofweek(date_trunc('year', o_orderdate)) + 1",
           )} AS week_mode0,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS week_iso,
           CAST(isoyear(o_orderdate) AS BIGINT) AS year_iso
    FROM orders WHERE o_orderkey % 37 = 0
    """,
    section=_SEC,
)
def fn_week_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL WEEK() mode semantics — the 5.6 footgun this engine must
    reproduce for migrating reports: WEEK(d) defaults to MODE 0
    (Sunday-start weeks, week 0 for days before the year's first Sunday),
    which disagrees with ISO everywhere near year boundaries; WEEK(d, 3)
    is ISO-8601 (Monday-start, week 1 holds Jan 4) and pairs with
    YEARWEEK's ISO year. Mode 0 is computed from the explicit
    first-Sunday formula (shared verbatim with the oracle; pinned against
    MySQL-documented literals in tests — e.g. WEEK('2008-02-20', 0) = 7);
    mode 3 maps to the engines' native ISO weekofyear/YEAROFWEEK.
    All row-level codegen arithmetic — no shuffle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    doy = F.dayofyear("o_orderdate")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
    dow_jan1 = F.dayofweek(F.trunc("o_orderdate", "year"))
    fs_doy = 1 + (8 - dow_jan1) % 7
    week0 = (
        F.when(doy < fs_doy, F.lit(0))
        .otherwise(F.floor((doy - fs_doy) / 7).cast("bigint") + 1)
        .cast("bigint")
    )
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        week0.alias("week_mode0"),
        F.weekofyear("o_orderdate").cast("bigint").alias("week_iso"),
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("bigint").alias("year_iso"),
    )


@register(
    "fn_mysql_string2",
    oracle="""
    SELECT n_nationkey,
           ['alpha', 'beta', 'gamma'][(n_nationkey % 3) + 1] AS elt_pick,
           CAST(COALESCE(list_position(['AFRICA', 'ASIA', 'EUROPE'], n_name), 0)
                AS BIGINT) AS field_pos,
           CAST(COALESCE(list_position(string_split('NATION_1,NATION_5,NATION_7', ','),
                                  n_name), 0) AS BIGINT) AS in_set,
           upper(format('{:x}', n_nationkey * 255 + 7)) AS conv_hex,
           format('{:,}', CAST(FLOOR(n_nationkey * 1234.567 * 100 + 0.5) AS BIGINT) // 100)
             || '.' ||
             lpad(CAST(CAST(FLOOR(n_nationkey * 1234.567 * 100 + 0.5) AS BIGINT) % 100
                  AS VARCHAR), 2, '0') AS fmt_grouped
    FROM nation
    """,
    section=_SEC,
)
def fn_mysql_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second MySQL string-function family — the list/positional helpers
    5.6 reports lean on: ELT(i, ...) positional pick, FIELD(s, ...) ->
    1-based position (0 when absent), FIND_IN_SET over a CSV set string
    (the SET-type accessor; Spark ships find_in_set natively),
    CONV(n, 10, 16) radix conversion, and FORMAT(x, 2) thousands-grouped
    rendering (applied to an already-exactly-rounded value so both
    engines format the same double). All row-level codegen expressions;
    the oracle mirrors each via DuckDB list/format primitives."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.element_at(
            F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma")),
            (F.col("n_nationkey") % 3 + 1).cast("int"),
        ).alias("elt_pick"),
        F.coalesce(
            F.array_position(
                F.array(F.lit("AFRICA"), F.lit("ASIA"), F.lit("EUROPE")),
                F.col("n_name"),
            ),
            F.lit(0),
        ).alias("field_pos"),
        F.expr("find_in_set(n_name, 'NATION_1,NATION_5,NATION_7')")
        .cast("bigint")
        .alias("in_set"),
        F.conv((F.col("n_nationkey") * 255 + 7).cast("string"), 10, 16).alias(
            "conv_hex"
        ),
        F.format_number(dround(F.col("n_nationkey") * 1234.567, 2), 2).alias(
            "fmt_grouped"
        ),
    )


@register(
    "fn_inet",
    oracle="""
    WITH ips AS (
      SELECT n_nationkey,
             '10.' || CAST(n_regionkey AS VARCHAR) || '.'
                   || CAST(n_nationkey AS VARCHAR) || '.'
                   || CAST((n_nationkey * 37) % 256 AS VARCHAR) AS ip
      FROM nation
    )
    SELECT n_nationkey, ip,
           CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num,
           num.v // 16777216 || '.' || (num.v // 65536) % 256 || '.'
             || (num.v // 256) % 256 || '.' || num.v % 256 AS ip_back
    FROM ips,
         LATERAL (SELECT CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS v) num
    """,
    section=_SEC,
)
def fn_inet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INET_ATON / INET_NTOA — MySQL's IPv4 dotted-quad ↔ integer pair,
    the address normalization every network/surveillance log pipeline
    runs (sortable ranges, CIDR joins become integer BETWEENs at 100 TB).
    Both directions are pure integer/string arithmetic (octet shifts),
    shared with the oracle; the round-trip (ip_back == ip) is part of the
    hashed output."""
    n = table(spark, sf_dir, "nation")
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        F.col("n_regionkey").cast("string"),
        F.col("n_nationkey").cast("string"),
        ((F.col("n_nationkey") * 37) % 256).cast("string"),
    )
    df = n.select("n_nationkey", ip.alias("ip"))
    oct_ = lambda i: F.element_at(F.split("ip", "\\."), i).cast("bigint")  # noqa: E731
    aton = oct_(1) * 16777216 + oct_(2) * 65536 + oct_(3) * 256 + oct_(4)
    ntoa = F.concat_ws(
        ".",
        F.floor(aton / 16777216).cast("bigint").cast("string"),
        (F.floor(aton / 65536).cast("bigint") % 256).cast("string"),
        (F.floor(aton / 256).cast("bigint") % 256).cast("string"),
        (aton % 256).cast("string"),
    )
    return df.select(
        "n_nationkey", "ip", aton.alias("ip_num"), ntoa.alias("ip_back")
    )


_AES_KEY = "0123456789abcdef"  # 16-byte demo key (AES-128)


@register(
    "fn_aes_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name AS plain, n_name AS decrypted,
           CAST(1 AS BOOLEAN) AS roundtrip_ok
    FROM nation
    """,
    section=_SEC,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES_ENCRYPT / AES_DECRYPT (MySQL 5.6's symmetric crypto pair, ECB
    mode exactly as 5.6 defaults to): the oracle cannot re-derive Spark's
    ciphertext (DuckDB has no AES), so the HASHED CONTRACT is the
    round-trip — decrypt(encrypt(plain)) must equal plain, emitted
    alongside an equality bit. Ciphertext itself stays out of the output
    (ECB is deterministic but engine-private). Row-level JVM crypto —
    no shuffle, no UDF. (5.6's ECB default is also its documented
    weakness; production guidance is GCM — which Spark supports via the
    same functions with a mode argument — but ECB is what the reference
    engine does, so ECB is what the conformance key pins.)"""
    n = table(spark, sf_dir, "nation")
    enc = F.expr(f"aes_encrypt(n_name, '{_AES_KEY}', 'ECB')")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(n_name, '{_AES_KEY}', 'ECB'),"
        f" '{_AES_KEY}', 'ECB') AS STRING)"
    )
    return n.select(
        "n_nationkey",
        F.col("n_name").alias("plain"),
        dec.alias("decrypted"),
        (dec == F.col("n_name")).alias("roundtrip_ok"),
    )


@register(
    "fn_regex_advanced",
    oracle=r"""
    SELECT n_nationkey,
           regexp_replace(n_name, '([A-Z]+)_(\d+)', '\2-\1') AS swapped,
           regexp_extract(n_name, '(\d+)$', 1) AS tail_digits,
           CAST(regexp_matches(n_name, '^NATION_(1\d|2[0-4])$') AS BOOLEAN)
             AS teens_or_twenties,
           regexp_replace('a1b22c333', '(\d+)', '<\1>', 'g') AS wrapped
    FROM nation
    """,
    section=_SEC,
)
def fn_regex_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advanced regex surface: capture-group BACKREFERENCES in the
    replacement (the dialect split pinned here: Spark/Java writes $1,
    DuckDB/RE2 writes \\1 — each side uses its own syntax and the oracle
    hash proves the RESULTS agree), anchored alternation, group
    extraction, and global multi-match replacement (Spark replaces all
    occurrences by default; DuckDB needs the 'g' flag — another dialect
    asymmetry this key pins). Row-level codegen, no shuffle."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.regexp_replace("n_name", r"([A-Z]+)_(\d+)", r"$2-$1").alias("swapped"),
        F.regexp_extract("n_name", r"(\d+)$", 1).alias("tail_digits"),
        F.col("n_name").rlike(r"^NATION_(1\d|2[0-4])$").alias("teens_or_twenties"),
        F.regexp_replace(F.lit("a1b22c333"), r"(\d+)", r"<$1>").alias("wrapped"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS VARCHAR) IS NOT NULL AS has_k,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS BIGINT)
             AS k_doubled
    FROM events WHERE event_id % 11 = 0
    """,
    section=_SEC,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT — the modern semi-structured type (Spark 4, same model as
    the 2024 open Variant spec): parse_json() builds a binary-encoded
    variant ONCE and typed paths extract without re-parsing text — at
    100 TB the difference between one parse per row and one parse per
    get_json_object CALL (events.props consumers here: fn_json runs
    string-path extraction; this is its typed successor). variant_get
    returns typed values directly; the oracle mirrors with DuckDB JSON
    extraction. Engine-private binary encoding stays out of the output —
    only extracted typed values are hashed."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return e.select(
        "event_id",
        k.alias("k_int"),
        k.isNotNull().alias("has_k"),
        (k * 2).cast("bigint").alias("k_doubled"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 10 THEN NULL
                ELSE FLOOR(l_extendedprice / (l_quantity - 10) * 100 + 0.5) / 100
           END AS unit_markup,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'n/a'
                         ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS parsed,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE FLOOR(l_tax / l_discount * 10000 + 0.5) / 10000
           END AS tax_ratio
    FROM lineitem
    WHERE l_orderkey % 29 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    section=_SEC,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* error-safe arithmetic (try_divide / try_cast) — the ANSI-era
    answer to MySQL 5.6's SILENT error semantics: 5.6 turns division by
    zero and bad casts into NULL-plus-warning instead of failing the
    statement, and a migrating workload depends on that. Under Spark's
    ANSI mode the plain operators THROW; the try_ family restores
    null-on-error per-expression — scoped leniency instead of a global
    sql_mode. Every expression stays whole-stage-codegen (no UDF); the
    oracle spells the same semantics with CASE guards / TRY_CAST."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 29 == 0)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            dround(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 10), 2
            ).alias("unit_markup"),
            # try_cast, not try_to_number('999'): a format mask caps the
            # parse domain at 3 digits while the oracle's TRY_CAST has no
            # width limit — the two must share one domain (ADVICE r5).
            F.when(F.col("l_linenumber") % 3 == 0, "n/a")
            .otherwise(F.col("l_linenumber").cast("string"))
            .try_cast("int")
            .alias("parsed"),
            dround(F.try_divide(F.col("l_tax"), F.col("l_discount")), 4).alias(
                "tax_ratio"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id % 50 AS VARCHAR)
               || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) AS url
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/?#]+)', 1) AS host,
           regexp_extract(url, '://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, 'id=([0-9]+)', 1) AS id_param
    FROM u ORDER BY doc_id
    """,
    section=_SEC,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured URL parsing via parse_url — PROTOCOL / HOST / PATH and
    per-key QUERY extraction as engine primitives, where MySQL 5.6
    workloads stack SUBSTRING_INDEX calls four deep. Pure codegen (the
    Spark side uses the real java.net-backed parser); the DuckDB oracle
    recovers the identical components with anchored regexps, which is
    exactly the equivalence being certified: the parser must agree with
    the grammar on well-formed URLs. Complements llm_url_normalize
    (corpus.py), which handles the DIRTY side — tracking-param strips
    and trailing-separator trims for dedup blocking keys."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    ).orderBy("doc_id")


# Deterministic pseudo-coordinates: facilities and customers get stable
# lat/lon from the Knuth multiplicative hash of their key (latitudes kept
# inside ±60° — away from the poles, where bearings degenerate). A real
# deployment reads coordinates from the table; the derivation here only
# exists because the TPC-H-ish fixtures carry no geography.
_GEO_EARTH_KM = 6371.0088
_GEO_RADIUS_KM = 2000.0


def _geo_lat_sql(key: str, salt: int) -> str:
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    return f"((({key} + {salt}) * {KNUTH}) % {KNUTH_MOD} % 1200) / 10.0 - 60.0"


def _geo_lon_sql(key: str, salt: int) -> str:
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    return f"((({key} + {salt}) * {KNUTH}) % {KNUTH_MOD} % 3600) / 10.0 - 180.0"


@register(
    "fn_geo_haversine",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey, s_nationkey,
             {_geo_lat_sql('s_suppkey', 17)} AS slat,
             {_geo_lon_sql('s_suppkey', 31)} AS slon
      FROM supplier WHERE s_suppkey % 7 = 0
    ), c AS (
      SELECT c_custkey, c_nationkey,
             {_geo_lat_sql('c_custkey', 17)} AS clat,
             {_geo_lon_sql('c_custkey', 31)} AS clon
      FROM customer WHERE c_custkey % 13 = 0
    ), p AS (
      SELECT s_suppkey, c_custkey,
             radians(slat) AS f1, radians(clat) AS f2,
             radians(clon - slon) AS dl
      FROM s JOIN c ON s_nationkey = c_nationkey
    ), d AS (
      SELECT s_suppkey, c_custkey,
             2 * {_GEO_EARTH_KM} * asin(sqrt(
                 sin((f2 - f1) / 2) * sin((f2 - f1) / 2)
                 + cos(f1) * cos(f2) * sin(dl / 2) * sin(dl / 2))) AS dist,
             degrees(atan2(sin(dl) * cos(f2),
                           cos(f1) * sin(f2) - sin(f1) * cos(f2) * cos(dl)))
               AS brg
      FROM p
    )
    SELECT s_suppkey, c_custkey,
           {sql_dround('dist', 2)} AS dist_km,
           {sql_dround('CAST(((brg % 360) + 360) % 360 AS DOUBLE)', 2)} AS bearing_deg,
           {sql_dround('dist', 2)} <= {_GEO_RADIUS_KM} AS within_radius
    FROM d
    ORDER BY s_suppkey, c_custkey
    """,
    section=_SEC,
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic scalar family — haversine great-circle distance, initial
    bearing, and a service-radius predicate between same-nation facility/
    customer pairs: the distance math behind catchment-area assignment
    ('which reporting facility serves this address?'), nearest-site
    routing, and the geo feature columns a spatial join
    (join_spatial_grid) rescors exactly. Pure codegen trigonometry —
    radians/sin/cos/asin/atan2/degrees are all JVM intrinsics; the
    DuckDB oracle pins the full formula at 2 dp, and the radius flag
    compares the ROUNDED distance so the emitted set is identical
    cross-engine.

    Scale: the nation equi-join bounds pairs per nation (no cross
    product); the trig is a per-row projection with zero exchanges
    beyond the join — at 100 TB the same expressions ride any
    partitioning, and the radius predicate pushes into the join when the
    pair source is pre-bucketed by geohash cell (join_spatial_grid's
    plan)."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    def lat(key: str, salt: int):
        return (
            ((F.col(key) + salt) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
        ) / 10.0 - 60.0

    def lon(key: str, salt: int):
        return (
            ((F.col(key) + salt) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
        ) / 10.0 - 180.0

    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 0)
        .select(
            "s_suppkey",
            "s_nationkey",
            lat("s_suppkey", 17).alias("slat"),
            lon("s_suppkey", 31).alias("slon"),
        )
    )
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            "c_custkey",
            "c_nationkey",
            lat("c_custkey", 17).alias("clat"),
            lon("c_custkey", 31).alias("clon"),
        )
    )
    p = s.join(c, F.col("s_nationkey") == F.col("c_nationkey")).select(
        "s_suppkey",
        "c_custkey",
        F.radians("slat").alias("f1"),
        F.radians("clat").alias("f2"),
        F.radians(F.col("clon") - F.col("slon")).alias("dl"),
    )
    half = (F.col("f2") - F.col("f1")) / 2
    dist = (
        2
        * _GEO_EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin(half) * F.sin(half)
                + F.cos("f1") * F.cos("f2")
                * F.sin(F.col("dl") / 2) * F.sin(F.col("dl") / 2)
            )
        )
    )
    brg = F.degrees(
        F.atan2(
            F.sin("dl") * F.cos("f2"),
            F.cos("f1") * F.sin("f2") - F.sin("f1") * F.cos("f2") * F.cos("dl"),
        )
    )
    dist_r = dround(dist, 2)
    return p.select(
        "s_suppkey",
        "c_custkey",
        dist_r.alias("dist_km"),
        dround(((brg % 360) + 360) % 360, 2).alias("bearing_deg"),
        (dist_r <= _GEO_RADIUS_KM).alias("within_radius"),
    ).orderBy("s_suppkey", "c_custkey")


# Point-in-polygon service area: a CONCAVE 7-vertex polygon (a rectangle
# with a triangular notch cut into its west side — concavity exercises the
# crossing-parity logic a convex hull test would not). Vertices sit on the
# x.x5 half-grid while the pseudo-coordinates sit on the 0.1° grid, so no
# point ever lies exactly on an edge or vertex: the crossing predicate is
# strict-inequality safe and bit-identical cross-engine (ray casting uses
# only +,-,*,/ and comparisons — IEEE-correctly-rounded ops, unlike pow).
# (lon, lat) order; closed implicitly (last -> first).
_GEO_POLY = (
    (-40.05, -30.05),
    (40.05, -30.05),
    (40.05, 30.05),
    (-40.05, 30.05),
    (-40.05, 10.05),
    (0.05, 0.05),
    (-40.05, -10.05),
)
_GEO_POLY_LON_MIN = min(x for x, _ in _GEO_POLY)
_GEO_POLY_LON_MAX = max(x for x, _ in _GEO_POLY)
_GEO_POLY_LAT_MIN = min(y for _, y in _GEO_POLY)
_GEO_POLY_LAT_MAX = max(y for _, y in _GEO_POLY)


def _poly_edges(poly=None):
    # horizontal edges (y1 == y2) can never satisfy the crossing test
    # ((y1 > py) != (y2 > py) is identically false) — dropping them up
    # front removes dead CASE terms and the division-by-zero edge slope
    # from both engines' expressions.
    v = _GEO_POLY if poly is None else poly
    edges = [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]
    return [((x1, y1), (x2, y2)) for (x1, y1), (x2, y2) in edges if y1 != y2]


def _pip_sql(lon: str, lat: str, poly=None) -> str:
    """Ray-casting crossing count as portable SQL: one CASE per edge, odd
    sum = inside. Identical arithmetic to the Spark expression."""
    terms = []
    for (x1, y1), (x2, y2) in _poly_edges(poly):
        terms.append(
            f"CASE WHEN (({y1} > {lat}) != ({y2} > {lat}))"
            f" AND ({lon} < ({x2} - ({x1})) * ({lat} - ({y1}))"
            f" / ({y2} - ({y1})) + ({x1})) THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def _pip_col(lon, lat, poly=None):
    """Ray-casting crossing parity as a Spark Column over lon/lat
    Columns — the codegen twin of _pip_sql (same edge list, same
    strict-inequality arithmetic)."""
    crossings = None
    for (x1, y1), (x2, y2) in _poly_edges(poly):
        term = F.when(
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (lon < (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1))
               / (F.lit(y2) - F.lit(y1)) + F.lit(x1)),
            1,
        ).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return crossings % 2 == 1


@register(
    "fn_geo_polygon",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_geo_lat_sql('c_custkey', 17)} AS lat,
             {_geo_lon_sql('c_custkey', 31)} AS lon
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT c_custkey,
           {sql_dround('lat', 1)} AS lat,
           {sql_dround('lon', 1)} AS lon,
           {_pip_sql('lon', 'lat')} AS in_polygon
    FROM c
    WHERE lon BETWEEN {_GEO_POLY_LON_MIN} AND {_GEO_POLY_LON_MAX}
      AND lat BETWEEN {_GEO_POLY_LAT_MIN} AND {_GEO_POLY_LAT_MAX}
    ORDER BY c_custkey
    """,
    section=_SEC,
)
def fn_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment — the minimal GIS predicate beyond
    `fn_geo_haversine`'s distance family ([ENGINE] 5.6 ships GEOMETRY +
    ST_Contains-style functions): which customers fall inside a literal
    service-area polygon. Ray casting (Shimrat 1962 / the even-odd rule):
    a ray east from the point crosses the polygon boundary an odd number
    of times iff the point is inside; works unmodified for CONCAVE
    polygons, which the test polygon is (notched rectangle).

    Plan: a bounding-box prefilter (two BETWEENs — min/max folded
    literals) discards most of the table before the crossing arithmetic,
    and both the prefilter and the 7-edge crossing count are pure
    whole-stage-codegen row expressions: ZERO exchanges (plan-asserted),
    no UDF, no join. At 100 TB the bbox predicate pushes to the parquet
    scan as min/max pruning on stored coordinate columns, and a polygon
    SET generalizes via join_spatial_grid's cell-bucketed pattern (bbox
    grid cells as the join key, this crossing expression as the exact
    rescore). Edge-tie safety: vertices sit on the x.x5 half-grid, points
    on the 0.1° grid — the strict inequalities can never see an exactly-
    on-edge point, so the crossing parity is cross-engine deterministic
    (only correctly-rounded IEEE ops involved)."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    lat = (
        ((F.col("c_custkey") + 17) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
    ) / 10.0 - 60.0
    lon = (
        ((F.col("c_custkey") + 31) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
    ) / 10.0 - 180.0
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    )
    bbox = F.col("lon").between(_GEO_POLY_LON_MIN, _GEO_POLY_LON_MAX) & F.col(
        "lat"
    ).between(_GEO_POLY_LAT_MIN, _GEO_POLY_LAT_MAX)
    # no orderBy: the driver compare is order-insensitive, and a sort
    # would add the plan's ONLY exchange (test_plans pins zero exchanges)
    return c.filter(bbox).select(
        "c_custkey",
        dround(F.col("lat"), 1).alias("lat"),
        dround(F.col("lon"), 1).alias("lon"),
        _pip_col(F.col("lon"), F.col("lat")).alias("in_polygon"),
    )


# Literal polygon SET for the containment JOIN (join_polygon_contains):
# the concave service area above plus two disjoint regions. Same
# half-grid vertex convention — no point ever sits on an edge.
_GEO_POLY_SET = {
    1: _GEO_POLY,
    2: ((60.05, -10.05), (100.05, -10.05), (80.05, 35.05)),
    3: (
        (-170.05, 40.05),
        (-120.05, 40.05),
        (-120.05, 55.05),
        (-170.05, 55.05),
    ),
}
_GEO_CELL_DEG = 15.0  # grid cell side for the containment join


def _poly_bbox(poly):
    return (
        min(x for x, _ in poly),
        max(x for x, _ in poly),
        min(y for _, y in poly),
        max(y for _, y in poly),
    )


def _poly_cells(poly):
    """Integer grid cells covered by the polygon's bbox — the candidate
    cells a containment join probes (a production build rasterizes the
    polygon itself; the bbox cover is lossless, just looser)."""
    import math

    x0, x1, y0, y1 = _poly_bbox(poly)
    return [
        (cx, cy)
        for cx in range(
            math.floor(x0 / _GEO_CELL_DEG), math.floor(x1 / _GEO_CELL_DEG) + 1
        )
        for cy in range(
            math.floor(y0 / _GEO_CELL_DEG), math.floor(y1 / _GEO_CELL_DEG) + 1
        )
    ]


@register(
    "fn_geo_wkt",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_geo_lat_sql('c_custkey', 17)} AS lat,
             {_geo_lon_sql('c_custkey', 31)} AS lon
      FROM customer WHERE c_custkey % 11 = 0
    ), w AS (
      SELECT c_custkey, lat, lon,
             'POINT(' || printf('%.1f', lon) || ' ' || printf('%.1f', lat)
               || ')' AS wkt
      FROM c
    )
    SELECT c_custkey, wkt,
           CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 1)
                AS DOUBLE) AS lon_parsed,
           CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 2)
                AS DOUBLE) AS lat_parsed,
           CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 1)
                AS DOUBLE) = {sql_dround('lon', 1)}
             AND CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 2)
                AS DOUBLE) = {sql_dround('lat', 1)} AS roundtrip_ok
    FROM w
    ORDER BY c_custkey
    """,
    section=_SEC,
)
def fn_geo_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT (well-known text) geometry I/O — the ST_AsText / ST_GeomFromText
    round trip that completes the GIS family (fn_geo_haversine: metrics;
    fn_geo_polygon / join_polygon_contains: predicates; THIS: the text
    interchange format every geometry column serializes through in
    [ENGINE] 5.6). Serialize each point as 'POINT(lon lat)' with a fixed
    %.1f rendering (printf round-half-even from the double is identical
    cross-engine — free-form double-to-string rendering is NOT, which is
    why the emitted WKT pins the precision), then parse it back with one
    regex and verify the round trip against the deterministically-rounded
    originals.

    Plan: pure codegen string/regex projection — the only exchange is the
    final presentation sort; at scale WKT parse/serialize rides any
    partitioning, and the parsed coordinate columns are what the
    bbox/cell machinery above consumes."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    lat = (
        ((F.col("c_custkey") + 17) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
    ) / 10.0 - 60.0
    lon = (
        ((F.col("c_custkey") + 31) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
    ) / 10.0 - 180.0
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    )
    wkt = F.concat(
        F.lit("POINT("),
        F.format_string("%.1f", F.col("lon")),
        F.lit(" "),
        F.format_string("%.1f", F.col("lat")),
        F.lit(")"),
    )
    pat = r"POINT\(([-0-9.]+) ([-0-9.]+)\)"
    w = c.select("c_custkey", "lat", "lon", wkt.alias("wkt"))
    lon_p = F.regexp_extract("wkt", pat, 1).cast("double")
    lat_p = F.regexp_extract("wkt", pat, 2).cast("double")
    return w.select(
        "c_custkey",
        "wkt",
        lon_p.alias("lon_parsed"),
        lat_p.alias("lat_parsed"),
        (
            (lon_p == dround(F.col("lon"), 1)) & (lat_p == dround(F.col("lat"), 1))
        ).alias("roundtrip_ok"),
    ).orderBy("c_custkey")


_GEO_NN_CELL = 15.0  # candidate cell size (deg) — same grid as the GIS family


@register(
    "join_geo_nearest",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey,
             {_geo_lat_sql('s_suppkey', 17)} AS slat,
             {_geo_lon_sql('s_suppkey', 31)} AS slon
      FROM supplier
    ), c AS (
      SELECT c_custkey,
             {_geo_lat_sql('c_custkey', 17)} AS clat,
             {_geo_lon_sql('c_custkey', 31)} AS clon
      FROM customer
    ), params AS (
      SELECT CASE WHEN COUNT(*) > 64000 THEN 16
                  WHEN COUNT(*) > 16000 THEN 8
                  WHEN COUNT(*) > 4000 THEN 4
                  WHEN COUNT(*) > 1000 THEN 2
                  ELSE 1 END AS k
      FROM supplier
    ), sc AS (
      SELECT s_suppkey, slat, slon,
             CAST(FLOOR(slon / ({_GEO_NN_CELL} / p.k)) AS INTEGER) AS cx,
             CAST(FLOOR(slat / ({_GEO_NN_CELL} / p.k)) AS INTEGER) AS cy
      FROM s CROSS JOIN params p
    ), cc AS (
      SELECT c_custkey, clat, clon,
             CAST(FLOOR(clon / ({_GEO_NN_CELL} / p.k)) AS INTEGER) AS cx,
             CAST(FLOOR(clat / ({_GEO_NN_CELL} / p.k)) AS INTEGER) AS cy
      FROM c CROSS JOIN params p
    ), cand AS (
      SELECT cc.c_custkey, cc.clat, cc.clon, sc.s_suppkey, sc.slat, sc.slon
      FROM cc
      JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
           o(dx, dy) ON TRUE
      JOIN sc ON sc.cx = cc.cx + o.dx AND sc.cy = cc.cy + o.dy
    ), d AS (
      SELECT c_custkey, s_suppkey,
             2 * {_GEO_EARTH_KM} * asin(sqrt(
                 sin((radians(slat) - radians(clat)) / 2)
                 * sin((radians(slat) - radians(clat)) / 2)
                 + cos(radians(clat)) * cos(radians(slat))
                   * sin(radians(slon - clon) / 2)
                   * sin(radians(slon - clon) / 2))) AS dist
      FROM cand
    ), ranked AS (
      SELECT c_custkey, s_suppkey,
             {sql_dround('dist', 4)} AS dist4,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY {sql_dround('dist', 4)}, s_suppkey)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY c_custkey) AS BIGINT)
               AS n_candidates
      FROM d
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey,
           {sql_dround('dist4', 2)} AS dist_km,
           n_candidates
    FROM ranked WHERE rn = 1
    ORDER BY c_custkey
    """,
    section=_SEC,
)
def join_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility geo join: assign every customer to the closest
    supplier within its 3x3 grid-cell neighborhood — the catchment-area
    assignment fn_geo_haversine's docstring motivates ('which reporting
    facility serves this address?'), completing the GIS family as its
    JOIN form (haversine: metrics; polygon: predicates; spatial_grid /
    polygon_contains: containment joins; THIS: k=1 nearest-neighbor).

    Candidates are CELL-BUCKETED, never all-pairs, and the cell size is
    DENSITY-DERIVED: a fixed grid makes candidates grow as customers x
    per-cell supplier density (quadratic in deployment scale - measured
    43.7 s at the 10x fixture with the fixed 15-degree grid before this
    ladder), so the cell side is 15/k degrees with k stepping 1/2/4/8/16
    as the supplier count crosses 1k/4k/16k/64k. k is a pure integer
    CASE over COUNT(supplier) - identical on both engines - and every
    15/k is an exact binary double (7.5, 3.75, 1.875, 0.9375), so the
    floor() bucketing stays bit-deterministic. Each customer probes its
    9-cell neighborhood via a broadcast offset join; the haversine
    rescore + per-customer top-1 runs only on candidates (customers
    with no supplier in the neighborhood are absent - the 'needs wider
    search ring' signal a production catchment build escalates on).

    Determinism: the argmin ranks by the 4dp-ROUNDED distance with
    s_suppkey as exact tiebreak, so cross-engine trig agreement at the
    grid (the certified fn_geo_haversine property) makes the WINNER
    identical even when two suppliers are near-equidistant.

    Scale: supplier-by-cell is dimension-sized (broadcast; its count is
    the one driver-side scalar, a dimension COUNT); the only data-scale
    exchange is the per-customer top-1 window — and the ladder bounds
    its input at ~9 x a CONSTANT per-cell density x |C|, linear in
    customers at every deployment scale."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    def lat(key: str, salt: int):
        return (
            ((F.col(key) + salt) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
        ) / 10.0 - 60.0

    def lon(key: str, salt: int):
        return (
            ((F.col(key) + salt) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
        ) / 10.0 - 180.0

    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        lat("s_suppkey", 17).alias("slat"),
        lon("s_suppkey", 31).alias("slon"),
    )
    n_supp = s.count()  # dimension-sized driver scalar (ladder input)
    k = 16 if n_supp > 64000 else 8 if n_supp > 16000 else (
        4 if n_supp > 4000 else 2 if n_supp > 1000 else 1
    )
    cell = _GEO_NN_CELL / k  # exact binary double for every ladder k
    sc = s.select(
        "s_suppkey",
        "slat",
        "slon",
        F.floor(F.col("slon") / cell).cast("int").alias("scx"),
        F.floor(F.col("slat") / cell).cast("int").alias("scy"),
    )
    cc = table(spark, sf_dir, "customer").select(
        "c_custkey",
        lat("c_custkey", 17).alias("clat"),
        lon("c_custkey", 31).alias("clon"),
    ).select(
        "c_custkey",
        "clat",
        "clon",
        F.floor(F.col("clon") / cell).cast("int").alias("ccx"),
        F.floor(F.col("clat") / cell).cast("int").alias("ccy"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    cand = cc.crossJoin(F.broadcast(offs)).join(
        F.broadcast(sc),
        (F.col("scx") == F.col("ccx") + F.col("dx"))
        & (F.col("scy") == F.col("ccy") + F.col("dy")),
    )
    f1 = F.radians("clat")
    f2 = F.radians("slat")
    dl = F.radians(F.col("slon") - F.col("clon"))
    dist = (
        2
        * _GEO_EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin((f2 - f1) / 2) * F.sin((f2 - f1) / 2)
                + F.cos(f1) * F.cos(f2) * F.sin(dl / 2) * F.sin(dl / 2)
            )
        )
    )
    d = cand.select("c_custkey", "s_suppkey", dround(dist, 4).alias("dist4"))
    # Argmin as a PARTIAL-AGGREGATABLE min_by, not a window: the window
    # form sorts the full candidate exchange into 1-per-customer groups
    # (149 s at the 100x fixture); min_by combines map-side first —
    # measured 82 s on the identical input, output equality pinned by
    # the oracle hash and the re-plan check (SCALING.md). The struct
    # ordering (dist4, s_suppkey) is exactly the window's sort key, so
    # the winner — including rounded-distance ties — is unchanged.
    agg = d.groupBy("c_custkey").agg(
        F.min_by(
            F.struct("s_suppkey", "dist4"), F.struct("dist4", "s_suppkey")
        ).alias("w"),
        F.count("*").cast("bigint").alias("n_candidates"),
    )
    return agg.select(
        "c_custkey",
        F.col("w.s_suppkey").alias("nearest_suppkey"),
        dround(F.col("w.dist4"), 2).alias("dist_km"),
        "n_candidates",
    ).orderBy("c_custkey")


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32 (no a,i,l,o)
_GH_BITS = 15  # bits per axis -> 30 bits -> 6 base32 chars
_GH_SCALE = 1 << _GH_BITS


def _gh_z_sql(lonx: str, latx: str) -> str:
    """30-bit geohash integer: interleave 15 bits of each axis index,
    longitude first at the MSB (the geohash bit convention). Same
    FLOOR/%/x arithmetic as scans._z16_sql — one expression string
    serves Spark and DuckDB."""
    terms = []
    for i in range(_GH_BITS):
        b = _GH_BITS - 1 - i
        terms.append(
            f"(CAST(FLOOR({lonx} / {1 << b}) AS BIGINT) % 2)"
            f" * {1 << (29 - 2 * i)}"
        )
        terms.append(
            f"(CAST(FLOOR({latx} / {1 << b}) AS BIGINT) % 2)"
            f" * {1 << (28 - 2 * i)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _gh_str_sql(z: str) -> str:
    """6-char base32 rendering of a 30-bit geohash integer."""
    chars = [
        f"substr('{_GH32}', CAST(CAST(FLOOR({z} / {32 ** (5 - j)}) AS BIGINT)"
        f" % 32 AS INTEGER) + 1, 1)"
        for j in range(6)
    ]
    return "(" + " || ".join(chars) + ")"


def _gh_unstr_sql(gh: str) -> str:
    """Inverse of _gh_str_sql: parse the 6 chars back to the integer
    (instr is 1-based in both engines; -1 recovers the digit)."""
    terms = [
        f"CAST((instr('{_GH32}', substr({gh}, {j + 1}, 1)) - 1) AS BIGINT)"
        f" * {32 ** (5 - j)}"
        for j in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "fn_geo_geohash",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_geo_lat_sql('c_custkey', 17)} AS lat,
             {_geo_lon_sql('c_custkey', 31)} AS lon
      FROM customer WHERE c_custkey % 11 = 0
    ), idx AS (
      SELECT c_custkey, lat, lon,
             CAST(FLOOR((lat + 90.0) / 180.0 * {_GH_SCALE}) AS BIGINT)
               AS latx,
             CAST(FLOOR((lon + 180.0) / 360.0 * {_GH_SCALE}) AS BIGINT)
               AS lonx
      FROM c
    ), z AS (
      SELECT c_custkey, lat, lon, latx, lonx,
             {_gh_z_sql('lonx', 'latx')} AS zv
      FROM idx
    ), enc AS (
      SELECT c_custkey, latx, lonx, zv,
             {_gh_str_sql('zv')} AS geohash
      FROM z
    )
    SELECT c_custkey, geohash,
           {sql_dround(f'(latx + 0.5) / {_GH_SCALE} * 180.0 - 90.0', 4)}
             AS cell_lat,
           {sql_dround(f'(lonx + 0.5) / {_GH_SCALE} * 360.0 - 180.0', 4)}
             AS cell_lon,
           {_gh_unstr_sql('geohash')} = zv AS roundtrip_ok
    FROM enc
    ORDER BY c_custkey
    """,
    section=_SEC,
)
def fn_geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding — the standard public cell-key every spatial
    system interoperates through (MySQL 8 ships ST_GeoHash; [ENGINE]
    5.6 users compute it app-side): quantize lat/lon to 15-bit axis
    indices, interleave to the 30-bit Morton value (longitude at the
    MSB, the geohash convention — the same FLOOR/%/x bit arithmetic as
    sink_zorder's clustering key), render 6 base32 characters, and
    prove the text round trip by parsing the STRING back to the integer
    (instr over the alphabet). 6 chars = +/-0.0027 degree cells; prefix
    truncation gives every coarser level, which is what makes geohash
    prefixes a drop-in bucketing key for the join_spatial_grid /
    join_geo_nearest candidate joins at any resolution.

    Determinism: quantization is FLOOR of one shared IEEE expression;
    everything after is exact integer arithmetic and 1-based substr/
    instr, identical in both engines — the whole operator is one shared
    expression family, no engine-specific bit ops.

    Scale: pure per-row projection, no exchange beyond the presentation
    sort; the ~60-term interleave expression sits in one projection
    over a sampled scan (and even interpreted-mode fallback would be
    IO-dominated — this is a key-derivation column, not a hot fold)."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    lat = (
        ((F.col("c_custkey") + 17) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 1200
    ) / 10.0 - 60.0
    lon = (
        ((F.col("c_custkey") + 31) * F.lit(KNUTH)) % F.lit(KNUTH_MOD) % 3600
    ) / 10.0 - 180.0
    idx = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select("c_custkey", lat.alias("lat"), lon.alias("lon"))
        .select(
            "c_custkey",
            F.expr(
                f"CAST(FLOOR((lat + 90.0) / 180.0 * {_GH_SCALE}) AS BIGINT)"
            ).alias("latx"),
            F.expr(
                f"CAST(FLOOR((lon + 180.0) / 360.0 * {_GH_SCALE}) AS BIGINT)"
            ).alias("lonx"),
        )
    )
    z = idx.withColumn("zv", F.expr(_gh_z_sql("lonx", "latx")))
    enc = z.withColumn("geohash", F.expr(_gh_str_sql("zv")))
    return enc.select(
        "c_custkey",
        "geohash",
        dround(
            (F.col("latx") + 0.5) / _GH_SCALE * 180.0 - 90.0, 4
        ).alias("cell_lat"),
        dround(
            (F.col("lonx") + 0.5) / _GH_SCALE * 360.0 - 180.0, 4
        ).alias("cell_lon"),
        (F.expr(_gh_unstr_sql("geohash")) == F.col("zv")).alias("roundtrip_ok"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# MMWR epidemiological calendar (CDC reporting weeks)
# ---------------------------------------------------------------------------


def epiweek_cols(d):
    """MMWR epiweek/epiyear/week-ending columns for a DATE column `d`,
    via the Wednesday rule: MMWR weeks run Sunday-Saturday, and week 1
    of a year is the first week containing at least FOUR January days —
    equivalently, a week belongs to the year its WEDNESDAY falls in, and
    its week number is that Wednesday's day-of-year divided into 7-day
    blocks. One formula covers every boundary case (including 53-week
    MMWR years like 2008 and 2014) with no lookup table. Returns
    (epiyear int, epiweek int, week_ending date) expressions — all pure
    codegen date arithmetic, shared by fn_epiweek and any detector that
    needs CDC-reportable week grids."""
    sunday = F.date_sub(d, F.dayofweek(d) - 1)
    wed = F.date_add(sunday, 3)
    epiyear = F.year(wed).cast("int")
    epiweek = (F.floor((F.dayofyear(wed) - 1) / 7) + 1).cast("int")
    return epiyear, epiweek, F.date_add(sunday, 6)


@register(
    "fn_epiweek",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS od FROM orders
    ), w AS (
      SELECT od - CAST(dayofweek(od) AS INTEGER) AS sunday FROM d
    ), x AS (
      SELECT sunday, sunday + 3 AS wed FROM w
    )
    SELECT CAST(year(wed) AS INTEGER) AS epiyear,
           CAST(FLOOR((dayofyear(wed) - 1) / 7) + 1 AS INTEGER) AS epiweek,
           strftime(sunday + 6, '%Y-%m-%d') AS week_ending,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM x GROUP BY 1, 2, 3
    """,
    section=_SEC,
)
def fn_epiweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMWR epiweek calendar — the CDC surveillance reporting grid
    (every notifiable-disease count the platform ingests or publishes is
    keyed to MMWR week, not ISO week: MMWR weeks start SUNDAY and week 1
    needs four January days, where ISO weeks start Monday and week 1
    holds Jan 4 — the two disagree around most year boundaries, and
    `fn_week_modes`' MySQL modes 0/3 cover neither). Implemented via the
    Wednesday rule (`epiweek_cols`): a week belongs to the year its
    Wednesday falls in; week number = that Wednesday's day-of-year in
    7-day blocks. Pinned in tests against published MMWR boundary
    literals (2014 week 53 spans 2014-12-28..2015-01-03; week 1 of 2015
    starts 2015-01-04; 2008 is also a 53-week year).

    The key rolls orders up to (epiyear, epiweek, week_ending) counts —
    the exact weekly-report shape a surveillance dashboard serves. All
    date arithmetic is row-level codegen; the one exchange is the
    grouped count, keyed by ~52 x years values (no skew: the calendar
    is uniform)."""
    d = F.to_date("o_orderdate")
    epiyear, epiweek, week_ending = epiweek_cols(d)
    return (
        table(spark, sf_dir, "orders")
        .select(
            epiyear.alias("epiyear"),
            epiweek.alias("epiweek"),
            F.date_format(week_ending, "yyyy-MM-dd").alias("week_ending"),
        )
        .groupBy("epiyear", "epiweek", "week_ending")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# WKT LINESTRING / POLYGON + rectangle-polygon ST_Intersects arithmetic
# ---------------------------------------------------------------------------


def _rect_poly_intersects_sql(poly) -> str:
    """Exact rectangle-x-polygon ST_Intersects predicate over rect columns
    (x0, x1, y0, y1), generated once and evaluated VERBATIM by both Spark
    (F.expr) and DuckDB — a literally identical expression chain. A rect
    and a polygon intersect iff (a) a rect corner lies in the polygon,
    (b) a polygon vertex lies in the rect, or (c) a polygon edge crosses
    one of the 4 rect boundary segments; (a) covers rect-inside-poly,
    (b) poly-inside-rect, (c) boundary crossings with no vertex
    containment. Vertical polygon edges make the crossing ordinate a
    division by zero — Spark SQL (non-ANSI) yields NULL there, DuckDB
    IEEE Inf, but the strict (e1 > X) != (e2 > X) conjunct is already
    FALSE on such edges and FALSE AND NULL = FALSE under three-valued
    logic, so the term is false identically in both engines without
    relying on the division's value. bbox prefilter ANDed
    in front (necessary condition), so most candidates exit cheaply."""
    bx0, bx1, by0, by1 = _poly_bbox(poly)
    v = list(poly)
    edges = [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]
    corner_in_poly = [
        f"({_pip_sql(cx, cy, poly)})"
        for cx, cy in (("x0", "y0"), ("x1", "y0"), ("x1", "y1"), ("x0", "y1"))
    ]
    vertex_in_rect = [
        f"({vx} BETWEEN x0 AND x1 AND {vy} BETWEEN y0 AND y1)" for vx, vy in v
    ]
    crossings = []
    for (ex1, ey1), (ex2, ey2) in edges:
        for xline in ("x0", "x1"):
            crossings.append(
                f"((({ex1}) > {xline}) != (({ex2}) > {xline})"
                f" AND ({ey1}) + (({ey2}) - ({ey1})) * ({xline} - ({ex1}))"
                f" / (({ex2}) - ({ex1})) BETWEEN y0 AND y1)"
            )
        for yline in ("y0", "y1"):
            crossings.append(
                f"((({ey1}) > {yline}) != (({ey2}) > {yline})"
                f" AND ({ex1}) + (({ex2}) - ({ex1})) * ({yline} - ({ey1}))"
                f" / (({ey2}) - ({ey1})) BETWEEN x0 AND x1)"
            )
    body = " OR ".join(corner_in_poly + vertex_in_rect + crossings)
    return (
        f"(x0 <= {bx1} AND x1 >= {bx0} AND y0 <= {by1} AND y1 >= {by0}"
        f" AND ({body}))"
    )


# second/third hashed vertices for the shape round trip (salts differ so
# the three points are uncorrelated... within the 1-D lattice the shared
# multiplier allows)
_WKT_SALTS = ((17, 31), (43, 59), (71, 83))


def _wkt_shape_points_sql() -> list[tuple[str, str]]:
    return [
        (_geo_lon_sql("c_custkey", sx), _geo_lat_sql("c_custkey", sy))
        for sy, sx in _WKT_SALTS
    ]


@register(
    "fn_geo_wkt_shapes",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {", ".join(
                 f"{_geo_lon_sql('c_custkey', sx)} AS lon{i},"
                 f" {_geo_lat_sql('c_custkey', sy)} AS lat{i}"
                 for i, (sy, sx) in enumerate(_WKT_SALTS))}
      FROM customer WHERE c_custkey % 13 = 0
    ), w AS (
      SELECT c_custkey,
             'LINESTRING(' ||
               printf('%.1f %.1f', lon0, lat0) || ', ' ||
               printf('%.1f %.1f', lon1, lat1) || ', ' ||
               printf('%.1f %.1f', lon2, lat2) || ')' AS ls_wkt,
             'POLYGON((' ||
               printf('%.1f %.1f', lon0, lat0) || ', ' ||
               printf('%.1f %.1f', lon1, lat1) || ', ' ||
               printf('%.1f %.1f', lon2, lat2) || ', ' ||
               printf('%.1f %.1f', lon0, lat0) || '))' AS poly_wkt
      FROM c
    ), p AS (
      SELECT c_custkey, ls_wkt, poly_wkt,
             string_split(regexp_extract(ls_wkt,
               'LINESTRING\\((.*)\\)', 1), ', ') AS ls_toks,
             string_split(regexp_extract(poly_wkt,
               'POLYGON\\(\\((.*)\\)\\)', 1), ', ') AS poly_toks
      FROM w
    )
    SELECT c_custkey, ls_wkt, poly_wkt,
           CAST(len(ls_toks) AS INTEGER) AS ls_npoints,
           ls_toks[1] = ls_toks[len(ls_toks)] AS ls_ring_closed,
           poly_toks[1] = poly_toks[len(poly_toks)] AS poly_ring_closed,
           'LINESTRING(' || array_to_string(list_transform(ls_toks,
               t -> printf('%.1f %.1f',
                           CAST(string_split(t, ' ')[1] AS DOUBLE),
                           CAST(string_split(t, ' ')[2] AS DOUBLE))),
             ', ') || ')' = ls_wkt AS ls_roundtrip_ok,
           'POLYGON((' || array_to_string(list_transform(poly_toks,
               t -> printf('%.1f %.1f',
                           CAST(string_split(t, ' ')[1] AS DOUBLE),
                           CAST(string_split(t, ' ')[2] AS DOUBLE))),
             ', ') || '))' = poly_wkt AS poly_roundtrip_ok
    FROM p
    """,
    section=_SEC,
)
def fn_geo_wkt_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT LINESTRING / POLYGON text I/O — completes `fn_geo_wkt`'s
    POINT-only coverage of the [ENGINE] 5.6 GEOMETRY interchange surface
    (ST_AsText / ST_GeomFromText over multi-vertex shapes): serialize a
    3-vertex linestring and its closed 4-vertex ring with pinned %.1f
    rendering, parse the coordinate lists back (regex body extract +
    delimiter splits + double casts), then PROVE the round trip by
    re-serializing the parsed doubles and comparing strings, plus the
    structural checks a geometry validator runs (vertex count, POLYGON
    ring closure, LINESTRING non-closure).

    Plan: pure codegen string/regex/array expressions over one
    projection — zero exchanges, no UDF; the parsed coordinate arrays
    are what the cell/bbox machinery (join_polygon_intersects) consumes
    at scale. The oracle replays the identical parse with DuckDB list
    functions; 1-based list indexing there vs element_at here, same
    semantics."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    pts = [
        (
            (
                ((F.col("c_custkey") + sx) * F.lit(KNUTH))
                % F.lit(KNUTH_MOD)
                % 3600
            )
            / 10.0
            - 180.0,
            (
                ((F.col("c_custkey") + sy) * F.lit(KNUTH))
                % F.lit(KNUTH_MOD)
                % 1200
            )
            / 10.0
            - 60.0,
        )
        for sy, sx in _WKT_SALTS
    ]
    fmt = lambda lon, lat: F.format_string("%.1f %.1f", lon, lat)  # noqa: E731
    ls_wkt = F.concat(
        F.lit("LINESTRING("),
        fmt(*pts[0]), F.lit(", "), fmt(*pts[1]), F.lit(", "), fmt(*pts[2]),
        F.lit(")"),
    )
    poly_wkt = F.concat(
        F.lit("POLYGON(("),
        fmt(*pts[0]), F.lit(", "), fmt(*pts[1]), F.lit(", "), fmt(*pts[2]),
        F.lit(", "), fmt(*pts[0]),
        F.lit("))"),
    )
    w = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select("c_custkey", ls_wkt.alias("ls_wkt"), poly_wkt.alias("poly_wkt"))
        .withColumn(
            "ls_toks",
            F.split(F.regexp_extract("ls_wkt", r"LINESTRING\((.*)\)", 1), ", "),
        )
        .withColumn(
            "poly_toks",
            F.split(
                F.regexp_extract("poly_wkt", r"POLYGON\(\((.*)\)\)", 1), ", "
            ),
        )
    )
    reser = lambda toks: F.array_join(  # noqa: E731
        F.transform(
            toks,
            lambda t: F.format_string(
                "%.1f %.1f",
                F.split(t, " ")[0].cast("double"),
                F.split(t, " ")[1].cast("double"),
            ),
        ),
        ", ",
    )
    return w.select(
        "c_custkey",
        "ls_wkt",
        "poly_wkt",
        F.size("ls_toks").alias("ls_npoints"),
        (
            F.col("ls_toks")[0] == F.element_at("ls_toks", F.size("ls_toks"))
        ).alias("ls_ring_closed"),
        (
            F.col("poly_toks")[0]
            == F.element_at("poly_toks", F.size("poly_toks"))
        ).alias("poly_ring_closed"),
        (
            F.concat(F.lit("LINESTRING("), reser(F.col("ls_toks")), F.lit(")"))
            == F.col("ls_wkt")
        ).alias("ls_roundtrip_ok"),
        (
            F.concat(F.lit("POLYGON(("), reser(F.col("poly_toks")), F.lit("))"))
            == F.col("poly_wkt")
        ).alias("poly_roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# MySQL 5.6 misc built-ins, round 2: CRC32, COMPRESS/UNCOMPRESS,
# EXPORT_SET, MAKE_SET, deterministic UUID formatting
# ---------------------------------------------------------------------------

# CRC-32 (IEEE 802.3, the zlib/MySQL polynomial) for the ORACLE: DuckDB has
# no crc32(), so the oracle derives the 256-entry table with 8 chained CTEs
# (one xor-shift round each over range(256)) and folds the string's bytes
# with a recursive CTE — crc = (crc >> 8) XOR table[(crc XOR byte) & 0xFF],
# init/final 0xFFFFFFFF. The fixture names are pure ASCII, so unicode() of
# each char IS the byte. Verified against zlib.crc32 for the fixture shape.
_CRC32_POLY = 3988292384  # 0xEDB88320 reflected polynomial
_CRC32_TAB_SQL = "".join(
    f", t{k} AS (SELECT i, xor(x >> 1, CASE WHEN x % 2 = 1"
    f" THEN {_CRC32_POLY} ELSE 0 END) AS x FROM t{k - 1})"
    for k in range(1, 9)
)
_EXPORT_BITS = 8
_MAKE_SET_NAMES = ("read", "write", "exec", "admin")

_MISC2_EXPORT_SQL = "concat_ws(','," + ", ".join(
    f"CASE WHEN (c_custkey % 256 >> {j}) % 2 = 1 THEN 'Y' ELSE 'N' END"
    for j in range(_EXPORT_BITS)
) + ")"
_MISC2_MAKESET_SQL = "concat_ws(','," + ", ".join(
    f"CASE WHEN (c_custkey % 16 >> {j}) % 2 = 1 THEN '{nm}' END"
    for j, nm in enumerate(_MAKE_SET_NAMES)
) + ")"


@register(
    "fn_mysql_misc2",
    oracle=f"""
    WITH RECURSIVE t0 AS (
      SELECT range AS i, CAST(range AS BIGINT) AS x FROM range(256)
    ){_CRC32_TAB_SQL}, crctab AS (
      SELECT i, x AS v FROM t8
    ), crc AS (
      SELECT c_custkey, c_name, 0 AS pos,
             CAST(4294967295 AS BIGINT) AS c
      FROM customer
      UNION ALL
      SELECT crc.c_custkey, crc.c_name, crc.pos + 1, xor(crc.c >> 8, tb.v)
      FROM crc JOIN crctab tb
        ON tb.i = xor(crc.c % 256,
                      unicode(substr(crc.c_name, crc.pos + 1, 1)))
      WHERE crc.pos < length(crc.c_name)
    ), fin AS (
      SELECT c_custkey, c_name, xor(c, 4294967295) AS crc32v
      FROM crc WHERE pos = length(c_name)
    )
    SELECT c_custkey,
           CAST(crc32v AS BIGINT) AS name_crc32,
           CASE WHEN length(c_name) = 0 THEN ''
                ELSE lpad(to_hex(octet_length(CAST(c_name AS BLOB)) % 256),
                          2, '0')
                  || lpad(to_hex((octet_length(CAST(c_name AS BLOB)) // 256)
                                 % 256), 2, '0')
                  || '0000789C' END AS comp_prefix_hex,
           c_name AS comp_roundtrip,
           {_MISC2_EXPORT_SQL} AS export_flags,
           {_MISC2_MAKESET_SQL} AS privileges,
           substr(md5(c_name), 1, 8) || '-' || substr(md5(c_name), 9, 4)
             || '-4' || substr(md5(c_name), 14, 3)
             || '-8' || substr(md5(c_name), 18, 3)
             || '-' || substr(md5(c_name), 21, 12) AS uuid_det
    FROM fin
    """,
    section=_SEC,
)
def fn_mysql_misc2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last uncovered MySQL 5.6 misc built-ins (VERDICT r10
    next-round #5): CRC32, COMPRESS/UNCOMPRESS, EXPORT_SET, MAKE_SET,
    and a DETERMINISTIC UUID-shape formatter (MySQL's UUID() is v1 —
    time/MAC-dependent and untestable — so the oracle-checkable variant
    derives the 8-4-4-4-12 shape from md5 with the version/variant
    nibbles forced to 4/8, the idiom migration scripts use for stable
    synthetic keys).

    - CRC32: Spark's built-in crc32 (java.util.zip.CRC32 — the IEEE
      802.3 polynomial MySQL/zlib use). The oracle derives the full
      CRC table + byte fold in SQL (see _CRC32_TAB_SQL), so the hash
      proves the polynomial, init and final-xor — not just output shape.
    - COMPRESS: MySQL's format is a 4-byte little-endian uncompressed
      length prefix + the zlib stream ('' stays ''). The Spark side runs
      REAL zlib in an Arrow-batched pandas UDF; the oracle verifies the
      analytically-predictable first 6 bytes (LE length + the 0x789C
      zlib default-level header) and the UNCOMPRESS round-trip; the
      pytest pins exact zlib bytes for a literal.
    - EXPORT_SET(bits,'Y','N',',',8) / MAKE_SET(bits, names...): pure
      bit-test expression chains (lowest bit first, concat_ws skipping
      the NULLs MAKE_SET drops) — identical spelling both engines.

    Scale: everything except COMPRESS is JVM codegen; the zlib UDF is
    Arrow-batched (pandas_udf) and embarrassingly parallel — no shuffle
    anywhere in the key."""
    import pandas as pd  # noqa: F401 — pandas_udf signature types

    c = table(spark, sf_dir, "customer")

    @F.pandas_udf("binary")
    def mysql_compress(s):
        import struct
        import zlib

        def one(x):
            if x == "":
                return b""
            b = x.encode("utf-8")
            return struct.pack("<I", len(b)) + zlib.compress(b)

        return s.map(one)

    @F.pandas_udf("string")
    def mysql_uncompress(b):
        import zlib

        def one(x):
            if x is None or len(x) == 0:
                return ""
            return zlib.decompress(bytes(x[4:])).decode("utf-8")

        return b.map(one)

    comp = mysql_compress(F.col("c_name"))
    bits8 = F.col("c_custkey") % 256
    bits4 = F.col("c_custkey") % 16
    h = F.md5(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey",
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.substring(F.hex(comp), 1, 12).alias("comp_prefix_hex"),
        mysql_uncompress(comp).alias("comp_roundtrip"),
        F.concat_ws(
            ",",
            *[
                F.when(bits8.bitwiseAND(F.lit(1 << j)) != 0, "Y").otherwise("N")
                for j in range(_EXPORT_BITS)
            ],
        ).alias("export_flags"),
        F.concat_ws(
            ",",
            *[
                F.when(bits4.bitwiseAND(F.lit(1 << j)) != 0, nm)
                for j, nm in enumerate(_MAKE_SET_NAMES)
            ],
        ).alias("privileges"),
        F.concat(
            F.substring(h, 1, 8), F.lit("-"),
            F.substring(h, 9, 4), F.lit("-4"),
            F.substring(h, 14, 3), F.lit("-8"),
            F.substring(h, 18, 3), F.lit("-"),
            F.substring(h, 21, 12),
        ).alias("uuid_det"),
    )


# ---------------------------------------------------------------------------
# Polygon metrics (ST_Area / ST_Centroid / ST_Envelope) + WKB round-trip —
# the remaining [ENGINE] 5.6 spatial surface beyond predicates
# ---------------------------------------------------------------------------

# Integer decidegree vertices: the WKT-shape coordinates times 10 are EXACT
# BIGINTs straight off the Knuth hash, so the shoelace cross products and
# centroid sums are exact integer arithmetic; each output is ONE final IEEE
# division — identical on both engines with no accumulation anywhere.


def _deci_x_sql(key: str, salt: int) -> str:
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    return f"((({key} + {salt}) * {KNUTH}) % {KNUTH_MOD} % 3600) - 1800"


def _deci_y_sql(key: str, salt: int) -> str:
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    return f"((({key} + {salt}) * {KNUTH}) % {KNUTH_MOD} % 1200) - 600"


_PMET_XY_SQL = ", ".join(
    f"{_deci_x_sql('c_custkey', sx)} AS x{i}, "
    f"{_deci_y_sql('c_custkey', sy)} AS y{i}"
    for i, (sy, sx) in enumerate(_WKT_SALTS)
)
# signed ring cross-product sum over edges 0->1, 1->2, 2->0 (the closing
# edge of the WKT ring) and the centroid numerators, all exact BIGINT
_PMET_CR_SQL = (
    "(x0 * y1 - x1 * y0) + (x1 * y2 - x2 * y1) + (x2 * y0 - x0 * y2)"
)
_PMET_SX_SQL = (
    "(x0 + x1) * (x0 * y1 - x1 * y0) + (x1 + x2) * (x1 * y2 - x2 * y1)"
    " + (x2 + x0) * (x2 * y0 - x0 * y2)"
)
_PMET_SY_SQL = (
    "(y0 + y1) * (x0 * y1 - x1 * y0) + (y1 + y2) * (x1 * y2 - x2 * y1)"
    " + (y2 + y0) * (x2 * y0 - x0 * y2)"
)


@register(
    "fn_geo_polygon_metrics",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_PMET_XY_SQL}
      FROM customer WHERE c_custkey % 13 = 0
    ), m AS (
      SELECT c_custkey, x0, y0, x1, y1, x2, y2,
             {_PMET_CR_SQL} AS cr, {_PMET_SX_SQL} AS sx,
             {_PMET_SY_SQL} AS sy,
             LEAST(x0, x1, x2) AS mnx, GREATEST(x0, x1, x2) AS mxx,
             LEAST(y0, y1, y2) AS mny, GREATEST(y0, y1, y2) AS mxy
      FROM c
    )
    SELECT c_custkey,
           {sql_dround('ABS(cr) / 200.0', 6)} AS area_deg2,
           CASE WHEN cr = 0 THEN NULL
                ELSE {sql_dround('CAST(sx AS DOUBLE) / (30.0 * cr)', 6)}
           END AS centroid_lon,
           CASE WHEN cr = 0 THEN NULL
                ELSE {sql_dround('CAST(sy AS DOUBLE) / (30.0 * cr)', 6)}
           END AS centroid_lat,
           cr < 0 AS ring_is_clockwise,
           'POLYGON((' ||
             printf('%.1f %.1f', mnx / 10.0, mny / 10.0) || ', ' ||
             printf('%.1f %.1f', mxx / 10.0, mny / 10.0) || ', ' ||
             printf('%.1f %.1f', mxx / 10.0, mxy / 10.0) || ', ' ||
             printf('%.1f %.1f', mnx / 10.0, mxy / 10.0) || ', ' ||
             printf('%.1f %.1f', mnx / 10.0, mny / 10.0) || '))'
             AS env_wkt,
           {sql_dround('(mxx - mnx) * (mxy - mny) / 100.0', 6)}
             AS env_area_deg2
    FROM m
    """,
    section=_SEC,
)
def fn_geo_polygon_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area / ST_Centroid / ST_Envelope over the WKT triangle rings of
    `fn_geo_wkt_shapes` — the metric half of the [ENGINE] 5.6 spatial
    function surface (the predicate half is `fn_spatial` + the polygon
    joins). Area is the shoelace formula; the centroid is the
    area-weighted ring centroid Cx = sum((x_i + x_j) * cross_ij) / (3 *
    sum(cross_ij)) (NULL for a degenerate/collinear ring, where the
    formula divides by zero); the envelope is the axis-aligned MBR
    serialized as the standard 5-point WKT ring (CCW from the SW
    corner), plus the ring-orientation bit ST_Area implementations
    branch on.

    Determinism: vertices times 10 are exact BIGINTs off the Knuth hash,
    so every cross product and centroid numerator is exact integer
    arithmetic; each output is ONE final IEEE division snapped to the
    1e-6 grid — no float accumulation, no engine divergence.

    Plan: pure codegen projection over the filtered scan — zero
    exchanges, no UDF. At 100 TB this is embarrassingly parallel map
    work; the only cost is the scan itself."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 0)
    xs, ys = [], []
    for sy, sx in _WKT_SALTS:
        xs.append(
            ((F.col("c_custkey") + sx) * F.lit(KNUTH))
            % F.lit(KNUTH_MOD) % 3600 - 1800
        )
        ys.append(
            ((F.col("c_custkey") + sy) * F.lit(KNUTH))
            % F.lit(KNUTH_MOD) % 1200 - 600
        )
    edges = [(0, 1), (1, 2), (2, 0)]
    crosses = [xs[i] * ys[j] - xs[j] * ys[i] for i, j in edges]
    cr = crosses[0] + crosses[1] + crosses[2]
    sx_ = sum((xs[i] + xs[j]) * crs for (i, j), crs in zip(edges, crosses))
    sy_ = sum((ys[i] + ys[j]) * crs for (i, j), crs in zip(edges, crosses))
    mnx, mxx = F.least(*xs), F.greatest(*xs)
    mny, mxy = F.least(*ys), F.greatest(*ys)
    corner = lambda x, y: F.format_string("%.1f %.1f", x / 10.0, y / 10.0)  # noqa: E731
    return c.select(
        "c_custkey",
        dround(F.abs(cr) / 200.0, 6).alias("area_deg2"),
        F.when(cr == 0, F.lit(None).cast("double"))
        .otherwise(dround(sx_.cast("double") / (30.0 * cr), 6))
        .alias("centroid_lon"),
        F.when(cr == 0, F.lit(None).cast("double"))
        .otherwise(dround(sy_.cast("double") / (30.0 * cr), 6))
        .alias("centroid_lat"),
        (cr < 0).alias("ring_is_clockwise"),
        F.concat(
            F.lit("POLYGON(("),
            corner(mnx, mny), F.lit(", "),
            corner(mxx, mny), F.lit(", "),
            corner(mxx, mxy), F.lit(", "),
            corner(mnx, mxy), F.lit(", "),
            corner(mnx, mny), F.lit("))"),
        ).alias("env_wkt"),
        dround((mxx - mnx) * (mxy - mny) / 100.0, 6).alias("env_area_deg2"),
    )


# --- WKB (well-known binary) round-trip -----------------------------------
# 5.6 STORES geometry as WKB, so the interchange surface isn't complete
# without the binary codec. There is no float<->bits builtin in either
# engine, but the IEEE-754 encode/decode is EXACT ARITHMETIC: the fixture
# coordinates are k/10 - 180 doubles in [-180, 180], so |v| lies in
# [0.0625, 256) -> exponent in [-4, 7] found by an exact power-of-two
# comparison ladder; mantissa = |v| * 2^(52-e) is an exact power-of-two
# scaling of the stored double (CAST to BIGINT loses nothing); decode
# inverts with the same exact operations. The same generated expression
# text drives BOTH engines (Spark F.expr / DuckDB), differing only in the
# integer-division token.

_WKB_HEXD = "0123456789ABCDEF"
_WKB_EXP_LADDER = " ".join(
    f"WHEN ABS({{v}}) >= {2.0 ** e!r} THEN {e}" for e in range(7, -5, -1)
)


def _wkb_enc_steps(v: str, p: str, div: str) -> list[tuple[str, str]]:
    """(name, expr) chain: double column `v` -> 16-char little-endian
    IEEE-754 hex `{p}le`. Exact arithmetic only (see block comment)."""
    be = f"{p}be"
    return [
        (f"{p}e", f"CASE {_WKB_EXP_LADDER.format(v=v)} ELSE -4 END"),
        (
            f"{p}f",
            f"CAST(ABS({v}) * pow(2.0, 52 - {p}e) AS BIGINT)"
            f" - 4503599627370496",
        ),
        (
            f"{p}hi",
            f"CASE WHEN {v} < 0 THEN 2147483648 ELSE 0 END"
            f" + (CAST({p}e AS BIGINT) + 1023) * 1048576"
            f" + {p}f {div} 4294967296",
        ),
        (f"{p}lo", f"{p}f % 4294967296"),
        (
            be,
            f"CASE WHEN {v} = 0.0 THEN '0000000000000000'"
            f" ELSE lpad(hex({p}hi), 8, '0') || lpad(hex({p}lo), 8, '0')"
            f" END",
        ),
        (
            f"{p}le",
            " || ".join(f"substr({be}, {i}, 2)" for i in (15, 13, 11, 9, 7, 5, 3, 1)),
        ),
    ]


def _wkb_dec_steps(h: str, p: str, div: str) -> list[tuple[str, str]]:
    """(name, expr) chain: 16-char little-endian hex `h` (an expression)
    -> decoded double `{p}v`. Inverse of _wkb_enc_steps, same exactness."""

    def nib(src: str, i: int, w: int) -> str:
        # CAST to BIGINT: Spark's instr is INT and ANSI mode overflows
        # on INT * 16^7; DuckDB would auto-promote, Spark must be told
        return (
            f"(CAST(instr('{_WKB_HEXD}', substr({src}, {i}, 1)) AS BIGINT)"
            f" - 1) * {16 ** w}"
        )

    beh = f"{p}beh"
    return [
        (
            beh,
            " || ".join(f"substr({h}, {i}, 2)" for i in (15, 13, 11, 9, 7, 5, 3, 1)),
        ),
        (f"{p}uhi", " + ".join(nib(beh, i, 8 - i) for i in range(1, 9))),
        (f"{p}ulo", " + ".join(nib(beh, i, 16 - i) for i in range(9, 17))),
        (f"{p}ue", f"({p}uhi % 2147483648) {div} 1048576 - 1023"),
        (f"{p}uf", f"({p}uhi % 1048576) * 4294967296 + {p}ulo"),
        (
            f"{p}v",
            f"CASE WHEN {p}uhi = 0 AND {p}ulo = 0 THEN 0.0"
            f" ELSE (CASE WHEN {p}uhi >= 2147483648 THEN -1.0 ELSE 1.0 END)"
            f" * (1.0 + {p}uf * pow(2.0, -52)) * pow(2.0, {p}ue) END",
        ),
    ]


def _wkb_oracle() -> str:
    steps = (
        _wkb_enc_steps("lon", "x", "//")
        + _wkb_enc_steps("lat", "y", "//")
    )
    chain = (
        "SELECT c_custkey, "
        f"{_geo_lon_sql('c_custkey', 31)} AS lon, "
        f"{_geo_lat_sql('c_custkey', 17)} AS lat "
        "FROM customer WHERE c_custkey % 13 = 0"
    )
    for name, expr in steps:
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    chain = (
        f"SELECT c_custkey, lon, lat,"
        f" '0101000000' || xle || yle AS wkb_hex FROM ({chain})"
    )
    dec = (
        _wkb_dec_steps("substr(wkb_hex, 11, 16)", "dx", "//")
        + _wkb_dec_steps("substr(wkb_hex, 27, 16)", "dy", "//")
    )
    for name, expr in dec:
        chain = f"SELECT *, {expr} AS {name} FROM ({chain})"
    return f"""
    SELECT c_custkey, lon, lat, wkb_hex,
           substr(wkb_hex, 1, 2) = '01' AS is_little_endian,
           CAST((instr('{_WKB_HEXD}', substr(wkb_hex, 3, 1)) - 1) * 16
                + instr('{_WKB_HEXD}', substr(wkb_hex, 4, 1)) - 1
                AS INTEGER) AS geom_type,
           dxv AS lon_rt, dyv AS lat_rt,
           dxv = lon AND dyv = lat AS roundtrip_ok
    FROM ({chain})
    """


@register(
    "fn_geo_wkb",
    oracle=_wkb_oracle(),
    section=_SEC,
)
def fn_geo_wkb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKB (well-known BINARY) point codec — [ENGINE] 5.6 stores every
    GEOMETRY value as WKB, so this completes the interchange surface the
    WKT keys opened: serialize POINT(lon lat) to standard little-endian
    WKB hex (byte-order 01, uint32 type 1, two IEEE-754 LE doubles),
    then PARSE the hex back and prove bit-exact recovery of both
    coordinates plus the header fields. The float<->bits conversion has
    no builtin in either engine, so it is done as EXACT ARITHMETIC: an
    exponent ladder over exact powers of two, mantissa extraction by
    exact power-of-two scaling, nibble-weighted sums for the decode —
    the identical generated expression text runs on both engines (see
    _wkb_enc_steps/_wkb_dec_steps), so the oracle hash proves the full
    encode-decode loop, not just output shape.

    Determinism: every intermediate is an exact BIGINT or an exact
    power-of-two-scaled double; `roundtrip_ok` uses = on doubles
    deliberately — the codec is exact or it is wrong.

    Plan: one codegen projection, zero exchanges, no UDF; at 100 TB the
    codec is map-side work on the scan."""
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    # lon/lat via F expressions (Python float division -> DOUBLE): the
    # oracle's SQL text would parse `10.0` as DECIMAL under Spark SQL
    df = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            "c_custkey",
            (
                ((F.col("c_custkey") + 31) * F.lit(KNUTH))
                % F.lit(KNUTH_MOD) % 3600 / 10.0 - 180.0
            ).alias("lon"),
            (
                ((F.col("c_custkey") + 17) * F.lit(KNUTH))
                % F.lit(KNUTH_MOD) % 1200 / 10.0 - 60.0
            ).alias("lat"),
        )
    )
    for name, expr in _wkb_enc_steps("lon", "x", "DIV") + _wkb_enc_steps(
        "lat", "y", "DIV"
    ):
        df = df.withColumn(name, F.expr(expr))
    df = df.select(
        "c_custkey",
        "lon",
        "lat",
        F.concat(F.lit("0101000000"), F.col("xle"), F.col("yle")).alias(
            "wkb_hex"
        ),
    )
    for name, expr in _wkb_dec_steps(
        "substr(wkb_hex, 11, 16)", "dx", "DIV"
    ) + _wkb_dec_steps("substr(wkb_hex, 27, 16)", "dy", "DIV"):
        df = df.withColumn(name, F.expr(expr))
    return df.select(
        "c_custkey",
        "lon",
        "lat",
        "wkb_hex",
        (F.substring("wkb_hex", 1, 2) == "01").alias("is_little_endian"),
        F.expr(
            f"CAST((instr('{_WKB_HEXD}', substr(wkb_hex, 3, 1)) - 1) * 16"
            f" + instr('{_WKB_HEXD}', substr(wkb_hex, 4, 1)) - 1 AS INT)"
        ).alias("geom_type"),
        F.col("dxv").alias("lon_rt"),
        F.col("dyv").alias("lat_rt"),
        ((F.col("dxv") == F.col("lon")) & (F.col("dyv") == F.col("lat"))).alias(
            "roundtrip_ok"
        ),
    )


# ---------------------------------------------------------------------------
# Normal distribution functions (Abramowitz & Stegun 7.1.26) — the
# p-value building block the z-statistic ops reference
# ---------------------------------------------------------------------------

# Φ(z) via the A&S 26.2.17 five-term rational approximation (|err| <
# 7.5e-8, far inside the 1e-6 output grid). The only transcendental is
# exp(-z²/2), measured to agree between Spark and DuckDB within 2.2e-16
# relative on a 4000-point grid (368/4000 values differ in the LAST
# ulp) — nine orders of magnitude inside the rounding tolerance, the
# same empirical-portability argument ln carries in the LLR scans.
_SN_T = "(1.0 / (1.0 + 0.2316419 * abs(z)))"
_SN_POLY = (
    f"({_SN_T} * (0.319381530 + {_SN_T} * (-0.356563782 + {_SN_T}"
    f" * (1.781477937 + {_SN_T} * (-1.821255978 + {_SN_T}"
    " * 1.330274429)))))"
)
_SN_PDF = "(exp(-(z * z) / 2.0) / 2.5066282746310002)"
_SN_UPPER = f"({_SN_PDF} * {_SN_POLY})"  # P(Z > |z|)
_SN_CDF = (
    f"(CASE WHEN z >= 0.0 THEN 1.0 - {_SN_UPPER} ELSE {_SN_UPPER} END)"
)
_SN_P2 = f"(2.0 * {_SN_UPPER})"  # two-sided p for a z statistic


@register(
    "fn_stat_normal",
    oracle=f"""
    WITH zs AS (
      SELECT c_custkey, CAST(c_acctbal / 2000.0 AS DOUBLE) AS z
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT -c_custkey, CAST(-(c_acctbal / 2000.0) AS DOUBLE) AS z
      FROM customer WHERE c_custkey % 3 = 0 AND c_custkey > 0
    )
    SELECT c_custkey, {sql_dround('z', 6)} AS z,
           {sql_dround(_SN_PDF, 6)} AS pdf,
           {sql_dround(_SN_CDF, 6)} AS cdf,
           {sql_dround(_SN_P2, 6)} AS p_two_sided
    FROM zs ORDER BY c_custkey
    """,
    section=_SEC,
)
def fn_stat_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard normal pdf / CDF / two-sided p-value as portable SQL —
    the Abramowitz & Stegun 26.2.17 five-term rational approximation
    (|err| < 7.5e-8, comfortably inside the 1e-6 output grid), the
    missing last step between this engine's z-statistic operators
    (agg_proportion_ztest, agg_welch_ttest's large-df t, agg_mann_
    whitney's normal approximation, agg_moran_grid, ts_changepoint_
    meanshift — all of which report z and a fixed-threshold verdict)
    and the p-value an analyst actually files. MySQL 5.6 has no
    distribution functions at all, so the platform's users computed
    these client-side; shipping Φ as an in-engine expression closes
    that gap declaratively — no UDF, whole-stage codegen, pushdown-
    transparent.

    Grid: ±(c_acctbal / 2000) over a third of customers — z spans
    about [-5, 5] in both tails. Cross-engine exactness: the only
    transcendental is exp(-z²/2), measured to agree within 2.2e-16
    relative across engines (last-ulp differences on ~9% of a 4k
    grid); every output snaps to the 1e-6 grid, nine orders of
    magnitude above that noise. Scale: pure projection — no shuffle at
    any size."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    pos = c.select(
        "c_custkey",
        (F.col("c_acctbal") / 2000.0).cast("double").alias("z"),
    )
    neg = c.filter(F.col("c_custkey") > 0).select(
        (-F.col("c_custkey")).alias("c_custkey"),
        (-(F.col("c_acctbal") / 2000.0)).cast("double").alias("z"),
    )
    zs = pos.unionByName(neg)
    return zs.select(
        "c_custkey",
        dround(F.col("z"), 6).alias("z"),
        dround(F.expr(_SN_PDF), 6).alias("pdf"),
        dround(F.expr(_SN_CDF), 6).alias("cdf"),
        dround(F.expr(_SN_P2), 6).alias("p_two_sided"),
    ).orderBy("c_custkey")
