"""MySQL-dialect SQL shim — the migration path for the reference's
port-3306 clients (SURVEY.md §3.2 entry point 2: `spark.sql` mirrors the
SQL session surface; this module lets the SQL *text* itself stay MySQL
5.6-flavored, [ENGINE] pinned at mysql-persistent-template.json:68).

`translate_mysql(sql)` rewrites the MySQL-isms that Spark's ANSI parser
rejects or mis-reads into Spark SQL; `sql_mysql(spark, sf_dir, sql)` runs
the result over the registered fixture views. This is a pragmatic
REWRITER, not a parser: rules are applied token-safely OUTSIDE string
literals (single- and double-quoted text is carved out first, so a
`'#hash'` or `'LIMIT 1, 2'` inside a string is never touched), and each
rule covers the unnested form MySQL clients actually write. Unsupported
constructs pass through untouched and fail loudly in Spark's parser —
never silently misparse.

Rules (each unit-tested in tests/test_dialect.py):
- backtick identifiers        `tbl`.`col`     -> tbl.col
- # line comments             # note          -> -- note
- MySQL double-quoted strings "text"          -> 'text'  (5.6 default
  sql_mode treats " as a STRING quote, not an identifier quote)
- LIMIT offset, count         LIMIT 1, 3      -> LIMIT 3 OFFSET 1
- SQL_CALC_FOUND_ROWS         stripped (pair with a count query —
  see the `limit_found_rows` operator for the collapsed idiom)
- STRAIGHT_JOIN               -> JOIN (Catalyst orders joins by cost;
  the reference's left-deep forcing hint has no meaning here)
- REGEXP / NOT REGEXP         -> RLIKE / NOT RLIKE
- NOW() / CURDATE()           -> current_timestamp() / current_date()
- DATE_ADD/DATE_SUB(x, INTERVAL n UNIT) -> (x +/- INTERVAL n UNIT)
- STR_TO_DATE(s, '%...')      -> to_timestamp(s, 'java pattern')
- DATE_FORMAT(x, '%Y-%m')     -> date_format(x, 'yyyy-MM') (% pattern
  codes mapped to Java DateTimeFormatter letters)
- GROUP_CONCAT([DISTINCT] x [SEPARATOR 's']) ->
  array_join(array_sort(collect_list|collect_set(x)), 's').
  MySQL's unordered GROUP_CONCAT is nondeterministic; the translation
  imposes sorted order (the determinism contract every operator here
  follows). ORDER BY inside GROUP_CONCAT is supported for the common
  self-ordering form (ORDER BY the same expression).
- user-variable ranking        @r := @r + 1  (with a `(SELECT @r := 0)`
  initializer and a top-level ORDER BY) -> row_number() OVER (ORDER BY
  the query's own sort keys) — the 5.6 window-function emulation idiom
  mapped onto the real window function.
- GROUP BY expr ASC/DESC      direction stripped; when no explicit
  ORDER BY exists the 5.6 implicit group-key sort is materialized as
  one (8.0 removed the syntax; an explicit ORDER BY overrides it,
  matching 5.6).
- statement forms (round 6): CREATE TABLE x [ENGINE=..] SELECT (AS
  optional in MySQL) -> CREATE TABLE x AS SELECT; ENGINE/CHARSET/
  COLLATE/AUTO_INCREMENT table options dropped; SHOW TABLES [FROM db]
  LIKE '%p%' -> SHOW TABLES [IN db] LIKE '*p*'; SHOW [FULL] COLUMNS
  FROM t -> SHOW COLUMNS IN t / DESCRIBE TABLE t. `execute_mysql` runs
  a multi-statement script (literal-safe ';' split) and returns the
  last statement's result — see dialect_dml_roundtrip.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# MySQL DATE_FORMAT % codes -> Java DateTimeFormatter patterns.
_DF_CODES = {
    "%Y": "yyyy", "%y": "yy", "%M": "MMMM", "%b": "MMM", "%m": "MM",
    "%c": "M", "%d": "dd", "%e": "d", "%H": "HH", "%k": "H", "%h": "hh",
    "%l": "h", "%i": "mm", "%s": "ss", "%S": "ss", "%f": "SSSSSS",
    "%p": "a", "%W": "EEEE", "%a": "EEE", "%j": "DDD", "%T": "HH:mm:ss",
    "%%": "%",
}

# Both MySQL string-quote styles, matched in ONE left-to-right pass so a
# double quote inside a single-quoted literal (or vice versa) is content,
# never a new string opener.
_LITERAL = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")


def _carve_literals(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with \x00<i>\x00 placeholders so rewrite
    rules can never touch string contents. Double-quoted strings (a MySQL
    5.6 default-sql_mode string syntax) are normalized to single-quoted
    here, at the tokenizer level."""
    out: list[str] = []

    def stash(m: re.Match) -> str:
        lit = m.group(0)
        if lit.startswith('"'):
            body = lit[1:-1].replace('""', '"')
            lit = "'" + body.replace("'", "''") + "'"
        out.append(lit)
        return f"\x00{len(out) - 1}\x00"

    return _LITERAL.sub(stash, sql), out


def _restore_literals(sql: str, lits: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], sql)


def _map_date_format(lit: str) -> str:
    """Translate one quoted MySQL %-pattern to a quoted Java pattern."""
    body = lit[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "%" and i + 1 < len(body):
            code = body[i : i + 2]
            out.append(_DF_CODES.get(code, code))
            i += 2
        else:
            # literal chars that collide with Java pattern letters must be
            # escaped in DateTimeFormatter patterns
            c = body[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "'" + "".join(out) + "'"


def _group_concat(m: re.Match, lits: list[str]) -> str:
    inner = m.group(1).strip()
    sep = "','"
    sm = re.search(r"\s+SEPARATOR\s+(\x00\d+\x00)\s*$", inner, re.I)
    if sm:
        sep = sm.group(1)
        inner = inner[: sm.start()].strip()
    om = re.search(r"\s+ORDER\s+BY\s+(.+?)\s*$", inner, re.I)
    if om:
        order = om.group(1).strip()
        expr = inner[: om.start()].strip()
        bare = re.sub(r"\s+(ASC|DESC)\s*$", "", order, flags=re.I).strip()
        if bare != expr:
            # general ORDER BY needs a struct sort — out of shim scope;
            # leave the original text so Spark's parser rejects it loudly
            return m.group(0)
        desc = bool(re.search(r"\bDESC\s*$", order, re.I))
        coll = f"collect_list({expr})"
        sort = f"reverse(array_sort({coll}))" if desc else f"array_sort({coll})"
        return f"array_join({sort}, {sep})"
    dm = re.match(r"DISTINCT\s+(.+)$", inner, re.I | re.S)
    if dm:
        return f"array_join(array_sort(collect_set({dm.group(1).strip()})), {sep})"
    return f"array_join(array_sort(collect_list({inner})), {sep})"


def translate_mysql(sql: str) -> str:
    """Rewrite MySQL 5.6 SQL text into Spark SQL (see module docstring)."""
    # whole-statement SHOW forms first (their LIKE pattern lives inside a
    # string literal, so they are handled before the carve): MySQL SHOW
    # TABLES/COLUMNS route onto Spark's catalog statements — the same
    # surface the catalog_ddl / catalog_show_describe operators drive.
    sm = re.match(
        r"\s*SHOW\s+TABLES\s+(?:(?:FROM|IN)\s+([`\w.]+)\s+)?LIKE\s+'([^']*)'\s*;?\s*$",
        sql,
        re.I,
    )
    if sm:
        db = f" IN {sm.group(1).replace('`', '')}" if sm.group(1) else ""
        # MySQL LIKE wildcards -> the glob style Spark's SHOW accepts.
        # '%' maps cleanly to '*'; MySQL's '_' (exactly one char) has NO
        # glob equivalent in Spark's SHOW TABLES — mapping it to '*' would
        # silently over-match (ADVICE r6: 'cust_' would hit
        # 'customer_archive'), and passing it through would silently match
        # a LITERAL underscore. Neither is 5.6 semantics, so reject loudly.
        if "_" in sm.group(2):
            raise NotImplementedError(
                "SHOW TABLES LIKE with the MySQL '_' single-char wildcard "
                "cannot be translated: Spark's SHOW TABLES glob has no "
                "single-character wildcard. Use '%' or list and filter."
            )
        pat = sm.group(2).replace("%", "*")
        return f"SHOW TABLES{db} LIKE '{pat}'"
    sm = re.match(
        r"\s*SHOW\s+(FULL\s+)?COLUMNS\s+(?:FROM|IN)\s+([`\w.]+)\s*;?\s*$", sql, re.I
    )
    if sm:
        t = sm.group(2).replace("`", "")
        # FULL wants types/nullability -> DESCRIBE; plain form maps 1:1
        return f"DESCRIBE TABLE {t}" if sm.group(1) else f"SHOW COLUMNS IN {t}"

    # string literals (both quote styles) carve out first — rules below can
    # never fire inside them; double-quoted strings normalize to
    # single-quoted inside the carve
    body, lits = _carve_literals(sql)

    # 1) backticks drop entirely (identifiers are already sane)
    body = body.replace("`", "")
    # 1b) DML/DDL statement forms (5.6 clients paste these verbatim):
    #     InnoDB-era table options drop FIRST (they have no Spark meaning
    #     and may sit between the table name and SELECT), then
    #     CREATE TABLE x SELECT ... (MySQL lets AS be omitted) -> CTAS.
    #     The option-strip is ANCHORED to CREATE TABLE statements (ADVICE
    #     r6): running it over arbitrary bodies would delete an innocent
    #     identifier comparison like `WHERE engine = other_col` (string
    #     literals are carve-protected, identifier RHSes are not).
    if re.match(r"\s*CREATE\s+TABLE\b", body, re.I):
        body = re.sub(r"\b(?:ENGINE|AUTO_INCREMENT)\s*=\s*\w+", "", body, flags=re.I)
        body = re.sub(
            r"\b(?:DEFAULT\s+)?(?:CHARSET|CHARACTER\s+SET|COLLATE)\s*=\s*\w+",
            "",
            body,
            flags=re.I,
        )
    body = re.sub(
        r"(\bCREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[\w.]+\s+)(SELECT\b)",
        r"\1AS \2",
        body,
        flags=re.I,
    )
    # 2) '#' comments -> '--' (to end of line)
    body = re.sub(r"#+\s?", "-- ", body)
    # 3) SQL_CALC_FOUND_ROWS has no Spark analogue (see limit_found_rows)
    body = re.sub(r"\bSQL_CALC_FOUND_ROWS\b\s*", "", body, flags=re.I)
    # 4) LIMIT offset, count  ->  LIMIT count OFFSET offset
    body = re.sub(
        r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", r"LIMIT \2 OFFSET \1", body, flags=re.I
    )
    # 5) join/predicate keyword swaps
    body = re.sub(r"\bSTRAIGHT_JOIN\b", "JOIN", body, flags=re.I)
    body = re.sub(r"\bREGEXP\b", "RLIKE", body, flags=re.I)
    # 6) zero-arg datetime functions
    body = re.sub(r"\bNOW\s*\(\s*\)", "current_timestamp()", body, flags=re.I)
    body = re.sub(r"\bCURDATE\s*\(\s*\)", "current_date()", body, flags=re.I)
    # 6b) DATE_ADD/DATE_SUB(x, INTERVAL n UNIT) -> x +/- INTERVAL n UNIT
    #     (Spark parses the infix interval form, not MySQL's function form)
    body = re.sub(
        r"\bDATE_(ADD|SUB)\s*\(\s*((?:[^,()]|\([^()]*\))+?)\s*,\s*"
        r"INTERVAL\s+(\d+)\s+(\w+)\s*\)",
        lambda m: f"({m.group(2)} {'+' if m.group(1).upper() == 'ADD' else '-'} "
        f"INTERVAL {m.group(3)} {m.group(4)})",
        body,
        flags=re.I,
    )
    # 6c) STR_TO_DATE(s, '%...') -> to_timestamp(s, 'java pattern')
    def std_sub(m: re.Match) -> str:
        idx = int(m.group(2))
        lits[idx] = _map_date_format(lits[idx])
        return f"to_timestamp({m.group(1)}, \x00{idx}\x00)"

    body = re.sub(
        r"\bSTR_TO_DATE\s*\(\s*((?:[^,()]|\([^()]*\))+?)\s*,\s*\x00(\d+)\x00\s*\)",
        std_sub,
        body,
        flags=re.I,
    )
    # 7) DATE_FORMAT %-patterns (second arg is a carved literal placeholder)
    def df_sub(m: re.Match) -> str:
        idx = int(m.group(2))
        lits[idx] = _map_date_format(lits[idx])
        return f"date_format({m.group(1)}, \x00{idx}\x00)"

    body = re.sub(
        r"\bDATE_FORMAT\s*\(\s*((?:[^,()]|\([^()]*\))+?)\s*,\s*\x00(\d+)\x00\s*\)",
        df_sub,
        body,
        flags=re.I,
    )
    # 8) GROUP_CONCAT (expressions up to one paren level deep)
    body = re.sub(
        r"\bGROUP_CONCAT\s*\(((?:[^()]|\([^()]*\))*)\)",
        lambda m: _group_concat(m, lits),
        body,
        flags=re.I,
    )
    # 9) user-variable ranking idiom — THE 5.6 window-function emulation:
    #      SELECT t.*, @r := @r + 1 AS rn
    #      FROM tbl t, (SELECT @r := 0) vars  ORDER BY <keys>
    #    translates to the real window function the engine has natively:
    #      row_number() OVER (ORDER BY <the query's own ORDER BY keys>).
    #    MySQL's actual evaluation order for := is undocumented-and-version-
    #    dependent; the translation pins the semantics users INTEND (rank in
    #    final output order). Only @v := @v + 1 with a (SELECT @v := 0)
    #    initializer is rewritten; other variable uses pass through and fail
    #    loudly in Spark's parser.
    # 10) GROUP BY <expr> [ASC|DESC] — 5.6 implicitly SORTS by the group
    #     keys (removed in 8.0; Spark's parser rejects the ASC/DESC).
    #     Strip the direction tokens; when the query has no explicit
    #     ORDER BY, materialize the implicit sort as one (5.6 lets an
    #     explicit ORDER BY override the implicit group sort).
    def _last_toplevel(pattern: str, text: str) -> re.Match | None:
        """Last match of pattern at paren depth 0 — rules 9/10 must bind
        to the OUTER query's clause, never one inside a derived table
        (string literals are already carved out, so every paren counts)."""
        best = None
        for m in re.finditer(pattern, text, re.I | re.S):
            prefix = text[: m.start()]
            if prefix.count("(") == prefix.count(")"):
                best = m
        return best

    gm = _last_toplevel(
        r"\bGROUP\s+BY\s+(.+?)(?=\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b|;|$)",
        body,
    )
    if gm and re.search(r"\b(ASC|DESC)\b", gm.group(1), re.I):
        glist = gm.group(1)
        stripped = re.sub(r"\s+(ASC|DESC)\b", "", glist, flags=re.I)
        body = body[: gm.start(1)] + stripped + body[gm.end(1) :]
        if not re.search(r"\bORDER\s+BY\b", body, re.I):
            order = glist.strip().rstrip(";").strip()
            # insert before LIMIT, else before a trailing semicolon
            lm = re.search(r"\bLIMIT\b", body, re.I)
            sc = re.search(r";\s*$", body)
            ins = lm.start() if lm else (sc.start() if sc else len(body))
            body = body[:ins].rstrip() + f"\nORDER BY {order}\n" + body[ins:]
    rm = re.search(r"@(\w+)\s*:=\s*@\1\s*\+\s*1", body)
    if rm:
        var = rm.group(1)
        om = _last_toplevel(
            r"\bORDER\s+BY\s+(.+?)(?=\bLIMIT\b|;|$)", body
        )
        if om:
            order = om.group(1).strip().rstrip(";").strip()
            body = re.sub(
                rf"@{var}\s*:=\s*@{var}\s*\+\s*1",
                f"row_number() OVER (ORDER BY {order})",
                body,
            )
            body = re.sub(
                rf"(?:,|\bCROSS\s+JOIN\b)\s*\(\s*SELECT\s+@{var}\s*:=\s*0\s*\)\s*(?:AS\s+)?\w*",
                "",
                body,
                flags=re.I,
            )
    return _restore_literals(body, lits)


def sql_mysql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run MySQL-dialect SQL text over the fixture views — the end-to-end
    migration surface: reference clients paste their 5.6 queries here."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(translate_mysql(sql))


def split_mysql_script(script: str) -> list[str]:
    """Split a multi-statement MySQL script on ';' — literal-safe (a ';'
    inside a string never splits), via the same carve the rewriter uses."""
    body, lits = _carve_literals(script)
    return [
        _restore_literals(part, lits).strip()
        for part in body.split(";")
        if part.strip()
    ]


def execute_mysql(spark: SparkSession, sf_dir: str, script: str) -> DataFrame:
    """Execute a multi-statement MySQL script (DDL + DML + query) statement
    by statement through the rewriter, returning the LAST statement's
    result — the session shape a 5.6 client actually produces (CREATE
    TABLE ... SELECT, INSERT ... SELECT, SHOW, then a read). Each statement
    routes onto the same Spark surface the dedicated operators use: CTAS →
    the catalog_ctas path, INSERT INTO ... SELECT → the sink_append path,
    SHOW TABLES/COLUMNS → the catalog_show_describe path."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    df = None
    for stmt in split_mysql_script(script):
        df = spark.sql(translate_mysql(stmt))
    if df is None:
        raise ValueError("empty MySQL script")
    return df


from sdp_spark.plans.registry import register  # noqa: E402

# A representative 5.6-flavored query exercising every shim rule at once:
# backticks, # comment, STRAIGHT_JOIN, GROUP_CONCAT DISTINCT+SEPARATOR,
# DATE_FORMAT %-codes, IFNULL, double-quoted string, LIMIT offset,count.
_MYSQL_QUERY = """
SELECT `c`.`c_mktsegment` AS segment,   # revenue page per segment
       COUNT(*) AS n_orders,
       IFNULL(GROUP_CONCAT(DISTINCT `o`.`o_orderpriority` SEPARATOR '|'), "none")
         AS prios,
       DATE_FORMAT(MIN(`o`.`o_orderdate`), '%Y-%m') AS first_month
FROM `customer` c STRAIGHT_JOIN `orders` o ON o.o_custkey = c.c_custkey
WHERE `o`.`o_orderpriority` REGEXP '^[12]-'
GROUP BY segment
ORDER BY n_orders DESC, segment ASC
LIMIT 1, 3
"""


@register(
    "dialect_mysql_query",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           COALESCE(array_to_string(list_sort(list(DISTINCT o.o_orderpriority)), '|'),
                    'none') AS prios,
           strftime(MIN(o.o_orderdate), '%Y-%m') AS first_month
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE regexp_matches(o.o_orderpriority, '^[12]-')
    GROUP BY segment
    ORDER BY n_orders DESC, segment ASC
    LIMIT 3 OFFSET 1
    """,
    section="3.2 sql dialect",
)
def dialect_mysql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MySQL-dialect session: the 5.6 query text above (verbatim
    what a reference client would send over port 3306) runs through
    `translate_mysql` → Catalyst, and must hash-match an ANSI oracle — the
    conformance proof for the migration shim. Every rewrite rule fires in
    this one statement; per-rule unit tests live in tests/test_dialect.py.

    Plan note: the translated text plans exactly like the native-API twin
    (broadcast-able dim join, partial+final agg, TakeOrderedAndProject) —
    the shim is a parse-time string rewrite, invisible to the optimizer."""
    return sql_mysql(spark, sf_dir, _MYSQL_QUERY)


# The canonical 5.6 ranking-emulation query (verbatim from the era's
# cookbooks): rank customers by balance with a session variable.
_USER_VAR_QUERY = """
SELECT c.c_custkey, c.c_acctbal,
       @rank := @rank + 1 AS balance_rank
FROM `customer` c, (SELECT @rank := 0) vars
WHERE c.c_acctbal > 5000
ORDER BY c.c_acctbal DESC, c.c_custkey
LIMIT 25
"""


@register(
    "dialect_user_var_rownum",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey)
                AS BIGINT) AS balance_rank
    FROM customer
    WHERE c_acctbal > 5000
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 25
    """,
    section="3.2 sql dialect",
)
def dialect_user_var_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MySQL 5.6 user-variable ranking idiom (`@r := @r + 1` + a
    `(SELECT @r := 0)` initializer row) — THE standard workaround for the
    engine's missing window functions (SURVEY.md §2.5 [ENGINE gap]) —
    translated by the shim into a real `row_number() OVER (ORDER BY ...)`
    using the query's own ORDER BY keys.

    Plan note: the variable idiom forces MySQL into a single-threaded
    ordered scan; the translation plans as a window over a sort — and
    because this query also carries LIMIT, Spark executes
    TakeOrderedAndProject + a bounded window, never a global sort of the
    full table. The rank column comes back BIGINT on both engines."""
    df = sql_mysql(spark, sf_dir, _USER_VAR_QUERY)
    return df.withColumn("balance_rank", F.col("balance_rank").cast("bigint"))


@register(
    "dialect_prepared_stmt",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_totalprice > 150000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    section="3.2 sql dialect",
)
def dialect_prepared_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the engine-side analogue of MySQL's PREPARE /
    EXECUTE (the 5.6 client surface every ORM speaks): named parameters
    bind server-side (`:cutoff`, `:min_price`), so query text stays
    constant across executions (plan cache friendly) and values are never
    string-spliced (the injection class prepared statements exist to
    kill). Spark binds via spark.sql(query, args={...}) — literals enter
    the plan as typed foldable expressions, giving Catalyst the same
    constant-folding/pushdown it gets from inline literals."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
                 AS revenue
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"cutoff": "1997-01-01", "min_price": 150000.0},
    )


@register(
    "dialect_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    section="3.2 sql dialect",
)
def dialect_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operators) — the linear query
    style where each stage reads top-to-bottom like a DataFrame chain:
    FROM → WHERE → AGGREGATE ... GROUP BY → ORDER BY. It parses to the
    IDENTICAL logical plan as the nested SELECT (the DuckDB oracle here
    is that nested form), so pushdown/pruning/codegen are untouched —
    this key certifies the parser surface, and that a 5.6-era user
    migrating hand-built query-builder strings gets a composable syntax
    with the same plans."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
        |> AGGREGATE COUNT(*) AS n_lines,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n_lines, revenue
        |> ORDER BY l_returnflag
        """
    )


@register(
    "dialect_identifier_param",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    section="3.2 sql dialect",
)
def dialect_identifier_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER(:param) — parameterized TABLE NAMES, the second half
    of the PREPARE/EXECUTE story: 5.6 users build dynamic table
    references with CONCAT into PREPARE (string-splicing SQL injection
    with extra steps); IDENTIFIER binds the name as an identifier, not
    as text, so it can never escape into syntax. The resolved plan is
    identical to the static query — catalog resolution happens at
    analysis with the bound value."""
    from sdp_spark.sources.fixtures import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM IDENTIFIER(:tbl) GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        args={"tbl": "orders"},
    )


# A 5.6 client session verbatim: CTAS without AS (MySQL lets you omit it)
# with an ENGINE option, INSERT ... SELECT appending a second slice, SHOW
# statements inspecting the result, then the read-back aggregate. The two
# SHOW statements execute (their results are discarded — the contract is
# that they parse and route, covered further by unit tests).
_DML_SCRIPT = """
CREATE TABLE sampledb.dialect_dml_rt ENGINE=InnoDB
  SELECT `c_mktsegment` AS segment, c_acctbal
  FROM `customer` WHERE c_acctbal > 9000;   # high-balance snapshot
INSERT INTO sampledb.dialect_dml_rt
  SELECT c_mktsegment, c_acctbal FROM `customer` WHERE c_acctbal < 0;
SHOW TABLES FROM sampledb LIKE '%dml%';
SHOW COLUMNS FROM sampledb.dialect_dml_rt;
SELECT segment, COUNT(*) AS n_accts,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_bal
FROM sampledb.dialect_dml_rt
GROUP BY segment ORDER BY segment
"""


@register(
    "dialect_dml_roundtrip",
    oracle="""
    WITH rt AS (
      SELECT c_mktsegment AS segment, c_acctbal FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT c_mktsegment, c_acctbal FROM customer WHERE c_acctbal < 0
    )
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_accts,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_bal
    FROM rt GROUP BY segment ORDER BY segment
    """,
    section="3.2 sql dialect",
)
def dialect_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statement-form MySQL shim (VERDICT r5 next-round #6): the script
    above — CREATE TABLE ... SELECT (no AS, ENGINE= option), INSERT ...
    SELECT, SHOW TABLES LIKE / SHOW COLUMNS, final aggregate read-back —
    executes via execute_mysql() statement by statement. The oracle
    replays the same data flow as a pure query (CTAS slice UNION ALL
    insert slice), so the round-trip through a real managed table is
    hash-checked end to end.

    Scale note: the CTAS and INSERT land as parquet writes through the
    exact planner paths of catalog_ctas / sink_append (AQE-coalesced
    file sizing applies); nothing about the shim constrains table size."""
    from sdp_spark.operators.catalog import _drop_table, ensure_sampledb

    ensure_sampledb(spark, sf_dir)
    _drop_table(spark, sf_dir, "dialect_dml_rt")
    return execute_mysql(spark, sf_dir, _DML_SCRIPT)
