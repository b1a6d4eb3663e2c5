"""Unit tests for the MySQL-dialect shim (sdp_spark/dialect.py): one test
per rewrite rule, plus literal-preservation (the carve-out that keeps rules
from ever touching string contents). The end-to-end conformance proof is
the `dialect_mysql_query` registry key (hash-matched against its ANSI
oracle by the driver and tests/test_oracle_parity.py)."""

from __future__ import annotations

from sdp_spark.dialect import translate_mysql as t


def test_backticks_drop():
    assert t("SELECT `a`.`b` FROM `tbl`") == "SELECT a.b FROM tbl"


def test_hash_comment():
    assert t("SELECT 1 # note\n") == "SELECT 1 -- note\n"


def test_double_quoted_string_becomes_single():
    assert t('SELECT "it\'s"') == "SELECT 'it''s'"


def test_limit_offset_count():
    assert t("SELECT 1 LIMIT 10, 5") == "SELECT 1 LIMIT 5 OFFSET 10"


def test_calc_found_rows_stripped():
    assert t("SELECT SQL_CALC_FOUND_ROWS x FROM t") == "SELECT x FROM t"


def test_straight_join_and_regexp():
    assert (
        t("SELECT 1 FROM a STRAIGHT_JOIN b WHERE x REGEXP 'p'")
        == "SELECT 1 FROM a JOIN b WHERE x RLIKE 'p'"
    )


def test_now_curdate():
    assert t("SELECT NOW(), CURDATE()") == "SELECT current_timestamp(), current_date()"


def test_date_format_codes():
    assert (
        t("SELECT DATE_FORMAT(ts, '%Y-%m-%d %H:%i:%s')")
        == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss')"
    )


def test_date_format_literal_letters_escaped():
    # non-code alphabetic chars must be quoted for DateTimeFormatter
    assert t("SELECT DATE_FORMAT(ts, '%Yq%m')") == "SELECT date_format(ts, 'yyyy'q'MM')"


def test_date_format_nested_call_arg():
    assert (
        t("SELECT DATE_FORMAT(MIN(o.d), '%Y-%m')")
        == "SELECT date_format(MIN(o.d), 'yyyy-MM')"
    )


def test_group_concat_plain():
    assert (
        t("SELECT GROUP_CONCAT(x) FROM t")
        == "SELECT array_join(array_sort(collect_list(x)), ',') FROM t"
    )


def test_group_concat_distinct_separator():
    assert (
        t("SELECT GROUP_CONCAT(DISTINCT x SEPARATOR '|')")
        == "SELECT array_join(array_sort(collect_set(x)), '|')"
    )


def test_group_concat_self_order_desc():
    assert (
        t("SELECT GROUP_CONCAT(x ORDER BY x DESC SEPARATOR ';')")
        == "SELECT array_join(reverse(array_sort(collect_list(x))), ';')"
    )


def test_group_concat_foreign_order_left_untouched():
    # unsupported general ORDER BY must pass through (fail loudly later)
    src = "SELECT GROUP_CONCAT(x ORDER BY y)"
    assert "GROUP_CONCAT" in t(src)


def test_string_literals_never_rewritten():
    src = "SELECT '#hash', 'LIMIT 1, 2', 'a REGEXP b', 'NOW()' FROM t LIMIT 1, 2"
    out = t(src)
    assert "'#hash'" in out and "'LIMIT 1, 2'" in out
    assert "'a REGEXP b'" in out and "'NOW()'" in out
    assert out.endswith("LIMIT 2 OFFSET 1")


def test_escaped_quote_literal_survives():
    src = "SELECT 'it''s #fine' FROM t"
    assert t(src) == src


def test_date_add_sub_interval():
    assert (
        t("SELECT DATE_ADD(o_orderdate, INTERVAL 30 DAY)")
        == "SELECT (o_orderdate + INTERVAL 30 DAY)"
    )
    assert (
        t("SELECT DATE_SUB(NOW(), INTERVAL 2 HOUR)")
        == "SELECT (current_timestamp() - INTERVAL 2 HOUR)"
    )


def test_str_to_date():
    assert (
        t("SELECT STR_TO_DATE('2024-01-02', '%Y-%m-%d')")
        == "SELECT to_timestamp('2024-01-02', 'yyyy-MM-dd')"
    )


# --- property fuzz: literals are inviolable -------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_fuzz_single_quoted_literal_roundtrips(s):
    """Whatever the string literal contains — #, LIMIT 1,2, REGEXP, %Y,
    backticks — translation must return it verbatim (SQL-escaped quotes
    preserved)."""
    lit = "'" + s.replace("'", "''") + "'"
    out = t(f"SELECT {lit} AS v FROM tbl")
    assert lit in out


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_fuzz_double_quoted_becomes_equivalent_single(s):
    """MySQL double-quoted strings convert to single-quoted with identical
    contents (no rule may fire inside)."""
    if '"' in s or "\\" in s:
        return
    out = t(f'SELECT "{s}" AS v')
    assert "'" + s.replace("'", "''") + "'" in out


def test_double_quote_inside_single_quoted_literal_is_content():
    # '"a"' is a 3-char string; the double quotes must NOT open a string
    src = "SELECT '\"a\"' FROM t"
    assert t(src) == src


def test_single_quote_inside_double_quoted_string():
    assert t('SELECT "it\'s"') == "SELECT 'it''s'"


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_fuzz_literal_with_embedded_double_quotes(s):
    lit = "'" + s.replace("'", "''") + "'"
    out = t(f"SELECT {lit}, {lit} FROM tbl")
    assert out.count(lit) == 2


def test_user_var_rownum_translates_to_window():
    src = (
        "SELECT c_custkey, @r := @r + 1 AS rn "
        "FROM customer c, (SELECT @r := 0) vars "
        "ORDER BY c_acctbal DESC, c_custkey LIMIT 5"
    )
    out = t(src)
    assert "row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)" in out
    assert "@r" not in out and "vars" not in out
    # the FROM keeps only the real table (no dangling comma-join)
    assert "customer c" in out and "SELECT @" not in out


def test_user_var_cross_join_initializer_form():
    src = (
        "SELECT t.*, @seq := @seq + 1 AS seq FROM orders t "
        "CROSS JOIN (SELECT @seq := 0) x ORDER BY t.o_orderdate"
    )
    out = t(src)
    assert "row_number() OVER (ORDER BY t.o_orderdate)" in out
    assert "CROSS JOIN" not in out


def test_user_var_without_order_by_passes_through():
    """No ORDER BY -> no safe rank order; leave text for a loud parse
    failure rather than inventing an order."""
    src = "SELECT @r := @r + 1 FROM t, (SELECT @r := 0) v"
    assert "@r := @r + 1" in t(src)


def test_user_var_inside_string_literal_untouched():
    src = "SELECT '@r := @r + 1' AS s FROM t ORDER BY s"
    assert t(src) == src


def test_group_by_desc_becomes_order_by():
    src = "SELECT a, COUNT(*) FROM t GROUP BY a DESC"
    out = t(src)
    assert "GROUP BY a\n" in out + "\n" or "GROUP BY a " in out
    assert "ORDER BY a DESC" in out
    assert out.count("DESC") == 1


def test_group_by_dir_stripped_when_order_by_present():
    src = "SELECT a, b, COUNT(*) FROM t GROUP BY a ASC, b DESC ORDER BY 3"
    out = t(src)
    assert "GROUP BY a, b" in out.replace("  ", " ")
    assert "ORDER BY 3" in out and "b DESC" not in out


def test_group_by_dir_before_limit():
    src = "SELECT a, COUNT(*) c FROM t GROUP BY a DESC LIMIT 5"
    out = t(src)
    assert "ORDER BY a DESC" in out and out.index("ORDER BY") < out.index("LIMIT")


def test_plain_group_by_untouched():
    src = "SELECT a, COUNT(*) FROM t GROUP BY a HAVING COUNT(*) > 1"
    assert t(src) == src


def test_user_var_binds_toplevel_order_by_not_nested():
    src = (
        "SELECT t.x, @r := @r + 1 AS rn "
        "FROM (SELECT x FROM u ORDER BY y LIMIT 10) t, (SELECT @r := 0) v "
        "ORDER BY t.x"
    )
    out = t(src)
    assert "row_number() OVER (ORDER BY t.x)" in out
    assert "OVER (ORDER BY y" not in out
    # the derived table's own ORDER BY survives untouched
    assert "FROM u ORDER BY y LIMIT 10" in out


def test_user_var_nested_order_only_passes_through():
    """Only a NESTED ORDER BY exists -> no top-level order to rank by;
    leave the idiom for a loud parse failure."""
    src = (
        "SELECT t.x, @r := @r + 1 FROM "
        "(SELECT x FROM u ORDER BY y) t, (SELECT @r := 0) v"
    )
    assert "@r := @r + 1" in t(src)


def test_group_by_desc_with_trailing_semicolon():
    out = t("SELECT a, COUNT(*) FROM t GROUP BY a DESC;")
    assert "ORDER BY a DESC" in out
    # no text after the semicolon; semicolon (if kept) stays terminal
    assert not out.rstrip().rstrip(";").rstrip().endswith("DESC;")
    assert out.rstrip().endswith(("DESC", ";"))


def test_group_by_binds_toplevel_not_derived():
    src = (
        "SELECT a, COUNT(*) FROM "
        "(SELECT a FROM u GROUP BY a ASC) t GROUP BY a"
    )
    out = t(src)
    # inner GROUP BY a ASC is nested; outer has no direction -> rule 10
    # must not touch the outer, and must not mis-bind the inner
    assert "GROUP BY a" in out


# --- round-6 statement-form rules (DML/DDL/SHOW routing) ---


def test_ctas_without_as_gets_as():
    out = t("CREATE TABLE db.t SELECT a FROM u")
    assert "CREATE TABLE db.t AS SELECT" in out


def test_ctas_with_as_not_doubled():
    out = t("CREATE TABLE db.t AS SELECT a FROM u")
    assert out.count(" AS SELECT") == 1


def test_ctas_if_not_exists():
    out = t("CREATE TABLE IF NOT EXISTS t2 SELECT a FROM u")
    assert "CREATE TABLE IF NOT EXISTS t2 AS SELECT" in out


def test_engine_and_charset_options_dropped():
    out = t(
        "CREATE TABLE t ENGINE=InnoDB DEFAULT CHARSET=utf8 "
        "AUTO_INCREMENT=100 SELECT a FROM u"
    )
    assert "ENGINE" not in out and "CHARSET" not in out
    assert "AUTO_INCREMENT" not in out
    assert "CREATE TABLE t" in out and "AS SELECT" in out


def test_show_tables_like_pattern():
    out = t("SHOW TABLES LIKE '%ord%'")
    assert out == "SHOW TABLES LIKE '*ord*'"


def test_show_tables_from_db_like():
    out = t("SHOW TABLES FROM `sampledb` LIKE 'cust%';")
    assert out == "SHOW TABLES IN sampledb LIKE 'cust*'"


def test_show_tables_like_single_char_wildcard_rejected():
    """MySQL '_' (exactly one char) has no Spark SHOW TABLES glob analogue;
    the old '_' -> '*' mapping silently over-matched (ADVICE r6) — the shim
    now refuses rather than changing semantics."""
    import pytest

    with pytest.raises(NotImplementedError, match="single-char"):
        t("SHOW TABLES FROM `sampledb` LIKE 'cust_';")


def test_option_strip_anchored_to_create_table():
    """ENGINE/CHARSET option-dropping must only fire on CREATE TABLE
    statements (ADVICE r6): a predicate comparing an `engine` column to
    another IDENTIFIER must survive translation untouched."""
    out = t("SELECT * FROM fleet WHERE engine = backup_engine")
    assert "engine = backup_engine" in out
    # and the strip still fires where it should
    out2 = t("CREATE TABLE t ENGINE=InnoDB DEFAULT CHARSET=utf8 SELECT 1 AS x")
    assert "ENGINE" not in out2 and "CHARSET" not in out2
    assert "AS SELECT" in out2


def test_show_columns_maps_to_spark():
    assert t("SHOW COLUMNS FROM orders") == "SHOW COLUMNS IN orders"
    assert t("SHOW FULL COLUMNS FROM db.orders") == "DESCRIBE TABLE db.orders"


def test_split_script_literal_safe():
    from sdp_spark.dialect import split_mysql_script

    stmts = split_mysql_script(
        "INSERT INTO t VALUES ('a;b');  SELECT * FROM t;"
    )
    assert len(stmts) == 2
    assert stmts[0] == "INSERT INTO t VALUES ('a;b')"
    assert stmts[1] == "SELECT * FROM t"


def test_like_inside_where_untouched():
    # the SHOW rule is whole-statement: a WHERE ... LIKE '%x%' query must
    # keep its MySQL-style % wildcards (valid in Spark LIKE too)
    out = t("SELECT * FROM t WHERE a LIKE '%x%'")
    assert "'%x%'" in out
