"""Deterministic numeric helpers (SURVEY.md §7 hard part 2).

Fixture measures are 2-decimal-exact doubles. Two cross-engine hazards:

1. **Order-dependent float sums** — Spark and DuckDB aggregate in different
   orders, so SUM(double) differs in the last ulp; any rounding of it can
   then differ by a full cent.
2. **Boundary rounding** — even on an identical double, Spark rounds via the
   shortest-decimal repr (BigDecimal HALF_UP) while DuckDB rounds the raw
   binary, so values like 4201.315 round to .32 vs .31.

Fixes used across all operators and mirrored in every oracle:

- ``dsum``: aggregate in DECIMAL (exact, order-independent), round the exact
  decimal (HALF_UP == away-from-zero in both engines), cast to double.
- ``dround``: FLOOR(x * 10^n + 0.5) / 10^n — pure IEEE ops, so the result is
  bit-identical across engines *whenever the input double is identical*
  (per-row expressions over the same parquet data, or quotients of exact
  decimal sums).

At 100 TB these also make results reproducible across partitionings/AQE
re-plans — float-sum nondeterminism is a scale bug, not just a test bug.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,8)"

# Knuth multiplicative hash constants — shared by every operator that does
# deterministic sampling / split assignment (sample_systematic,
# llm_pipeline_train_corpus). Exact bigint arithmetic, portable to any
# engine; keys must stay < ~3.5e9 (else pmod(xxhash64) — see docstrings).
KNUTH = 2654435761
KNUTH_MOD = 4294967296  # 2^32


def dround(col: Column | str, n: int = 2) -> Column:
    """Deterministic double rounding: floor(x*10^n + 0.5)/10^n."""
    col = F.col(col) if isinstance(col, str) else col
    p = 10**n
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def dsum(col: Column | str, n: int = 2) -> Column:
    """Exact (decimal) sum of a money column, rounded, as double."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(col.cast(DEC)), n).cast("double")


def davg(col: Column | str, n: int = 4) -> Column:
    """Exact-sum average: decimal SUM / COUNT, deterministically rounded."""
    col = F.col(col) if isinstance(col, str) else col
    return dround(F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)), n)


def sql_dsum(expr: str, n: int = 2) -> str:
    """DuckDB twin of dsum."""
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,8))), {n}) AS DOUBLE)"


def sql_davg(expr: str, n: int = 4) -> str:
    """DuckDB twin of davg."""
    p = 10**n
    return (
        f"FLOOR(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE)"
        f" / COUNT(*) * {p} + 0.5) / {p}"
    )


def sql_dround(expr: str, n: int = 2) -> str:
    """DuckDB twin of dround."""
    p = 10**n
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"
