"""Hash-stable aggregation helpers.

Double ``SUM``/``AVG`` results depend on accumulation order, which
differs between Spark's partial/final hash aggregate and DuckDB — the
last few ulps drift and an exact value-hash comparison fails.  For money
/ fixed-point measures we instead sum scaled BIGINTs (exact, associative,
order-independent) and convert to double once at the end:

    sum(x) ≈ CAST(SUM(CAST(round(x * 10^s) AS BIGINT)) AS DOUBLE) / 10^s

Both dialects compute the identical double product, identical rounding
(ties away from zero for positives in both), an exact integer sum, and
one final division — bit-identical everywhere, at any parallelism.
This is also the right 100 TB answer: integer partial aggregates are
cheaper to merge than decimals and never lose associativity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_sum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of a fixed-point double measure."""
    mult = float(10**scale)
    return (
        F.sum(F.round(col * F.lit(mult)).cast("bigint")).cast("double") / F.lit(mult)
    )


def scaled_sum_sql(expr: str, scale: int = 4) -> str:
    mult = f"{float(10 ** scale)!r}"
    return f"CAST(sum(CAST(round(({expr}) * {mult}) AS BIGINT)) AS DOUBLE) / {mult}"


def scaled_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent mean: exact scaled sum ÷ exact count."""
    mult = float(10**scale)
    return (
        F.sum(F.round(col * F.lit(mult)).cast("bigint")).cast("double")
        / F.lit(mult)
        / F.count(F.lit(1))
    )


def scaled_avg_sql(expr: str, scale: int = 4) -> str:
    mult = f"{float(10 ** scale)!r}"
    return (
        f"CAST(sum(CAST(round(({expr}) * {mult}) AS BIGINT)) AS DOUBLE) / {mult} / count(*)"
    )
