"""Sampling / dataset-split operators for training-data pipelines.

``hash_split`` is the canonical deterministic train/val/test assignment:
bucket by a stable content hash of the key, not by RNG — the same row
lands in the same split on every run, every engine, any partitioning.
The hash is md5 (available and identical in Spark and DuckDB), compared
on its leading hex chars, so the DuckDB oracle renders the exact same
logic and the split is auditable in plain SQL.

``stratified_sample`` wraps Spark's seeded ``sampleBy`` for
per-stratum-fraction sampling (approximate row counts by design —
rows-only checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _split_expr(key: Column, cuts: list[tuple[str, str]]) -> Column:
    """CASE over the first 4 hex chars of md5(key) — 65536 buckets."""
    h = F.substring(F.md5(key.cast("string")), 1, 4)
    expr = None
    for name, upper in cuts[:-1]:
        cond = h < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = cuts[-1][0]
    return expr.otherwise(last_name) if expr is not None else F.lit(last_name)


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    fractions: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split keyed on ``md5(key)``.

    ``fractions`` maps split name → fraction (must sum to 1); default
    80/10/10 train/val/test.  Assignment is a pure row-local expression —
    no shuffle, no RNG, reproducible across engines and runs.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    cuts, acc = [], 0.0
    for name, frac in fractions.items():
        acc += frac
        cuts.append((name, f"{min(int(round(acc * 65536)), 65535):04x}"))
    return df.withColumn(split_col, _split_expr(F.col(key_col), cuts))


def hash_split_sql(key: str, fractions: dict[str, float] | None = None) -> str:
    """DuckDB CASE expression matching :func:`hash_split` exactly."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = f"substr(md5(CAST({key} AS VARCHAR)), 1, 4)"
    parts, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        upper = f"{min(int(round(acc * 65536)), 65535):04x}"
        parts.append(f"WHEN {h} < '{upper}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    *,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded ``sampleBy``): e.g. rebalance
    a skewed language mix by downsampling the dominant strata."""
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)
