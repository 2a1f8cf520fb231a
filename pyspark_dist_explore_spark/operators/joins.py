"""Join strategy helpers for scale (SURVEY §4.2): skew salting and
bucketed co-located joins.

``salted_join`` is the classic hot-key mitigation: the skewed (big) side
gets a deterministic salt in ``[0, n)``, the small side is replicated n
ways, and the join key becomes (key, salt) — one hot key fans out across
n reducers instead of melting one.  AQE's skew-join handles moderate skew
automatically; salting is for the pathological keys AQE can't split
(e.g., a single null-like sentinel key with 30% of all rows).

Bucketed joins need no helper — write both sides with
``.bucketBy(n, key).sortBy(key)`` and Spark elides the shuffle; the test
suite pins that plan shape (tests/test_scale_patterns.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Join a skew-heavy ``big`` frame to a ``small`` frame on ``key``.

    The salt is derived deterministically from ``salt_source`` columns
    (default: all non-key columns of ``big``) via xxhash64 — reproducible
    runs, no RNG state.  ``small`` is replicated ``salt_buckets`` times;
    keep it broadcast-small or the replication cost dominates.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full outer would emit each unmatched small-side REPLICA as
        # its own null-extended row (salt_buckets copies per unmatched key)
        raise ValueError(f"salted_join supports inner/left/left_semi joins, got how={how!r}")
    if salt_source is None:
        salt_source = [c for c in big.columns if c != key]
    if not salt_source:
        raise ValueError("need at least one non-key column to derive a deterministic salt")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_source]), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt)
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")
