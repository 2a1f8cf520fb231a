"""Deduplication operators for training-data pipelines (SURVEY.md §2.2 X1–X3).

Five families, all pure DataFrame plans (no Python in the hot path):

- exact:        hash-groupBy on the key columns, deterministic survivor
- fingerprint:  md5 over normalized text (whitespace-collapsed, lowered)
- minhash:      shingle → k deterministic hashes → band → bucket-join (LSH)
- simhash:      64-bit sign-aggregated token hashes, banded for candidates
- jaccard:      exact token-set Jaccard via token self-join (the oracle-able
                ground truth the approximate families approximate)

Scale notes (100 TB): every family is a shuffle on a dedup key whose
cardinality is ≈ #distinct documents — the natural partitioning.  The
MinHash band join only shuffles (band_id, band_hash) buckets, never full
text; candidate verification re-joins text by doc_id afterwards.  Exact
dedup uses one window per key group (same shuffle as groupBy) with a
deterministic tie-break so results are reproducible run-to-run — a
requirement ``dropDuplicates`` (arbitrary survivor) can't meet.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Normalization / tokenization shared by the text-dedup families.
# Spark and DuckDB renderings kept adjacent (see plans/llm_ops.py oracles).
# --------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace + trim — canonical dedup form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


NORMALIZE_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


# --------------------------------------------------------------------------
# X1: exact dedup with deterministic survivor
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, keys: Sequence[str], tie_break: str | Sequence[str]) -> DataFrame:
    """Keep exactly one row per key tuple: the first under ``tie_break``.

    Equivalent to ``dropDuplicates(keys)`` but reproducible (the survivor
    is defined, not partition-order-dependent).  ``tie_break`` must be a
    TOTAL order within each key group — pass enough columns to break all
    ties, or the survivor is again partition-dependent.  One shuffle.
    """
    ties = [tie_break] if isinstance(tie_break, str) else list(tie_break)
    w = Window.partitionBy(*keys).orderBy(*[F.col(t).asc() for t in ties])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Fingerprint (md5 of normalized text) groups: one row per distinct
    content with survivor id + duplicate count."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# --------------------------------------------------------------------------
# X3: MinHash + LSH near-dup (deterministic, engine-native — no Spark ML
# dependency, no seeds to drift: hash_i(s) = xxhash64(shingle, seed=i)).
# --------------------------------------------------------------------------


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings of the normalized text (distinct)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """array<bigint> of length ``num_hashes``: min over shingles of
    ``xxhash64(shingle, seed=i)`` — a classic permutation-free MinHash."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing ≥1 band.

    ``num_hashes`` must divide into ``bands`` equal rows-per-band chunks.
    Shuffle payload is (band_id, band_hash, doc_id) only; the quadratic
    blow-up is confined to same-bucket groups.
    """
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_neardup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact shingle-Jaccard ≥ ``threshold``.

    Returns (doc_a, doc_b, jaccard) — jaccard rounded to 6 for stability.
    """
    cands = minhash_candidates(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash (64-bit) near-dup
# --------------------------------------------------------------------------


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash: per bit, sign of Σ±1 over token hashes (distinct
    tokens, xxhash64).  Pure SQL expressions; one pass."""
    hashes = F.transform(F.array_distinct(token_col), lambda t: F.xxhash64(t))

    def mask(i: int):  # 1 << 63 overflows a signed long literal; shift instead
        return F.shiftleft(F.lit(1).cast("bigint"), i)

    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask(i)) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    out = F.lit(0).cast("bigint")
    for i, s in enumerate(bit_sums):
        out = out + F.when(s > 0, mask(i)).otherwise(F.lit(0).cast("bigint"))
    return out


def simhash_neardup(
    df: DataFrame, text_col: str, id_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) ≤ ``max_hamming``.

    Candidate generation bands the 64-bit hash into 4×16-bit chunks
    (pigeonhole: distance ≤3 ⇒ ≥1 identical chunk), so the join is on
    small buckets, not a cross join.
    """
    sig = df.select(
        F.col(id_col).alias("doc_id"), simhash64(tokens(F.col(text_col))).alias("sim")
    )
    chunks = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("sim", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sim", "b.chunk", "b.ck")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# Exact n-gram / token Jaccard via self-join (oracle-able ground truth)
# --------------------------------------------------------------------------


def jaccard_pairs_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with token-set Jaccard ≥ threshold, via token self-join.

    Expressible in plain SQL (the DuckDB oracle mirrors it exactly):
    explode distinct tokens → self-join on token → per-pair intersection
    counts → |A∪B| = |A|+|B|−|A∩B|.  Quadratic only within shared-token
    groups; at scale, prune stopword-like ultra-frequent tokens first.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).where(F.col("tok") != "")
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("n_b"))
    jac = F.round(
        F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
