"""X30 DSIR (operators/dsir.py) — importance-resampling data selection.

The class-A integer statistics are driver-gate-hashed inside
`text_perplexity`; these tests pin the FULL surface on a controlled
engine pair: exact fixed-point log-weights vs the DuckDB twin, the
deterministic top-n selection, planted target-affinity semantics, the
staged==lazy gram-stream equivalence, and the no-global-sort plan.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pyspark_dist_explore_spark.operators.dsir import (
    dsir_bucket_counts,
    dsir_gram_rows,
    dsir_scores,
    dsir_sql,
    dsir_topk,
)
from tests.conftest import SF_SMOKE


def _split_docs(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    raw = docs.where("doc_id % 10 != 0").select("doc_id", "text")
    tgt = docs.where("doc_id % 10 = 0").select("doc_id", "text")
    return raw, tgt


def test_dsir_scores_match_duckdb(spark):
    raw, tgt = _split_docs(spark)
    got = {
        r["doc_id"]: r
        for r in dsir_scores(
            raw, "text", "doc_id", target=tgt, n_buckets=4096,
            hash_fn="md5", count_stats=True,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = con.execute(
        dsir_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
            n_buckets=4096, count_stats=True,
        )
    ).fetchall()
    assert len(want) == len(got) > 0
    for doc_id, n_g, e6, logw, t_mass, t_hits, r_mass in want:
        g = got[doc_id]
        assert (g["n_ds_grams"], g["ds_logw_e6"]) == (n_g, e6), doc_id
        assert (g["ds_t_mass"], g["ds_t_hits"], g["ds_r_mass"]) == (
            t_mass, t_hits, r_mass,
        ), doc_id
        assert g["ds_logw"] == pytest.approx(logw, abs=1e-9)


def test_dsir_topk_selects_target_like_docs(spark):
    # raw: three docs speaking the target's vocabulary, three speaking a
    # disjoint one — the importance weight must rank the target-like
    # docs on top whatever their ids
    tgt = spark.createDataFrame(
        [(100 + i, "spark table join scan filter shuffle") for i in range(4)],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark table join filter"),
            (2, "zebra quark nebula plasma"),
            (3, "table scan shuffle spark"),
            (4, "violet anchovy umbrella xylophone"),
            (5, "join scan filter table"),
            (6, "marzipan gondola feldspar obsidian"),
        ],
        "doc_id bigint, text string",
    )
    scored = dsir_scores(raw, "text", "doc_id", target=tgt, n_buckets=1 << 10)
    kept = {r["doc_id"] for r in dsir_topk(scored, 3).collect()}
    assert kept == {1, 3, 5}
    # and the weights separate cleanly: every kept weight above every dropped
    by_id = {r["doc_id"]: r["ds_logw"] for r in scored.collect()}
    assert min(by_id[i] for i in (1, 3, 5)) > max(by_id[i] for i in (2, 4, 6))


def test_dsir_staged_counts_equal_library_counts(spark):
    # the registered query derives the gram stream from the perplexity
    # scorers' checkpointed pair frame; the library builds it row-locally
    # — same multiset, so bucket counts agree exactly
    raw, _ = _split_docs(spark)
    lib = {
        (r["bucket"], r["cnt"])
        for r in dsir_bucket_counts(
            dsir_gram_rows(raw, "text", "doc_id"), n_buckets=512, hash_fn="md5"
        ).collect()
    }
    from pyspark.sql import Window
    from pyspark_dist_explore_spark.operators.dedup import normalize_text

    toks = raw.select(
        F.col("doc_id"),
        F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias("idx", "tok"),
    ).where(F.col("tok") != "")
    pairs = toks.select(
        "doc_id", "idx", "tok",
        F.lag("tok", 1).over(Window.partitionBy("doc_id").orderBy("idx")).alias("prev"),
    )
    staged_grams = pairs.select("doc_id", F.col("tok").alias("gram")).unionByName(
        pairs.where(F.col("prev").isNotNull()).select(
            "doc_id", F.concat_ws(" ", "prev", "tok").alias("gram")
        )
    )
    staged = {
        (r["bucket"], r["cnt"])
        for r in dsir_bucket_counts(
            staged_grams, n_buckets=512, hash_fn="md5"
        ).collect()
    }
    assert staged == lib


def test_dsir_empty_docs_emit_no_rows(spark):
    raw = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, None), (4, "   ")],
        "doc_id bigint, text string",
    )
    tgt = spark.createDataFrame([(9, "some words")], "doc_id bigint, text string")
    out = dsir_scores(raw, "text", "doc_id", target=tgt).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_dsir_validation():
    with pytest.raises(ValueError, match="alpha"):
        dsir_scores(None, alpha=0.0, target=None)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_scores(None, n_buckets=0, target=None)
    with pytest.raises(ValueError, match="raw"):
        dsir_scores(None, target=None)
    with pytest.raises(ValueError, match="n_keep"):
        dsir_topk(None, 0)


def test_dsir_gram_count_hash_invariant(spark):
    # n_ds_grams counts grams, not buckets — identical across hash_fn
    raw, tgt = _split_docs(spark)
    md5 = dsir_scores(raw, "text", "doc_id", target=tgt, hash_fn="md5")
    xx = dsir_scores(raw, "text", "doc_id", target=tgt, hash_fn="xxhash64")
    a = {(r["doc_id"], r["n_ds_grams"]) for r in md5.collect()}
    b = {(r["doc_id"], r["n_ds_grams"]) for r in xx.collect()}
    assert a == b


def test_dsir_topk_plans_take_ordered(spark):
    raw, tgt = _split_docs(spark)
    scored = dsir_scores(raw, "text", "doc_id", target=tgt)
    plan = dsir_topk(scored, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort
    assert "SortMergeJoin" not in plan  # count tables broadcast


def test_dsir_model_artifacts_round_trip(spark, tmp_path):
    """Landed count tables == fresh frames, scoring from loaded
    artifacts == scoring from scratch, and a scheme mismatch refuses
    loudly at load."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dsir import dsir_bucket_counts
    from pyspark_dist_explore_spark.sources.sinks import (
        load_dsir_model,
        write_dsir_model,
    )

    raw, tgt = _split_docs(spark)
    p_raw, p_tgt = str(tmp_path / "raw"), str(tmp_path / "tgt")
    write_dsir_model(raw, "text", "doc_id", p_raw, n_buckets=512, hash_fn="md5")
    write_dsir_model(tgt, "text", "doc_id", p_tgt, n_buckets=512, hash_fn="md5")
    rc, params = load_dsir_model(
        spark, p_raw, expect={"n_buckets": 512, "hash_fn": "md5"}
    )
    tc, _ = load_dsir_model(spark, p_tgt)
    fresh = {
        (r["bucket"], r["cnt"])
        for r in dsir_bucket_counts(
            dsir_gram_rows(raw, "text", "doc_id"), n_buckets=512, hash_fn="md5"
        ).collect()
    }
    assert {(r["bucket"], r["cnt"]) for r in rc.collect()} == fresh

    from_artifacts = sorted(
        tuple(r)
        for r in dsir_scores(
            raw, "text", "doc_id",
            raw_counts=rc, target_counts=tc, n_buckets=512, hash_fn="md5",
        ).collect()
    )
    from_scratch = sorted(
        tuple(r)
        for r in dsir_scores(
            raw, "text", "doc_id", target=tgt, n_buckets=512, hash_fn="md5"
        ).collect()
    )
    assert from_artifacts == from_scratch

    with _pytest.raises(ValueError, match="different scheme"):
        load_dsir_model(spark, p_raw, expect={"n_buckets": 4096})


def test_dsir_scores_partition_invariant(spark):
    """The 1e-6 fixed-point grid makes the per-doc log-weight sum exact
    integer arithmetic — identical at ANY parallelism (the determinism
    claim, proven): repartition(1) == repartition(13, doc_id)."""
    raw, tgt = _split_docs(spark)
    def run(d):
        return sorted(
            map(tuple, dsir_scores(d, "text", "doc_id", target=tgt,
                                   n_buckets=512, count_stats=True).collect())
        )
    assert run(raw.repartition(1)) == run(raw.repartition(13, "doc_id"))


def test_topk_by_rank_equals_driver_topk(spark):
    """The distributed rank path (production n_keep — no driver funnel)
    selects the EXACT same set as TakeOrderedAndProject under the same
    total order, at several cut points including ones that land inside
    a range partition."""
    from pyspark_dist_explore_spark.operators.dsir import topk_by_rank

    raw, tgt = _split_docs(spark)
    scored = dsir_scores(raw, "text", "doc_id", target=tgt).cache()
    order = [F.col("ds_logw_e6").desc(), F.col("doc_id").asc()]
    total = scored.count()
    for n in (1, 7, 40, total, total + 10):
        want = sorted(r["doc_id"] for r in dsir_topk(scored, min(n, 100_000)).collect())
        got = sorted(r["doc_id"] for r in topk_by_rank(scored, n, order).collect())
        assert got == want, f"n={n}"
    # columns pass through untouched
    assert topk_by_rank(scored, 5, order).columns == scored.columns
    scored.unpersist()


def test_dsir_topk_large_nkeep_switches_plan(spark):
    """Above DSIR_TOPK_DRIVER_MAX the selection must NOT plan a
    TakeOrderedAndProject (the driver funnel the advisor flagged)."""
    from pyspark_dist_explore_spark.operators.dsir import (
        DSIR_TOPK_DRIVER_MAX,
        dsir_topk,
    )

    raw, tgt = _split_docs(spark)
    scored = dsir_scores(raw, "text", "doc_id", target=tgt)
    plan = (
        dsir_topk(scored, DSIR_TOPK_DRIVER_MAX + 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" not in plan


def test_topk_by_rank_large_nkeep_exact_at_scale(spark):
    """Regression for the round-9 advisor repro: unpinned, the range
    exchange re-executes with fresh sampled boundaries in the final job
    and the offset table no longer describes the partitioning it joins
    against — n_keep=150k over 400k rows came back 144 559 / 153 885 /
    151 383 rows with missing AND extra docs.  With the exchange pinned
    via localCheckpoint the kept set must be exactly the true top-k."""
    from pyspark_dist_explore_spark.operators.dsir import topk_by_rank

    n_rows, n_keep = 400_000, 150_000
    df = (
        spark.range(n_rows)
        .withColumn("doc_id", F.concat(F.lit("d"), F.col("id").cast("string")))
        # pseudo-random score with heavy ties to stress the tie-break
        .withColumn("score", F.pmod(F.xxhash64("doc_id"), F.lit(1000)))
        .drop("id")
    )
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    kept = topk_by_rank(df, n_keep, order)
    got = sorted((r["score"], r["doc_id"]) for r in kept.collect())
    want = sorted(
        (r["score"], r["doc_id"])
        for r in df.orderBy(*order).limit(n_keep).collect()
    )
    assert len(got) == n_keep
    assert got == want
