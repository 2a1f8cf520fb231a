"""Operator unit tests on hand-built fixtures (FIXTURES.md §B:
f_docs_dup, f_vecs + sink round-trip + stats sanity)."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from pyspark_dist_explore_spark.operators import dedup, similarity, stats, textstats
from pyspark_dist_explore_spark.operators.histogram import compute_histogram

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),          # near dup (1 token)
    (4, "completely different content about spark engines"),
    (5, "  The  Quick  Brown  Fox  Jumps  Over  The  Lazy  Dog "),  # ws/case dup of 1
    (6, "unrelated text regarding histogram buckets and bins"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_fingerprint_dedup_normalizes(spark):
    out = dedup.fingerprint_dedup(_docs(spark), "text", "doc_id").collect()
    groups = {r["survivor_id"]: r["n_dups"] for r in out}
    assert groups[1] == 3  # docs 1, 2, 5 collapse (case + whitespace)
    assert groups[3] == 1 and groups[4] == 1 and groups[6] == 1


def test_jaccard_exact_finds_neardup(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs_exact(_docs(spark), "text", "doc_id", threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # 1 vs 3: tokens {the,quick,brown,fox,jumps/leaps,over,lazy,dog}: 7/9
    assert math.isclose(pairs[(1, 3)], 7 / 9, rel_tol=1e-5)
    assert (1, 4) not in pairs


def test_minhash_finds_neardups_not_strangers(spark):
    out = dedup.minhash_neardup(
        _docs(spark), "text", "doc_id", threshold=0.7, num_hashes=32, bands=16, shingle_n=1
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in found and (1, 5) in found and (2, 5) in found
    assert (1, 3) in found  # 7/9 ≈ 0.78 ≥ 0.7
    assert all(4 not in p and 6 not in p for p in found)


def test_neardup_clusters_chain_and_singletons(spark):
    # chain 1-2-3-...-8 (diameter 7 forces >1 propagation round with
    # pointer jumping), separate pair (20,21), singletons 30/31 via all_ids
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)] + [(21, 20)], ["doc_a", "doc_b"]
    )
    ids = spark.createDataFrame(
        [(i,) for i in range(1, 9)] + [(20,), (21,), (30,), (31,)], ["doc_id"]
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dedup.neardup_clusters(pairs, all_ids=ids).collect()
    }
    assert len(out) == 12
    for i in range(1, 9):
        assert out[i] == (1, 1 if i == 1 else 0)
    assert out[20] == (20, 1) and out[21] == (20, 0)
    assert out[30] == (30, 1) and out[31] == (31, 1)


def test_cluster_best_survivors_planted(spark):
    """X60: per-cluster election — max score wins, ties break to the min
    id, a scored member always beats an unscored one, an all-unscored
    cluster degenerates to the min-id convention."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20), (30, 30)],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (11, 7.0), (30, None)],
        "doc_id: long, score: double",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dedup.cluster_best_survivors(labels, scores).collect()
    }
    assert len(out) == 8  # one output row per label row
    assert out[2] == (1, 1) and out[3] == (1, 0) and out[1] == (1, 0)  # tie -> min id
    assert out[11] == (10, 1) and out[10] == (10, 0)  # scored beats missing
    assert out[20] == (20, 1) and out[21] == (20, 0)  # all unscored -> min id
    assert out[30] == (30, 1)  # NULL score singleton still survives
    per_cluster = {}
    for doc, (cl, surv) in out.items():
        per_cluster[cl] = per_cluster.get(cl, 0) + surv
    assert all(v == 1 for v in per_cluster.values())


def test_cluster_best_survivors_lower_is_better(spark):
    """higher_is_better=False elects the MIN score (perplexity-style);
    unscored members still lose to scored ones."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1)], ["doc_id", "cluster_id"]
    )
    scores = spark.createDataFrame(
        [(2, 40.0), (3, 12.5), (4, None)], "doc_id: long, score: double"
    )
    out = {
        r["doc_id"]: r["is_survivor"]
        for r in dedup.cluster_best_survivors(
            labels, scores, higher_is_better=False
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_cluster_best_survivors_constant_score_equals_min_id(spark):
    """A constant score reproduces neardup_clusters' min-id survivors
    bit for bit (the docstring pin)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)] + [(21, 20)], ["doc_a", "doc_b"]
    )
    ids = spark.createDataFrame(
        [(i,) for i in range(1, 7)] + [(20,), (21,), (30,)], ["doc_id"]
    )
    base = dedup.neardup_clusters(pairs, all_ids=ids)
    scores = ids.select("doc_id", F.lit(1.0).alias("score"))
    elected = dedup.cluster_best_survivors(base, scores)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, elected.collect()))


def test_cluster_best_survivors_matches_duckdb_twin(spark):
    """Distributed aggregate election == the window-form DuckDB twin on
    a frame with ties, NULLs, missing ids, and negative scores."""
    import duckdb
    import pandas as pd

    label_rows = [(i, i % 7) for i in range(60)]
    score_rows = [
        (i, None if i % 11 == 0 else round(((i * 37) % 19) - 9 + i % 3 * 0.25, 6))
        for i in range(0, 60, 2)  # odd ids missing from scores entirely
    ]
    labels = spark.createDataFrame(label_rows, ["doc_id", "cluster_id"])
    scores = spark.createDataFrame(score_rows, "doc_id: long, score: double")
    for hib in (True, False):
        got = sorted(
            map(tuple, dedup.cluster_best_survivors(labels, scores, higher_is_better=hib).collect())
        )
        con = duckdb.connect()
        try:
            con.register("lbl", pd.DataFrame(label_rows, columns=["doc_id", "cluster_id"]))
            con.register("scr", pd.DataFrame(score_rows, columns=["doc_id", "score"]))
            sql = dedup.cluster_best_survivors_sql("lbl", "scr", higher_is_better=hib)
            want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        finally:
            con.close()
        assert got == want, f"higher_is_better={hib}"


def test_cluster_best_survivors_guards(spark):
    labels = spark.createDataFrame([(1, 1)], ["doc_id", "cluster_id"])
    scores = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
    with pytest.raises(ValueError, match="cluster_id"):
        dedup.cluster_best_survivors(labels.drop("cluster_id").withColumn("c", F.lit(1)), scores)
    with pytest.raises(ValueError, match="score"):
        dedup.cluster_best_survivors(labels, scores.withColumnRenamed("score", "s"))


def test_neardup_clusters_pairs_only_no_all_ids(spark):
    pairs = spark.createDataFrame([(3, 7), (7, 5)], ["doc_a", "doc_b"])
    out = {r["doc_id"]: r["cluster_id"] for r in dedup.neardup_clusters(pairs).collect()}
    assert out == {3: 3, 5: 3, 7: 3}


def test_neardup_clusters_warns_when_unconverged(spark):
    """Exhausting max_iter with labels still moving must WARN — silently
    returning partial propagation would keep near-dups in a training set."""
    import warnings

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], ["doc_a", "doc_b"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.neardup_clusters(pairs, max_iter=1)
    assert any("did not converge" in str(w.message) for w in caught)
    # and a sufficient budget stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.neardup_clusters(pairs)
    assert not any("did not converge" in str(w.message) for w in caught)


def test_semantic_dedup_composition(spark):
    """Embedding-level semantic dedup is a straight composition of two
    shipped operators: ANN-pruned cosine near-dup pairs feeding cluster
    resolution — every embedding gets a cluster, each cluster one
    survivor, near-identical vectors (cos >= 0.98) never both survive."""
    from pyspark_dist_explore_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(500)
    pairs = similarity.ann_lsh_neardup_pairs(
        emb, threshold=0.98, n_planes=4, id_col="vec_id", vec_col="embedding"
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    clusters = dedup.neardup_clusters(pairs, all_ids=emb.select("vec_id"))
    rows = clusters.collect()
    assert len(rows) == emb.count()  # every vector labeled
    by_id = {r["doc_id"]: r for r in rows}
    survivors = {r["doc_id"] for r in rows if r["is_survivor"] == 1}
    # each cluster's survivor is its min id, and it is in the survivor set
    for r in rows:
        assert by_id[r["cluster_id"]]["is_survivor"] == 1
        assert r["cluster_id"] <= r["doc_id"]
    # no near-dup pair survives twice
    for p in pairs.collect():
        assert not (p["doc_a"] in survivors and p["doc_b"] in survivors)


def test_neardup_clusters_releases_round_storage(spark):
    """Superseded propagation rounds must not pin checkpoint blocks: a
    multi-round run may leave at most the FINAL round's state behind
    (plus anything persisted before the call), never one copy per round."""
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # a 40-node chain needs several pointer-jumping rounds to converge
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], ["doc_a", "doc_b"])
    res = dedup.neardup_clusters(pairs)
    assert res.where(F.col("is_survivor") == 1).count() == 1
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 1, f"leaked {after - before} checkpointed round states"


def test_release_local_checkpoint_degrades_loudly(spark):
    """When the private JVM handle the block release relies on is absent
    (Spark Connect / a future Spark upgrade), the release must neither
    raise nor pass silently: one RuntimeWarning names the ContextCleaner
    fallback, and repeat calls stay quiet (one-shot flag)."""
    import warnings

    class _NoHandle:
        """Stands in for a DataFrame whose _jdf private API is gone."""

        @property
        def _jdf(self):
            raise AttributeError("queryExecution handle removed")

    dedup._RELEASE_WARNED = False
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            dedup._release_local_checkpoint(_NoHandle())  # must not raise
            dedup._release_local_checkpoint(_NoHandle())  # second call: quiet
        runtime = [w for w in caught if issubclass(w.category, RuntimeWarning)]
        assert len(runtime) == 1, f"expected exactly one warning, got {len(runtime)}"
        assert "ContextCleaner" in str(runtime[0].message)
    finally:
        dedup._RELEASE_WARNED = False
    # and the REAL path still releases without warning on this Spark
    df = spark.range(5).localCheckpoint()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup._release_local_checkpoint(df)
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]


def test_release_local_checkpoint_untested_major_skips_private_api(spark):
    """r11 verdict item 7 — upgrade behavior is DECIDED, not
    discovered: on a pyspark major outside _RELEASE_TESTED_MAJORS the
    release never even touches the private _jdf handle (it might have
    changed shape in ways that misbehave rather than raise); it warns
    once naming the fallback and returns."""
    import warnings

    class _MustNotTouch:
        @property
        def _jdf(self):
            raise AssertionError(
                "private handle touched on an untested pyspark major"
            )

    saved = dedup._PYSPARK_MAJOR
    dedup._RELEASE_WARNED = False
    try:
        dedup._PYSPARK_MAJOR = 99
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            dedup._release_local_checkpoint(_MustNotTouch())
            dedup._release_local_checkpoint(_MustNotTouch())  # one-shot
        runtime = [w for w in caught if issubclass(w.category, RuntimeWarning)]
        assert len(runtime) == 1
        assert "99" in str(runtime[0].message)
        assert "ContextCleaner" in str(runtime[0].message)
    finally:
        dedup._PYSPARK_MAJOR = saved
        dedup._RELEASE_WARNED = False
    # this container's major IS in the tested set — the real path runs
    assert dedup._PYSPARK_MAJOR in dedup._RELEASE_TESTED_MAJORS


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_simhash_close_for_neardups(spark, hash_fn):
    sig = {
        r["doc_id"]: r["sim"]
        for r in dedup.simhash_signatures(
            _docs(spark), "text", "doc_id", hash_fn=hash_fn
        ).collect()
    }
    assert sig[1] == sig[2] == sig[5]  # identical token sets

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sig[1], sig[3]) < ham(sig[1], sig[4])


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_simhash_packed_lanes(spark, hash_fn):
    """The r15 lane-packed bit-count aggregate must reproduce the wide
    SUM(±1) reference form bit for bit — sign_i>0 ⇔ 2·c_i>n is exact
    integer arithmetic, so any mismatch is a packing bug.  Checked on
    the hand fixtures AND the sf0.001 corpus (real token spread)."""
    from tests.conftest import SF_SMOKE

    for docs in (_docs(spark), spark.read.parquet(f"{SF_SMOKE}/documents.parquet")):
        got = sorted(
            (r["doc_id"], r["sim"])
            for r in dedup.simhash_signatures(
                docs, "text", "doc_id", hash_fn=hash_fn
            ).collect()
        )
        want = sorted(
            (r["doc_id"], r["sim"])
            for r in dedup._simhash_signatures_unpacked(
                docs, "text", "doc_id", hash_fn=hash_fn
            ).collect()
        )
        assert got == want


def test_simhash_md5_token_hash_matches_duckdb(spark):
    """The md5-variant's 60-bit token hash (conv of the leading 15 md5
    hex chars) must be bit-identical to DuckDB's '0x…'::BIGINT twin —
    the whole simhash oracle rests on this equality."""
    import duckdb

    toks = ["the", "Quick", "brown-fox", "héllo wörld", "123", "x" * 50]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {
        r["tok"]: r["h"]
        for r in df.select(
            "tok",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for t in toks:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
        ).fetchone()[0]
        assert got[t] == want, t


def test_exact_dedup_survivor(spark):
    out = dedup.exact_dedup(
        _docs(spark).withColumn("norm", F.lower(F.col("text"))), ["norm"], ["doc_id"]
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 4, 5, 6]  # doc 2 (exact dup of 1) dropped, min id kept


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [0.7, 0.7, 0.0, 0.0]),   # diagonal
    (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
]


def _vecs(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_exact_topk_ranking(spark):
    v = _vecs(spark)
    q = v.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    got = [
        r["vec_id"]
        for r in similarity.exact_topk(v, q, k=4).orderBy("rank").collect()
    ]
    assert got == [1, 3, 2, 4]  # cos: .994, .707, 0, -1


def test_ann_lsh_subset_of_exact_scores(spark):
    v = _vecs(spark)
    q = v.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    ann = similarity.ann_lsh_topk(v, q, k=4, n_planes=2).collect()
    exact = {
        r["vec_id"]: r["cos_sim"] for r in similarity.exact_topk(v, q, k=4).collect()
    }
    for r in ann:  # every ANN hit scores identically to the exact scan
        assert exact[r["vec_id"]] == r["cos_sim"]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und der vogel"),
            (3, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(df, "text", "doc_id").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_describe_exact_matches_python_stats(spark):
    vals = [1.5, 2.25, 3.75, 10.0, 7.25]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    r = stats.describe_exact(df, ["x"]).collect()[0]
    assert r["cnt"] == 5
    assert math.isclose(r["mean"], statistics.mean(vals), abs_tol=1e-6)
    assert math.isclose(r["stddev"], statistics.stdev(vals), abs_tol=1e-6)
    assert (r["vmin"], r["vmax"]) == (1.5, 10.0)


def test_histogram_parquet_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    hist = compute_histogram([("v", df, "v")], bins=10)
    path = str(tmp_path / "hist_out")
    hist.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    # nullability may legitimately widen across a parquet round-trip
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in hist.schema.fields
    ]
    assert sorted((r["bucket"], r["cnt"]) for r in back.collect()) == sorted(
        (r["bucket"], r["cnt"]) for r in hist.collect()
    )


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_winnowing_shared_passage_detected(spark, hash_fn):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "X Y alpha beta gamma delta epsilon zeta eta theta iota kappa Z"),
            (3, "one two three four five six seven eight nine ten eleven"),
        ],
        ["doc_id", "text"],
    )
    fps = textstats.winnowing_fingerprints(
        docs, "text", "doc_id", k=5, window=4, hash_fn=hash_fn
    )
    by_doc = {
        i: {r["fingerprint"] for r in rows}
        for i, rows in [
            (i, fps.where(F.col("doc_id") == i).collect()) for i in (1, 2, 3)
        ]
    }
    # docs 1 and 2 share a 10-word passage (≥ k+window-1=8) → shared fingerprint
    assert by_doc[1] & by_doc[2]
    # doc 3 shares nothing with doc 1
    assert not (by_doc[1] & by_doc[3])


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_winnowing_short_and_exact_dup_docs(spark, hash_fn):
    """Docs shorter than k tokens yield exactly ONE whole-doc gram
    fingerprint; exact-dup docs yield identical fingerprint sets."""
    docs = spark.createDataFrame(
        [
            (1, "tiny doc"),  # 2 tokens < k=5
            (2, "tiny doc"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        ["doc_id", "text"],
    )
    fps = textstats.winnowing_fingerprints(
        docs, "text", "doc_id", k=5, window=4, hash_fn=hash_fn
    )
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert len(by_doc[1]) == 1 and by_doc[1] == by_doc[2]
    assert by_doc[3] == by_doc[4] and len(by_doc[3]) >= 1
    assert not (by_doc[1] & by_doc[3])


def test_ivf_topk_scores_match_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in similarity.exact_topk(emb, q, k=50).collect()
    }
    ivf = similarity.ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    assert len(ivf) > 0
    hits = [r for r in ivf if (r["query_id"], r["vec_id"]) in exact]
    # every IVF result that the exact top-50 contains scores identically
    for r in hits:
        assert exact[(r["query_id"], r["vec_id"])] == r["cos_sim"]


def test_ivf_recall_at_5(spark):
    """IVF recall probe with KMeans centroids.

    The synthetic embeddings are near-isotropic (mean pairwise cos ≈ 0,
    no cluster structure), the worst case for ANY partitioning ANN —
    measured recall@5 here is ~0.57 @ n_probe=4 and ~0.92 @ n_probe=10
    (a prior 0.85 @ n_probe=4 figure was an artifact of the query
    vectors themselves being the data-blind centroids).  So the test
    pins (a) floors per probe width, (b) monotone improvement, and
    (c) the exactness invariant: probing EVERY list must reproduce the
    exact top-5 bit-for-bit (recall 1.0) — the end-to-end correctness
    check of assignment + probe + re-rank.
    """
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in similarity.exact_topk(emb, q, k=5).collect()
    }

    def recall(n_probe: int) -> float:
        ivf = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                emb, q, k=5, n_centroids=16, n_probe=n_probe
            ).collect()
        }
        return len(exact & ivf) / len(exact)

    r4, r8, r16 = recall(4), recall(8), recall(16)
    assert r4 >= 0.5, f"recall@5(n_probe=4)={r4:.3f}"
    assert r8 >= r4 and r8 >= 0.75, f"recall@5(n_probe=8)={r8:.3f}"
    assert r16 == 1.0, f"full probe must equal exact, got {r16:.3f}"


def test_ivf_multi_assign_recall(spark):
    """X4 round-13 lever: multi-assignment (each vector indexed into its
    ``n_assign`` nearest lists) lifts recall at a FIXED probe width —
    the bounded-cost alternative to widening the scan.  Measured on the
    worst-case isotropic corpus: 0.53 → 0.73 → 0.86 at n_probe=4 for
    n_assign=1/2/3 (seeded KMeans, deterministic).  Pins: floors per
    replication factor, monotone improvement, the verdict's ≥0.8 target
    at n_probe=4 without a full scan, and the exactness invariant
    (replicated index + full probe still reproduces exact top-5 — the
    distinct() dedup of multi-list meetings is correct)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in similarity.exact_topk(emb, q, k=5).collect()
    }

    def recall(n_assign: int, n_probe: int) -> float:
        ivf = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                emb, q, k=5, n_centroids=16, n_probe=n_probe, n_assign=n_assign
            ).collect()
        }
        return len(exact & ivf) / len(exact)

    r1, r2, r3 = recall(1, 4), recall(2, 4), recall(3, 4)
    assert r2 >= max(r1, 0.65), f"recall@5(n_assign=2, n_probe=4)={r2:.3f}"
    assert r3 >= max(r2, 0.8), f"recall@5(n_assign=3, n_probe=4)={r3:.3f}"
    assert recall(2, 16) == 1.0, "replicated index + full probe must equal exact"
    with pytest.raises(ValueError, match="n_assign"):
        similarity.ivf_topk(emb, q, k=5, n_assign=0)


def test_grouped_sum_pandas_matches_jvm(spark):
    """The unregistered grouped-agg pandas UDF surface stays pinned: the
    Arrow scaled-integer sum must equal the JVM scaled_sum exactly."""
    from pyspark_dist_explore_spark.functions.agg import scaled_sum
    from pyspark_dist_explore_spark.plans.extended import q_grouped_sum_pandas
    from pyspark_dist_explore_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    arrow = {
        r["l_returnflag"]: r["total_price"]
        for r in q_grouped_sum_pandas(spark, sf).collect()
    }
    jvm = {
        r["l_returnflag"]: r["total_price"]
        for r in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(scaled_sum(F.col("l_extendedprice")).alias("total_price"))
        .collect()
    }
    assert arrow == jvm and len(arrow) >= 2


def test_kmeans_sample_fit_guards(spark):
    from pyspark_dist_explore_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select(F.col("vec_id"), similarity._unit(F.col("embedding")).alias("vv"))
    with pytest.raises(ValueError, match="id_col"):
        similarity.kmeans_centroids(v, 4, fit_sample_mod=4)
    # thin sample (500/64 < 8*16) falls back to the full corpus: the fit
    # still seeds all n_centroids clusters
    cents = similarity.kmeans_centroids(
        v, 16, id_col="vec_id", fit_sample_mod=64
    ).collect()
    assert len(cents) == 16
    # healthy sample: deterministic hash-sample fit, still n_centroids rows
    cents2 = similarity.kmeans_centroids(v, 8, id_col="vec_id", fit_sample_mod=4).collect()
    assert len(cents2) == 8


def test_bmp_codec_roundtrip():
    import numpy as np
    from pyspark_dist_explore_spark.operators import multimodal

    px = multimodal._doc_pixels(7, 0, width=5, height=3)  # odd width → row padding
    data = multimodal.encode_bmp(px)
    assert data[:2] == b"BM"
    decoded = multimodal.decode_bmp(data)
    assert decoded.shape == (3, 5, 3)
    assert np.array_equal(decoded, px)
    # concatenated frames split on the self-declared byte length
    clip = data + multimodal.encode_bmp(multimodal._doc_pixels(7, 1, 5, 3))
    frames = multimodal.split_bmp_frames(clip)
    assert len(frames) == 2 and frames[0] == data
    # decode_bmp on the clip returns the FIRST frame (trailing bytes ignored)
    assert np.array_equal(multimodal.decode_bmp(clip), px)
    # a frame whose declared size overruns the buffer raises instead of
    # silently returning a truncated (corrupt) final frame
    with pytest.raises(ValueError, match="truncated frame"):
        multimodal.split_bmp_frames(clip[:-10])


def test_wav_codec_roundtrip_and_audio_features(spark):
    import numpy as np
    from pyspark_dist_explore_spark.operators import multimodal

    samples = multimodal._doc_samples(7, 1000)
    data = multimodal.encode_wav(samples, 8000)
    rate, decoded = multimodal.decode_wav(data)
    assert rate == 8000 and np.array_equal(decoded, samples)

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    payload = multimodal.attach_audio_payload(docs, "doc_id", n_samples=1000)
    feats = {r["doc_id"]: r for r in multimodal.audio_features(payload).collect()}
    for d in (1, 2):
        s = multimodal._doc_samples(d, 1000).astype(float)
        assert feats[d]["n_samples"] == 1000
        assert feats[d]["duration_s"] == 1000 / 8000
        assert feats[d]["rms"] == pytest.approx(float(np.sqrt(np.mean(s * s))))
        assert feats[d]["peak"] == int(np.max(np.abs(s)))
    # decimation halves the sample count and rate (duration preserved)
    half = {r["doc_id"]: r for r in multimodal.audio_features(payload, every_n=2).collect()}
    assert half[1]["n_samples"] == 500 and half[1]["sample_rate"] == 4000
    assert half[1]["duration_s"] == feats[1]["duration_s"]
    # non-dividing every_n: duration stays exact (pre-decimation count /
    # original rate) — ceil(1000/3)*3/8000 would overstate by 2 samples
    third = {r["doc_id"]: r for r in multimodal.audio_features(payload, every_n=3).collect()}
    assert third[1]["n_samples"] == 334  # ceil(1000/3)
    assert third[1]["duration_s"] == 1000 / 8000


def test_extract_features_partial_decode_merges_per_row(spark):
    from pyspark_dist_explore_spark.operators import multimodal

    docs = spark.createDataFrame([(1, "aa"), (2, "bb")], ["doc_id", "text"])
    payload = multimodal.attach_binary_payload(docs, "text", "doc_id")

    def decode(b: bytes) -> dict:
        # mixed batch: only payload b"aa" reports a modality, nobody
        # reports content_hash, and doc_id must be un-overridable
        d = {"doc_id": -99}
        if b == b"aa":
            d["modality"] = "image"
        return d

    rows = {r["doc_id"]: r for r in multimodal.extract_features(payload, decode=decode).collect()}
    assert set(rows) == {1, 2}  # doc_id never overridden by decode
    assert rows[1]["modality"] == "image"
    assert rows[2]["modality"] == "text"  # default kept, not NULLed
    for r in rows.values():  # defaults preserved where decode lacks the key
        assert r["content_hash"] is not None and r["n_bytes"] == 2


def test_binary_file_ingestion_roundtrip(spark, tmp_path):
    """Files on disk → binaryFile source → decoder: the production path."""
    import numpy as np
    from pyspark_dist_explore_spark.operators import multimodal

    d = multimodal.write_media_fixture(str(tmp_path / "wav"), [3, 7], n_samples=1000)
    ingested = multimodal.read_binary_media(spark, d + "/*.wav")
    rows = {r["doc_id"]: r for r in ingested.collect()}
    assert set(rows) == {3, 7}
    # the ingested bytes ARE the encoded payload (bit-exact round trip)
    assert bytes(rows[3]["payload"]) == multimodal.encode_wav(
        multimodal._doc_samples(3, 1000), 8000
    )
    assert rows[3]["meta"]["size"] == len(bytes(rows[3]["payload"]))
    # and they decode through the normal feature path
    feats = {r["doc_id"]: r for r in multimodal.audio_features(ingested).collect()}
    s = multimodal._doc_samples(7, 1000).astype(float)
    assert feats[7]["rms"] == pytest.approx(float(np.sqrt(np.mean(s * s))))
    # idempotent rewrite leaves files alone
    multimodal.write_media_fixture(str(tmp_path / "wav"), [3, 7], n_samples=1000)
    assert ingested.count() == 2


def test_media_fixture_rewrites_on_param_change(spark, tmp_path):
    """Idempotency keys on CONTENT: re-calling with different payload
    parameters must rewrite stale files, not silently serve old ones."""
    from pyspark_dist_explore_spark.operators import multimodal

    d = multimodal.write_media_fixture(str(tmp_path / "wav"), [3], n_samples=4000)
    multimodal.write_media_fixture(str(tmp_path / "wav"), [3], n_samples=1000)
    [row] = multimodal.read_binary_media(spark, d + "/*.wav").collect()
    assert bytes(row["payload"]) == multimodal.encode_wav(
        multimodal._doc_samples(3, 1000), 8000
    )


def test_binary_media_unparseable_names(spark, tmp_path):
    """Non-matching file names: dropped by an explicit filter by default,
    job failure under strict=True — never silent NULL doc_ids."""
    from pyspark_dist_explore_spark.operators import multimodal

    d = multimodal.write_media_fixture(str(tmp_path / "wav"), [3], n_samples=500)
    (tmp_path / "wav" / "sample.wav").write_bytes(b"not keyed by doc id")
    ingested = multimodal.read_binary_media(spark, d + "/*.wav")
    assert [r["doc_id"] for r in ingested.collect()] == [3]
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="does not match id_regex"):
        multimodal.read_binary_media(spark, d + "/*.wav", strict=True).collect()
    # a regex whose group 1 MATCHES but is not an integer must also fail
    # strict mode (and be dropped by default), not emit NULL doc_ids
    loose = r"([a-z0-9]+)\.\w+$"
    assert multimodal.read_binary_media(spark, d + "/*.wav", id_regex=loose).count() == 1
    with pytest.raises(SparkRuntimeException, match="not an integer"):
        multimodal.read_binary_media(
            spark, d + "/*.wav", id_regex=loose, strict=True
        ).collect()


def test_multimodal_real_decode_resize_and_frames(spark):
    import numpy as np
    from pyspark_dist_explore_spark.operators import multimodal

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    payload = multimodal.attach_image_payload(docs, "doc_id", width=16, height=12, n_frames=3)
    resized = multimodal.resize_images(
        payload, width=8, height=8, decoder=multimodal.decode_bmp
    ).collect()
    assert {(r["width"], r["height"]) for r in resized} == {(8, 8)}
    # the hash is over the REAL resized pixels — recompute driver-side
    import hashlib

    expected = {
        d: hashlib.md5(
            multimodal.resize_nearest(
                multimodal._doc_pixels(d, 0, 16, 12), 8, 8
            ).tobytes()
        ).hexdigest()
        for d in (1, 2)
    }
    assert {r["doc_id"]: r["pixels_hash"] for r in resized} == expected
    frames = multimodal.sample_frames(payload, every_n=2, max_frames=3).collect()
    # 3-frame clips sampled every 2nd frame → frames 0 and 2 per doc
    assert len(frames) == 4
    assert sorted({r["frame_idx"] for r in frames}) == [0, 2]
    f0 = {r["doc_id"]: r["frame_hash"] for r in frames if r["frame_idx"] == 0}
    assert f0[1] == hashlib.md5(multimodal._doc_pixels(1, 0, 16, 12).tobytes()).hexdigest()
    # metadata-only fallback still runs for undecodable payloads
    text_payload = multimodal.attach_binary_payload(
        spark.createDataFrame([(1, "hello")], ["doc_id", "text"]), "text", "doc_id"
    )
    fallback = multimodal.resize_images(text_payload).collect()
    assert len(fallback) == 1 and fallback[0]["width"] == 224


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_minhash_verify_agrees_with_exact_jaccard(spark, hash_fn):
    """Cross-operator consistency: every LSH-verified near-dup pair must
    carry the SAME jaccard value the exact all-pairs operator computes,
    and be a subset of it (banding can only miss pairs, never invent or
    mis-score them) — for both the xxhash64 and md5 hash families."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "entirely unrelated content goes right here now"),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs_exact(docs, "text", "doc_id", threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_neardup(
            docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=16, shingle_n=1,
            hash_fn=hash_fn,
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert exact[pair] == j
    assert (1, 5) in lsh and lsh[(1, 5)] == 1.0  # identical docs always collide


def test_minhash_md5_double_hash_matches_duckdb(spark):
    """The md5-variant's h_i = h1 + i·h2 values must be bit-identical to
    the DuckDB twin's arithmetic — the minhash oracle rests on this."""
    import duckdb

    shingles = ["the quick brown", "héllo wörld x", "a", "x y z"]
    df = spark.createDataFrame([(s,) for s in shingles], ["sh"])
    h1 = F.conv(F.substring(F.md5("sh"), 1, 12), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5("sh"), 13, 12), 16, 10).cast("bigint")
    got = {
        r["sh"]: [r[f"h{i}"] for i in range(4)]
        for r in df.select(
            "sh", *[(h1 + F.lit(i) * h2).alias(f"h{i}") for i in range(4)]
        ).collect()
    }
    con = duckdb.connect()
    for s in shingles:
        want = con.execute(
            """SELECT list_transform([0,1,2,3], i ->
                 ('0x' || substr(md5(?),1,12))::BIGINT
                 + i * ('0x' || substr(md5(?),13,12))::BIGINT)""",
            [s, s],
        ).fetchone()[0]
        assert got[s] == want, s


def test_tfidf_matches_sklearn_shape(spark):
    """Smoothed-idf formula check against a tiny hand-computed corpus."""
    import math

    from pyspark_dist_explore_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "cat sat"), (2, "cat ran"), (3, "dog ran ran")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["df_t"], r["tfidf"])
        for r in textstats.tfidf(docs, "text", "doc_id").collect()
    }
    # 'cat' appears in 2 of 3 docs; 'ran' tf=2 in doc 3
    assert rows[(1, "cat")][0:2] == (1, 2)
    assert rows[(3, "ran")][0:2] == (2, 2)
    idf_ran = math.log((3 + 1) / (2 + 1)) + 1
    assert rows[(3, "ran")][2] == round(2 * idf_ran, 6)


def test_tfidf_vectors_feed_similarity(spark):
    """tfidf_doc_vectors output plugs straight into the similarity ops."""
    from pyspark_dist_explore_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "spark engine shuffles data fast"),
            (2, "spark engine shuffles data fast"),  # exact dup of 1
            (3, "completely different words entirely here"),
        ],
        ["doc_id", "text"],
    )
    vocab = sorted(
        {r["term"] for r in textstats.term_frequencies(docs, "text", "doc_id").collect()}
    )
    vecs = textstats.tfidf_doc_vectors(docs, "text", "doc_id", vocab)
    pairs = similarity.cosine_neardup_pairs(
        vecs, threshold=0.99, id_col="doc_id", vec_col="vec", n_blocks=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    # unit-normalized: every non-empty doc vector has L2 norm 1
    import numpy as np

    for r in vecs.collect():
        assert abs(np.linalg.norm(r["vec"]) - 1.0) < 1e-9


def test_word2vec_doc_vectors(spark):
    """Seeded Word2Vec doc vectors: right shape, deterministic, and exact
    dups get identical vectors (average of the same word vectors)."""
    import numpy as np

    from pyspark_dist_explore_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "spark engine shuffles data fast"),
            (2, "spark engine shuffles data fast"),
            (3, "totally unrelated words appear here"),
        ],
        ["doc_id", "text"],
    )
    vecs = {
        r["doc_id"]: np.array(r["vec"])
        for r in textstats.word2vec_embeddings(
            docs, "text", "doc_id", vector_size=8
        ).collect()
    }
    assert set(vecs) == {1, 2, 3}
    assert all(v.shape == (8,) for v in vecs.values())
    assert np.allclose(vecs[1], vecs[2])  # identical docs → identical vectors


def test_minhash_ml_variant_finds_dups(spark):
    out = dedup.minhash_ml_neardup(_docs(spark), "text", "doc_id", threshold=0.7).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in found  # exact dups always share all buckets
    assert all(4 not in p for p in found)


def test_approx_sketches_within_error_bounds(spark):
    """The approximate sketches (X7c) stay inside their published error
    envelopes against exact answers on real data — the accuracy check the
    rows-only driver entry can't provide."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact_distinct = li.select("l_orderkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("acd"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(approx["acd"] - exact_distinct) / exact_distinct < 0.05  # 2% rsd, 2.5σ slack
    # percentile_approx with high accuracy lands within one quantity unit
    assert abs(approx["p50_approx"] - approx["p50_exact"]) <= 1.0

    hist = stats.histogram_approx(li, "l_extendedprice", bins=20).collect()
    n_valid = li.where(F.col("l_extendedprice").isNotNull()).count()
    assert sum(r["weight"] for r in hist) == pytest.approx(n_valid)  # weights conserve mass
    centers = [r["center"] for r in hist]
    assert centers == sorted(centers)  # adaptive bins come out ordered


def test_kde_curve_integrates_to_one(spark):
    import numpy as np
    from pyspark_dist_explore_spark.operators.histogram import compute_kde

    df = spark.createDataFrame([(float(v),) for v in np.linspace(0, 100, 500)], ["v"])
    pdf = (
        compute_kde([("v", df, "v")], num=200)
        .orderBy("i")
        .toPandas()
    )
    assert len(pdf) == 200
    # trapezoidal integral of the density over the grid ≈ 1 (mass beyond
    # the [min,max] grid tails is small but nonzero)
    integral = np.trapz(pdf["density"], pdf["x"])
    assert 0.9 < integral < 1.05
    assert (pdf["density"] >= 0).all()


def test_csv_json_sources_agree_with_parquet(spark, tmp_path):
    """The engine is source-agnostic: the same histogram over CSV, JSON
    and parquet copies of one table is identical."""
    from pyspark_dist_explore_spark.sources.tables import read_any

    src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    csv_p, json_p = str(tmp_path / "c_csv"), str(tmp_path / "c_json")
    src.write.mode("overwrite").option("header", "true").csv(csv_p)
    src.write.mode("overwrite").json(json_p)
    schema = "c_custkey bigint, c_acctbal double"
    expected = sorted(
        (r["bucket"], r["cnt"])
        for r in compute_histogram([("x", src, "c_acctbal")], bins=8).collect()
    )
    for fmt, path in [("csv", csv_p), ("json", json_p)]:
        df = read_any(spark, path, fmt, schema=schema)
        got = sorted(
            (r["bucket"], r["cnt"])
            for r in compute_histogram([("x", df, "c_acctbal")], bins=8).collect()
        )
        assert got == expected, fmt


def test_hash_split_deterministic_and_proportional(spark):
    from pyspark_dist_explore_spark.operators.sampling import hash_split

    df = spark.range(0, 20000).select(F.col("id"))
    a = {r["id"]: r["split"] for r in hash_split(df, "id").collect()}
    b = {r["id"]: r["split"] for r in hash_split(df, "id").collect()}
    assert a == b  # fully deterministic
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 20000 - 0.8) < 0.02
    assert abs(c["val"] / 20000 - 0.1) < 0.01
    assert abs(c["test"] / 20000 - 0.1) < 0.01


def test_hash_split_bad_fractions(spark):
    from pyspark_dist_explore_spark.operators.sampling import hash_split

    df = spark.range(10)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "id", fractions={"a": 0.5, "b": 0.4})


def test_minhash_staged_input_same_pairs(spark):
    """The staged shingle_rows= path must return the identical verified
    pair set as the fully-lazy derivation — it is an execution-shape
    change only."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("doc_id") < 300
    )
    lazy = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_neardup(docs, "text", "doc_id", threshold=0.8).collect()
    }
    rows = dedup.shingle_rows(docs, "text", "doc_id", 3).localCheckpoint()
    staged = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_neardup(
            docs, "text", "doc_id", threshold=0.8, shingle_rows=rows
        ).collect()
    }
    assert staged == lazy


def test_text_quality_still_oracle_green(spark):
    """Deregistered round 4 (subset of the merged text_stats profile)
    but still a public query — pin it."""
    from pyspark_dist_explore_spark.plans.llm_ops import (
        TEXT_QUALITY_ORACLE,
        q_text_quality,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_text_quality, TEXT_QUALITY_ORACLE)


def test_scrub_text_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.org or visit https://a.example/p?q=1 now"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "plain text, nothing sensitive"),
            (4, "two mails: a@b.io c@d.co and http://x.y"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.scrub_text(docs, "text", "doc_id").collect()}
    assert (out[1]["n_email"], out[1]["n_url"], out[1]["n_phone"]) == (1, 1, 0)
    assert "jo.doe" not in out[1]["scrubbed"] and "https://" not in out[1]["scrubbed"]
    assert out[1]["scrubbed"].count("<redacted>") == 2
    assert out[2]["n_phone"] == 1 and "555" not in out[2]["scrubbed"]
    assert out[3]["scrubbed"] == "plain text, nothing sensitive"
    assert out[4]["n_email"] == 2 and out[4]["n_url"] == 1


def test_scrub_patterns_match_duckdb_semantics(spark):
    """Counts and the scrubbed BYTES must agree between Spark (Java
    regex) and DuckDB (RE2) for the shared pattern set — the oracle's
    md5(scrubbed) hash rests on this."""
    import duckdb

    texts = [
        "mail jo.doe+x@example.org or https://a.example/p?q=1 now",
        "call +1 (555) 123-4567 or (020) 7946-0958 x",
        "a@b.io http://x.y +44 20 7946 0958",
        "nothing here",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: (r["n_email"], r["n_url"], r["n_phone"], r["scrubbed"])
        for r in textstats.scrub_text(df, "text", "i").withColumnRenamed("doc_id", "i").collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = []
        for _, pat in textstats.SCRUB_PATTERNS:
            want.append(
                con.execute("SELECT len(regexp_extract_all(?, ?))", [t, pat]).fetchone()[0]
            )
        scrubbed = t
        for _, pat in textstats.SCRUB_PATTERNS:
            scrubbed = con.execute(
                "SELECT regexp_replace(?, ?, '<redacted>', 'g')", [scrubbed, pat]
            ).fetchone()[0]
        assert got[i] == (*want, scrubbed), (i, t, got[i], (*want, scrubbed))


def test_repetition_signals_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct; bigram "a a" ×3 / 3
            (2, "the cat sat the cat ran"),  # 6 tok, 4 distinct; "the cat" ×2 / 5
            (3, "one"),              # single token → no bigram
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_signals(docs, "text", "doc_id").collect()
    }
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_token_frac"] == round(1 - 4 / 6, 6)
    assert out[2]["top_bigram_frac"] == 0.4
    assert out[3]["top_bigram_frac"] is None  # no bigram exists


def test_pack_sequences_cumsum_matches_duckdb(spark):
    """The cumsum packing mode is pure window SQL — pin it against the
    DuckDB rendering on the real documents table (pytest-level oracle;
    packing has no registry slot)."""
    from pyspark_dist_explore_spark.operators.packing import (
        pack_sequences,
        pack_sequences_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return pack_sequences(
            docs, "doc_id", text_col="text", max_tokens=512, buckets=8
        )

    oracle = pack_sequences_sql(
        "documents", "doc_id", max_tokens=512, buckets=8, norm_text_expr=norm
    )
    compare(spark, SF_SMOKE, build, oracle)


def test_pack_sequences_greedy_invariants(spark):
    """Greedy mode: every pack ≤ max_tokens (oversize docs ride alone),
    all docs packed exactly once, deterministic across runs."""
    from pyspark_dist_explore_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, (i * 37) % 900 + 1) for i in range(500)] + [(1000, 5000)],
        ["doc_id", "n_tok"],
    )
    out = pack_sequences(
        docs, "doc_id", token_count_col="n_tok", max_tokens=1000, buckets=4,
        mode="greedy",
    )
    rows = out.collect()
    assert len(rows) == 501 and len({r["doc_id"] for r in rows}) == 501
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        total = sum(r["n_tokens"] for r in members)
        if any(r["oversize"] for r in members):
            assert len(members) == 1, "oversize docs must ride alone"
        else:
            assert total <= 1000, f"pack {pid} holds {total} tokens"
    rows2 = pack_sequences(
        docs, "doc_id", token_count_col="n_tok", max_tokens=1000, buckets=4,
        mode="greedy",
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pack_sequences_utilization(spark):
    """Packing short docs at a generous budget must put multiple docs per
    pack (the point of packing) in both modes."""
    from pyspark_dist_explore_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(i, 100) for i in range(200)], ["doc_id", "n_tok"])
    for mode in ("cumsum", "greedy"):
        out = pack_sequences(
            docs, "doc_id", token_count_col="n_tok", max_tokens=1000, buckets=2,
            mode=mode,
        )
        n_packs = out.select("pack_id").distinct().count()
        # 200 docs × 100 tok at 1000 budget over 2 buckets → ≥9-10 docs/pack
        assert n_packs <= 22, (mode, n_packs)


def test_percentiles_quantity_still_oracle_green(spark):
    """Deregistered from the 50-entry window round 4 (merged into
    summary_stats' long format) but still a public query — pin it."""
    from pyspark_dist_explore_spark.plans.relational import (
        PERCENTILES_ORACLE,
        q_percentiles_quantity,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_percentiles_quantity, PERCENTILES_ORACLE)


def test_stratified_sample_hash_deterministic(spark):
    """The md5-bucket stratified sampler keeps the same SET every run,
    hits ~frac per stratum, drops unlisted strata, keeps frac=1 whole."""
    from pyspark_dist_explore_spark.operators.sampling import stratified_sample_hash

    df = spark.range(0, 30000).select(
        F.col("id"),
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")), (F.col("id") % 3 + 1).cast("int")).alias("s"),
    )
    fracs = {"a": 0.25, "b": 1.0}  # "c" unlisted → dropped
    kept1 = {r["id"] for r in stratified_sample_hash(df, "s", fracs, "id").collect()}
    kept2 = {r["id"] for r in stratified_sample_hash(df, "s", fracs, "id").collect()}
    assert kept1 == kept2  # the SET, not just the count, is stable
    by_stratum = {"a": 0, "b": 0, "c": 0}
    for i in kept1:
        by_stratum["abc"[i % 3]] += 1
    assert by_stratum["c"] == 0
    assert by_stratum["b"] == 10000  # frac 1.0 keeps every row
    assert abs(by_stratum["a"] / 10000 - 0.25) < 0.02


def test_stratified_sample_hash_bad_fraction(spark):
    from pyspark_dist_explore_spark.operators.sampling import stratified_sample_hash

    import pytest as _pytest

    df = spark.range(10).select(F.col("id"), F.lit("a").alias("s"))
    with _pytest.raises(ValueError, match="fractions"):
        stratified_sample_hash(df, "s", {"a": 1.5}, "id")


def test_temperature_resample_flattens_and_matches_duckdb(spark):
    """X24: expected kept counts track coeff·√n per group (temperature
    τ=0.5 flattening — the dominant group is downsampled hardest, a
    tiny group survives whole), the kept SET is run-stable and
    bit-identical to the DuckDB twin, and a new salt re-draws."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        temperature_resample,
        temperature_resample_sql,
    )

    # groups: big 20000, mid 2000, tiny 50 (tiny → keep-all branch)
    df = spark.range(0, 22050).select(
        F.col("id"),
        F.when(F.col("id") < 20000, "big")
        .when(F.col("id") < 22000, "mid")
        .otherwise("tiny")
        .alias("g"),
    )
    out1 = {r["id"] for r in temperature_resample(df, "g", "id", coeff=20.0).collect()}
    out2 = {r["id"] for r in temperature_resample(df, "g", "id", coeff=20.0).collect()}
    assert out1 == out2, "the kept SET is deterministic"
    by_g = {"big": 0, "mid": 0, "tiny": 0}
    for i in out1:
        by_g["big" if i < 20000 else "mid" if i < 22000 else "tiny"] += 1
    assert by_g["tiny"] == 50, "rate ≥ 1 keeps the whole group"
    # expected = coeff·√n: big 20·141.4≈2828, mid 20·44.7≈894
    assert abs(by_g["big"] - 2828) < 2828 * 0.1
    assert abs(by_g["mid"] - 894) < 894 * 0.15
    # flattening: natural ratio 10:1 compresses toward √10 ≈ 3.2:1
    assert 2.5 < by_g["big"] / by_g["mid"] < 4.0

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(22050)}).assign(
        g=lambda d: ["big" if i < 20000 else "mid" if i < 22000 else "tiny"
                     for i in d["id"]]))
    want = {r[0] for r in con.execute(
        "SELECT id FROM ("
        + temperature_resample_sql("SELECT id, g FROM t", "g", "id", coeff=20.0)
        + ")").fetchall()}
    con.close()
    assert out1 == want, "kept set bit-identical to the DuckDB twin"

    resalt = {r["id"] for r in
              temperature_resample(df, "g", "id", coeff=20.0, salt="temp1").collect()}
    assert resalt != out1, "a new salt is an independent re-draw"


def test_stratified_take_exact_counts_and_twin(spark):
    """X26: exactly min(target, n) rows per stratum — a hard cap, not a
    Bernoulli expectation; the kept SET is run-stable, bit-identical to
    the DuckDB twin, re-drawn under a new salt, and unlisted/zero
    strata drop entirely."""
    import duckdb

    from pyspark_dist_explore_spark.operators.sampling import (
        stratified_take_exact,
        stratified_take_exact_sql,
    )

    targets = {"en": 120, "es": 50, "zh": 100_000, "de": 0}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_take_exact(docs, "lang", "doc_id", targets).collect()
    )
    by_lang: dict[str, int] = {}
    for _, lang in got:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert by_lang["en"] == 120 and by_lang["es"] == 50, "exact caps"
    assert by_lang["zh"] == 74, "target > n keeps the whole stratum"
    assert "de" not in by_lang and "fr" not in by_lang, "zero/unlisted drop"

    again = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_take_exact(docs, "lang", "doc_id", targets).collect()
    )
    assert got == again, "the kept SET is deterministic"

    con = duckdb.connect()
    sql = stratified_take_exact_sql(
        "SELECT doc_id, lang FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')",
        "lang",
        "doc_id",
        targets,
    )
    want = sorted(
        map(tuple, con.execute("SELECT doc_id, lang FROM (" + sql + ")").fetchall())
    )
    con.close()
    assert got == want, "kept set bit-identical to the DuckDB twin"

    resalt = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_take_exact(
            docs, "lang", "doc_id", targets, salt="take1"
        ).collect()
    )
    assert resalt != got and len(resalt) == len(got), "new salt, same counts"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="targets"):
        stratified_take_exact(docs, "lang", "doc_id", {"en": -1})
    assert stratified_take_exact(docs, "lang", "doc_id", {}).count() == 0


def test_temperature_resample_tau_and_guards(spark):
    """τ=1 keeps the natural mix at a flat rate (general-τ pow path),
    NULL groups are dropped, and parameter guards raise."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.sampling import temperature_resample

    df = spark.range(0, 3000).select(
        F.col("id"),
        F.when(F.col("id") % 3 < 2, "x").otherwise("y").alias("g"),
    )
    # τ=1: rate = coeff·n^0 = coeff for every group → natural proportions
    kept = temperature_resample(df, "g", "id", coeff=0.5, tau=1.0).collect()
    by_g = {"x": 0, "y": 0}
    for r in kept:
        by_g[r["g"]] += 1
    assert abs(by_g["x"] / 2000 - 0.5) < 0.06
    assert abs(by_g["y"] / 1000 - 0.5) < 0.08

    withnull = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "id bigint, g string"
    )
    got = temperature_resample(withnull, "g", "id", coeff=10.0).collect()
    assert {r["id"] for r in got} == {1, 2}, "NULL groups have no mixture weight"

    with _pytest.raises(ValueError, match="coeff"):
        temperature_resample(df, "g", "id", coeff=0.0)
    with _pytest.raises(ValueError, match="tau"):
        temperature_resample(df, "g", "id", coeff=1.0, tau=1.5)


def test_zero_vector_scores_zero_not_crash(spark):
    v = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    q = v.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    rows = similarity.exact_topk(v, q, k=2).collect()
    assert all(r["cos_sim"] == 0.0 for r in rows)  # zero vector ⊥ everything


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest
    from pyspark_dist_explore_spark.operators.joins import salted_join

    big = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("p"))
    small = spark.range(2).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="right")


def test_describe_exact_single_scan(spark):
    """All columns in ONE aggregate job (review finding: was N scans)."""
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        stats.describe_exact(df, ["l_quantity", "l_extendedprice", "l_discount"]).explain(
            "formatted"
        )
    import re

    # formatted explain shows each node twice (tree + detail); count the
    # numbered detail headers, one per physical scan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan_buf.getvalue(), re.M)
    assert len(scans) == 1


def test_minhash_md5_num_hashes_overflow_guard(spark):
    """hash_fn='md5' must refuse num_hashes past the provably
    overflow-free double-hashing bound (Spark would wrap silently where
    DuckDB raises — the exact divergence the md5 variant exists to
    prevent); xxhash64 stays unrestricted."""
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="4096"):
        dedup.minhash_signatures(
            docs, "text", "doc_id", num_hashes=5000, hash_fn="md5"
        )
    # the boundary value and the xxhash64 path build fine (no action run)
    dedup.minhash_signatures(docs, "text", "doc_id", num_hashes=64, hash_fn="md5")
    dedup.minhash_signatures(docs, "text", "doc_id", num_hashes=5000)


def test_shuffle_shards_matches_duckdb(spark):
    """The deterministic training shuffle (global pseudo-random order →
    balanced shards → within-shard positions) is pure hash + window SQL;
    pin it against the DuckDB twin on the documents table."""
    from pyspark_dist_explore_spark.operators.sampling import (
        shuffle_shards,
        shuffle_shards_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return shuffle_shards(
            docs.select("doc_id", "source"), "doc_id", shards=8
        )

    oracle = shuffle_shards_sql(
        "SELECT doc_id, source FROM documents",
        "doc_id",
        shards=8,
        out_cols=["doc_id", "source"],
    )
    compare(spark, SF_SMOKE, build, oracle)


def test_shuffle_shards_invariants(spark):
    """Shards are hash-balanced, positions are 1..n_shard dense, the
    order de-correlates from the input order, and a different salt gives
    an independent reshuffle while the same salt reproduces exactly."""
    from pyspark_dist_explore_spark.operators.sampling import shuffle_shards

    df = spark.range(2000).withColumnRenamed("id", "k")
    out = shuffle_shards(df, "k", shards=8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(8))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes), sizes  # hash-balanced
    for rows in by_shard.values():
        assert sorted(r.pos for r in rows) == list(range(1, len(rows) + 1))
    # de-correlated: consecutive ids rarely stay adjacent in shard order
    shard0 = sorted(by_shard[0], key=lambda r: r.pos)
    adjacent = sum(
        1 for a, b in zip(shard0, shard0[1:]) if abs(a.k - b.k) == 1
    )
    assert adjacent < len(shard0) / 10, adjacent
    again = shuffle_shards(df, "k", shards=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = {
        r.k: (r.shard, r.pos)
        for r in shuffle_shards(df, "k", shards=8, salt="epoch2").collect()
    }
    moved = sum(1 for r in out if other[r.k] != (r.shard, r.pos))
    assert moved > len(out) * 0.9, moved  # independent reshuffle


def test_incremental_dedup_bloom_equals_plain(spark):
    """The Bloom-prefilter path must return EXACTLY the plain anti-join
    result — tiny bitmaps force heavy false-positive traffic through the
    verify branch, which must weed them without dropping anything."""
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    new = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    seen = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(F.md5(dedup.normalize_text(F.col("text"))).alias("fingerprint"))
    )
    plain = sorted(
        map(tuple, dedup.incremental_dedup(new, seen, "text", "doc_id").collect())
    )
    assert plain, "plain path returned nothing — fixture degenerate"
    for bits in (256, 65536):
        bloom = sorted(
            map(
                tuple,
                dedup.incremental_dedup(
                    new, seen, "text", "doc_id", bloom_bits=bits
                ).collect(),
            )
        )
        assert bloom == plain, f"bloom path diverged at bits={bits}"


def test_incremental_dedup_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    seen = spark.createDataFrame([("x",)], ["fingerprint"])
    with pytest.raises(ValueError, match="multiple of 64"):
        dedup.incremental_dedup(docs, seen, "text", "doc_id", bloom_bits=100)
    with pytest.raises(ValueError, match="hashes"):
        dedup.incremental_dedup(
            docs, seen, "text", "doc_id", bloom_bits=256, bloom_hashes=17
        )


def test_deregistered_json_extract_matches_duckdb(spark):
    """json_extract_events was merged into events_window_agg (round 5);
    the original builder stays callable with its oracle pinned here."""
    from pyspark_dist_explore_spark.plans.relational import (
        JSON_EXTRACT_ORACLE,
        q_json_extract_events,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_json_extract_events, JSON_EXTRACT_ORACLE)


def test_deregistered_part_queries_match_duckdb(spark):
    """scalar_funcs_part and unpivot_part_metrics were merged into the
    registered scalar_unpivot_part (round 5); the original builders stay
    callable with their oracles pinned here."""
    from pyspark_dist_explore_spark.plans.extended import (
        UNPIVOT_PART_ORACLE,
        q_unpivot_part_metrics,
    )
    from pyspark_dist_explore_spark.plans.relational import (
        SCALAR_FUNCS_PART_ORACLE,
        q_scalar_funcs_part,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_scalar_funcs_part, SCALAR_FUNCS_PART_ORACLE)
    compare(spark, SF_SMOKE, q_unpivot_part_metrics, UNPIVOT_PART_ORACLE)


def test_deregistered_join_queries_match_duckdb(spark):
    """join_semi_anti and join_left_outer were merged into the registered
    join_variants (round 5, freeing a slot for corpus_shuffle_shards);
    the original builders stay callable with their oracles pinned here."""
    from pyspark_dist_explore_spark.plans.extended import (
        JOIN_LEFT_OUTER_ORACLE,
        JOIN_SEMI_ANTI_ORACLE,
        q_join_left_outer,
        q_join_semi_anti,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_join_semi_anti, JOIN_SEMI_ANTI_ORACLE)
    compare(spark, SF_SMOKE, q_join_left_outer, JOIN_LEFT_OUTER_ORACLE)


def test_token_budget_stratified_semantics(spark):
    """Direct semantics pin for select_by_token_budget_stratified:
    budgets admit whole quality bins from the top until the budget
    fills; zero budget keeps nothing; missing strata are dropped."""
    from pyspark_dist_explore_spark.operators.sampling import (
        select_by_token_budget_stratified,
    )

    rows = [
        # (id, stratum, quality, tokens)
        (1, "a", 0.9, 100),
        (2, "a", 0.8, 100),
        (3, "a", 0.7, 100),
        (4, "b", 0.9, 100),
        (5, "b", 0.1, 100),
        (6, "c", 0.99, 50),
    ]
    df = spark.createDataFrame(rows, ["id", "s", "q", "tok"])
    out = select_by_token_budget_stratified(
        df, "s", "q", "tok", {"a": 200, "b": 0}, bins=10
    )
    kept = sorted(r.id for r in out.collect())
    # a: bins 9 (q=.9) then 8 (q=.8) fill 200 exactly; bin 7 would exceed.
    # b: zero budget -> nothing. c: not in budgets -> dropped.
    assert kept == [1, 2]


def test_pack_sequences_bucket_bounds(spark):
    """buckets draws 16 hash bits — >65536 would silently leave buckets
    empty, so it must raise instead."""
    import pytest as _pytest
    from pyspark_dist_explore_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(1, 10)], ["doc_id", "n_tok"])
    for bad in (0, 65537):
        with _pytest.raises(ValueError, match="65536"):
            pack_sequences(
                docs, "doc_id", token_count_col="n_tok", buckets=bad
            )
    pack_sequences(docs, "doc_id", token_count_col="n_tok", buckets=65536)


def test_pack_sequences_rejects_uncastable_ids(spark):
    """A non-numeric string id must fail the job loudly, not silently
    collapse to NULL doc_ids (which would break ordering and dedup)."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [("a", 10), ("7", 20)], ["doc_id", "n_tok"]
    )
    from pyspark_dist_explore_spark.operators.packing import pack_sequences

    out = pack_sequences(docs, "doc_id", token_count_col="n_tok")
    with _pytest.raises(Exception, match="not castable"):
        out.collect()
    # numeric strings cast cleanly
    ok = spark.createDataFrame([("7", 20), ("8", 30)], ["doc_id", "n_tok"])
    rows = pack_sequences(ok, "doc_id", token_count_col="n_tok").collect()
    assert {r["doc_id"] for r in rows} == {7, 8}


def test_stratified_sample_hash_null_key_cross_engine(spark):
    """NULL keys/strata must hash identically in Spark and DuckDB (both
    coalesce to '' explicitly — concat_ws vs concat NULL semantics would
    otherwise diverge), and quoted stratum names must render as valid
    escaped SQL literals."""
    import duckdb

    from pyspark_dist_explore_spark.operators.sampling import (
        stratified_sample_hash,
        stratified_sample_hash_sql,
    )

    fracs = {"a": 0.5, "o'brien": 0.5}
    data = [(i, "a" if i % 2 else "o'brien") for i in range(200)] + [
        (None, "a"),
        (None, "o'brien"),
        (7777, None),  # NULL stratum → dropped on both engines
    ]
    df = spark.createDataFrame(data, ["k", "s"])
    kept_spark = sorted(
        (r["k"] if r["k"] is not None else -1, r["s"])
        for r in stratified_sample_hash(df, "s", fracs, "k").collect()
    )
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (k BIGINT, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", data)
        pred = stratified_sample_hash_sql("s", "k", fracs)
        duck = con.execute(f"SELECT k, s FROM t WHERE {pred}").fetchall()
    finally:
        con.close()
    kept_duck = sorted((k if k is not None else -1, s) for k, s in duck)
    assert kept_spark == kept_duck
    assert kept_spark  # the sampler kept something (frac 0.5 strata)


def test_shingle_rows_matches_array_form(spark):
    """The relational lead-window gram build (round-5 rewrite, ~3-4×
    faster) must produce the IDENTICAL distinct (doc_id, sh) set as the
    expression-level `shingles()` array builder it replaced, including
    short-doc whole-gram and empty-text edge cases."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "short doc"),
            (3, "one"),
            (4, ""),
            (5, "  spaced   out   tokens  here "),
            (6, "dup dup dup dup"),
        ],
        ["doc_id", "text"],
    )
    for n in (1, 3, 5, 13):
        fast = {
            (r["doc_id"], r["sh"])
            for r in dedup.shingle_rows(docs, "text", "doc_id", n).collect()
        }
        slow = {
            (r["doc_id"], r["sh"])
            for r in docs.select(
                "doc_id", F.explode(dedup.shingles(F.col("text"), n)).alias("sh")
            )
            .where(F.col("sh") != "")
            .collect()
        }
        assert fast == slow, f"n={n}: {fast ^ slow}"
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fast = {
        (r["doc_id"], r["sh"])
        for r in dedup.shingle_rows(real, "text", "doc_id", 3).collect()
    }
    slow = {
        (r["doc_id"], r["sh"])
        for r in real.select(
            "doc_id", F.explode(dedup.shingles(F.col("text"), 3)).alias("sh")
        )
        .where(F.col("sh") != "")
        .collect()
    }
    assert fast == slow


def test_select_by_token_budget_exact_semantics(spark):
    """Budgeted quality selection must equal the Python reference (whole
    highest-quality bins admitted while cumulative tokens <= budget) on
    real profiled documents, stay within budget, and be deterministic."""
    from pyspark_dist_explore_spark.operators.sampling import select_by_token_budget

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    profile = textstats.text_profile(docs, "text", "doc_id").select(
        "doc_id", "quality", "n_tokens"
    )
    rows = profile.collect()
    bins, budget = 1000, 5000
    by_bin = {}
    for r in rows:
        qb = min(bins - 1, max(0, int(r["quality"] * bins)))
        by_bin.setdefault(qb, [0, []])
        by_bin[qb][0] += r["n_tokens"]
        by_bin[qb][1].append(r["doc_id"])
    expected, cum = set(), 0
    for qb in sorted(by_bin, reverse=True):
        cum += by_bin[qb][0]
        if cum > budget:
            break
        expected.update(by_bin[qb][1])
    out = select_by_token_budget(profile, "quality", "n_tokens", budget, bins=bins)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == expected
    tok = sum(r["n_tokens"] for r in rows if r["doc_id"] in kept)
    assert tok <= budget
    assert kept, "a 5k-token budget on 500 docs must admit something"
    kept2 = {
        r["doc_id"]
        for r in select_by_token_budget(
            profile, "quality", "n_tokens", budget, bins=bins
        ).collect()
    }
    assert kept2 == kept  # deterministic
    # degenerate budgets
    assert (
        select_by_token_budget(profile, "quality", "n_tokens", 0, bins=bins).count()
        == 0
    )
    big = select_by_token_budget(
        profile, "quality", "n_tokens", 10**12, bins=bins
    ).count()
    assert big == len(rows)


def test_select_by_token_budget_stratified(spark):
    """Per-stratum budgeted selection: each language fills its own token
    budget independently (Python-reference equality per stratum),
    unlisted strata drop, and the whole thing is one plan."""
    from pyspark_dist_explore_spark.operators.sampling import (
        select_by_token_budget_stratified,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    profile = (
        textstats.text_profile(docs, "text", "doc_id")
        .select("doc_id", "quality", "n_tokens")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    rows = profile.collect()
    bins = 1000
    budgets = {"en": 3000, "de": 1500}
    expected = set()
    for lang, budget in budgets.items():
        by_bin = {}
        for r in rows:
            if r["lang"] != lang:
                continue
            qb = min(bins - 1, max(0, int(r["quality"] * bins)))
            by_bin.setdefault(qb, [0, []])
            by_bin[qb][0] += r["n_tokens"]
            by_bin[qb][1].append(r["doc_id"])
        cum = 0
        for qb in sorted(by_bin, reverse=True):
            cum += by_bin[qb][0]
            if cum > budget:
                break
            expected.update(by_bin[qb][1])
    out = select_by_token_budget_stratified(
        profile, "lang", "quality", "n_tokens", budgets, bins=bins
    )
    kept_rows = out.collect()
    assert {r["doc_id"] for r in kept_rows} == expected
    assert {r["lang"] for r in kept_rows} <= set(budgets)
    for lang, budget in budgets.items():
        tok = sum(r["n_tokens"] for r in kept_rows if r["lang"] == lang)
        assert tok <= budget, (lang, tok)
    # empty budgets → empty result, not an error
    assert (
        select_by_token_budget_stratified(
            profile, "lang", "quality", "n_tokens", {}
        ).count()
        == 0
    )


def test_chunk_documents_reference_semantics(spark):
    """Chunking must match the Python reference exactly: stride windows
    over the normalized token stream, every chunk <= max_tokens,
    overlap carried, empty docs yield one empty chunk, and the
    chunk->pack composition packs long docs instead of oversizing."""
    from pyspark_dist_explore_spark.operators.packing import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    docs = docs.unionByName(
        spark.createDataFrame([(9001, ""), (9002, "  one  two  ")], ["doc_id", "text"])
        .join(docs.limit(0), ["doc_id", "text"], "left_anti")
        .select("doc_id", "text", *[F.lit(None).cast(docs.schema[c].dataType).alias(c) for c in docs.columns if c not in ("doc_id", "text")])
    )
    max_tokens, overlap = 30, 5
    stride = max_tokens - overlap
    out = chunk_documents(
        docs, "text", "doc_id", max_tokens=max_tokens, overlap=overlap
    ).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"]) for r in out}
    import re as _re

    expected = {}
    for r in docs.select("doc_id", "text").collect():
        toks = _re.sub(r"\s+", " ", (r["text"] or "").lower()).strip()
        toks = toks.split(" ") if toks else []
        n = len(toks)
        n_chunks = max(1, 1 + -(-(n - max_tokens) // stride)) if n > max_tokens else 1
        for ci in range(n_chunks):
            ch = toks[ci * stride : ci * stride + max_tokens]
            expected[(r["doc_id"], ci)] = (len(ch), " ".join(ch))
    assert got == expected
    assert all(n <= max_tokens for n, _ in got.values())
    # composition: chunks pack without oversize flags
    chunks = chunk_documents(docs, "text", "doc_id", max_tokens=max_tokens)
    packed = pack_sequences(
        chunks.select(
            (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("cid"), "n_tokens"
        ),
        "cid",
        token_count_col="n_tokens",
        max_tokens=max_tokens,
    )
    assert packed.where(F.col("oversize") == 1).count() == 0


def test_chunk_documents_validation(spark):
    import pytest as _pytest
    from pyspark_dist_explore_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "text", "doc_id", max_tokens=10, overlap=10)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(docs, "text", "doc_id", max_tokens=0)


# --------------------------------------------------------------------------
# int8 embedding quantization (similarity.quantize_embeddings)
# --------------------------------------------------------------------------


def test_quantize_codes_match_duckdb(spark):
    """The affine int8 codes are deterministic arithmetic — the whole
    (minmax → scale → round) chain must be bit-identical to the DuckDB
    twin at every position of every vector."""
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        quantize_embeddings,
        quantize_codes_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        mm = dimension_minmax(emb, vec_col="embedding")
        return quantize_embeddings(emb, mm, id_col="vec_id", vec_col="embedding").select(
            "vec_id", "codes"
        )

    compare(
        spark,
        SF_SMOKE,
        build,
        quantize_codes_sql("SELECT vec_id, embedding FROM embeddings"),
    )


def test_quantize_pack_roundtrip_and_error_bound(spark):
    """packed is a pure byte re-encode of codes (exact round-trip), and
    dequantization error is bounded by half a step per dimension."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        quantize_embeddings,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    mm = dimension_minmax(emb)
    quant = quantize_embeddings(emb, mm, id_col="vec_id").withColumnRenamed(
        "vec_id", "qid"
    )
    rows = (
        quant.join(emb, quant.qid == emb.vec_id)
        .select("codes", "packed", "embedding")
        .limit(200)
        .collect()
    )
    mm_rows = sorted(mm.collect(), key=lambda r: r.dim)
    lo = np.array([r.lo for r in mm_rows])
    hi = np.array([r.hi for r in mm_rows])
    step = (hi - lo) / 255.0
    assert len(rows) == 200
    for r in rows:
        assert list(np.frombuffer(r.packed, dtype=np.uint8)) == r.codes
        x = np.array(r.embedding, dtype=np.float64)
        xq = lo + np.array(r.codes, dtype=np.float64) * step
        assert np.all(np.abs(x - xq) <= step / 2 + 1e-9)


def test_topk_quantized_recall_vs_exact(spark):
    """8-bit quantization must preserve neighbor structure: recall@5 of
    the packed-code scan vs the exact float scan ≥ 0.9 (measured; the
    memory win is 4-8x, the recall cost should be ~none)."""
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        exact_topk,
        quantize_embeddings,
        topk_quantized,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = exact_topk(emb, queries, k=5)
    mm = dimension_minmax(emb)
    quant = topk_quantized(quantize_embeddings(emb, mm), mm, queries, k=5)
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}
    got = {(r.query_id, r.vec_id) for r in quant.collect()}
    assert len(truth) == 25 and len(got) == 25
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"quantized recall@5 {recall} < 0.9"


def test_ivf_packed_full_probe_equals_packed_scan(spark):
    """ivf_topk_packed with n_probe == n_centroids scans every inverted
    list, so it must reproduce the brute-force packed scan bit-for-bit
    — the end-to-end correctness pin for the composed (IVF x int8)
    scale path."""
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        ivf_topk_packed,
        quantize_embeddings,
        topk_quantized,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mm = dimension_minmax(emb)
    quant = quantize_embeddings(emb, mm)
    full = ivf_topk_packed(
        quant, mm, queries, k=5, n_centroids=8, n_probe=8, fit_sample_mod=None
    )
    flat = topk_quantized(quant, mm, queries, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, flat.collect()))


def test_ivf_packed_recall_floor(spark):
    """Probing 4/16 lists over packed codes keeps recall@5 >= 0.4 vs the
    exact float scan (float IVF measures ~0.5 at the same setting; the
    8-bit step costs ~nothing on top)."""
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        exact_topk,
        ivf_topk_packed,
        quantize_embeddings,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mm = dimension_minmax(emb)
    quant = quantize_embeddings(emb, mm)
    got = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_packed(
            quant, mm, queries, k=5, n_centroids=16, n_probe=4
        ).collect()
    }
    truth = {(r.query_id, r.vec_id) for r in exact_topk(emb, queries, k=5).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.4, f"packed IVF recall@5 {recall} < 0.4"


# --------------------------------------------------------------------------
# containment detection (dedup.containment_pairs)
# --------------------------------------------------------------------------


def test_containment_xxhash_variant_runs(spark):
    """The registered neardup_containment query (md5 variant) is
    oracle-checked by test_oracle_parity; the faster xxhash64 library
    default shares every stage but the gram hash — pin that it runs and
    emits the same SCHEMA (which grams winnow out is hash-dependent by
    design, so sets are pinned per-variant, not cross-variant)."""
    from pyspark_dist_explore_spark.operators.dedup import containment_pairs
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = containment_pairs(docs, "text", "doc_id", threshold=0.5, max_df=50)
    assert out.columns == [
        "id_a", "id_b", "shared", "n_a", "n_b", "containment_a", "containment_b",
    ]
    assert out.count() > 0


def test_containment_pairs_planted_asymmetric(spark):
    """A short doc pasted verbatim inside a much longer one must surface
    with containment ~1.0 for the short side while symmetric Jaccard
    (the minhash/simhash view) stays low — the case this operator
    exists for."""
    from pyspark_dist_explore_spark.operators.dedup import containment_pairs

    article = " ".join(f"word{i} token{i * 7 % 13}" for i in range(40))
    filler = " ".join(f"boiler{i} chrome{i * 3 % 11}" for i in range(400))
    rows = [
        (1, article),
        (2, filler[: len(filler) // 2] + " " + article + " " + filler[len(filler) // 2 :]),
        (3, "completely unrelated text " + " ".join(f"z{i}" for i in range(60))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r
        for r in containment_pairs(
            docs, "text", "doc_id", threshold=0.8, max_df=10
        ).collect()
    }
    assert (1, 2) in got, f"planted containment pair missing: {got.keys()}"
    r = got[(1, 2)]
    assert r.containment_a >= 0.9  # nearly all of doc 1's passages are in doc 2
    assert r.containment_b <= 0.5  # doc 2 is mostly its own bulk
    assert (1, 3) not in got and (2, 3) not in got


def test_quantize_saturates_new_vectors_against_saved_minmax(spark):
    """The incremental path: coding NEW vectors against a SAVED minmax
    must saturate out-of-range values to [0, 255] (never wrap in the
    uint8 pack) and code NULL elements to 0."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        quantize_embeddings,
    )

    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 10.0])], ["vec_id", "embedding"]
    )
    mm = dimension_minmax(base)
    newv = spark.createDataFrame(
        [(2, [5.0, -3.0]), (3, [None, 4.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(newv, mm).collect()}
    assert rows[2].codes == [255, 0]  # above hi saturates, below lo floors
    assert rows[3].codes[0] == 0  # NULL element codes to 0
    assert list(np.frombuffer(rows[2].packed, dtype=np.uint8)) == [255, 0]


def test_quantize_whole_null_embedding_yields_null_row(spark):
    """A row whose ENTIRE embedding is NULL must come out with NULL
    codes/packed (filterable), not crash the Arrow byte pack."""
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        quantize_embeddings,
    )

    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 10.0])], ["vec_id", "embedding"]
    )
    mm = dimension_minmax(base)
    newv = spark.createDataFrame(
        [(2, [0.5, 5.0]), (3, None)], "vec_id bigint, embedding array<double>"
    )
    rows = {r.vec_id: r for r in quantize_embeddings(newv, mm).collect()}
    assert rows[2].packed is not None
    assert rows[3].codes is None and rows[3].packed is None


def test_containment_pairs_validates_params(spark):
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="threshold"):
        containment_pairs(docs, "text", "doc_id", threshold=0.0)
    with _pytest.raises(ValueError, match="max_df"):
        containment_pairs(docs, "text", "doc_id", max_df=0)


def test_containment_staged_fp_rows_matches_lazy(spark):
    """fp_rows= staging is an execution-shape change only: staged and
    lazy agree row for row, and a wrong-schema fp_rows fails fast."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dedup import containment_pairs
    from pyspark_dist_explore_spark.operators.textstats import winnowing_fingerprints
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    lazy = containment_pairs(docs, "text", "doc_id", threshold=0.5, max_df=50)
    rows = winnowing_fingerprints(docs, "text", "doc_id", k=5, window=4).localCheckpoint()
    staged = containment_pairs(
        docs, "text", "doc_id", threshold=0.5, max_df=50, fp_rows=rows
    )
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, staged.collect()))
    with _pytest.raises(ValueError, match="fp_rows missing"):
        containment_pairs(
            docs, "text", "doc_id", fp_rows=rows.withColumnRenamed("fingerprint", "fp")
        )


# --------------------------------------------------------------------------
# distribution drift (stats.histogram_drift)
# --------------------------------------------------------------------------


def test_histogram_drift_matches_duckdb(spark):
    """The whole PSI chain (shared-range dense histogram over two frames
    -> pivot -> clamped ratios -> (p-q)ln(p/q)) hash-matches DuckDB at
    10 dp."""
    from pyspark_dist_explore_spark.operators.stats import histogram_drift
    from pyspark_dist_explore_spark.plans.queries import _hist_oracle
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        return histogram_drift(c, s, "c_acctbal", cur_col="s_acctbal", bins=20)

    hist_sql = _hist_oracle(
        [("ref", "customer", "c_acctbal"), ("cur", "supplier", "s_acctbal")],
        bins=20,
        dense=True,
    )
    oracle = f"""
WITH dense AS ({hist_sql}),
piv AS (
  SELECT bucket,
         COALESCE(max(CASE WHEN series = 'ref' THEN cnt END), 0) AS ref_cnt,
         COALESCE(max(CASE WHEN series = 'cur' THEN cnt END), 0) AS cur_cnt
  FROM dense GROUP BY bucket
),
tot AS (SELECT sum(ref_cnt) AS tr, sum(cur_cnt) AS tc FROM piv)
SELECT bucket, ref_cnt, cur_cnt,
       round(greatest(ref_cnt / tr, 1e-06), 10) AS p,
       round(greatest(cur_cnt / tc, 1e-06), 10) AS q,
       round((greatest(ref_cnt / tr, 1e-06) - greatest(cur_cnt / tc, 1e-06))
             * ln(greatest(ref_cnt / tr, 1e-06) / greatest(cur_cnt / tc, 1e-06)),
             10) AS psi
FROM piv, tot
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_histogram_drift_semantics(spark):
    """Identical snapshots score ~0; a shifted snapshot crosses the
    'shifted' rule-of-thumb threshold (0.25)."""
    from pyspark_dist_explore_spark.operators.stats import histogram_drift

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    same = histogram_drift(c, c, "c_acctbal", bins=20)
    psi_same = same.agg(F.sum("psi")).first()[0]
    assert abs(psi_same) < 1e-9
    shifted = c.select((F.col("c_acctbal") * 1.5 + 2000).alias("c_acctbal"))
    moved = histogram_drift(c, shifted, "c_acctbal", bins=20)
    psi_moved = moved.agg(F.sum("psi")).first()[0]
    assert psi_moved > 0.25, f"shifted distribution must flag drift, psi={psi_moved}"


# --------------------------------------------------------------------------
# unigram LM perplexity scoring (textstats.unigram_logprob_scores)
# --------------------------------------------------------------------------


def test_unigram_logprob_matches_duckdb(spark):
    """The full chain (tokenize -> self-trained Laplace unigram LM ->
    scaled-bigint per-doc logprob sum -> mean/ppl) hash-matches DuckDB
    — the fixed-point sum makes the float result partial-aggregation-
    order-independent, so no tolerance games are needed."""
    from pyspark_dist_explore_spark.operators.textstats import unigram_logprob_scores
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return unigram_logprob_scores(docs, "text", "doc_id")

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    oracle = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
),
lm AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM lm),
scored AS (
  SELECT tf.doc_id, sum(tf.tf) AS n_tok,
         sum(tf.tf * CAST(round(ln((COALESCE(lm.cnt, 0) + 1.0) / (tot.n + 1.0 * tot.v)) * 1e6)
                          AS BIGINT)) AS ssum
  FROM tf LEFT JOIN lm ON tf.term = lm.term, tot
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tok,
       CAST(umean_e6 AS DOUBLE) / 1e6 AS mean_logprob,
       round(exp(-(CAST(umean_e6 AS DOUBLE) / 1e6)), 6) AS ppl
FROM (
  SELECT doc_id, n_tok,
         CAST(round(CAST(ssum AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS BIGINT) AS umean_e6
  FROM scored
)
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_unigram_logprob_flags_gibberish(spark):
    """Scored against a reference LM, a gibberish doc must have much
    higher perplexity than in-distribution text; OOV smoothing keeps
    every score finite."""
    from pyspark_dist_explore_spark.operators.textstats import (
        term_frequencies,
        unigram_logprob_scores,
    )

    ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = term_frequencies(ref, "text", "doc_id").groupBy("term").agg(
        F.sum("tf").alias("cnt")
    )
    common_text = ref.limit(1).first().text
    probe = spark.createDataFrame(
        [(1, common_text), (2, "zxqv qqj wvvx kjzq pzzt mmqx " * 10)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in
            unigram_logprob_scores(probe, "text", "doc_id", lm_counts=lm).collect()}
    assert rows[2].ppl > 5 * rows[1].ppl, (rows[1].ppl, rows[2].ppl)
    assert all(r.ppl == r.ppl and r.ppl != float("inf") for r in rows.values())


def test_histogram_drift_empty_snapshot_is_max_drift(spark):
    """An empty current snapshot must score as (large, finite) drift —
    every bin's q clamps to eps — not crash on ANSI division by zero."""
    from pyspark_dist_explore_spark.operators.stats import histogram_drift

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    d = histogram_drift(c, c.where("1=0"), "c_acctbal", bins=10)
    psi = d.agg(F.sum("psi")).first()[0]
    assert psi == psi and psi != float("inf")
    assert psi > 0.25, f"empty snapshot must flag drift, psi={psi}"


# --------------------------------------------------------------------------
# line-level dedup (textstats.drop_repeated_lines)
# --------------------------------------------------------------------------


def test_drop_repeated_lines_matches_duckdb(spark):
    """Full-chain twin on synthetic multi-line docs: trimmed-line doc
    frequency, boilerplate drop, ordered rebuild — hash-identical to a
    hand-rolled DuckDB rendering."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.textstats import drop_repeated_lines

    rows = [
        (1, "unique first line\ncookie banner\nbody one\n\nfooter text"),
        (2, "another article\n  cookie banner\nbody two\nfooter text"),
        (3, "cookie banner\nfooter text"),
        (4, "totally original\n\n\nmore original"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        map(tuple, drop_repeated_lines(docs, "text", "doc_id", min_df=2).collect())
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute("""
WITH lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM docs
),
keyed AS (SELECT doc_id, pos, line, trim(line) AS key FROM lines),
common AS (
  SELECT key FROM keyed WHERE key <> ''
  GROUP BY key HAVING count(DISTINCT doc_id) >= 2
),
kept AS (SELECT k.* FROM keyed k ANTI JOIN common c ON k.key = c.key),
n_all AS (SELECT doc_id, count(*) AS n_all FROM keyed GROUP BY doc_id),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_lines_kept
  FROM kept GROUP BY doc_id
)
SELECT n_all.doc_id,
       COALESCE(rebuilt.text, '') AS text,
       CAST(COALESCE(n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(n_all - COALESCE(n_lines_kept, 0) AS BIGINT) AS n_lines_dropped
FROM n_all LEFT JOIN rebuilt USING (doc_id)
""").fetchall()))
    con.close()
    assert got == want


def test_drop_repeated_lines_semantics(spark):
    """Boilerplate lines vanish from every doc, unique bodies survive in
    order, blank lines are never treated as boilerplate, and an
    all-boilerplate doc becomes an empty husk."""
    from pyspark_dist_explore_spark.operators.textstats import drop_repeated_lines

    rows = [
        (1, "keep me\nshared footer\nalso mine"),
        (2, "other body\nshared footer"),
        (3, "shared footer"),
        (4, "a\n\nb"),
        (5, "c\n\nd"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           drop_repeated_lines(docs, "text", "doc_id", min_df=2).collect()}
    assert out[1].text == "keep me\nalso mine"
    assert out[1].n_lines_dropped == 1
    assert out[3].text == "" and out[3].n_lines_kept == 0
    assert out[4].text == "a\n\nb", "blank lines survive"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_df"):
        drop_repeated_lines(docs, "text", "doc_id", min_df=1)


# --------------------------------------------------------------------------
# vocabulary induction + OOV coverage (textstats.vocabulary/oov_stats, X25)
# --------------------------------------------------------------------------


def test_vocabulary_topv_tie_break_deterministic(spark):
    """The induced vocab is a pure function of the corpus: boundary ties
    resolve lexicographically (cnt DESC, tok ASC), so the same corpus
    yields the same V types on every run and engine."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import vocabulary

    # counts: a=3, then b=c=d=2 tied at the V=2 boundary, e=1
    docs = spark.createDataFrame(
        [(1, "a a a b b"), (2, "c c d d e")], ["doc_id", "text"]
    )
    v = [(r["tok"], r["cnt"]) for r in vocabulary(docs, "text", size=2).collect()]
    assert v == [("a", 3), ("b", 2)], "tie at the boundary goes to the first token"
    v3 = {r["tok"] for r in vocabulary(docs, "text", size=3).collect()}
    assert v3 == {"a", "b", "c"}
    with _pytest.raises(ValueError, match="size"):
        vocabulary(docs, "text", size=0)


def test_oov_stats_matches_duckdb_and_reference_vocab(spark):
    """Per-group integer coverage counts match the DuckDB twin on the
    real corpus; a supplied REFERENCE vocab (the tokenizer-coverage use
    case) is honored instead of inducing one; NULL groups coalesce."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        oov_stats,
        vocabulary,
        vocabulary_oov_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = vocabulary(docs, "text", size=16)
    got = sorted(
        map(tuple, oov_stats(docs, "text", "source", vocab).collect())
    )
    con = duckdb.connect()
    sql = vocabulary_oov_sql(
        "SELECT source, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')",
        "source",
        16,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert got == want
    assert any(r[2] > 0 for r in got), "V=16 must leave a real OOV tail"

    ref = spark.createDataFrame([("alpha",), ("beta",)], ["tok"])
    probe = spark.createDataFrame(
        [(1, "alpha beta gamma", None), (2, "alpha alpha", "g1")],
        "doc_id bigint, text string, grp string",
    )
    out = {r["group"]: r for r in oov_stats(probe, "text", "grp", ref).collect()}
    assert out[""]["in_vocab_tokens"] == 2 and out[""]["oov_tokens"] == 1
    assert out["g1"]["in_vocab_tokens"] == 2 and out["g1"]["oov_tokens"] == 0


# --------------------------------------------------------------------------
# duplicate-span removal (textstats.drop_duplicate_spans, X23)
# --------------------------------------------------------------------------


def test_drop_duplicate_spans_matches_duckdb(spark):
    """Full-chain twin on the real corpus: k-gram build, corpus-wide
    duplicate detection, coverage explode, ordered token rebuild — all
    columns (including the rebuilt text) identical to the DuckDB
    rendering at sf0.001."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        drop_duplicate_spans,
        drop_duplicate_spans_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        map(tuple, drop_duplicate_spans(docs, "text", "doc_id", k=8).collect())
    )
    con = duckdb.connect()
    sql = drop_duplicate_spans_sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')",
        k=8,
        min_count=2,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert got == want
    assert any(r[3] > 0 for r in got), "corpus must exercise actual span drops"


def test_drop_duplicate_spans_semantics(spark):
    """A span shared across docs vanishes from BOTH occurrences (the
    paper's remove-all rule); an INTRA-doc repeated phrase is dropped
    from both positions; docs shorter than k are never touched; empty
    docs survive as husks; parameter guards raise."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import drop_duplicate_spans

    span = "the quick brown fox jumps over the lazy dog ran"  # 10 tokens
    p8 = "red orange yellow green blue indigo violet ultraviolet"  # 8 tokens
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"one two three {span}"),
        (3, f"{p8} x {p8}"),
        (4, "short doc only"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in drop_duplicate_spans(docs, "text", "doc_id", k=8).collect()
    }
    # 10-token shared span → 3 duplicated 8-gram starts, all 10 tokens covered
    assert out[1].text == "alpha beta gamma delta"
    assert out[1].n_tok_dropped == 10 and out[1].n_dup_spans == 3
    assert out[2].text == "one two three"
    assert out[2].n_tok_dropped == 10 and out[2].n_dup_spans == 3
    # intra-doc repeat: both copies go, the separator survives
    assert out[3].text == "x"
    assert out[3].n_tok_kept == 1 and out[3].n_dup_spans == 2
    # short and empty docs untouched
    assert out[4].text == "short doc only" and out[4].n_tok_dropped == 0
    assert out[5].text == "" and out[5].n_tok_dropped == 0 and out[5].n_dup_spans == 0
    with _pytest.raises(ValueError, match="min_count"):
        drop_duplicate_spans(docs, "text", "doc_id", min_count=1)
    with _pytest.raises(ValueError, match="k must"):
        drop_duplicate_spans(docs, "text", "doc_id", k=1)


def test_drop_duplicate_spans_staged_gram_rows(spark):
    """``gram_rows=`` (the staged two-consumer gram frame, the form a
    100 TB run materializes once) is result-identical to the lazy
    default."""
    from pyspark_dist_explore_spark.operators.textstats import (
        drop_duplicate_spans,
        span_grams,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lazy = sorted(
        map(tuple, drop_duplicate_spans(docs, "text", "doc_id", k=8).collect())
    )
    staged_grams = span_grams(docs, "text", "doc_id", k=8).localCheckpoint()
    staged = sorted(
        map(
            tuple,
            drop_duplicate_spans(
                docs, "text", "doc_id", k=8, gram_rows=staged_grams
            ).collect(),
        )
    )
    assert lazy == staged


def test_new_op_edge_guards(spark):
    """Hardening pins: PSI eps bounds, NULL-text doc survives line
    dedup as a husk, duplicate-term reference LM is re-aggregated not
    fanned out."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.stats import histogram_drift
    from pyspark_dist_explore_spark.operators.textstats import (
        drop_repeated_lines,
        unigram_logprob_scores,
    )
    from pyspark_dist_explore_spark.streaming.histogram_stream import (
        stream_drift_scores,
    )

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    with _pytest.raises(ValueError, match="eps"):
        histogram_drift(c, c, "c_acctbal", eps=0.0)
    ref = spark.createDataFrame([(0, 1)], "bucket int, cnt bigint")
    wh = spark.createDataFrame(
        [], "window_start timestamp, window_end timestamp, bucket int, cnt bigint"
    )
    with _pytest.raises(ValueError, match="eps"):
        stream_drift_scores(wh, ref, eps=2.0)

    docs = spark.createDataFrame(
        [(1, None), (2, "real line")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in
           drop_repeated_lines(docs, "text", "doc_id").collect()}
    assert out[1].text == "" and out[1].n_lines_kept == 1, "NULL-text doc survives"

    probe = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    dup_lm = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 20)], "term string, cnt bigint"
    )
    r = unigram_logprob_scores(probe, "text", "doc_id", lm_counts=dup_lm).first()
    assert r.n_tok == 3, "duplicate LM terms must aggregate, not fan the join out"


def test_histogram_drift_by_group_matches_duckdb(spark):
    """Per-group drift (WHICH sources drifted): per-group shared-range
    bins + per-group PSI hash-match the DuckDB twin on real testdata —
    ref = whole corpus, cur = one source's docs, grouped by lang."""
    from pyspark_dist_explore_spark.functions.numeric import bucket_sql
    from pyspark_dist_explore_spark.operators.stats import histogram_drift_by_group
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return histogram_drift_by_group(
            docs, docs.where("source IN ('src0', 'src1', 'src2')"), "n_chars", "lang", bins=8
        )

    bucket = bucket_sql("v", "__lo", "__hi", 8)
    oracle = f"""
WITH u0 AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '') AS grp, CAST(n_chars AS DOUBLE) AS v
  FROM documents
  UNION ALL
  SELECT COALESCE(CAST(lang AS VARCHAR), '') AS grp, CAST(n_chars AS DOUBLE) AS v
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
),
present AS (SELECT DISTINCT grp FROM u0),
u AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '') AS grp, CAST(n_chars AS DOUBLE) AS v, 'ref' AS src
  FROM documents WHERE n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))
  UNION ALL
  SELECT COALESCE(CAST(lang AS VARCHAR), '') AS grp, CAST(n_chars AS DOUBLE) AS v, 'cur' AS src
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
    AND n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))
),
mm AS (SELECT grp, min(v) AS __lo, max(v) AS __hi FROM u GROUP BY grp),
b AS (
  SELECT u.grp, u.src, {bucket} AS bucket
  FROM u JOIN mm ON u.grp = mm.grp
),
cells AS (
  SELECT grp, bucket,
         sum(CASE WHEN src = 'ref' THEN 1 ELSE 0 END) AS ref_cnt,
         sum(CASE WHEN src = 'cur' THEN 1 ELSE 0 END) AS cur_cnt
  FROM b GROUP BY grp, bucket
),
tot AS (SELECT grp, sum(ref_cnt) AS tr, sum(cur_cnt) AS tc FROM cells GROUP BY grp),
scored AS (
  SELECT cells.grp,
         CAST(sum(ref_cnt) AS BIGINT) AS n_ref,
         CAST(sum(cur_cnt) AS BIGINT) AS n_cur,
         round(sum(
           (greatest(CASE WHEN tr > 0 THEN ref_cnt / tr ELSE 0.0 END, 1e-06)
            - greatest(CASE WHEN tc > 0 THEN cur_cnt / tc ELSE 0.0 END, 1e-06))
           * ln(greatest(CASE WHEN tr > 0 THEN ref_cnt / tr ELSE 0.0 END, 1e-06)
                / greatest(CASE WHEN tc > 0 THEN cur_cnt / tc ELSE 0.0 END, 1e-06))
         ), 10) AS psi
  FROM cells JOIN tot ON cells.grp = tot.grp
  GROUP BY cells.grp
)
SELECT present.grp AS "group",
       COALESCE(n_ref, 0) AS n_ref,
       COALESCE(n_cur, 0) AS n_cur,
       COALESCE(psi, 0.0) AS psi
FROM present LEFT JOIN scored ON present.grp = scored.grp
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_histogram_drift_by_group_semantics(spark):
    """A group identical across snapshots scores ~0; a group present in
    only one snapshot scores maximal (finite) drift; a group whose
    values are all NULL on BOTH sides still gets a (0, 0, 0.0) row
    instead of vanishing."""
    from pyspark_dist_explore_spark.operators.stats import histogram_drift_by_group

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(20)]
        + [("b", float(i)) for i in range(20)]
        + [("dead", None)],
        "g string, v double",
    )
    cur = spark.createDataFrame(
        [("a", float(i)) for i in range(20)] + [("c", 5.0), ("dead", None)],
        "g string, v double",
    )
    out = {r.group: r for r in
           histogram_drift_by_group(ref, cur, "v", "g", bins=10).collect()}
    assert abs(out["a"].psi) < 1e-9
    assert out["b"].n_cur == 0 and out["b"].psi > 0.25
    assert out["c"].n_ref == 0 and out["c"].psi > 0.25
    assert out["dead"].n_ref == 0 and out["dead"].n_cur == 0
    assert out["dead"].psi == 0.0, "all-NULL group must appear, not vanish"
    assert all(r.psi == r.psi and r.psi != float("inf") for r in out.values())


def test_corpus_profile_matches_duckdb(spark):
    """The one-scan corpus EDA card hash-matches DuckDB per source:
    token counts, fixed-point quality mean, exact-dup fraction."""
    from pyspark_dist_explore_spark.operators.textstats import corpus_profile
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return corpus_profile(docs, "text", "doc_id", group_col="source")

    norm = "trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))"
    q = ("round(0.5 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
         " / greatest(CAST(length(text) AS DOUBLE), 1.0))"
         " + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)"
         " / greatest(CAST(length(text) AS DOUBLE), 1.0))"
         " + 0.2 * (CASE WHEN length(text) >= 20 AND length(text) <= 10000 THEN 1.0 ELSE 0.5 END), 6)")
    oracle = f"""
WITH scored AS (
  SELECT COALESCE(CAST(source AS VARCHAR), '') AS "group",
         CASE WHEN {norm} = '' THEN 0
              ELSE len(string_split({norm}, ' ')) END AS tok,
         CAST(round({q} * 1e6) AS BIGINT) AS q6,
         md5({norm}) AS fp,
         CASE WHEN {norm} = '' THEN 1 ELSE 0 END AS empty
  FROM documents
)
SELECT "group",
       count(*) AS n_docs,
       CAST(sum(empty) AS BIGINT) AS n_empty,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(CAST(sum(tok) AS DOUBLE) / count(*), 6) AS avg_tokens,
       round(CAST(sum(q6) AS DOUBLE) / 1e6 / count(*), 6) AS avg_quality,
       count(DISTINCT fp) AS n_unique,
       round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS dup_frac
FROM scored GROUP BY "group"
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_corpus_profile_semantics(spark):
    """Whole-corpus mode, duplicate detection, empty docs."""
    from pyspark_dist_explore_spark.operators.textstats import corpus_profile

    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different"), (4, "")],
        ["doc_id", "text"],
    )
    r = corpus_profile(docs, "text", "doc_id").first()
    assert r.group == "ALL" and r.n_docs == 4
    assert r.n_empty == 1
    assert r.n_unique == 3  # dup pair collapses; '' counts as one fingerprint
    assert abs(r.dup_frac - 0.25) < 1e-9


def test_corpus_profile_null_text_counts_as_empty(spark):
    from pyspark_dist_explore_spark.operators.textstats import corpus_profile

    docs = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id bigint, text string"
    )
    r = corpus_profile(docs, "text", "doc_id").first()
    assert r.n_docs == 2 and r.n_empty == 1
    assert r.n_unique == 2  # '' fingerprint + the real doc


# --------------------------------------------------------------------------
# Unicode normalization (dedup.normalize_unicode)
# --------------------------------------------------------------------------


def test_normalize_unicode_matches_duckdb(spark):
    """NFC fold + control strip hash-matches DuckDB's nfc_normalize on
    planted NFD/NFC/control-char rows; accent_fold matches
    strip_accents."""
    import unicodedata

    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.dedup import normalize_unicode

    rows = [
        (1, unicodedata.normalize("NFC", "caf\u00e9 plain NFC")),
        (2, unicodedata.normalize("NFD", "caf\u00e9 decomposed NFD")),
        (3, "bell\x07 and\x1f del\x7f controls"),
        (4, "\u212b angstrom sign"),  # NFC-normalizes to U+00C5
        (5, None),
        (6, "ascii only stays put"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        map(tuple, normalize_unicode(docs, "text", "doc_id").collect())
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(r"""
SELECT doc_id,
       regexp_replace(nfc_normalize(text), '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS text,
       CASE WHEN text IS NULL THEN 0
            WHEN regexp_replace(nfc_normalize(text), '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') <> text
            THEN 1 ELSE 0 END AS changed
FROM docs
""").fetchall()))
    con.close()
    assert got == want
    # accent fold twin: strip_accents semantics (ligatures NOT folded)
    folded = {
        r.doc_id: r.text
        for r in normalize_unicode(
            docs.where("text IS NOT NULL"), "text", "doc_id", accent_fold=True
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame([r for r in rows if r[1] is not None],
                                      columns=["doc_id", "text"]))
    duck_folded = dict(con.execute(r"""
SELECT doc_id,
       regexp_replace(strip_accents(nfc_normalize(text)),
                      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')
FROM docs""").fetchall())
    con.close()
    assert folded == duck_folded
    assert folded[1] == "cafe plain NFC"
    assert unicodedata.normalize("NFC", "café") == "café"


def test_normalize_unicode_collapses_nfd_vs_nfc_dedup(spark):
    """The planted scenario from the gap report: NFC and NFD encodings
    of the same string defeat fingerprint dedup UNTIL normalize_unicode
    runs; afterwards they collapse to one survivor."""
    import unicodedata

    from pyspark_dist_explore_spark.operators.dedup import (
        fingerprint_dedup,
        normalize_unicode,
    )

    _nfc_lait = unicodedata.normalize("NFC", "caf\u00e9 au lait")
    _nfd_lait = unicodedata.normalize("NFD", _nfc_lait)
    assert _nfc_lait != _nfd_lait  # genuinely different byte forms

    docs = spark.createDataFrame(
        [(1, _nfc_lait), (2, _nfd_lait)], "doc_id bigint, text string"
    )
    raw_kept = fingerprint_dedup(docs, "text", "doc_id").count()
    assert raw_kept == 2, "without unicode normalization the pair survives"
    normed = normalize_unicode(docs, "text", "doc_id")
    assert {r.changed for r in normed.collect()} == {0, 1}
    assert fingerprint_dedup(normed, "text", "doc_id").count() == 1


def test_normalize_unicode_validates_form(spark):
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dedup import normalize_unicode

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="form"):
        normalize_unicode(docs, "text", "doc_id", form="NFX")


# --------------------------------------------------------------------------
# bigram-LM perplexity (textstats.bigram_logprob_scores)
# --------------------------------------------------------------------------


def test_bigram_logprob_matches_duckdb(spark):
    """The interpolated-bigram chain (lag-window pair build -> self-
    trained LMs -> lam*p_ML + (1-lam)*Laplace-unigram -> scaled-bigint
    per-doc sum) hash-matches DuckDB bit for bit."""
    from pyspark_dist_explore_spark.operators.textstats import bigram_logprob_scores
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return bigram_logprob_scores(docs, "text", "doc_id")

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    oracle = f"""
WITH toks AS (
  SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS idx, unnest(l) AS tok
  FROM (SELECT doc_id, string_split({norm}, ' ') AS l FROM documents) t
),
t2 AS (SELECT doc_id, idx, tok FROM toks WHERE tok <> ''),
pairs AS (
  SELECT doc_id, idx, tok, lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS prev
  FROM t2
),
uni AS (SELECT tok AS term, count(*) AS cnt FROM t2 GROUP BY tok),
bi AS (
  SELECT prev, tok AS term, count(*) AS bcnt FROM pairs
  WHERE prev IS NOT NULL GROUP BY prev, tok
),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni),
scored AS (
  SELECT p.doc_id,
         CAST(round(ln(
           (CASE WHEN p.prev IS NOT NULL AND COALESCE(cx.cnt, 0) > 0
                 THEN 0.7 * (CAST(COALESCE(b.bcnt, 0) AS DOUBLE) / CAST(cx.cnt AS DOUBLE))
                 ELSE 0.0 END)
           + 0.30000000000000004 * ((CAST(COALESCE(u.cnt, 0) AS DOUBLE) + 1.0) / (tot.n + 1.0 * tot.v))
         ) * 1e6) AS BIGINT) AS slogp
  FROM pairs p
  LEFT JOIN uni u ON p.tok = u.term
  LEFT JOIN uni cx ON p.prev = cx.term
  LEFT JOIN bi b ON p.prev = b.prev AND p.tok = b.term, tot
)
SELECT doc_id, n_tok,
       CAST(mean_e6 AS DOUBLE) / 1e6 AS mean_logprob,
       round(exp(-(CAST(mean_e6 AS DOUBLE) / 1e6)), 6) AS ppl
FROM (
  SELECT doc_id, count(*) AS n_tok,
         CAST(round(CAST(sum(slogp) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_e6
  FROM scored GROUP BY doc_id
)
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_bigram_logprob_flags_word_salad(spark):
    """Common words in impossible order: unigram ppl can't see it (the
    salad is an exact PERMUTATION of the real doc, so its unigram
    margin is exactly 1.0), the bigram LM must — by a wide margin."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.textstats import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    # reference corpus with REAL bigram structure (the parquet word-soup
    # testdata has none — adjacency there is already near-random)
    sent = "the quick brown fox jumps over the lazy dog"
    ref = spark.createDataFrame(
        [(i, sent + " and the dog sleeps") for i in range(30)]
        + [(100 + i, "a cat sits on the mat near the door") for i in range(30)],
        ["doc_id", "text"],
    )
    real = sent
    salad = " ".join(reversed(sent.split()))  # exact permutation
    probe = spark.createDataFrame([(1, real), (2, salad)], ["doc_id", "text"])

    from pyspark_dist_explore_spark.operators.textstats import term_frequencies

    uni_lm = term_frequencies(ref, "text", "doc_id").groupBy("term").agg(
        F.sum("tf").alias("cnt")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = ref.select(
        F.col("doc_id"), F.posexplode(F.split(norm, " ")).alias("idx", "tok")
    ).where(F.col("tok") != "")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("idx")
    bi_lm = (
        toks.select("doc_id", "idx", "tok", F.lag("tok", 1).over(w).alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bi = {r.doc_id: r.ppl for r in bigram_logprob_scores(
        probe, "text", "doc_id", lm_unigrams=uni_lm, lm_bigrams=bi_lm
    ).collect()}
    un = {r.doc_id: r.ppl for r in unigram_logprob_scores(
        probe, "text", "doc_id", lm_counts=uni_lm
    ).collect()}
    uni_margin = un[2] / un[1]
    bi_margin = bi[2] / bi[1]
    assert abs(uni_margin - 1.0) < 1e-6, f"exact permutation: {uni_margin}"
    assert bi_margin > 2.0, f"bigram must flag word salad, margin={bi_margin}"
    assert all(p == p and p != float("inf") for p in bi.values())


def test_bigram_logprob_validates_params(spark):
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import bigram_logprob_scores

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="lam"):
        bigram_logprob_scores(docs, "text", "doc_id", lam=1.0)
    with _pytest.raises(ValueError, match="alpha"):
        bigram_logprob_scores(docs, "text", "doc_id", alpha=0.0)
    with _pytest.raises(ValueError, match="BOTH"):
        bigram_logprob_scores(docs, "text", "doc_id", lm_unigrams=docs)


def test_deregistered_round6_text_queries_match_duckdb(spark):
    """text_lang_id (folded into text_stats) and date_funcs_orders
    (folded into q3_top_orders) stay callable, oracles pinned here."""
    from pyspark_dist_explore_spark.plans.llm_ops import (
        TEXT_LANG_ID_ORACLE,
        q_text_lang_id,
    )
    from pyspark_dist_explore_spark.plans.relational import (
        DATE_FUNCS_ORACLE,
        q_date_funcs_orders,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_text_lang_id, TEXT_LANG_ID_ORACLE)
    compare(spark, SF_SMOKE, q_date_funcs_orders, DATE_FUNCS_ORACLE)


def test_deregistered_round6_sampling_queries_match_duckdb(spark):
    """dataset_hash_split + stratified_sample_langs were merged into
    sampling_splits; originals stay callable, oracles pinned here."""
    from pyspark_dist_explore_spark.plans.llm_ops import (
        HASH_SPLIT_ORACLE,
        STRATIFIED_LANGS_ORACLE,
        q_dataset_hash_split,
        q_stratified_sample_langs,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_dataset_hash_split, HASH_SPLIT_ORACLE)
    compare(spark, SF_SMOKE, q_stratified_sample_langs, STRATIFIED_LANGS_ORACLE)


def test_deregistered_round6_grouping_queries_match_duckdb(spark):
    """rollup_cube_status + grouping_sets_priority were merged into
    grouping_analytics; originals stay callable, oracles pinned here."""
    from pyspark_dist_explore_spark.plans.extended import (
        GROUPING_SETS_ORACLE,
        q_grouping_sets_priority,
    )
    from pyspark_dist_explore_spark.plans.relational import (
        ROLLUP_CUBE_ORACLE,
        q_rollup_cube_status,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_rollup_cube_status, ROLLUP_CUBE_ORACLE)
    compare(spark, SF_SMOKE, q_grouping_sets_priority, GROUPING_SETS_ORACLE)


def test_deregistered_round6_vector_queries_match_duckdb(spark):
    """vector_topk_exact + vector_neardup_pairs were merged into
    vector_exact_search; originals stay callable, oracles pinned here."""
    from pyspark_dist_explore_spark.plans.llm_ops import (
        VECTOR_PAIRS_ORACLE,
        VECTOR_TOPK_ORACLE,
        q_vector_neardup_pairs,
        q_vector_topk_exact,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_vector_topk_exact, VECTOR_TOPK_ORACLE)
    compare(spark, SF_SMOKE, q_vector_neardup_pairs, VECTOR_PAIRS_ORACLE)


def test_perplexity_staged_inputs_match_lazy(spark):
    """tf_rows=/pairs_rows= staging is an execution-shape change only:
    staged and lazy scorers agree row for row; wrong-schema staged
    frames fail fast."""
    import pytest as _pytest
    from pyspark.sql import Window

    from pyspark_dist_explore_spark.operators.textstats import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    from pyspark_dist_explore_spark.operators.dedup import normalize_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    norm = normalize_text(F.col("text"))
    toks = docs.select(
        F.col("doc_id"), F.posexplode(F.split(norm, " ")).alias("idx", "tok")
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("idx")
    pairs = toks.select(
        "doc_id", "idx", "tok", F.lag("tok", 1).over(w).alias("prev")
    ).localCheckpoint()
    tf = pairs.groupBy("doc_id", F.col("tok").alias("term")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    lazy_u = sorted(map(tuple, unigram_logprob_scores(docs, "text", "doc_id").collect()))
    staged_u = sorted(map(tuple, unigram_logprob_scores(
        docs, "text", "doc_id", tf_rows=tf).collect()))
    assert lazy_u == staged_u
    lazy_b = sorted(map(tuple, bigram_logprob_scores(docs, "text", "doc_id").collect()))
    staged_b = sorted(map(tuple, bigram_logprob_scores(
        docs, "text", "doc_id", pairs_rows=pairs).collect()))
    assert lazy_b == staged_b
    with _pytest.raises(ValueError, match="tf_rows missing"):
        unigram_logprob_scores(docs, "text", "doc_id",
                               tf_rows=tf.withColumnRenamed("tf", "cnt"))
    with _pytest.raises(ValueError, match="pairs_rows missing"):
        bigram_logprob_scores(docs, "text", "doc_id",
                              pairs_rows=pairs.drop("prev"))


def test_kmeans_fit_absolute_cap(spark):
    """max_fit_rows bounds the KMeans fit ABSOLUTELY (a ratio sample
    alone still grows with the corpus): capping changes only which rows
    the fit sees — centroid count, determinism, and downstream IVF
    recall floors hold — and an under-need cap fails fast."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.selectExpr("vec_id", "embedding as vv")
    capped = similarity.kmeans_centroids(
        v, 8, id_col="vec_id", max_fit_rows=64
    ).collect()
    assert len(capped) == 8
    again = similarity.kmeans_centroids(
        v, 8, id_col="vec_id", max_fit_rows=64
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, again)), "deterministic"
    with _pytest.raises(ValueError, match="max_fit_rows"):
        similarity.kmeans_centroids(v, 8, id_col="vec_id", max_fit_rows=10)

    queries = emb.where("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    ivf = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8, max_fit_rows=64
    )
    exact = similarity.exact_topk(emb, queries, k=5)
    got = {(r.query_id, r.vec_id) for r in ivf.collect()}
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert got == truth, "full-probe IVF == exact must hold under the fit cap"


def test_normalize_unicode_properties_batch(spark):
    """Batched property pins for unicode normalization over a spread of
    adversarial strings (one Spark job, Python unicodedata reference):
    idempotence, NFC/NFD input convergence, and control-char absence."""
    import re
    import unicodedata

    from pyspark_dist_explore_spark.operators.dedup import normalize_unicode

    seeds = [
        "plain ascii",
        "café",
        "Ωμέγα and ångström Å",
        "한국어 text mixed", "русский текст",
        "áêï",          # combining marks on ascii
        "ÅΩﬁ",             # angstrom sign, ohm sign, fi ligature
        "ctrl\x00\x01\x1f\x7fchars",
        "tabs\tand\nnewlines\rsurvive",
        "",
        "́leading combining",
    ]
    rows = []
    rid = 0
    for s in seeds:
        for form in ("NFC", "NFD"):
            rows.append((rid, unicodedata.normalize(form, s) if s else s))
            rid += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.text
           for r in normalize_unicode(docs, "text", "doc_id").collect()}

    ctrl = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")

    def ref(x: str) -> str:
        return ctrl.sub("", unicodedata.normalize("NFC", x))

    for rid, text in rows:
        assert got[rid] == ref(text), (rid, text)
        assert not ctrl.search(got[rid])
        # idempotence: normalizing the output changes nothing
        assert ref(got[rid]) == got[rid]
    # NFC and NFD encodings of the same seed converge
    for i in range(0, len(rows), 2):
        assert got[rows[i][0]] == got[rows[i + 1][0]], rows[i]


def test_operators_handle_empty_corpus(spark):
    """An EMPTY corpus must yield empty (or empty-profile) results, not
    ANSI division errors or crashes — pinned across the text/dedup/
    packing/sampling families."""
    from pyspark_dist_explore_spark.operators import dedup, similarity
    from pyspark_dist_explore_spark.operators.packing import pack_sequences
    from pyspark_dist_explore_spark.operators.sampling import shuffle_shards
    from pyspark_dist_explore_spark.operators.stats import histogram_drift_by_group
    from pyspark_dist_explore_spark.operators.textstats import (
        bigram_logprob_scores,
        corpus_profile,
        drop_repeated_lines,
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame([], "doc_id bigint, text string, g string")
    assert corpus_profile(docs, "text", "doc_id").count() == 0
    assert drop_repeated_lines(docs, "text", "doc_id").count() == 0
    assert unigram_logprob_scores(docs, "text", "doc_id").count() == 0
    assert bigram_logprob_scores(docs, "text", "doc_id").count() == 0
    assert dedup.normalize_unicode(docs, "text", "doc_id").count() == 0
    assert dedup.minhash_neardup(docs, "text", "doc_id", threshold=0.8).count() == 0
    assert pack_sequences(docs, "doc_id", text_col="text").count() == 0
    assert shuffle_shards(docs, "doc_id", shards=4, salt="e").count() == 0
    assert histogram_drift_by_group(docs, docs, "doc_id", "g").count() == 0
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert similarity.dimension_minmax(emb).count() == 0


def test_pipeline_pathological_duplicate_skew(spark):
    """5 000 byte-identical docs + a handful of distinct ones: exact
    dedup must collapse the skew BEFORE pair generation (the pipeline's
    stage order is the quadratic-blowup guard — a naive pair join over
    the raw corpus would score C(5000, 2) pairs in one bucket), and the
    output keeps exactly one survivor of the clone army."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.pipeline import curate_documents, minhash_pair_fn

    clones = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document body repeated verbatim many times over").alias(
            "text"
        ),
    )
    distinct = spark.createDataFrame(
        [
            (100000, "a completely different first article body here"),
            (100001, "and another unrelated second piece of writing"),
        ],
        ["doc_id", "text"],
    )
    out = curate_documents(
        clones.unionByName(distinct), "text", "doc_id",
        min_quality=0.0, pair_fn=minhash_pair_fn(),
    )
    kept = {r.doc_id for r in out.collect()}
    assert 0 in kept, "min-id clone survives"
    assert kept & {100000, 100001} == {100000, 100001}
    assert len(kept & set(range(1, 5000))) == 0, "4 999 clones must vanish"


def test_dedup_lines_within_doc_matches_duckdb(spark):
    """Intra-doc first-occurrence line dedup hash-matches a hand-rolled
    DuckDB twin (row_number over (doc, trimmed line) by position)."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.textstats import dedup_lines_within_doc

    rows = [
        (1, "promo block\nbody one\npromo block\nbody two\npromo block"),
        (2, "a\n\nb\n\na\n  a"),        # blanks survive; indented dup drops
        (3, "only original content"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(map(tuple,
                     dedup_lines_within_doc(docs, "text", "doc_id").collect()))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute("""
WITH lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(COALESCE(text, ''), chr(10)), 1) - 1 AS pos,
         unnest(string_split(COALESCE(text, ''), chr(10))) AS line
  FROM docs
),
keyed AS (
  SELECT doc_id, pos, line, trim(line) AS key,
         row_number() OVER (PARTITION BY doc_id, trim(line) ORDER BY pos) AS occ
  FROM lines
),
kept AS (SELECT * FROM keyed WHERE key = '' OR occ = 1)
SELECT k.doc_id,
       COALESCE(string_agg(kp.line, chr(10) ORDER BY kp.pos), '') AS text,
       CAST(count(kp.pos) AS BIGINT) AS n_lines_kept,
       CAST(count(*) - count(kp.pos) AS BIGINT) AS n_lines_dropped
FROM keyed k LEFT JOIN kept kp ON k.doc_id = kp.doc_id AND k.pos = kp.pos
GROUP BY k.doc_id
""").fetchall()))
    con.close()
    assert got == want
    out = {r.doc_id: r for r in
           dedup_lines_within_doc(docs, "text", "doc_id").collect()}
    assert out[1].text == "promo block\nbody one\nbody two"
    assert out[1].n_lines_dropped == 2
    assert out[2].text == "a\n\nb\n", f"blanks survive, dup 'a' forms drop: {out[2].text!r}"
    assert out[4].text == "" and out[4].n_lines_kept == 1


def test_contamination_report_attributes_eval_items(spark):
    """The audit view: which eval items leaked into which training docs,
    ranked by distinct shared n-grams — consistent with contaminated_ids
    and zero rows for clean benchmarks."""
    from pyspark_dist_explore_spark.operators.decontam import (
        contaminated_ids,
        contamination_report,
    )

    phrase = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            (1, f"intro text {phrase} closing words here"),
            (2, "completely unrelated training document body"),
            (3, f"{phrase} and then {phrase} again padded out"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, phrase), (200, "spotless benchmark item nothing shared")],
        ["eval_id", "text"],
    )
    rep = contamination_report(
        train, eval_df, "text", "doc_id", ngram_n=8, eval_id_col="eval_id"
    )
    rows = {(r.doc_id, r.eval_id): r.n_shared_grams for r in rep.collect()}
    assert set(rows) == {(1, 100), (3, 100)}, rows
    assert rows[(1, 100)] == 1  # the phrase is exactly one 8-gram
    assert rows[(3, 100)] == 1  # repeats don't inflate the DISTINCT count
    flagged = {r.doc_id for r in contaminated_ids(
        train, eval_df, "text", "doc_id", ngram_n=8).collect()}
    assert flagged == {1, 3}, "report and drop-list must agree"


def test_pack_greedy_matches_python_reference_random_cases(spark):
    """Randomized cross-check: Spark's greedy (applyInPandas first-fit)
    equals a local Python reference on adversarial token-count mixes —
    oversize runs, exact-budget fits, zeros, and boundary straddles."""
    import random

    from pyspark_dist_explore_spark.operators.packing import (
        _PACK_STRIDE,
        pack_sequences,
    )

    rng = random.Random(20260814)
    max_tokens = 100
    cases = []
    for case in range(6):
        n = rng.randint(1, 60)
        counts = [
            rng.choice([0, 1, rng.randint(2, 99), 100, rng.randint(101, 250)])
            for _ in range(n)
        ]
        cases.append(counts)
    cases.append([100] * 5 + [250, 250] + [0] * 3)   # exact fits + oversize run
    cases.append([99, 1, 99, 1, 2])                   # boundary straddles

    for counts in cases:
        rows = [(i, c) for i, c in enumerate(counts)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        got = {
            r.doc_id: (r.pack_id, r.oversize)
            for r in pack_sequences(
                df, "doc_id", token_count_col="n_tokens",
                max_tokens=max_tokens, buckets=1, mode="greedy",
            ).collect()
        }
        # Python reference: first-fit in doc_id order (single bucket 0)
        pid, cur = 0, 0
        want = {}
        for i, c in rows:
            if c > max_tokens:
                if cur > 0:
                    pid += 1
                want[i] = (0 * _PACK_STRIDE + pid, 1)
                pid += 1
                cur = 0
            else:
                if cur + c > max_tokens:
                    pid += 1
                    cur = 0
                want[i] = (0 * _PACK_STRIDE + pid, 0)
                cur += c
        assert got == want, (counts, got, want)


def test_pack_ffd_matches_python_reference_random_cases(spark):
    """X62: Spark's FFD (applyInPandas first-fit-decreasing) equals a
    local Python reference on the same adversarial mixes as greedy —
    and is invariant to input partitioning."""
    import random

    from pyspark_dist_explore_spark.operators.packing import (
        _PACK_STRIDE,
        pack_sequences,
    )

    rng = random.Random(20260816)
    max_tokens = 100
    cases = [
        [
            rng.choice([0, 1, rng.randint(2, 99), 100, rng.randint(101, 250)])
            for _ in range(rng.randint(1, 60))
        ]
        for _ in range(6)
    ]
    cases.append([100] * 5 + [250, 250] + [0] * 3)
    cases.append([51, 51, 51, 49, 49, 49])  # classic FFD-beats-next-fit mix

    for counts in cases:
        rows = [(i, c) for i, c in enumerate(counts)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        got = {
            r.doc_id: (r.pack_id, r.oversize)
            for r in pack_sequences(
                df.repartition(5), "doc_id", token_count_col="n_tokens",
                max_tokens=max_tokens, buckets=1, mode="ffd",
            ).collect()
        }
        # Python reference FFD: (n DESC, id ASC), first open pack that fits
        order = sorted(rows, key=lambda r: (-r[1], r[0]))
        caps, want = [], {}
        for i, c in order:
            if c > max_tokens:
                want[i] = (len(caps), 1)
                caps.append(0)
                continue
            for p, cap in enumerate(caps):
                if cap >= c:
                    want[i] = (p, 0)
                    caps[p] -= c
                    break
            else:
                want[i] = (len(caps), 0)
                caps.append(max_tokens - c)
        want = {i: (0 * _PACK_STRIDE + p, o) for i, (p, o) in want.items()}
        assert got == want, (counts, got, want)
        # every regular pack strictly within budget
        per_pack = {}
        for i, c in rows:
            if c <= max_tokens:
                per_pack[got[i][0]] = per_pack.get(got[i][0], 0) + c
        assert all(v <= max_tokens for v in per_pack.values())


def test_pack_ffd_beats_greedy_fill_rate(spark):
    """X62's reason to exist: on a fragmentation-prone mix (large docs
    interleaved with small fillers in id order) FFD produces fewer
    packs and less waste than greedy next-fit — measured by the X50b
    packing_efficiency card on BOTH packings."""
    from pyspark_dist_explore_spark.operators.packing import (
        pack_sequences,
        packing_efficiency,
    )

    # id order alternates 60s and 50s: no two adjacent docs share a
    # 100-budget pack, so greedy packs every doc ALONE (40 packs, waste
    # 40/50 alternating); FFD opens 20 packs for the 60s then pairs the
    # 50s two-a-pack (30 packs, zero waste on the 50 side)
    rows = [(i, 60 if i % 2 == 0 else 50) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    cards = {}
    for mode in ("greedy", "ffd"):
        packed = pack_sequences(
            df, "doc_id", token_count_col="n_tokens",
            max_tokens=100, buckets=1, mode=mode,
        )
        card = packing_efficiency(packed, 100).collect()[0]
        cards[mode] = card
        assert card.n_oversize == 0 and card.total_tokens == 20 * 60 + 20 * 50
    assert cards["greedy"].n_packs == 40 and cards["ffd"].n_packs == 30
    assert cards["ffd"].n_packs < cards["greedy"].n_packs
    assert cards["ffd"].waste_tokens < cards["greedy"].waste_tokens


def test_pack_sequences_mode_guard_names_ffd(spark):
    from pyspark_dist_explore_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id bigint, n_tokens bigint")
    with pytest.raises(ValueError, match="'ffd'"):
        pack_sequences(df, "doc_id", token_count_col="n_tokens", mode="nope")


# --------------------------------------------------------------------------
# semantic dedup (similarity.semantic_dedup — SemDeDup composition)
# --------------------------------------------------------------------------


def test_cosine_pairs_partitioned_constant_matches_unpartitioned(spark):
    """partition_col with a constant value must be a pure plan-shape
    change: identical pair set to the unpartitioned blocked matmul."""
    from pyspark_dist_explore_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = sorted(
        map(tuple, cosine_neardup_pairs(emb, threshold=0.3, n_blocks=4).collect())
    )
    part = sorted(
        map(
            tuple,
            cosine_neardup_pairs(
                emb.withColumn("grp", F.lit(0)),
                threshold=0.3,
                n_blocks=4,
                partition_col="grp",
            ).collect(),
        )
    )
    assert base == part
    assert len(base) > 0  # the corpus must actually exercise the matmul


def test_cosine_pairs_partitioned_never_crosses_partitions(spark):
    """Two identical copies of the same vectors in different partitions:
    cross-partition cosine is 1.0 everywhere, yet NO cross-partition
    pair may be emitted — pairs flow only within a partition value."""
    from pyspark_dist_explore_spark.operators.similarity import cosine_neardup_pairs

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(20)
    )
    two = emb.withColumn("grp", F.lit(0)).unionAll(
        emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding").withColumn(
            "grp", F.lit(1)
        )
    )
    pairs = cosine_neardup_pairs(
        two, threshold=0.999, n_blocks=2, partition_col="grp"
    ).collect()
    for r in pairs:
        assert (r.id_a < 1000) == (r.id_b < 1000), f"cross-partition pair {r}"


def test_semantic_dedup_collapses_planted_duplicates(spark):
    """Two well-separated semantic groups, each with near-identical
    members (cos > 0.999 within, < 0.5 across): every group collapses
    to ONE survivor; singletons survive as their own clusters."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    a = rng.normal(size=16)
    b = rng.normal(size=16)
    b -= (a @ b) / (a @ a) * a  # orthogonalize
    rows = []
    for i in range(4):  # group A: ids 0..3, tiny perturbations of a
        rows.append((i, [float(x) for x in a + 1e-3 * rng.normal(size=16)]))
    for i in range(3):  # group B: ids 10..12
        rows.append((10 + i, [float(x) for x in b + 1e-3 * rng.normal(size=16)]))
    rows.append((20, [float(x) for x in a - b]))  # singleton, far from both
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            emb, threshold=0.99, n_centroids=2, n_blocks=2,
            fit_sample_mod=None, max_fit_rows=None,
        ).collect()
    }
    assert len(out) == 8
    # group A collapses to min-id survivor 0
    assert all(out[i].cluster_id == 0 for i in range(4)), out
    assert [out[i].is_survivor for i in range(4)] == [1, 0, 0, 0]
    # group B collapses to survivor 10
    assert all(out[10 + i].cluster_id == 10 for i in range(3)), out
    assert [out[10 + i].is_survivor for i in range(3)] == [1, 0, 0]
    # the singleton survives alone
    assert out[20].cluster_id == 20 and out[20].is_survivor == 1


def test_semantic_dedup_pairs_match_within_cell_bruteforce(spark):
    """The within-cell pair scoring is EXACT: for each KMeans cell, the
    emitted ≥-threshold pairs must equal a numpy brute-force over that
    cell's members (the approximation is the cell boundary, nothing
    else)."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import (
        cosine_neardup_pairs,
        kmeans_centroids,
        _dot_arrow,
        _unit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = emb.select(F.col("vec_id"), _unit(F.col("embedding")).alias("vv"))
    cents = kmeans_centroids(
        v, 4, vec_col="vv", id_col="vec_id", fit_sample_mod=None, max_fit_rows=None
    )
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .select("vec_id", "vv", "cent_id", _dot_arrow(F.col("vv"), F.col("cv")).alias("sim"))
        .groupBy("vec_id")
        .agg(F.max_by(F.struct("cent_id", "vv"),
                      F.struct(F.col("sim"), (-F.col("cent_id")).alias("neg_cent"))).alias("best"))
        .select("vec_id", F.col("best.vv").alias("embedding"), F.col("best.cent_id").alias("cent_id"))
    )
    got = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(
            assigned, threshold=0.3, n_blocks=3, partition_col="cent_id"
        ).collect()
    }
    local = assigned.collect()
    by_cell = {}
    for r in local:
        by_cell.setdefault(r.cent_id, []).append((r.vec_id, np.array(r.embedding)))
    want = set()
    for members in by_cell.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ia, va = members[i]
                ib, vb = members[j]
                if np.round(va @ vb, 6) >= 0.3:
                    want.add((min(ia, ib), max(ia, ib)))
    assert got == want
    assert len(want) > 0  # the cells must actually contain pairs


# --------------------------------------------------------------------------
# X47: embedding domain clustering/tagging (similarity.assign_domains /
# domain_tag / domain_profile) — the similarity→sampling link
# --------------------------------------------------------------------------


def test_assign_domains_fixed_centroids_match_numpy(spark):
    """The broadcast-argmax assignment equals a driver-side numpy argmax
    over unit vectors (cosine DESC, cent_id ASC tie-break)."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        assign_domains,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    got = {r.vec_id: r.domain for r in assign_domains(emb, cents).collect()}
    local = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    cv = {r.cent_id: np.array(r.cv, dtype=float) for r in cents.collect()}
    for vid, v in local.items():
        uv = v / np.linalg.norm(v)
        sims = sorted(
            ((float(uv @ c), -cid) for cid, c in cv.items()), reverse=True
        )
        assert got[vid] == -sims[0][1], vid
    # KMeans-fit form: every vector gets a label in [0, k)
    fit = assign_domains(emb, n_domains=3, fit_sample_mod=None, max_fit_rows=None)
    labels = {r.domain for r in fit.collect()}
    assert labels <= set(range(3)) and fit.count() == emb.count()


def test_domain_tag_profile_and_mixture_over_discovered_domains(spark):
    """The full X47 story: tag documents with KMeans-discovered domains,
    read the per-domain profile card, derive per-domain token targets
    from it, and materialize a mixture keyed on the DISCOVERED domain —
    up-sampling one domain 2x and keeping another at 1x.  A doc without
    an embedding tags as missing_domain."""
    from pyspark_dist_explore_spark.operators.sampling import materialize_mixture
    from pyspark_dist_explore_spark.operators.similarity import (
        domain_profile,
        domain_tag,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    extra = spark.createDataFrame(
        [(10_000_000, "synthetic", "no embedding for this doc")],
        "doc_id bigint, source string, text string",
    )
    tagged = domain_tag(
        docs.unionByName(extra),
        emb,
        n_domains=3,
        fit_sample_mod=None,
        max_fit_rows=None,
    ).withColumn(
        "n_tok", F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("bigint")
    )
    assert tagged.where("doc_id = 10000000").collect()[0]["domain"] == -1
    prof = {
        r.domain: r
        for r in domain_profile(
            tagged.where("domain >= 0"), token_col="n_tok"
        ).collect()
    }
    assert set(prof) <= {0, 1, 2} and len(prof) >= 2
    assert sum(r.n_docs for r in prof.values()) == docs.count()
    # per-source audit shape: (domain, source) rows partition the docs
    by_src = domain_profile(
        tagged.where("domain >= 0"), token_col="n_tok", source_col="source"
    )
    assert by_src.groupBy().sum("n_docs").collect()[0][0] == docs.count()
    # derive targets FROM the profile: 2x the smallest domain's tokens,
    # exactly 1x the largest's — the DoReMi-shaped recipe
    small = min(prof.values(), key=lambda r: r.n_tokens)
    big = max(prof.values(), key=lambda r: r.n_tokens)
    targets = {str(small.domain): 2 * small.n_tokens, str(big.domain): big.n_tokens}
    stream = materialize_mixture(
        tagged.withColumn("domain", F.col("domain").cast("string")),
        "domain",
        "n_tok",
        "doc_id",
        targets,
    )
    per_dom = {
        r.domain: r
        for r in stream.groupBy("domain").agg(
            F.sum("n_tok").alias("tok"), F.max("epoch").alias("max_epoch")
        ).collect()
    }
    assert set(per_dom) == set(targets)
    assert per_dom[str(small.domain)]["tok"] == 2 * small.n_tokens
    assert per_dom[str(small.domain)]["max_epoch"] == 2
    assert per_dom[str(big.domain)]["tok"] == big.n_tokens
    assert per_dom[str(big.domain)]["max_epoch"] == 1


def test_domain_scores_and_prune_prototypes_d4(spark):
    """X52 (D4 diversification): domain_scores carries the own-centroid
    cosine through the same argmax (labels == assign_domains, scores ==
    numpy max-cos on the rounded grid; unassignable rows NULL in BOTH
    fields); prune_prototypes keeps exactly ceil(num·n/den) per domain,
    and membership is the LEAST-prototypical band (every kept score <=
    every dropped score within a domain, up to boundary ties)."""
    import math

    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        assign_domains,
        domain_scores,
        prune_prototypes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    sc = {r["vec_id"]: r for r in domain_scores(emb, cents, assign_round=6).collect()}
    lab = {r["vec_id"]: r["domain"] for r in assign_domains(emb, cents, assign_round=6).collect()}
    assert {k: v["domain"] for k, v in sc.items()} == lab
    cv = {r["cent_id"]: np.array(r["cv"], dtype=float) for r in cents.collect()}
    for r in emb.collect():
        v = np.array(r["embedding"], dtype=float)
        uv = v / np.linalg.norm(v)
        want = max(round(float(uv @ c), 6) for c in cv.values())
        assert abs(sc[r["vec_id"]]["proto_sim"] - want) < 1e-9, r["vec_id"]

    bad = spark.createDataFrame(
        [(900, [1.0, None, 0.0])], "vec_id bigint, embedding array<double>"
    )
    b = domain_scores(bad, cents.limit(0).unionByName(cents), assign_round=6).collect()[0]
    assert b["domain"] is None and b["proto_sim"] is None

    kept = prune_prototypes(emb, (1, 3), centroids=cents)
    got = {}
    for r in kept.collect():
        got.setdefault(r["domain"], set()).add((r["vec_id"], r["proto_q6"]))
    full = {}
    for vid, r in sc.items():
        full.setdefault(r["domain"], []).append(
            (int(round(r["proto_sim"] * 1e6)), vid)
        )
    for d, rows in full.items():
        k = math.ceil(len(rows) / 3)
        assert len(got[d]) == k, d
        kept_scores = sorted(q for _, q in got[d])
        dropped = sorted(
            q for q, vid in rows if vid not in {v for v, _ in got[d]}
        )
        # least-prototypical band: max kept <= min dropped (ties equal)
        assert kept_scores[-1] <= dropped[0], d


def test_assign_domains_unassignable_rows_and_retag_guard(spark):
    """A row whose similarity is NULL against EVERY centroid (NULL
    embedding element, length mismatch vs the centroids) gets a NULL
    domain from assign_domains — not the smallest cent_id via the
    tie-breaker (r11 advisor catch) — and domain_tag folds it into
    missing_domain; re-tagging a frame that already carries domain_col
    raises instead of producing an ambiguous join."""
    import pytest

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        assign_domains,
        domain_tag,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.6, 0.8, 0.0]),
            (3, [0.5, None, 0.1]),      # NULL element -> unassignable
            (4, [1.0, 0.0]),            # length mismatch -> unassignable
        ],
        "vec_id bigint, embedding array<double>",
    )
    cents = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    got = {r.vec_id: r.domain for r in assign_domains(emb, cents).collect()}
    assert got[0] == 0 and got[1] == 1 and got[2] == 1
    assert got[3] is None and got[4] is None
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string"
    )
    tagged = domain_tag(docs, emb, centroids=cents)
    by_id = {r.doc_id: r.domain for r in tagged.collect()}
    assert by_id[3] == -1 and by_id[4] == -1   # unassignable -> sentinel
    assert by_id[5] == -1                      # no embedding -> sentinel
    assert by_id[0] == 0 and by_id[2] == 1
    with pytest.raises(ValueError, match="already carries"):
        domain_tag(tagged, emb, centroids=cents)


def test_shard_manifest_backticked_column_and_unstaged_sidecar(spark, tmp_path):
    """shard_manifest survives a backtick in the id column name (the
    one SQL-string interpolation in the family — r11 advisor catch),
    and write_training_shards(stage_manifest=False) keeps the
    single-materialization write path while still landing a sidecar
    that verifies clean for a deterministic input."""
    from pyspark_dist_explore_spark.sources.sinks import (
        shard_manifest,
        verify_training_shards,
        write_training_shards,
    )

    weird = spark.range(20).select(
        F.col("id").alias("the `odd` id"), F.lit(0).alias("shard")
    )
    rows = shard_manifest(weird, "shard", "the `odd` id").collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 20
    assert rows[0]["sum_id"] == sum(range(20)) and rows[0]["max_id"] == 19

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("payload")
    )
    path = str(tmp_path / "dump_unstaged")
    write_training_shards(
        df, "doc_id", path, shards=4, stage_manifest=False
    )
    report = verify_training_shards(spark, path)
    assert report.count() == 4 and all(r.ok for r in report.collect())


# --------------------------------------------------------------------------
# semantic decontamination (decontam.semantic_contaminated_ids)
# --------------------------------------------------------------------------


def test_semantic_contaminated_ids_flags_paraphrase_embedding(spark):
    """A train doc whose embedding is a near-copy of an eval item flags
    with THAT eval id; dissimilar train docs pass; empty eval flags
    nothing; an eval side over the cap is a hard error."""
    import numpy as np
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.decontam import semantic_contaminated_ids

    rng = np.random.default_rng(11)
    e0 = rng.normal(size=16)
    e1 = rng.normal(size=16)
    e1 -= (e0 @ e1) / (e0 @ e0) * e0
    train = spark.createDataFrame(
        [
            (1, [float(x) for x in e0 + 1e-3 * rng.normal(size=16)]),  # ~ eval 100
            (2, [float(x) for x in e1]),                                # ~ eval 101
            (3, [float(x) for x in e0 - e1]),                           # far from both
        ],
        "doc_id bigint, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [float(x) for x in e0]), (101, [float(x) for x in e1])],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r.doc_id: (r.eval_id, r.cos_sim)
        for r in semantic_contaminated_ids(
            train, ev, threshold=0.99, eval_id_col="vec_id"
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1][0] == 100 and got[1][1] >= 0.99
    assert got[2][0] == 101 and got[2][1] == 1.0

    empty_ev = ev.where("vec_id < 0")
    assert semantic_contaminated_ids(
        train, empty_ev, threshold=0.9, eval_id_col="vec_id"
    ).count() == 0

    with _pytest.raises(ValueError, match="max_eval_rows"):
        semantic_contaminated_ids(
            train, ev, threshold=0.9, eval_id_col="vec_id", max_eval_rows=1
        )


def test_semantic_contaminated_ids_matches_bruteforce(spark):
    """Flag set == numpy brute-force max-cosine over the same corpora
    (testdata embeddings as train, first 10 vectors as the eval side,
    threshold low enough that real matches exist)."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.decontam import semantic_contaminated_ids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ev = emb.where("vec_id < 10")
    got = {
        r.doc_id: r.eval_id
        for r in semantic_contaminated_ids(
            emb, ev, threshold=0.3, id_col="vec_id", eval_id_col="vec_id"
        ).collect()
    }
    rows = emb.collect()
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    U = {k: v / np.linalg.norm(v) for k, v in V.items()}
    want = {}
    for tid, tv in U.items():
        sims = {eid: float(np.round(tv @ U[eid], 6)) for eid in range(10)}
        best = max(sims.values())
        if best >= 0.3:
            want[tid] = min(e for e, s in sims.items() if s == best)
    assert got == want
    assert len(want) >= 10  # the probe must actually flag something


def test_cosine_pairs_invariant_to_block_count(spark):
    """n_blocks is a pure execution-tiling knob: the emitted pair set
    must be identical at 1, 2, and 5 blocks (each pair is scored in
    exactly one block-pair group whatever the tiling)."""
    from pyspark_dist_explore_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    sets = [
        sorted(map(tuple, cosine_neardup_pairs(emb, threshold=0.3, n_blocks=b).collect()))
        for b in (1, 2, 5)
    ]
    assert sets[0] == sets[1] == sets[2]
    assert len(sets[0]) > 0


def test_neardup_clusters_lazy_chain_boundary(spark):
    """The documented correctness boundary of the lazy resolver: a path
    graph of diameter D resolves exactly when rounds >= D and matches
    the eager convergent form; below D the propagation is incomplete by
    construction (this is WHY unknown graph shapes use the eager form)."""
    from pyspark_dist_explore_spark.operators.dedup import (
        neardup_clusters,
        neardup_clusters_lazy,
    )

    # path 0-1-2-...-9: diameter 9
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a bigint, doc_b bigint"
    )
    full = sorted(
        map(tuple, neardup_clusters_lazy(pairs, rounds=9).collect())
    )
    eager = sorted(map(tuple, neardup_clusters(pairs).collect()))
    assert full == eager
    assert all(cluster == 0 for _, cluster, _ in full)
    # under-provisioned rounds: node 9 has NOT yet received label 0
    partial = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters_lazy(pairs, rounds=3).collect()
    }
    assert partial[9] != 0


def test_semantic_pairs_validates_inputs(spark):
    """Bad centroids frame and out-of-range threshold fail loudly at
    build, not with a downstream analyzer error."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import semantic_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    bad_cents = emb.limit(2)  # wrong columns entirely
    with _pytest.raises(ValueError, match="cent_id"):
        semantic_pairs(emb, centroids=bad_cents)
    with _pytest.raises(ValueError, match="threshold"):
        semantic_pairs(emb, threshold=1.5)


def test_lsh_bucket_md5_matches_duckdb(spark):
    """The md5-plane LSH signature is bit-identical across engines:
    every vector's 4-plane bucket matches DuckDB's rendering of the
    same plane-sign + projection arithmetic (lsh_bucket_sql — one
    definition, two dialects).  This is what lets the registered 'lsh'
    section of vector_exact_search be hash-checked end to end."""
    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        lsh_bucket,
        lsh_bucket_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return emb.select(
            "vec_id",
            lsh_bucket(_unit(F.col("embedding")), 4, hash_fn="md5").alias("bucket"),
        )

    unit = (
        "CASE WHEN sqrt(list_dot_product(ve, ve)) > 0 "
        "THEN list_transform(ve, x -> x / sqrt(list_dot_product(ve, ve))) "
        "ELSE list_transform(ve, x -> 0.0) END"
    )
    oracle = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
u AS (SELECT vec_id, {unit} AS uv FROM v)
SELECT vec_id, {lsh_bucket_sql('uv', 4)} AS bucket FROM u
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_lsh_md5_variant_same_shape_as_default(spark):
    """hash_fn is a bucketing choice, not a semantics change: both
    variants return (query_id, rank, vec_id, cos_sim) with ranks
    1..k' per query and every cos_sim exact within the probed bucket."""
    from pyspark_dist_explore_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for fn in ("xxhash64", "md5"):
        rows = ann_lsh_topk(emb, queries, k=5, n_planes=4, hash_fn=fn).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.rank)
        for q, ranks in by_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), (fn, q, ranks)
        assert len(rows) > 0, fn


def test_lsh_bucket_literal_planes_validate_dim(spark):
    """The literal md5-plane path raises LOUDLY on a vector whose length
    differs from ``dim=`` — zip_with would otherwise NULL-pad, the
    projection would go NULL, and every plane bit would silently resolve
    to 0 (wrong bucket, no error, oracle divergence)."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import lsh_bucket

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "id long, v array<double>")
    ok = df.select(lsh_bucket(F.col("v"), 2, hash_fn="md5", dim=3).alias("b")).collect()
    assert len(ok) == 1
    with _pytest.raises(Exception, match="vector length 3 != dim=4"):
        df.select(lsh_bucket(F.col("v"), 2, hash_fn="md5", dim=4).alias("b")).collect()


def test_cosine_pairs_assume_unit_matches_default(spark):
    """``assume_unit=True`` on pre-normalized input returns the same pair
    set as the default re-normalizing path (single vs double
    normalization agree after the round(...,6) output contract) — the
    flag exists so single-normalized arithmetic matches the oracle's
    bit pattern, not to change results."""
    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        cosine_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    unit = emb.select("vec_id", _unit(F.col("embedding")).alias("embedding"))
    base = cosine_neardup_pairs(emb, threshold=0.45, n_blocks=2)
    fast = cosine_neardup_pairs(unit, threshold=0.45, n_blocks=2, assume_unit=True)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, fast.collect()))


def test_ivf_fixed_centroids_full_probe_equals_exact(spark):
    """The deterministic fixed-centroid IVF form (what the registered
    vector_ann_topk hash-checks) degrades to brute force when every cell
    is probed: n_probe == n_cells means scored == the full corpus, so
    the result must equal exact_topk row for row (the sequential-fold
    re-rank and the Arrow-einsum re-rank agree at the round-6 output
    contract)."""
    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        exact_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    full = ivf_topk(
        emb, q, k=5, n_probe=8, centroids=cents, assign_round=6
    ).collect()
    exact = exact_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))


def test_ivf_fixed_centroids_validate_inputs(spark):
    """Bad centroids frames fail loudly at build on both IVF forms."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        ivf_topk,
        ivf_topk_packed,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    bad = emb.limit(2)  # wrong columns entirely
    with _pytest.raises(ValueError, match="cent_id"):
        ivf_topk(emb, q, centroids=bad)
    mm = dimension_minmax(emb)
    quant = quantize_embeddings(emb, mm)
    with _pytest.raises(ValueError, match="cent_id"):
        ivf_topk_packed(quant, mm, q, centroids=bad)


def test_ivf_packed_fixed_centroids_same_cells_as_float(spark):
    """With the same fixed cells and round-6 grids, the packed form's
    PROBE SELECTION matches the float form's (query-side arithmetic is
    identical — float qv vs float cv); corpus-side assignments may
    differ only where int8 quantization moved a vector across a cell
    boundary, so spot-check agreement is high but not required to be
    total.  What IS required: both forms return well-formed per-query
    rankings over the same query set."""
    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        dimension_minmax,
        ivf_topk,
        ivf_topk_packed,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    mm = dimension_minmax(emb)
    quant = quantize_embeddings(emb, mm)
    f = ivf_topk(emb, q, k=5, n_probe=2, centroids=cents, assign_round=6).collect()
    p = ivf_topk_packed(
        quant, mm, q, k=5, n_probe=2, centroids=cents, assign_round=6
    ).collect()
    for rows in (f, p):
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.rank)
        assert set(by_q) == {0, 1, 2, 3, 4}
        for qid, ranks in by_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
    # quantization at 8 bits rarely moves a vector across a cell
    # boundary: demand substantial overlap between the two top-5 sets
    fs = {(r.query_id, r.vec_id) for r in f}
    ps = {(r.query_id, r.vec_id) for r in p}
    assert len(fs & ps) / len(fs) >= 0.6, (fs, ps)


def test_semantic_pairs_cell_budget_guard(spark):
    """max_cell_rows: a cell larger than the budget fails LOUDLY at
    execution time (naming the cell and the n_centroids recipe) instead
    of silently going quadratic; a generous budget and None both pass."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        semantic_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # ONE centroid -> every vector lands in the same cell (the degenerate
    # collapse the guard exists for)
    cents = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    with _pytest.raises(Exception, match="max_partition_rows=10"):
        semantic_pairs(
            emb, threshold=0.45, n_blocks=2, centroids=cents, max_cell_rows=10
        ).collect()
    ok = semantic_pairs(
        emb, threshold=0.45, n_blocks=2, centroids=cents, max_cell_rows=None
    ).count()
    big = semantic_pairs(
        emb, threshold=0.45, n_blocks=2, centroids=cents, max_cell_rows=1 << 20
    ).count()
    assert ok == big


def test_cosine_pairs_partition_budget_requires_partition_col(spark):
    from pyspark_dist_explore_spark.operators.similarity import cosine_neardup_pairs
    import pytest as _pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    with _pytest.raises(ValueError, match="requires partition_col"):
        cosine_neardup_pairs(emb, max_partition_rows=10)


def test_word2vec_same_config_repeatable(spark):
    """The seeded Word2Vec fit is bit-stable for a FIXED (partitioning ×
    shuffle-partitions) config: two fits in the same session produce
    identical vectors.  (It is NOT stable ACROSS partitionings — audited
    at sf0.1 in round 8, documented in COVERAGE.md X5f: seed fixes
    per-partition RNG streams, training aggregation follows the layout —
    which is why word2vec_topk is rows-only and why reproducible
    pipelines pin their partitioning or persist the model.)"""
    from pyspark_dist_explore_spark.operators.textstats import word2vec_embeddings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        (r.doc_id, tuple(round(x, 12) for x in r.vec))
        for r in word2vec_embeddings(docs, "text", "doc_id").collect()
    )
    b = sorted(
        (r.doc_id, tuple(round(x, 12) for x in r.vec))
        for r in word2vec_embeddings(docs, "text", "doc_id").collect()
    )
    assert a == b


def test_span_dedup_matches_python_spec_property(spark):
    """Property pin for X23: distributed execution == a pure-Python
    rendering of the spec (k-gram duplicate detection over the
    normalized stream, remove-all coverage, ordered rebuild) on
    arbitrary small corpora over a tiny alphabet (collisions forced)."""
    import re as _re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_dist_explore_spark.operators.textstats import drop_duplicate_spans

    def spec(texts: list[str], k: int):
        toks = {
            i: _re.sub(r"\s+", " ", t.lower()).strip().split(" ")
            for i, t in enumerate(texts)
        }
        counts: dict[tuple, int] = {}
        for l in toks.values():
            if len(l) >= k:
                for s in range(len(l) - k + 1):
                    g = tuple(l[s : s + k])
                    counts[g] = counts.get(g, 0) + 1
        out = {}
        for i, l in toks.items():
            covered = set()
            n_spans = 0
            if len(l) >= k:
                for s in range(len(l) - k + 1):
                    if counts[tuple(l[s : s + k])] >= 2:
                        n_spans += 1
                        covered.update(range(s, s + k))
            keep = [t for p, t in enumerate(l) if p not in covered]
            out[i] = (" ".join(keep), len(keep), len(l) - len(keep), n_spans)
        return out

    token = st.sampled_from(["aa", "bb", "cc"])
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=6), k=st.integers(2, 4))
    def inner(texts, k):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {
            r["doc_id"]: (r["text"], r["n_tok_kept"], r["n_tok_dropped"], r["n_dup_spans"])
            for r in drop_duplicate_spans(df, "text", "doc_id", k=k).collect()
        }
        assert got == spec(texts, k)

    inner()


# --------------------------------------------------------------------------
# incremental near-dup vs a corpus snapshot (dedup.incremental_minhash_neardup)
# --------------------------------------------------------------------------


def test_incremental_minhash_neardup_semantics_and_equivalence(spark):
    """A new batch probes a snapshot's PRECOMPUTED band+signature
    artifacts: the re-crawled page (exact copy and shingle-level
    near-copy) is flagged against its snapshot source, novel content is
    not — and the result equals the from-scratch reference (full-corpus
    banding restricted to batch×snapshot pairs, signature-estimated
    Jaccard) exactly, since both run the same scheme."""
    from pyspark_dist_explore_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_rows,
        minhash_candidates,
        minhash_signatures,
    )

    snapshot = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    src = {r["doc_id"]: r["text"] for r in snapshot.limit(3).collect()}
    ids = sorted(src)
    batch = spark.createDataFrame(
        [
            (1_000_001, src[ids[0]]),                          # exact re-crawl
            (1_000_002, src[ids[1]] + " tiny new footer"),     # near-copy
            (1_000_003, " ".join(f"novel{i} content{i}" for i in range(40))),
        ],
        ["doc_id", "text"],
    )
    kw = dict(num_hashes=32, bands=8, shingle_n=3, hash_fn="xxhash64")
    snap_bands = minhash_band_rows(snapshot, "text", "doc_id", **kw)
    snap_sigs = minhash_signatures(
        snapshot, "text", "doc_id", num_hashes=32, shingle_n=3, hash_fn="xxhash64"
    )
    got = incremental_minhash_neardup(
        batch, snap_bands, snap_sigs, "text", "doc_id", threshold=0.5, **kw
    )
    rows = {(r["doc_id"], r["snapshot_id"]): r["est_jaccard"] for r in got.collect()}
    assert (1_000_001, ids[0]) in rows and rows[(1_000_001, ids[0])] == 1.0
    assert any(d == 1_000_002 and s == ids[1] for d, s in rows)
    assert not any(d == 1_000_003 for d, s in rows), "novel content must not flag"

    # from-scratch reference over the union, restricted to batch×snapshot
    union = snapshot.unionByName(batch)
    pairs = minhash_candidates(union, "text", "doc_id", **kw)
    u_sigs = minhash_signatures(
        union, "text", "doc_id", num_hashes=32, shingle_n=3, hash_fn="xxhash64"
    )
    from pyspark.sql import functions as FF

    cross = pairs.where(
        (FF.col("doc_b") >= 1_000_000) & (FF.col("doc_a") < 1_000_000)
    )
    a = u_sigs.select(
        FF.col("doc_id").alias("doc_a"),
        *[FF.col(f"h{i}").alias(f"__a{i}") for i in range(32)],
    )
    bb = u_sigs.select(
        FF.col("doc_id").alias("doc_b"),
        *[FF.col(f"h{i}").alias(f"__b{i}") for i in range(32)],
    )
    agree = None
    for i in range(32):
        t = (FF.col(f"__a{i}") == FF.col(f"__b{i}")).cast("int")
        agree = t if agree is None else agree + t
    ref = (
        cross.join(a, "doc_a")
        .join(bb, "doc_b")
        .select(
            FF.col("doc_b").alias("doc_id"),
            FF.col("doc_a").alias("snapshot_id"),
            (agree.cast("double") / FF.lit(32.0)).alias("est_jaccard"),
        )
        .where(FF.col("est_jaccard") >= 0.5)
    )
    want = {(r["doc_id"], r["snapshot_id"]): r["est_jaccard"] for r in ref.collect()}
    assert rows == want, "incremental path must equal the from-scratch reference"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold"):
        incremental_minhash_neardup(
            batch, snap_bands, snap_sigs, "text", "doc_id", threshold=0.0, **kw
        )


# --------------------------------------------------------------------------
# chunk→doc embedding pooling (similarity.mean_pool_embeddings, X28)
# --------------------------------------------------------------------------


def test_mean_pool_embeddings_matches_numpy_and_duckdb(spark):
    """Pooled vectors equal the numpy weighted mean @6dp on the real
    embeddings table (groups of ~50 vectors), and the DuckDB unnest
    twin agrees on the same grid."""
    import duckdb
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import mean_pool_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        (F.col("vec_id") % 10).alias("g"),
        "vec_id",
        "embedding",
    )
    out = {
        r["g"]: (r["embedding"], r["n_pooled"])
        for r in mean_pool_embeddings(
            emb, "g", "embedding", weight_col="vec_id"
        ).collect()
    }
    rows = emb.collect()
    by_g: dict[int, list] = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((r["vec_id"], np.array(r["embedding"], dtype=np.float64)))
    for g, members in by_g.items():
        w = np.array([m[0] for m in members], dtype=np.float64)
        mat = np.stack([m[1] for m in members])
        want = (mat * w[:, None]).sum(axis=0) / w.sum()
        got_vec, got_n = out[g]
        assert got_n == len(members)
        assert np.allclose(np.array(got_vec), want, atol=5e-7)

    con = duckdb.connect()
    duck = con.execute("""
WITH e AS (
  SELECT vec_id % 10 AS g, CAST(vec_id AS DOUBLE) AS w,
         unnest(embedding) AS val,
         generate_subscripts(embedding, 1) - 1 AS pos
  FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
)
SELECT g, pos, round(sum(CAST(val AS DOUBLE) * w) / sum(w), 6) AS val
FROM e GROUP BY g, pos
""").fetchall()
    con.close()
    for g, pos, val in duck:
        assert round(out[g][0][pos], 6) == val


def test_mean_pool_embeddings_semantics(spark):
    """normalize=True yields unit vectors; NULL vectors are skipped;
    mixed dims raise at execution instead of silently truncating."""
    import math

    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import mean_pool_embeddings

    df = spark.createDataFrame(
        [
            (1, [3.0, 0.0]),
            (1, [0.0, 4.0]),
            (1, None),
            (2, [1.0, 1.0]),
        ],
        "g int, embedding array<double>",
    )
    out = {r["g"]: r for r in
           mean_pool_embeddings(df, "g", "embedding", normalize=True).collect()}
    assert out[1]["n_pooled"] == 2, "NULL vector skipped"
    nrm = math.sqrt(sum(x * x for x in out[1]["embedding"]))
    assert abs(nrm - 1.0) < 1e-12
    # direction = (1.5, 2.0) normalized
    assert abs(out[1]["embedding"][0] - 0.6) < 1e-12
    assert abs(out[1]["embedding"][1] - 0.8) < 1e-12

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "g int, embedding array<double>"
    )
    with _pytest.raises(Exception, match="mixed vector dims"):
        mean_pool_embeddings(mixed, "g", "embedding").collect()


def test_drop_duplicate_spans_original_case_rebuild(spark):
    """rebuild='original': detection still collapses case variants of a
    span (normalized grams), but survivors keep their casing; counts
    and coverage are identical to the normalized form."""
    from pyspark_dist_explore_spark.operators.textstats import drop_duplicate_spans

    span = "The Quick Brown Fox Jumps Over The Lazy Dog"  # 9 tokens
    rows = [
        (1, f"Alpha Beta {span} Gamma"),
        (2, f"One Two {span.lower()} Three"),  # case variant still collapses
        (3, "Unique Original Casing Here Stays Put"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in drop_duplicate_spans(
        docs, "text", "doc_id", k=8, rebuild="original").collect()}
    assert out[1].text == "Alpha Beta Gamma", "casing preserved in survivors"
    assert out[2].text == "One Two Three"
    assert out[1].n_tok_dropped == 9 and out[2].n_tok_dropped == 9
    assert out[3].text == "Unique Original Casing Here Stays Put"
    norm = {r.doc_id: r for r in drop_duplicate_spans(
        docs, "text", "doc_id", k=8).collect()}
    for d in (1, 2, 3):
        assert (norm[d].n_tok_kept, norm[d].n_tok_dropped, norm[d].n_dup_spans) == (
            out[d].n_tok_kept, out[d].n_tok_dropped, out[d].n_dup_spans
        ), "counts identical across rebuild modes"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rebuild"):
        drop_duplicate_spans(docs, "text", "doc_id", rebuild="verbatim")


# --------------------------------------------------------------------------
# X29: hashed n-gram linear classifier gate (fastText-shaped quality filter)
# --------------------------------------------------------------------------


def test_classifier_score_matches_duckdb(spark):
    """Inline-weight classifier vs the DuckDB twin on real testdata —
    every gate column is exact BIGINT, so this is bit equality."""
    from pyspark_dist_explore_spark.operators.textstats import (
        classifier_score,
        classifier_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return classifier_score(docs, "text", "doc_id", threshold=(3, 7), hash_fn="md5")

    compare(
        spark,
        SF_SMOKE,
        build,
        classifier_sql("SELECT doc_id, text FROM documents", threshold=(3, 7)),
    )


def test_classifier_weight_chain_bits(spark):
    """Pin the md5 → bucket → mixer-weight integer chain against a pure
    Python recompute for a known gram — the cross-engine contract in
    one assert."""
    import hashlib

    from pyspark_dist_explore_spark.operators.textstats import (
        CLS_MIX,
        classifier_score,
    )

    B, S = 1 << 20, 1 << 16
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    r = classifier_score(
        df, "text", "doc_id", n_buckets=B, weight_scale=S, hash_fn="md5"
    ).first()
    h = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    w = (h % B) * CLS_MIX % S - S // 2
    assert (r.n_cls_grams, r.cls_logit_num) == (1, w)
    assert r.cls_keep == int(w >= 0)


def test_classifier_semantics(spark):
    """Planted-doc semantics: gram counts, empty/NULL gate, bigram
    toggle, threshold monotonicity, weights-frame == inline when the
    table encodes the same mixer."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.textstats import (
        CLS_MIX,
        classifier_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "The  QUICK brown fox jumps"),
            (2, "one"),
            (3, ""),
            (4, None),
            (5, "a b c a b c a b c"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in classifier_score(docs, "text", "doc_id").collect()}
    # uni + bi grams of n tokens = 2n - 1
    assert out[1].n_cls_grams == 2 * 5 - 1
    assert out[2].n_cls_grams == 1
    assert (out[3].n_cls_grams, out[3].cls_logit_num, out[3].cls_keep) == (0, 0, 0)
    assert (out[4].n_cls_grams, out[4].cls_logit_num, out[4].cls_keep) == (0, 0, 0)
    uni = {
        r.doc_id: r
        for r in classifier_score(docs, "text", "doc_id", bigrams=False).collect()
    }
    assert uni[1].n_cls_grams == 5 and uni[5].n_cls_grams == 9

    # monotonicity: raising the threshold can only shrink the kept set
    kept = {}
    for num in (-1000, 0, 1000):
        res = classifier_score(docs, "text", "doc_id", threshold=(num, 1)).collect()
        kept[num] = {r.doc_id for r in res if r.cls_keep}
    assert kept[1000] <= kept[0] <= kept[-1000]

    # weights-frame form: a table holding the mixer weight for EVERY
    # bucket must reproduce the inline form exactly
    B, S = 1 << 10, 1 << 8
    wtab = spark.range(B).select(
        F.col("id").alias("bucket"),
        (F.col("id") * F.lit(CLS_MIX) % F.lit(S) - F.lit(S // 2)).alias("weight"),
    )
    inline = classifier_score(docs, "text", "doc_id", n_buckets=B, weight_scale=S)
    tabled = classifier_score(
        docs, "text", "doc_id", n_buckets=B, weight_scale=S, weights=wtab
    )
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, tabled.collect()))

    # unmatched buckets weigh 0: an empty weight table scores every doc 0
    empty_w = wtab.where("bucket < 0")
    zeroed = classifier_score(docs, "text", "doc_id", weights=empty_w).collect()
    assert all(r.cls_logit_num == 0 for r in zeroed)
    assert {r.doc_id for r in zeroed if r.cls_keep} == {1, 2, 5}  # n>0 and 0 >= 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="weight_scale"):
        classifier_score(docs, "text", "doc_id", weight_scale=3)
    with _pytest.raises(ValueError, match="denominator"):
        classifier_score(docs, "text", "doc_id", threshold=(0, 0))
    with _pytest.raises(ValueError, match="missing column"):
        classifier_score(docs, "text", "doc_id", weights=docs)


def test_classifier_inline_plan_no_exchange(spark):
    """The inline-weight gate is ONE row-local projection: no Exchange,
    no Python, in the physical plan — the 100 TB contract (the filter
    rides the scan)."""
    from pyspark_dist_explore_spark.operators.textstats import classifier_score
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        classifier_score(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pooled_gate_section_partition_invariant(spark):
    """The registered ``embedding_quantize`` 'pooled' section's
    fixed-point discipline, proven: discretizing to round(x*1e6)
    integers BEFORE the pooling sums makes the hashed csv identical at
    any parallelism (float-sum order cannot matter when every addend is
    an exact integer in a double)."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.similarity import mean_pool_embeddings
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    def build(src):
        e6 = src.select(
            F.col("label").cast("bigint").alias("label"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * F.lit(1e6)),
            ).alias("embedding"),
        )
        pooled = mean_pool_embeddings(e6, "label")
        return sorted(
            (
                r.label,
                ",".join(str(int(round(v))) for v in r.embedding),
                r.n_pooled,
            )
            for r in pooled.collect()
        )

    one = build(emb.repartition(1))
    many = build(emb.repartition(13, "vec_id"))
    assert one == many


# --------------------------------------------------------------------------
# X31: Gopher/MassiveText rule-set quality gate (Rae et al. 2021, A1.1)
# --------------------------------------------------------------------------


def test_gopher_gate_matches_duckdb(spark):
    """Full twin on real testdata at the registered bounds — every gq_*
    column is an exact integer, so the equality is bit-for-bit."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_quality_gate,
        gopher_sql,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in gopher_quality_gate(
            docs, "text", "doc_id", min_words=20, min_stop_words=1
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            gopher_sql(
                "SELECT doc_id, text FROM documents", min_words=20, min_stop_words=1
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_gopher_gate_rule_semantics(spark):
    """Each published rule fires on a planted violator and ONLY that
    rule's signal explains the drop; a clean doc passes."""
    from pyspark_dist_explore_spark.operators.textstats import gopher_quality_gate

    clean = "the quick brown fox and that dog have fun with all of them just fine"
    rows = [
        (1, clean),  # passes at min_words=5
        (2, None),  # null -> zero words
        (3, "- a\n- b\n- c"),  # 100% bullet lines
        (4, "so tired...\nreally...\nvery...\nyes"),  # 75% ellipsis lines
        (5, "the of and " + "# " * 40),  # symbol ratio >> 0.1
        (6, "1 2 3 4 5 6 7 8 9 10 the of"),  # <80% alpha words
        (7, "internationalization " * 8 + "the of"),  # mean word len > 10
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_gate(
            df, "text", "doc_id", min_words=5, min_stop_words=1
        ).collect()
    }
    assert out[1]["gq_keep"] == 1
    assert out[2]["gq_keep"] == 0 and out[2]["gq_n_words"] == 0
    assert out[3]["gq_keep"] == 0 and out[3]["gq_bullet_lines"] == 3
    assert out[4]["gq_keep"] == 0 and out[4]["gq_ellipsis_lines"] == 3
    assert out[5]["gq_keep"] == 0 and out[5]["gq_n_hash"] == 40
    assert out[6]["gq_keep"] == 0 and 5 * out[6]["gq_n_alpha_words"] < 4 * out[6]["gq_n_words"]
    assert out[7]["gq_keep"] == 0 and out[7]["gq_word_chars"] > 10 * out[7]["gq_n_words"]


def test_gopher_stopword_rule_counts_types_not_tokens(spark):
    """Rule 7 counts DISTINCT stop-word types present (the paper's
    'contains at least 2 of'), not occurrences: 'the the the' is one."""
    from pyspark_dist_explore_spark.operators.textstats import gopher_quality_gate

    df = spark.createDataFrame(
        [(1, "the the the the aaa bbb"), (2, "the of aaa bbb")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["gq_n_stop"]
        for r in gopher_quality_gate(df, "text", "doc_id").collect()
    }
    assert out == {1: 1, 2: 2}


def test_gopher_gate_plan_no_exchange(spark):
    """Like the X29 classifier: one row-local staged projection — no
    Exchange, no Python in the physical plan (the filter rides the
    scan at any corpus size)."""
    from pyspark_dist_explore_spark.operators.textstats import gopher_quality_gate
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        gopher_quality_gate(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_merged_profile_equals_standalone(spark):
    """text_profile_lang(gopher=...) rides one scan but must emit the
    exact same gq_* values as the standalone gate."""
    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_quality_gate,
        text_profile_lang,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    gq_cols = [
        "gq_n_words", "gq_word_chars", "gq_n_hash", "gq_n_ellipsis",
        "gq_n_alpha_words",
        "gq_n_stop", "gq_n_lines", "gq_bullet_lines", "gq_ellipsis_lines",
        "gq_keep",
    ]
    merged = {
        r["doc_id"]: tuple(r[c] for c in gq_cols)
        for r in text_profile_lang(
            docs, "text", "doc_id", gopher={"min_words": 20}
        ).collect()
    }
    alone = {
        r["doc_id"]: tuple(r[c] for c in gq_cols)
        for r in gopher_quality_gate(docs, "text", "doc_id", min_words=20).collect()
    }
    assert merged == alone


# --------------------------------------------------------------------------
# X32: full Gopher repetition battery (top/dup n-gram char fractions)
# --------------------------------------------------------------------------


def test_repetition_battery_matches_duckdb(spark):
    """Full long-format twin on real testdata — integer numerators are
    bit-exact, fractions share the @6 grid."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_repetition_battery,
        gopher_repetition_sql,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = sorted(
        tuple(r) for r in gopher_repetition_battery(docs, "text", "doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            gopher_repetition_sql("SELECT doc_id, text FROM documents")
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_repetition_battery_semantics(spark):
    """Planted docs: a repeated phrase dominates top/dup fractions at
    n=2 but scores 0 at n=5 (its 5-gram windows are all distinct); a
    fully unique doc scores 0 everywhere; short docs emit rows only for
    n ≤ token count."""
    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_repetition_battery,
    )

    rows = [
        (1, "alpha beta alpha beta alpha beta gamma"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["n"]): r.asDict()
        for r in gopher_repetition_battery(
            df, "text", "doc_id", top_ns=(2,), dup_ns=(5,)
        ).collect()
    }
    # doc 1: 'alpha beta' x3 covers 27 of 32 word chars
    assert got[(1, 2)]["top_gram"] == "alpha beta"
    assert got[(1, 2)]["top_cnt"] == 3
    assert got[(1, 2)]["top_chars"] == 27 and got[(1, 2)]["word_chars"] == 32
    assert got[(1, 2)]["top_char_frac"] == got[(1, 2)]["dup_char_frac"] == 0.84375
    assert got[(1, 5)]["dup_char_frac"] == 0.0  # 5-gram windows all distinct
    assert got[(2, 2)]["dup_char_frac"] == 0.0 and got[(2, 2)]["top_cnt"] == 1
    # doc 3 has 2 tokens: a bigram row exists, no 5-gram row
    assert (3, 2) in got and (3, 5) not in got


def test_repetition_battery_tiebreak_lexicographic(spark):
    """Two grams at the same max count: the LEXICOGRAPHICALLY smallest
    wins — the pick is a pure function of the corpus, not of partition
    order."""
    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_repetition_battery,
    )

    # 'zz yy' and 'aa bb' both appear twice (other bigrams once)
    df = spark.createDataFrame(
        [(1, "zz yy zz yy qq aa bb aa bb")], "doc_id bigint, text string"
    )
    out = gopher_repetition_battery(
        df, "text", "doc_id", top_ns=(2,), dup_ns=()
    ).collect()
    row = {r["n"]: r for r in out}[2]
    assert row["top_cnt"] == 2 and row["top_gram"] == "aa bb"


def test_repetition_battery_validation(spark):
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import (
        gopher_repetition_battery,
    )

    with _pytest.raises(ValueError, match="gram sizes"):
        gopher_repetition_battery(None, "text", "doc_id", top_ns=(1,), dup_ns=())


# --------------------------------------------------------------------------
# X33: CCNet head/middle/tail perplexity bucketing
# --------------------------------------------------------------------------


def test_perplexity_buckets_match_duckdb(spark):
    """Per-lang tertiles over the unigram scorer's output: the SAME
    scored rows bucketed by both engines agree exactly (quantile_cont
    == F.percentile linear interpolation, the summary_stats precedent)."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        perplexity_buckets,
        perplexity_buckets_sql,
        unigram_logprob_scores,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    scored = unigram_logprob_scores(docs, "text", "doc_id").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    got = sorted(
        (r["doc_id"], r["ppl_bucket"])
        for r in perplexity_buckets(scored, group_col="lang").collect()
    )
    rows = [(r["doc_id"], r["lang"], float(r["ppl"])) for r in scored.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE s(doc_id BIGINT, lang VARCHAR, ppl DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?,?,?)", rows)
    want = sorted(
        (r[0], r[-1])
        for r in con.execute(
            perplexity_buckets_sql("SELECT doc_id, lang, ppl FROM s", group_col="lang")
        ).fetchall()
    )
    assert got == want and len(got) == 500
    # tertiles are near-balanced within each group union
    from collections import Counter

    sizes = Counter(b for _, b in got)
    assert set(sizes) == {0, 1, 2}
    assert max(sizes.values()) - min(sizes.values()) < 20


def test_perplexity_buckets_semantics(spark):
    """Head = LOWEST perplexity; a doc exactly on a threshold lands in
    the lower bucket (closed left); validation rejects bad cuts."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import perplexity_buckets

    # scores 1..6 -> tertile thresholds ~2.67/4.33: buckets 0,0,1,1,2,2
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 7)], "doc_id bigint, ppl double"
    )
    got = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(df).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2}
    # exact threshold: cuts=(0.5,) over 1,2,3 -> median 2.0; the doc
    # scoring exactly 2.0 lands in the LOWER bucket (closed left)
    df2 = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "doc_id bigint, ppl double"
    )
    got2 = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df2, cuts=(0.5,)).collect()
    }
    assert got2 == {1: 0, 2: 0, 3: 1}
    with _pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(df, cuts=(0.0,))
    with _pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(df, cuts=(0.5, 0.3))


def test_perplexity_buckets_plan_no_global_sort(spark):
    """The threshold form: one tiny percentile aggregate broadcast back,
    bucket a row-local CASE — the corpus is never globally ordered."""
    from pyspark_dist_explore_spark.operators.textstats import (
        perplexity_buckets,
        unigram_logprob_scores,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    scored = unigram_logprob_scores(docs, "text", "doc_id")
    plan = (
        perplexity_buckets(scored)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" not in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort exchange
    assert "Broadcast" in plan


# --------------------------------------------------------------------------
# X34: Johnson-Lindenstrauss random projection (Rademacher planes)
# --------------------------------------------------------------------------


def test_random_projection_matches_duckdb(spark):
    """Float form @6 AND the discretized integer form bit-exact vs the
    DuckDB twin — one plane-sign definition rendered to both engines."""
    import duckdb

    from pyspark_dist_explore_spark.operators.similarity import (
        random_projection,
        random_projection_sql,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    got = {
        r["vec_id"]: [round(x, 6) for x in r["rp"]]
        for r in random_projection(emb, out_dim=8, hash_fn="md5", dim=dim).collect()
    }
    want = {
        r[0]: [round(x, 6) for x in r[1]]
        for r in con.execute(
            "SELECT vec_id, "
            + random_projection_sql("CAST(embedding AS DOUBLE[])", 8)
            + " FROM embeddings"
        ).fetchall()
    }
    assert got == want and len(got) == 500

    emb6 = emb.selectExpr(
        "vec_id",
        "transform(cast(embedding as array<double>), x -> round(x * 1e6)) AS embedding",
    )
    goti = {
        r["vec_id"]: [int(x) for x in r["rp"]]
        for r in random_projection(
            emb6, out_dim=8, hash_fn="md5", dim=dim, scale=False
        ).collect()
    }
    wanti = {
        r[0]: [int(x) for x in r[1]]
        for r in con.execute(
            "SELECT vec_id, "
            + random_projection_sql(
                "list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000))",
                8,
                scale=False,
            )
            + " FROM embeddings"
        ).fetchall()
    }
    assert goti == wanti


def test_random_projection_shares_lsh_planes(spark):
    """The LSH signature IS the sign of this projection: bit p of
    lsh_bucket == (rp[p] >= 0) for the md5 planes — one corpus pass can
    land both artifacts."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        lsh_bucket,
        random_projection,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    dim = len(emb.first()["embedding"])
    unit = emb.select("vec_id", _unit(F.col("embedding")).alias("embedding"))
    buckets = {
        r["vec_id"]: r["b"]
        for r in unit.select(
            "vec_id", lsh_bucket(F.col("embedding"), 8, hash_fn="md5", dim=dim).alias("b")
        ).collect()
    }
    rps = {
        r["vec_id"]: r["rp"]
        for r in random_projection(unit, out_dim=8, hash_fn="md5", dim=dim).collect()
    }
    for vid, b in buckets.items():
        for p in range(8):
            assert ((b >> p) & 1) == (1 if rps[vid][p] >= 0 else 0), (vid, p)


def test_random_projection_preserves_planted_similarity(spark):
    """JL sanity: an exact duplicate projects identically (cos 1), and a
    scaled copy keeps cosine 1; the projection is linear so this is
    structural, not statistical."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.similarity import random_projection

    base = [float(np.sin(i)) for i in range(16)]
    rows = [
        (1, base),
        (2, base),  # exact duplicate
        (3, [2.0 * x for x in base]),  # scaled copy
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        r["vec_id"]: np.array(r["rp"])
        for r in random_projection(df, out_dim=4, hash_fn="md5", dim=16).collect()
    }
    assert np.allclose(got[1], got[2])
    assert np.allclose(2.0 * got[1], got[3])


def test_random_projection_guards_and_plan(spark):
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="out_dim"):
        random_projection(df, out_dim=0)
    # literal-plane dim mismatch raises at execution
    bad = random_projection(df, out_dim=2, hash_fn="md5", dim=8)
    with _pytest.raises(Exception, match="vector length"):
        bad.collect()
    plan = (
        random_projection(df, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rp_topk_recall_and_planted(spark):
    """Two-stage retrieve-then-rerank: recall floors on the worst-case
    (near-random) corpus, monotone in out_dim x overfetch, and a planted
    near-duplicate is ALWAYS retrieved (cos≈1 survives the projection —
    JL variance 1/out_dim cannot bury it in the noise floor)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.similarity import exact_topk, rp_topk
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qs = emb.where("vec_id < 10").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in exact_topk(emb, qs, k=5).collect()}

    def recall(od, ov):
        got = {
            (r["query_id"], r["vec_id"])
            for r in rp_topk(emb, qs, k=5, out_dim=od, overfetch=ov).collect()
        }
        return len(exact & got) / len(exact)

    lo, hi = recall(8, 4), recall(32, 8)
    assert hi >= 0.5, hi          # competitive with the IVF floor on this corpus
    assert hi > lo                # more sketch + more overfetch -> more recall

    # planted twin: vec 9000 := vec 0 + tiny noise must be hit #1 for query 0
    rng = np.random.default_rng(7)
    base = np.array(emb.where("vec_id = 0").first()["embedding"], dtype=float)
    twin = (base + rng.normal(0, 0.01, len(base))).tolist()
    planted = emb.unionByName(
        spark.createDataFrame(
            [(9000, twin, 0)], emb.schema
        )
    )
    got = rp_topk(planted, qs, k=5, out_dim=8, overfetch=4).collect()
    top_for_q0 = [r["vec_id"] for r in got if r["query_id"] == 0 and r["rank"] == 1]
    assert top_for_q0 == [9000]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overfetch"):
        rp_topk(emb, qs, overfetch=0)


def test_rp_topk_string_ids(spark):
    """The batch-local prune derives its Arrow schema from the coarse
    plan (not a hardcoded bigint DDL), so caller-supplied NON-integer id
    columns flow through: string-id results must equal the bigint-id
    results under the id mapping."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.similarity import rp_topk
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").where("vec_id < 200")
    qs = emb.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    base = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in rp_topk(emb, qs, k=3, out_dim=8, overfetch=4).collect()
    }

    s_emb = emb.withColumn("vec_id", F.concat(F.lit("doc-"), F.col("vec_id")))
    s_qs = qs.withColumn("query_id", F.concat(F.lit("doc-"), F.col("query_id")))
    got = rp_topk(s_emb, s_qs, k=3, out_dim=8, overfetch=4).collect()
    assert got, "string-id rp_topk returned nothing"
    for r in got:
        qid = int(r["query_id"].removeprefix("doc-"))
        assert r["vec_id"] == f"doc-{base[(qid, r['rank'])]}"


def test_gopher_gate_matches_python_reference(spark):
    """Property-style pin: the integer rule gate agrees with a direct
    pure-Python implementation of the published rules over a planted
    grid of docs sweeping every rule boundary."""
    import re

    from pyspark_dist_explore_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        gopher_quality_gate,
    )

    def py_gate(text, min_words=5, min_stop=1):
        if text is None:
            text = ""
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        lines = text.split("\n")
        n = len(toks)
        wc = sum(len(t) for t in toks)
        n_hash = len(re.findall(r"#", text))
        n_ell = len(re.findall(r"\.\.\.|…", text))
        alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
        stop = sum(1 for s in GOPHER_STOPWORDS if s in toks)
        bl = sum(1 for l in lines if re.match(r"^[-*•]", l.lstrip()))
        el = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l.rstrip()))
        nl = len(lines)
        return int(
            min_words <= n <= 100_000
            and 3 * n <= wc <= 10 * n
            and 10 * n_hash <= n       # A1.1: each symbol ratio on its own
            and 10 * n_ell <= n
            and 10 * bl <= 9 * nl      # drop only when MORE than 90% / 30%
            and 10 * el <= 3 * nl
            and 5 * alpha >= 4 * n
            and stop >= min_stop
        )

    texts = [
        None, "", "   ",
        "the quick brown fox and that dog have fun with all of them",
        "aa bb cc dd ee",                          # all short words
        "the of and " + "# " * 20,                  # symbols
        "- x\n- y\nplain line of the day",          # bullets below 90%
        "- x\n- y\n- z",                            # bullets at 100%
        "wait...\nmore...\nok the end",             # ellipsis 2/3
        "the supercalifragilistic expialidocious " * 4,
        "1 2 3 4 5 6 7 the of and",
        "mixed the of content with words and 12 34 #",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["gq_keep"]
        for r in gopher_quality_gate(
            df, "text", "doc_id", min_words=5, min_stop_words=1
        ).collect()
    }
    want = {i: py_gate(t) for i, t in enumerate(texts)}
    assert got == want


# --------------------------------------------------------------------------
# X36: cross-corpus exact-content overlap audit
# --------------------------------------------------------------------------


def test_corpus_overlap_matches_duckdb(spark):
    """One-row census vs the DuckDB twin on two overlapping slices of
    real testdata (every column, incl. the rational fp_jaccard)."""
    import duckdb

    from pyspark_dist_explore_spark.operators.dedup import (
        corpus_overlap,
        corpus_overlap_sql,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = docs.where("doc_id < 300").select("doc_id", "text")
    b = docs.where("doc_id >= 200").select("doc_id", "text")
    got = tuple(corpus_overlap(a, b).collect()[0])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = con.execute(
        corpus_overlap_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id < 300",
            "SELECT doc_id, text FROM documents WHERE doc_id >= 200",
        )
    ).fetchall()[0]
    assert got == tuple(want)
    # sanity: the shared 200-299 slice forces overlap
    assert got[4] > 0 and got[5] >= 100


def test_corpus_overlap_semantics(spark):
    """Planted: duplicate rows count as DOCS in a_docs_in_b but once in
    the fp censuses; disjoint corpora score zero overlap; whitespace/
    case variants of one content collapse to one fingerprint."""
    from pyspark_dist_explore_spark.operators.dedup import corpus_overlap

    a = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "only in a")],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(10, "HELLO   world"), (11, "only in b"), (12, "only in b")],
        "doc_id bigint, text string",
    )
    r = corpus_overlap(a, b).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert (r["n_fp_a"], r["n_fp_b"]) == (2, 2)  # case/space variants collapse
    assert r["n_fp_common"] == 1
    assert r["a_docs_in_b"] == 2 and r["b_docs_in_a"] == 1
    assert r["fp_jaccard"] == round(1 / 3, 6)

    disjoint = corpus_overlap(
        a, spark.createDataFrame([(9, "zzz")], "doc_id bigint, text string")
    ).collect()[0]
    assert disjoint["n_fp_common"] == 0 and disjoint["fp_jaccard"] == 0.0


# --------------------------------------------------------------------------
# X43: K-way cross-source overlap matrix
# --------------------------------------------------------------------------


def test_corpus_overlap_matrix_matches_duckdb(spark):
    """Full K×K/2 matrix vs the DuckDB twin on real testdata with the
    gate's mirror adapter planting cross-source commons."""
    import duckdb

    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.dedup import (
        corpus_overlap_matrix,
        corpus_overlap_matrix_sql,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    mirror = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("src"), ((F.col("doc_id") + 7) % 20).cast("string")).alias(
            "source"
        ),
        "text",
    )
    mixed = docs.select(
        "doc_id", F.col("source").cast("string").alias("source"), "text"
    ).unionAll(mirror)
    got = sorted(tuple(r) for r in corpus_overlap_matrix(mixed).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    src = """
      SELECT doc_id, CAST(source AS VARCHAR) AS source, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             'src' || CAST((doc_id + 7) % 20 AS VARCHAR) AS source, text
      FROM documents WHERE doc_id % 5 = 0
    """
    want = sorted(
        tuple(r) for r in con.execute(corpus_overlap_matrix_sql(src)).fetchall()
    )
    assert got == want
    # the mirror adapter must plant real cross-source commons
    assert any(r[6] > 0 for r in got)
    # every unordered source pair appears, zero-overlap pairs included
    k = len({r[0] for r in got} | {r[1] for r in got})
    assert len(got) == k * (k - 1) // 2


def test_corpus_overlap_matrix_consistent_with_pairwise(spark):
    """Each matrix row must equal the two-corpus X36 census run on the
    same pair of source slices (the matrix IS the K²/2 pairwise sweep
    in one scan), and zero-overlap pairs materialize with exact
    totals."""
    from pyspark_dist_explore_spark.operators.dedup import (
        corpus_overlap,
        corpus_overlap_matrix,
    )

    df = spark.createDataFrame(
        [
            (1, "s1", "Hello  World"),
            (2, "s1", "hello world"),
            (3, "s1", "only in one"),
            (4, "s2", "HELLO   world"),
            (5, "s2", "different"),
            (6, "s3", "nothing shared"),
            (7, None, "hello world"),  # NULL source groups as ''
        ],
        "doc_id bigint, source string, text string",
    )
    all_rows = corpus_overlap_matrix(df).collect()
    null_grp = [r for r in all_rows if r["src_a"] == ""]
    assert len(null_grp) == 3 and all(r["n_a"] == 1 for r in null_grp)
    assert {r["src_b"]: r["n_fp_common"] for r in null_grp} == {
        "s1": 1, "s2": 1, "s3": 0
    }
    rows = {
        (r["src_a"], r["src_b"]): r for r in all_rows if r["src_a"] != ""
    }
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for (sa, sb), r in rows.items():
        a = df.where(df.source == sa).select("doc_id", "text")
        b = df.where(df.source == sb).select("doc_id", "text")
        c = corpus_overlap(a, b).collect()[0]
        for stat in (
            "n_a", "n_b", "n_fp_a", "n_fp_b",
            "n_fp_common", "a_docs_in_b", "b_docs_in_a",
        ):
            assert r[stat] == c[stat], (sa, sb, stat)
    assert rows[("s1", "s2")]["n_fp_common"] == 1
    assert rows[("s1", "s2")]["a_docs_in_b"] == 2  # both s1 variants collapse
    assert rows[("s2", "s3")]["n_fp_common"] == 0
    assert rows[("s2", "s3")]["n_b"] == 1 and rows[("s2", "s3")]["n_fp_a"] == 2


def test_minhash_band_rows_signatures_staging(spark):
    """signatures= derives the band frame from a precomputed signature
    table — bit-identical to the from-scratch build (a snapshot build
    must never pay the shingle+min pass twice), and mutually exclusive
    with shingle_rows=."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dedup import (
        minhash_band_rows,
        minhash_signatures,
        shingle_rows,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    kw = dict(num_hashes=32, bands=8, shingle_n=3, hash_fn="md5")
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=32, shingle_n=3, hash_fn="md5"
    )
    from_scratch = sorted(
        map(tuple, minhash_band_rows(docs, "text", "doc_id", **kw).collect())
    )
    from_sigs = sorted(
        map(
            tuple,
            minhash_band_rows(docs, "text", "doc_id", signatures=sigs, **kw).collect(),
        )
    )
    assert from_scratch == from_sigs and len(from_scratch) > 0

    with _pytest.raises(ValueError, match="not both"):
        minhash_band_rows(
            docs, "text", "doc_id",
            signatures=sigs,
            shingle_rows=shingle_rows(docs, "text", "doc_id", 3),
            **kw,
        )


# --------------------------------------------------------------------------
# X37: C4 heuristic cleaning (Raffel et al. 2020 §2.2)
# --------------------------------------------------------------------------


def test_c4_clean_rule_semantics(spark):
    """Every published C4 rule fires on a planted violator: line-level
    (terminal punctuation, ≥3 words, 'javascript') and page-level
    (<5 sentences, '{', 'lorem ipsum', bad-word list)."""
    from pyspark_dist_explore_spark.operators.textstats import c4_clean

    good = "\n".join(
        ["This is a fine sentence.", "Here is another good one!",
         "Is this a question?", 'She said "yes."', "And one more to close it."]
    )
    rows = [
        (1, good),                                            # passes everything
        (2, good.replace("another good one!", "another good one")),  # line loses punct
        (3, "Too few words.\nOk.\nNo.", ),                    # short lines dropped -> 1 sentence... 
        (4, good + "\nPlease enable javascript to continue."),# js line dropped, page kept
        (5, good + "\nfunction f() { return 1; }"),           # brace -> page dropped
        (6, good + "\nLorem Ipsum dolor sit amet."),          # lorem -> page dropped
        (7, good + "\nthis mentions forbiddenword here."),    # bad word -> dropped
        (8, None),                                            # null text
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_clean(
            df, "text", "doc_id", bad_words=("forbiddenword",)
        ).collect()
    }
    assert out[1]["c4_keep"] == 1 and out[1]["c4_n_kept_lines"] == 5
    # line without terminal punctuation is dropped -> only 4 sentences
    assert out[2]["c4_n_kept_lines"] == 4 and out[2]["c4_keep"] == 0
    # <3-word lines all dropped regardless of punctuation
    assert out[3]["c4_n_kept_lines"] == 1 and out[3]["c4_keep"] == 0
    # javascript LINE dropped, page survives (5 clean sentences remain)
    assert out[4]["c4_n_kept_lines"] == 5 and out[4]["c4_keep"] == 1
    assert out[5]["c4_has_brace"] == 1 and out[5]["c4_keep"] == 0
    assert out[6]["c4_has_lorem"] == 1 and out[6]["c4_keep"] == 0
    assert out[7]["c4_has_bad"] == 1 and out[7]["c4_keep"] == 0
    assert out[8]["c4_n_lines"] == 1 and out[8]["c4_keep"] == 0
    # the md5 verifies WHICH lines survived: doc 4's kept text == doc 1's
    assert out[4]["c4_kept_md5"] == out[1]["c4_kept_md5"]


def test_c4_clean_matches_duckdb(spark):
    """Bit-exact twin on planted realistic docs AND on the injected
    word-salad corpus (both dialects render one rule definition)."""
    import duckdb
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.textstats import (
        c4_clean,
        c4_sql,
        inject_punctuation,
        inject_punctuation_sql,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    inj = docs.select("doc_id", inject_punctuation(F.col("text")).alias("text"))
    got = sorted(
        map(tuple, c4_clean(inj, "text", "doc_id", min_sentences=12).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                c4_sql(
                    inject_punctuation_sql("SELECT doc_id, text FROM documents"),
                    min_sentences=12,
                )
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 500
    # the injected gate must be MIXED, not vacuous
    keeps = [r[-1] for r in got]
    assert 0 < sum(keeps) < len(keeps)


def test_c4_clean_plan_no_exchange(spark):
    """Like Gopher/X29: one row-local staged projection — no Exchange,
    no Python (the filter rides the scan at any corpus size)."""
    from pyspark_dist_explore_spark.operators.textstats import c4_clean
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        c4_clean(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_inject_punctuation_deterministic(spark):
    """The adapter is a pure function of (token, position): stable
    across partitionings, and suffixes actually mix all four kinds."""
    from pyspark.sql import functions as F

    from pyspark_dist_explore_spark.operators.textstats import inject_punctuation
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    a = {
        r["doc_id"]: r["t"]
        for r in docs.repartition(1)
        .select("doc_id", inject_punctuation(F.col("text")).alias("t"))
        .collect()
    }
    b = {
        r["doc_id"]: r["t"]
        for r in docs.repartition(7, "doc_id")
        .select("doc_id", inject_punctuation(F.col("text")).alias("t"))
        .collect()
    }
    assert a == b
    joined = " ".join(a.values())
    assert "." in joined and "?" in joined and "\n" in joined


# --------------------------------------------------------------------------
# X39: MinHash-LSH banding planner
# --------------------------------------------------------------------------


def test_lsh_planner_math_and_pick():
    """The planner reproduces the textbook banding model: curve values
    vs a direct recount, monotone S-curve, the (1/b)^(1/r) midpoint
    rule, and sensible picks for the engine's own schemes — and its
    fp/fn masses are consistent with an independent numeric integral."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.dedup import (
        lsh_candidate_prob,
        plan_minhash_lsh,
    )

    # curve == direct formula, monotone in s
    for b, r in ((8, 4), (4, 8), (16, 2)):
        prev = -1.0
        for i in range(11):
            s = i / 10
            p = lsh_candidate_prob(s, b, r)
            assert abs(p - (1 - (1 - s**r) ** b)) < 1e-12
            assert p >= prev
            prev = p
        # midpoint property: P(candidate) at (1/b)^(1/r) == 1-(1-1/b)^b
        mid = (1 / b) ** (1 / r)
        assert abs(lsh_candidate_prob(mid, b, r) - (1 - (1 - 1 / b) ** b)) < 1e-9

    # picks: t=0.6 chooses the engine's registered (8 bands, 4 rows);
    # t=0.8 chooses (4, 8) — the planner would RETUNE the default for a
    # strict threshold, which is exactly its job
    assert {k: plan_minhash_lsh(k, num_hashes=32)["bands"] for k in (0.6, 0.8)} == {
        0.6: 8, 0.8: 4,
    }
    p = plan_minhash_lsh(0.8, num_hashes=32)
    assert p["rows"] == 8 and p["bands"] * p["rows"] == 32
    # every divisor pair is reported exactly once
    alts = [(p["bands"], p["rows"])] + [
        (o["bands"], o["rows"]) for o in p["alternatives"]
    ]
    assert sorted(alts) == [(1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1)]

    # fp/fn masses: independent integral at finer grid agrees to ~1e-3
    def masses(b, r, t, n=20000):
        fp = fn = 0.0
        for i in range(n):
            s = (i + 0.5) / n
            pp = 1 - (1 - s**r) ** b
            if s < t:
                fp += pp / n
            else:
                fn += (1 - pp) / n
        return fp, fn

    fp, fn = masses(4, 8, 0.8)
    assert abs(p["fp_mass"] - fp) < 1e-3 and abs(p["fn_mass"] - fn) < 1e-3
    # trade direction: more bands => more candidates => more fp, less fn
    by_bands = {o["bands"]: o for o in p["alternatives"]}
    by_bands[4] = p
    assert by_bands[8]["fp_mass"] > by_bands[4]["fp_mass"]
    assert by_bands[8]["fn_mass"] < by_bands[4]["fn_mass"]

    with _pytest.raises(ValueError, match="threshold"):
        plan_minhash_lsh(1.0)
    with _pytest.raises(ValueError, match="num_hashes"):
        plan_minhash_lsh(0.5, num_hashes=1)
    with _pytest.raises(ValueError, match="in \\[0, 1\\]"):
        lsh_candidate_prob(1.5, 4, 8)


def test_c4_clean_matches_python_reference(spark):
    """Property-style pin: c4_clean agrees with a direct pure-Python
    implementation of the published rules over a seeded random grid of
    docs sweeping line counts, punctuation, word counts, 'javascript',
    braces, 'lorem ipsum' and bad words."""
    import hashlib
    import random
    import re

    from pyspark_dist_explore_spark.operators.textstats import c4_clean

    rng = random.Random(9)
    words = ["alpha", "beta", "Gamma", "deltaX", "ok", "the", "Z"]
    tails = [".", "!", "?", '"', "”", "", " ", ":", "..."]
    extras = ["", "javascript", "JavaScript rules", "{", "lorem ipsum",
              "Lorem Ipsum dolor", "forbidden"]

    seps = [" ", "  ", "\t", " \t "]  # the word count must split on \s+

    def rand_doc():
        lines = []
        for _ in range(rng.randint(0, 6)):
            ws = [rng.choice(words) for _ in range(rng.randint(0, 6))]
            extra = rng.choice(extras)
            if extra:
                ws.insert(rng.randint(0, len(ws)), extra)
            line = ws[0] if ws else ""
            for w in ws[1:]:
                line += rng.choice(seps) + w
            lines.append(line + rng.choice(tails))
        return "\n".join(lines) if lines else rng.choice(["", None])

    def py_c4(text, mw=3, ms=2, bad=("forbidden",)):
        t = text or ""
        lines = t.split("\n")
        kept = [
            x for x in lines
            if re.search(r'[.!?"”]$', x.rstrip())
            and len([w for w in re.split(r"\s+", x) if w]) >= mw
            and "javascript" not in x.lower()
        ]
        joined = "\n".join(kept)
        n_sent = len(re.findall(r"[.!?]", joined))
        toks = [w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w]
        keep = int(
            n_sent >= ms
            and "{" not in t
            and "lorem ipsum" not in t.lower()
            and not any(b in toks for b in bad)
        )
        return (
            len(lines), len(kept),
            hashlib.md5(joined.encode()).hexdigest(),
            n_sent, keep,
        )

    texts = [rand_doc() for _ in range(120)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (
            r["c4_n_lines"], r["c4_n_kept_lines"], r["c4_kept_md5"],
            r["c4_n_sentences"], r["c4_keep"],
        )
        for r in c4_clean(
            df, "text", "doc_id", min_sentences=2, bad_words=("forbidden",)
        ).collect()
    }
    want = {i: py_c4(t) for i, t in enumerate(texts)}
    assert got == want


def test_plan_minhash_lsh_predicts_measured_candidate_rate(spark):
    """X39 planner → operator wiring: run minhash_candidates with the
    planner's (bands, rows) pick on a PLANTED corpus (pairs with exact
    known token-Jaccard via shingle_n=1 and disjoint per-pair vocab) and
    check the measured per-level candidate rate tracks the S-curve
    ``lsh_candidate_prob`` the planner integrates — i.e. the planner's
    fp/fn masses describe the operator that ships, not a different
    scheme."""
    threshold, num_hashes = 0.7, 32
    plan = dedup.plan_minhash_lsh(threshold, num_hashes=num_hashes)
    bands, rows = plan["bands"], plan["rows"]
    assert bands * rows == num_hashes

    # five Jaccard levels: J = k / (k + 2e) with k shared + e extra each
    levels = {0.2: (6, 12), 1 / 3: (10, 10), 0.6: (15, 5), 0.8: (16, 2), 0.9: (18, 1)}
    n_pairs = 40
    recs, truth = [], {}
    doc = 0
    for J, (k, e) in levels.items():
        for p in range(n_pairs):
            tag = f"J{k}_{e}p{p}"
            shared = [f"{tag}s{i}" for i in range(k)]
            a = shared + [f"{tag}a{i}" for i in range(e)]
            b = shared + [f"{tag}b{i}" for i in range(e)]
            recs.append((doc, " ".join(a)))
            recs.append((doc + 1, " ".join(b)))
            truth[(doc, doc + 1)] = J
            doc += 2
    docs = spark.createDataFrame(recs, "doc_id bigint, text string")
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(
            docs, "text", "doc_id",
            num_hashes=num_hashes, bands=bands, shingle_n=1,
        ).collect()
    }
    # disjoint vocab => no cross-pair candidates possible except via
    # band-hash collisions, which must be absent at this scale
    assert cands <= set(truth), f"cross-pair collisions: {cands - set(truth)}"
    for J in levels:
        got = sum(1 for pair, s in truth.items() if s == J and pair in cands) / n_pairs
        want = dedup.lsh_candidate_prob(J, bands, rows)
        assert abs(got - want) <= 0.2, f"J={J}: measured {got} vs predicted {want}"


def test_cap_per_key_matches_duckdb_and_semantics(spark):
    """X41 per-host cap: kept set hash-matches the DuckDB twin, every
    key keeps min(n, n_key) rows, NULL keys group as '' (one capped
    bucket), and a new salt is an independent re-draw."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        cap_per_key,
        cap_per_key_sql,
    )

    rows = [(i, f"h{i % 4}" if i % 11 else None) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, host string")
    got = sorted(
        (r["doc_id"], r["host"]) for r in cap_per_key(docs, "host", "doc_id", 7).collect()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "host"]))
    want = sorted(map(tuple, con.execute(
        cap_per_key_sql("SELECT doc_id, host FROM docs", "host", "doc_id", 7)
    ).fetchall()))
    con.close()
    assert got == want
    from collections import Counter
    per_key = Counter(h if h is not None else "" for _, h in got)
    assert all(c <= 7 for c in per_key.values())
    assert per_key[""] == 7  # 18 NULL-host rows capped as one bucket
    # an uncapped key keeps everything
    few = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, host string")
    assert cap_per_key(few, "host", "doc_id", 7).count() == 3
    # new salt = independent re-draw of WHICH rows survive, same counts
    alt = {r["doc_id"] for r in cap_per_key(docs, "host", "doc_id", 7, salt="cap1").collect()}
    assert alt != {d for d, _ in got} and len(alt) == len(got)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must be >= 1"):
        cap_per_key(docs, "host", "doc_id", 0)


def test_materialize_mixture_matches_duckdb_and_semantics(spark):
    """X44 mixture epochs: the emitted (doc, epoch) multiset hash-
    matches the DuckDB twin; up-sampled sources repeat full epochs +
    an md5-prefix partial; an exact-1.0x target yields exactly one
    epoch and NO partial; down-sampled sources keep the prefix whose
    running token sum stays <= target; zero-total and target-0 and
    unlisted sources drop; a new salt re-draws the partial prefix."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        materialize_mixture,
        materialize_mixture_sql,
    )

    rows = [(i, f"s{i % 5}", (i * 7) % 13) for i in range(150)]
    rows += [(900, "szero", 0), (901, "szero", 0)]  # zero-total source
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok bigint")
    totals = {
        s: sum(t for _, src, t in rows if src == s)
        for s in ("s0", "s1", "s2", "s3")
    }
    targets = {
        "s0": totals["s0"] // 2,        # partial only
        "s1": totals["s1"] * 2 + totals["s1"] // 3,  # 2 full + partial
        "s2": totals["s2"],             # exactly one epoch, no partial
        "s3": 0,                        # dropped
        "szero": 50,                    # zero-total: dropped
        # s4 unlisted: dropped
    }
    out = materialize_mixture(docs, "source", "n_tok", "doc_id", targets)
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "source", "n_tok"]))
    want = sorted(map(tuple, con.execute(
        materialize_mixture_sql(
            "SELECT doc_id, source, n_tok FROM docs",
            "source", "n_tok", "doc_id", targets,
        )
    ).fetchall()))
    con.close()
    assert got == want and got
    by_src = {}
    for doc_id, src, n_tok, epoch in got:
        by_src.setdefault(src, []).append((doc_id, n_tok, epoch))
    assert set(by_src) == {"s0", "s1", "s2"}
    # s2: exactly one full epoch of every doc, no partial
    s2_docs = [d for d, s, _ in rows if s == "s2"]
    assert sorted(d for d, _, _ in by_src["s2"]) == sorted(s2_docs)
    assert {e for _, _, e in by_src["s2"]} == {1}
    # s1: epochs 1-2 carry every doc, epoch 3 is a strict partial prefix
    s1_docs = sorted(d for d, s, _ in rows if s == "s1")
    for e in (1, 2):
        assert sorted(d for d, _, ep in by_src["s1"] if ep == e) == s1_docs
    partial = [d for d, _, ep in by_src["s1"] if ep == 3]
    assert 0 < len(partial) < len(s1_docs)
    # s0: kept token sum fills the budget within the heaviest-doc slack
    s0_kept = sum(t for _, t, _ in by_src["s0"])
    assert s0_kept <= targets["s0"] > 0
    # token accounting: every source's emitted tokens stay <= target
    for s in by_src:
        assert sum(t for _, t, e in by_src[s]) <= targets[s]
    # new salt: same per-epoch counts, different partial membership
    alt = materialize_mixture(docs, "source", "n_tok", "doc_id", targets, salt="mix1")
    alt_partial = sorted(
        r["doc_id"] for r in alt.collect() if r["source"] == "s1" and r["epoch"] == 3
    )
    assert alt_partial != sorted(partial)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="targets must be >= 0"):
        materialize_mixture(docs, "source", "n_tok", "doc_id", {"s0": -1})


def test_top_frac_per_group_matches_duckdb_and_semantics(spark):
    """X45 per-group top-fraction: kept set hash-matches the DuckDB
    twin; every group keeps ceil(num*n/den) rows (small groups keep at
    least one); ties resolve by md5(salt:id) not partition order; NULL
    scores drop; NULL groups select as one '' group; frac=(0,1) keeps
    nothing; a new salt re-draws only within tied scores."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        top_frac_per_group,
        top_frac_per_group_sql,
    )

    rows = [
        (i, f"g{i % 3}" if i % 17 else None, (i * 31) % 7 if i % 13 else None)
        for i in range(120)
    ]
    # g-small: a 3-row group — ceil semantics must keep 1 at frac 1/4
    rows += [(200, "gsmall", 5), (201, "gsmall", 4), (202, "gsmall", 3)]
    docs = spark.createDataFrame(rows, "doc_id bigint, grp string, score bigint")
    got = sorted(tuple(r) for r in
                 top_frac_per_group(docs, "grp", "score", (1, 4), "doc_id").collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "grp", "score"]))
    want = sorted(map(tuple, con.execute(
        top_frac_per_group_sql(
            "SELECT doc_id, grp, score FROM docs", "grp", "score", (1, 4), "doc_id"
        )
    ).fetchall()))
    con.close()
    assert got == want and got
    from collections import Counter
    import math

    live = [(d, g, s) for d, g, s in rows if s is not None]
    sizes = Counter(g if g is not None else "" for _, g, _ in live)
    kept = Counter(g if g is not None else "" for _, g, _ in got)
    for g, n in sizes.items():
        assert kept[g] == math.ceil(n / 4), (g, n, kept[g])
    assert kept["gsmall"] == 1
    # the kept gsmall row is the top score
    assert [s for d, g, s in got if g == "gsmall"] == [5]
    # scores kept are >= scores dropped within each group, up to ties
    for g in sizes:
        key = g if g != "" else None
        kept_scores = sorted((s for d, gg, s in got if gg == key), reverse=True)
        all_scores = sorted((s for d, gg, s in live if gg == key), reverse=True)
        assert kept_scores == all_scores[: len(kept_scores)]
    # frac=(0,1) keeps nothing; bad frac raises
    assert top_frac_per_group(docs, "grp", "score", (0, 1), "doc_id").count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="frac must be"):
        top_frac_per_group(docs, "grp", "score", (1, 0), "doc_id")
    # new salt: same per-group counts, tie membership may change
    alt = top_frac_per_group(docs, "grp", "score", (1, 4), "doc_id", salt="top1")
    assert Counter(
        (r["grp"] if r["grp"] is not None else "") for r in alt.collect()
    ) == kept


def test_bpe_learn_matches_python_reference(spark):
    """X40: bpe_learn agrees with a direct pure-Python implementation
    of Sennrich et al. 2016 (char-init, freq-weighted adjacent-pair
    counts, greedy (count DESC, pair ASC) merges, stop below count 2)
    over a seeded random corpus."""
    import random
    from collections import Counter

    from pyspark_dist_explore_spark.operators.textstats import bpe_learn

    rng = random.Random(40)
    words = ["banana", "bandana", "ananas", "cabana", "nab", "band",
             "an", "na", "b", "la", "lab", "bala"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        for _ in range(60)
    ]

    def py_bpe(texts, k):
        freqs = Counter(w for t in texts for w in t.split() if w)
        segs = {w: tuple(w) for w in freqs}
        out = []
        for step in range(k):
            pc = Counter()
            for w, syms in segs.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += freqs[w]
            if not pc:
                break
            # tie-break: count DESC, then pair ASC on the bracket-coded
            # form — identical to ordering by (left, right) tuple
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            out.append((step, f"{a} {b}", a + b, cnt))
            new = {}
            for w, syms in segs.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                new[w] = tuple(merged)
            segs = new
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in bpe_learn(df, "text", k=12).orderBy("step").collect()]
    assert got == py_bpe(texts, 12)


def test_bpe_merges_sql_twin_and_encode(spark):
    """The unrolled DuckDB twin reproduces bpe_learn exactly (including
    early stop), and bpe_encode's fertility counts match a per-word
    driver-side segmentation with the same merges."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.textstats import (
        bpe_encode,
        bpe_learn,
        bpe_merges_sql,
        bpe_segment_expr,
    )

    rows = [(1, "low lower lowest low low newer new newest wider wide wide"),
            (2, "low slow slower news new wide widely lowest"),
            (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = bpe_learn(df, "text", k=30)  # > available merges: early stop
    got = [tuple(r) for r in m.orderBy("step").collect()]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = [tuple(r) for r in con.execute(
        bpe_merges_sql("SELECT doc_id, text FROM docs", k=30) + " ORDER BY step"
    ).fetchall()]
    con.close()
    assert got == want and 0 < len(got) < 30

    merges = [(r[1], r[2]) for r in got]
    enc = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", m).collect()}
    assert enc[3]["n_tokens"] == 0 and enc[3]["n_subwords"] == 0
    # spot-check fertility against a single-word segmentation
    one = spark.createDataFrame([("lowest",)], "w string").select(
        bpe_segment_expr(F.col("w"), merges).alias("s")
    ).collect()[0]["s"]
    assert "".join(one) == "lowest" and len(one) >= 1
    doc1_words = rows[0][1].split()
    segs = spark.createDataFrame([(w,) for w in doc1_words], "w string").select(
        F.size(bpe_segment_expr(F.col("w"), merges)).alias("n")
    ).collect()
    assert enc[1]["n_subwords"] == sum(r["n"] for r in segs)
    assert enc[1]["n_tokens"] == len(doc1_words)
    # and the DuckDB encode twin reproduces the fertility card exactly
    import duckdb as _duckdb
    import pandas as _pd

    from pyspark_dist_explore_spark.operators.textstats import bpe_encode_sql

    con2 = _duckdb.connect()
    con2.register("docs", _pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck_enc = sorted(map(tuple, con2.execute(
        bpe_encode_sql("SELECT doc_id, text FROM docs", merges)
    ).fetchall()))
    con2.close()
    assert duck_enc == sorted(
        (r["doc_id"], r["n_tokens"], r["n_subwords"]) for r in enc.values()
    )


def test_bpe_sentinels_in_text_are_stripped(spark):
    """r10 advisor catch: real crawl text can contain the in-band
    \\x01/\\x02 bracket sentinels (and \\x03, the fertility pivot) —
    they must be stripped from the token stream BEFORE char-wrapping in
    BOTH engines, so learn/encode neither corrupt symbol boundaries nor
    diverge cross-engine.  A token that is ONLY sentinels drops."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.textstats import (
        bpe_encode,
        bpe_encode_sql,
        bpe_learn,
        bpe_merges_sql,
    )

    rows = [
        (1, "low low\x01er lowest low low newer new\x02 newest wide"),
        (2, "low slow \x01\x02\x03 slower news new wide widely lowest"),
        (3, "wi\x03de wide lower lower newer"),
    ]
    clean_rows = [(i, t.replace("\x01", "").replace("\x02", "").replace("\x03", ""))
                  for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = bpe_learn(df, "text", k=10)
    got = [tuple(r) for r in m.orderBy("step").collect()]
    assert got, "corpus must yield merges"
    # learning over the dirty text == learning over pre-stripped text
    clean_df = spark.createDataFrame(clean_rows, "doc_id bigint, text string")
    assert got == [
        tuple(r) for r in bpe_learn(clean_df, "text", k=10).orderBy("step").collect()
    ]
    # DuckDB twin strips identically
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = [tuple(r) for r in con.execute(
        bpe_merges_sql("SELECT doc_id, text FROM docs", k=10) + " ORDER BY step"
    ).fetchall()]
    assert got == want
    # encode halves agree too, and the all-sentinel token of doc 2 drops
    merges = [(r[1], r[2]) for r in got]
    enc = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", m).collect()}
    assert enc[2]["n_tokens"] == len(clean_rows[1][1].split())
    duck_enc = sorted(map(tuple, con.execute(
        bpe_encode_sql("SELECT doc_id, text FROM docs", merges)
    ).fetchall()))
    con.close()
    assert duck_enc == sorted(
        (r["doc_id"], r["n_tokens"], r["n_subwords"]) for r in enc.values()
    )


def test_bpe_learn_max_merges_guard(spark):
    """A vocab-sized k is k SEQUENTIAL Spark jobs by construction — the
    guard refuses it loudly unless the caller raises max_merges."""
    import pytest as _pytest

    from pyspark_dist_explore_spark.operators.textstats import bpe_learn

    df = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="SEQUENTIAL Spark job rounds"):
        bpe_learn(df, "text", k=32000)
    # explicit opt-in works (corpus runs out of pairs immediately)
    assert bpe_learn(df, "text", k=600, max_merges=600).count() <= 600


def test_bpe_learn_driver_fit_equals_spark(spark):
    """fit='driver' (round 14): the greedy loop replayed in driver
    Python over the collected type table must equal the Spark loop
    row-for-row — sequential AND batched, on real data and on a
    unicode-edge corpus (multi-byte chars exercise the claim that
    Python's code-point sort order == Spark's UTF-8 binary collation);
    the word_freqs= hook feeds the shared staged table; the collect
    guard refuses an over-cap type table."""
    from pyspark_dist_explore_spark.operators.textstats import (
        bpe_learn,
        bpe_word_freqs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    uni = spark.createDataFrame(
        [(1, "héllo héllo wörld wörld wörld héllo 日本 日本 日本")],
        "doc_id bigint, text string",
    )
    for corpus in (docs, uni):
        for bm in (1, 4):
            a = [
                tuple(r)
                for r in bpe_learn(corpus, "text", k=6, batch_merges=bm)
                .orderBy("step")
                .collect()
            ]
            b = [
                tuple(r)
                for r in bpe_learn(corpus, "text", k=6, batch_merges=bm, fit="driver")
                .orderBy("step")
                .collect()
            ]
            assert a == b and a, (bm, a, b)
    # word_freqs= short-circuits the corpus scan
    wf = bpe_word_freqs(docs, "text").localCheckpoint()
    c = [
        tuple(r)
        for r in bpe_learn(docs, "text", k=6, word_freqs=wf, fit="driver")
        .orderBy("step")
        .collect()
    ]
    d = [tuple(r) for r in bpe_learn(docs, "text", k=6).orderBy("step").collect()]
    assert c == d
    with pytest.raises(ValueError, match="max_driver_types"):
        bpe_learn(docs, "text", k=2, fit="driver", max_driver_types=1)
    with pytest.raises(ValueError, match="fit must be"):
        bpe_learn(docs, "text", k=2, fit="nope")


def test_bpe_learn_batched_merges(spark):
    """batch_merges>1 (round 12, opt-in): symbol-disjoint top pairs
    apply per round in one projection.  On a conflict-free corpus the
    batched table EQUALS sequential greedy step-for-step; on a
    conflicting corpus the in-round conflict is skipped and re-picked
    next round with its exact round-start count — so every recorded
    count is exact, only pick ORDER differs from sequential."""
    from pyspark_dist_explore_spark.operators.textstats import bpe_learn

    # conflict-free: four independent two-char words
    free = spark.createDataFrame(
        [(1, "ab ab ab ab cd cd cd ef ef gh gh")],
        "doc_id bigint, text string",
    )
    seq = [tuple(r) for r in bpe_learn(free, "text", k=4).orderBy("step").collect()]
    bat = [
        tuple(r)
        for r in bpe_learn(free, "text", k=4, batch_merges=4)
        .orderBy("step")
        .collect()
    ]
    assert seq == bat and len(seq) == 4

    # conflicting: (x,y)=10 beats (y,z)=9 which shares y -> (y,z) must
    # wait a round; (z,w)=8 is disjoint from (x,y) and rides round 1
    docs = spark.createDataFrame(
        [(1, " ".join(["xy"] * 10 + ["yz"] * 9 + ["zw"] * 8))],
        "doc_id bigint, text string",
    )
    got = [
        (r["step"], r["pair"], r["merged"], r["cnt"])
        for r in bpe_learn(docs, "text", k=3, batch_merges=3)
        .orderBy("step")
        .collect()
    ]
    assert got == [
        (0, "x y", "xy", 10),
        (1, "z w", "zw", 8),
        (2, "y z", "yz", 9),
    ]
    # sequential order for reference: strictly by count
    got_seq = [
        (r["pair"], r["cnt"])
        for r in bpe_learn(docs, "text", k=3).orderBy("step").collect()
    ]
    assert got_seq == [("x y", 10), ("y z", 9), ("z w", 8)]

    import pytest

    with pytest.raises(ValueError, match="batch_merges"):
        bpe_learn(docs, "text", k=2, batch_merges=0)


def test_bpe_fertility_dynamic_twin(spark):
    """The gate's learn→encode chain: bpe_fertility_sql re-derives the
    merge table inside DuckDB and applies it via the dynamically
    pivoted replace chain — per-group sums must equal Spark's
    bpe_encode over the bpe_learn frame, extra_cols passing the group
    through.  Short-corpus early stop (< k merges) must degrade to the
    same no-op on both engines."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.textstats import (
        bpe_encode,
        bpe_fertility_sql,
        bpe_learn,
    )

    rows = [
        (1, "g1", "low lower lowest low low newer new newest wider wide"),
        (2, "g1", "low slow slower news new wide widely lowest"),
        (3, "g2", "lowest newest wide low low low"),
        (4, "g2", None),
        (5, "g3", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    for k in (6, 40):  # 40 > available merges: the chr(3) sentinel path
        m = bpe_learn(df, "text", k=k)
        got = sorted(
            tuple(r)
            for r in bpe_encode(df, "text", "doc_id", m, extra_cols=("source",))
            .groupBy(F.col("source").alias("grp"))
            .agg(
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            )
            .collect()
        )
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                bpe_fertility_sql("SELECT doc_id, source, text FROM docs", "source", k=k)
            ).fetchall()
        )
        con.close()
        assert got == want, k
        assert got[2][0] == "g3" and got[2][1] == 0 and got[2][2] == 0


# --------------------------------------------------------------------------
# X48: unigram-LM tokenizer induction (Kudo 2018, hard-EM/Viterbi) —
# textstats.unigram_seed_candidates / unigram_lm_learn / unigram_encode
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# X51: heuristic markup stripping (dedup.strip_markup / markup_stats)
# --------------------------------------------------------------------------


def test_strip_markup_semantics_and_twin(spark):
    """Hand-pinned semantics + DuckDB string-for-string twin: block
    constructs (script/style/comment) vanish wholesale even with '<'
    in their bodies, remaining tags become spaces, bare math survives
    (tags must start with a letter or '!'), entities decode in spec
    order ('&amp;lt;' -> literal '&lt;', never '<'), '&nbsp;' folds
    into the whitespace collapse, NULL stays NULL — and the stripped
    output really carries no residual markup (n_tags == 0)."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.dedup import (
        markup_stats,
        markup_stats_sql,
        strip_markup,
        strip_markup_sql,
    )

    rows = [
        (1, '<!DOCTYPE html><html><head><script type="x">if (a<b) (x && y);'
            '</script><style>p (m)</style><!-- c --></head>'
            '<body id="d">Hello <b>world</b> &amp; friends</body></html>'),
        (2, "plain text, a < b and c > d stay"),
        (3, "&amp;lt; decodes to &lt; literally; &nbsp;spaced&nbsp;out"),
        (4, None),
        (5, ""),
        (6, "<p>multi\nline <I CLASS=\"x\">caps</I> tag</p>"),
        (7, "&quot;q&quot; &apos;a&apos; &#39;n&#39; &gt;&lt;"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    nt, ne = markup_stats(F.col("text"))
    got = [
        tuple(r)
        for r in df.select(
            "doc_id",
            strip_markup(F.col("text")).alias("s"),
            nt.alias("nt"),
            ne.alias("ne"),
        ).orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    st, se = markup_stats_sql("text")
    want = [
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {strip_markup_sql('text')} AS s, {st}, {se} "
            "FROM t ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    assert got == want
    by = {r[0]: r for r in got}
    assert by[1][1] == "Hello world & friends"
    assert by[2][1] == "plain text, a < b and c > d stay" and by[2][2] == 0
    assert by[3][1] == "&lt; decodes to < literally; spaced out"
    assert by[4][1] is None
    assert by[6][1] == "multi line caps tag"
    assert by[7][1] == "\"q\" 'a' 'n' ><"
    # no residual markup in the stripped output
    stripped = df.where("text IS NOT NULL").select(
        strip_markup(F.col("text")).alias("s")
    )
    nt2, _ = markup_stats(F.col("s"))
    leftover = stripped.select(nt2.alias("n")).groupBy().sum("n").collect()[0][0]
    assert leftover == 0


def test_unigram_seed_candidates_duckdb_twin(spark):
    """The seed candidate table (all chars + top-N multi-char
    substrings, corpus-weighted, (cnt DESC, piece ASC) tie-break) is
    exact class-A — the DuckDB twin matches row-for-row on the real
    sf0.001 corpus."""
    import duckdb

    from pyspark_dist_explore_spark.operators.textstats import (
        unigram_seed_candidates,
        unigram_seed_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        map(
            tuple,
            unigram_seed_candidates(
                docs, "text", max_piece_len=4, seed_size=32
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                unigram_seed_sql(
                    "SELECT text FROM documents", max_piece_len=4, seed_size=32
                )
            ).fetchall(),
        )
    )
    con.close()
    assert got == want and len(got) > 32


def test_viterbi_segment_exact_dp_and_tie_breaks(spark):
    """Hand-checked DP: min integer cost wins; ties break to fewer
    pieces then the lexicographically smaller path; unseen chars fall
    back to single-char pieces at unk_cost; empty word -> []."""
    from pyspark_dist_explore_spark.operators.textstats import (
        _viterbi_segment,
    )

    cost = {"a": 10, "b": 10, "ab": 15, "ba": 12, "aba": 40}
    seg = lambda w, **kw: _viterbi_segment(
        w, cost, max_piece_len=3, unk_cost=100, **kw
    )
    assert seg("") == []
    assert seg("a") == ["a"]
    # "aba": a+ba = 22 beats ab+a = 25, aba = 40, a+b+a = 30
    assert seg("aba") == ["a", "ba"]
    # tie on cost: "abab" a+ba+b = 32 vs ab+ab = 30 -> ab+ab wins outright
    assert seg("abab") == ["ab", "ab"]
    # unseen char: fallback piece at unk_cost, never a crash
    assert seg("axb") == ["a", "x", "b"]
    # tie-break to FEWER pieces: cost2 makes "aa" (20) == "a"+"a" (20)
    cost2 = {"a": 10, "aa": 20}
    from pyspark_dist_explore_spark.operators.textstats import (
        _viterbi_segment as V,
    )
    assert V("aa", cost2, max_piece_len=2, unk_cost=99) == ["aa"]
    # equal cost AND piece count -> lexicographically smaller path:
    # "ab"+"c" vs "a"+"bc" both cost 20, both 2 pieces -> a+bc < ab+c
    cost3 = {"a": 10, "bc": 10, "ab": 10, "c": 10}
    assert V("abc", cost3, max_piece_len=2, unk_cost=99) == ["a", "bc"]


def test_unigram_lm_learn_toy_replay_and_determinism(spark):
    """On a toy corpus the induced vocab keeps the repeated multi-char
    pieces; the Spark M-step counts equal a sequential pure-Python
    replay of the same hard-EM over the collected word-freq table
    (distinct code path: distributed explode+aggregate vs a dict loop);
    and the result is invariant under input partitioning."""
    from pyspark_dist_explore_spark.operators.textstats import (
        _unigram_costs,
        _viterbi_segment,
        unigram_lm_learn,
        unigram_seed_candidates,
    )

    rows = [
        (1, "abab abab banana"),
        (2, "abab cocoa banana"),
        (3, "cocoa cocoa abab"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(vocab_size=10, max_piece_len=3, seed_size=16, em_rounds=2)
    got = [tuple(r) for r in unigram_lm_learn(df, "text", **kw).collect()]

    # ---- sequential replay over the collected type table ----
    freqs = {}
    for _, t in rows:
        for w in (t or "").lower().split():
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    counts = {
        r["piece"]: int(r["cnt"])
        for r in unigram_seed_candidates(
            df, "text", max_piece_len=3, seed_size=16
        ).collect()
    }
    chars = {p for p in counts if len(p) == 1}

    def em(cost):
        unk = max(cost.values()) + 8 * (1 << 20)
        used = {}
        for w, f in freqs.items():
            for piece in _viterbi_segment(
                w, cost, max_piece_len=3, unk_cost=unk
            ):
                used[piece] = used.get(piece, 0) + f
        return used

    for _ in range(2):
        used = em(_unigram_costs(counts, cost_scale=1 << 20))
        counts = {
            p: used.get(p, 0)
            for p in counts
            if used.get(p, 0) > 0 or p in chars
        }
    n_multi = max(10 - len(chars), 0)
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:n_multi]
    counts = {p: counts[p] for p in chars} | dict(multi)
    used = em(_unigram_costs(counts, cost_scale=1 << 20))
    counts = {
        p: used.get(p, 0) for p in counts if used.get(p, 0) > 0 or p in chars
    }
    cost = _unigram_costs(counts, cost_scale=1 << 20)
    want = sorted((p, int(c), int(cost[p])) for p, c in counts.items())
    assert got == want
    # the repeated units of the corpus made the cut
    pieces = {p for p, _, _ in got}
    assert "bab" in pieces or "ab" in pieces
    assert {p for p in pieces if len(p) == 1} >= {"a", "b", "c", "n", "o"}

    # ---- partitioning invariance ----
    got7 = [
        tuple(r)
        for r in unigram_lm_learn(df.repartition(7), "text", **kw).collect()
    ]
    assert got7 == got


def test_unigram_encode_fertility_and_unk(spark):
    """unigram_encode matches a driver-side per-word Viterbi recount,
    shares bpe_encode's schema (the A/B card), handles NULL/empty docs
    as 0/0, and words with unseen chars still segment (char fallback)."""
    from pyspark_dist_explore_spark.operators.textstats import (
        _viterbi_segment,
        unigram_encode,
        unigram_lm_learn,
    )

    rows = [
        (1, "abab abab banana"),
        (2, "abab cocoa banana zzz"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    train = df.where("doc_id = 1 or doc_id = 2")
    vocab = unigram_lm_learn(
        train, "text", vocab_size=12, max_piece_len=3, seed_size=16
    )
    model = {r["piece"]: int(r["cost"]) for r in vocab.collect()}
    unk = max(model.values()) + 8 * (1 << 20)
    enc = {
        r["doc_id"]: r
        for r in unigram_encode(df, "text", "doc_id", vocab).collect()
    }
    for doc_id, t in rows:
        words = [w for w in (t or "").lower().split() if w]
        n_sub = sum(
            len(_viterbi_segment(w, model, max_piece_len=3, unk_cost=unk))
            for w in words
        )
        assert enc[doc_id]["n_tokens"] == len(words), doc_id
        assert enc[doc_id]["n_subwords"] == n_sub, doc_id
    assert enc[3]["n_tokens"] == 0 and enc[3]["n_subwords"] == 0
    assert set(enc[1].asDict()) == {"doc_id", "n_tokens", "n_subwords"}
    # extra_cols ride the rollup
    enc2 = unigram_encode(
        df.withColumn("src", F.lit("s")), "text", "doc_id", vocab,
        extra_cols=("src",),
    )
    assert set(enc2.columns) == {"doc_id", "src", "n_tokens", "n_subwords"}


def test_viterbi_segment_hypothesis_vs_exhaustive():
    """Property pin (no Spark needed): for random short words and
    random integer cost tables, the DP's pick equals brute-force
    enumeration of ALL segmentations under the exact total order
    (cost, piece count, path lexicographic) — the strongest possible
    exactness statement for the X48 E-step."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_dist_explore_spark.operators.textstats import (
        _viterbi_segment,
    )

    MAXLEN = 3
    UNK = 10_000

    def all_segmentations(w):
        if not w:
            yield ()
            return
        for j in range(1, min(MAXLEN, len(w)) + 1):
            head = w[:j]
            for rest in all_segmentations(w[j:]):
                yield (head,) + rest

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet="abc", min_size=1, max_size=7),
        costs=st.dictionaries(
            st.text(alphabet="abc", min_size=1, max_size=MAXLEN),
            st.integers(min_value=1, max_value=50),
            max_size=12,
        ),
    )
    def check(word, costs):
        # chars always costed (the coverage floor learn guarantees)
        cost = {c: 7 for c in "abc"} | costs

        def score(seg):
            return (
                sum(cost.get(p, UNK) for p in seg),
                len(seg),
                seg,
            )

        valid = [
            seg
            for seg in all_segmentations(word)
            # pieces >1 char must be in the table (the DP's rule);
            # single chars fall back to UNK
            if all(len(p) == 1 or p in cost for p in seg)
        ]
        want = min(valid, key=score)
        got = tuple(
            _viterbi_segment(word, cost, max_piece_len=MAXLEN, unk_cost=UNK)
        )
        assert score(got) == score(want) and got == want

    check()


def test_corpus_diff_hypothesis_vs_brute_force(spark):
    """Property pin: corpus_diff over random id/group/text frames
    equals a pure-Python recount of every column (token counting
    included), covering duplicate-free random overlap patterns, NULL
    groups, NULL/empty texts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_dist_explore_spark.operators.dedup import corpus_diff

    texts = st.one_of(
        st.none(),
        st.sampled_from(
            ["", "a b", "a  b  c", "x", "w1 w2 w3 w4", "a b", "Z z"]
        ),
    )
    row = st.tuples(
        st.integers(min_value=0, max_value=14),
        st.sampled_from(["s0", "s1", None]),
        texts,
    )
    frames = st.tuples(
        st.lists(row, max_size=10, unique_by=lambda r: r[0]),
        st.lists(row, max_size=10, unique_by=lambda r: r[0]),
    )

    def norm(t):
        return " ".join((t or "").lower().split())

    def ntok(t):
        n = norm(t)
        return 0 if n == "" else len(n.split(" "))

    # derandomize: a fixed example sequence.  Randomized draws twice hit
    # a one-off full-suite flake (first call of an example asserted,
    # hypothesis's replay passed -> unreproducible Flaky with no DB
    # entry); a 500-example randomized stress of this exact property ran
    # clean, so the fixed sequence trades no real coverage for
    # run-to-run determinism in the gate suite.
    @settings(
        max_examples=12,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(frames=frames)
    def check(frames):
        old_rows, new_rows = frames
        old = spark.createDataFrame(
            old_rows, "doc_id bigint, source string, text string"
        ) if old_rows else spark.createDataFrame(
            [], "doc_id bigint, source string, text string"
        )
        new = spark.createDataFrame(
            new_rows, "doc_id bigint, source string, text string"
        ) if new_rows else spark.createDataFrame(
            [], "doc_id bigint, source string, text string"
        )
        got = {
            r["group"]: r.asDict()
            for r in corpus_diff(old, new, group_col="source").collect()
        }
        om = {r[0]: r for r in old_rows}
        nm = {r[0]: r for r in new_rows}
        agg: dict = {}
        for i in set(om) | set(nm):
            o, n = om.get(i), nm.get(i)
            grp = (n[1] if n is not None else o[1]) or ""
            a = agg.setdefault(
                grp,
                dict.fromkeys(
                    [
                        "n_added", "n_removed", "n_changed", "n_unchanged",
                        "tokens_added", "tokens_removed",
                        "tokens_changed_delta", "n_old", "n_new",
                        "tokens_old", "tokens_new",
                    ],
                    0,
                ),
            )
            if o is None:
                a["n_added"] += 1
                a["tokens_added"] += ntok(n[2])
            elif n is None:
                a["n_removed"] += 1
                a["tokens_removed"] += ntok(o[2])
            elif norm(o[2]) != norm(n[2]):
                a["n_changed"] += 1
                a["tokens_changed_delta"] += ntok(n[2]) - ntok(o[2])
            else:
                a["n_unchanged"] += 1
            if o is not None:
                a["n_old"] += 1
                a["tokens_old"] += ntok(o[2])
            if n is not None:
                a["n_new"] += 1
                a["tokens_new"] += ntok(n[2])
        assert set(got) == set(agg)
        for grp, want in agg.items():
            for k, v in want.items():
                assert got[grp][k] == v, (grp, k)

    check()


# --------------------------------------------------------------------------
# X50: semantic-locality packing (packing.pack_related_documents) —
# in-context-pretraining shape (Shi et al. 2023, arXiv:2310.10638)
# --------------------------------------------------------------------------


def test_unigram_learn_degenerate_corpora(spark):
    """Edge semantics: an empty corpus and an all-empty/NULL corpus
    both return an EMPTY vocab frame (schema intact, no crash); a
    single-char corpus learns exactly its chars."""
    from pyspark_dist_explore_spark.operators.textstats import (
        unigram_encode,
        unigram_lm_learn,
    )

    import pytest

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    v0 = unigram_lm_learn(empty, "text", vocab_size=8, em_rounds=1)
    assert v0.columns == ["piece", "cnt", "cost"] and v0.count() == 0

    blank = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id bigint, text string"
    )
    vb = unigram_lm_learn(blank, "text", vocab_size=8, em_rounds=1)
    assert vb.count() == 0

    onechar = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id bigint, text string"
    )
    vc = {r["piece"]: r["cnt"] for r in unigram_lm_learn(
        onechar, "text", vocab_size=8, max_piece_len=2, em_rounds=1
    ).collect()}
    assert set(vc) == {"a", "b"} and vc["a"] == 3 and vc["b"] == 1

    with pytest.raises(ValueError, match="empty vocab"):
        unigram_encode(onechar, "text", "doc_id", v0)

    with pytest.raises(ValueError, match="max_seed"):
        unigram_lm_learn(onechar, "text", seed_size=1 << 21)


def test_pack_related_rp_key_rides_assignment(spark):
    """r15: the JL order key carried through assign_domains' ``keep=``
    must be BIT-identical per id to the standalone random_projection
    frame the old equi-join read — same arithmetic, same rows, no join."""
    import struct

    from pyspark_dist_explore_spark.operators.similarity import (
        _unit,
        assign_domains,
        random_projection,
        random_projection_exprs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: F.round(x * F.lit(1e6))
        ).alias("embedding"),
    )
    dim = len(emb.select("embedding").first()[0])
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    rp1_expr = random_projection_exprs(
        F.col("embedding"), out_dim=1, hash_fn="md5", dim=dim, scale=False
    )[0]
    kept = {
        r["vec_id"]: (r["domain"], r["__rp1"])
        for r in assign_domains(
            emb.select("vec_id", "embedding", rp1_expr.alias("__rp1")),
            cents,
            id_col="vec_id",
            assign_round=6,
            keep=("__rp1",),
        ).collect()
    }
    standalone = {
        r["vec_id"]: r["rp"][0]
        for r in random_projection(
            emb, out_dim=1, hash_fn="md5", dim=dim, scale=False
        ).collect()
    }
    plain = {
        r["vec_id"]: r["domain"]
        for r in assign_domains(
            emb, cents, id_col="vec_id", assign_round=6
        ).collect()
    }
    assert set(kept) == set(standalone) == set(plain)
    for vid, (domain, rp1) in kept.items():
        assert domain == plain[vid], vid  # keep= must not perturb the argmax
        assert struct.pack("<d", rp1) == struct.pack("<d", standalone[vid]), vid


def test_pack_related_documents_hypothesis_purity_and_budget(spark):
    """Property pin over random corpora: packs never mix domains, the
    output is total, cumsum budgets hold (≤ max + one boundary doc),
    and within a domain the pack ids are contiguous from the domain's
    base (the floor-division invariant)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_dist_explore_spark.operators.packing import (
        _PACK_STRIDE,
        pack_related_documents,
    )

    rows = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),     # doc_id
            st.integers(min_value=0, max_value=9),      # token words
            st.sampled_from([0, 1, 2, None]),           # cluster (None=no vec)
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda r: r[0],
    )

    axes = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}

    # derandomize for the same reason as the corpus_diff property above
    # (one-off full-suite Flaky with no reproducible example)
    @settings(
        max_examples=10,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows)
    def check(rows):
        docs = spark.createDataFrame(
            [(i, "w " * n) for i, n, _ in rows],
            "doc_id bigint, text string",
        )
        emb = spark.createDataFrame(
            [(i, axes[c]) for i, _, c in rows if c is not None],
            "vec_id bigint, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(k, v) for k, v in axes.items()],
            "cent_id bigint, cv array<double>",
        )
        got = {
            r["doc_id"]: r
            for r in pack_related_documents(
                docs, emb, text_col="text", max_tokens=5, centroids=cents
            ).collect()
        }
        assert set(got) == {i for i, _, _ in rows}  # total
        for i, n, c in rows:
            assert got[i]["n_tokens"] == n
            assert got[i]["domain"] == (c if c is not None else -1)
            base = (got[i]["domain"] + 1) * _PACK_STRIDE
            assert base <= got[i]["pack_id"] < base + _PACK_STRIDE
        packs: dict = {}
        for r in got.values():
            packs.setdefault(r["pack_id"], []).append(r)
        for members in packs.values():
            assert len({m["domain"] for m in members}) == 1
            non_over = [m["n_tokens"] for m in members if not m["oversize"]]
            # cumsum: at most one boundary doc overflows the budget
            assert sum(non_over) <= 5 + max(non_over or [0])

    check()


def test_round12_operators_edge_inputs(spark):
    """Edge-input pins for the round-12 surface: empty sides of
    corpus_diff, an empty vectors frame for related packing (all docs
    -> missing_domain), an empty packed frame for the audit card, bare
    '<'/'>'/'&amp' through the markup stripper, unseen-char-only docs
    through unigram_encode (char fallback), and an all-oversize greedy
    packing (each giant doc rides its own pack)."""
    from pyspark_dist_explore_spark import (
        corpus_diff,
        pack_related_documents,
        pack_sequences,
        packing_efficiency,
        strip_markup,
        unigram_encode,
        unigram_lm_learn,
    )

    e = spark.createDataFrame([], "doc_id bigint, source string, text string")
    d = spark.createDataFrame(
        [(1, "s", "a b")], "doc_id bigint, source string, text string"
    )
    r = corpus_diff(e, d, group_col="source").collect()
    assert len(r) == 1 and r[0]["n_added"] == 1 and r[0]["n_old"] == 0
    r = corpus_diff(d, e, group_col="source").collect()
    assert len(r) == 1 and r[0]["n_removed"] == 1 and r[0]["n_new"] == 0
    assert corpus_diff(e, e, group_col="source").count() == 0

    docs = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id bigint, text string")
    ev = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cent_id bigint, cv array<double>"
    )
    r = pack_related_documents(
        docs, ev, text_col="text", max_tokens=4, centroids=cents
    ).collect()
    assert len(r) == 2 and all(x["domain"] == -1 for x in r)

    empty_packed = spark.createDataFrame(
        [], "doc_id bigint, n_tokens bigint, bucket int, pack_id bigint, oversize int"
    )
    assert packing_efficiency(empty_packed, 6).count() == 0

    w = spark.createDataFrame(
        [(1, None), (2, "<"), (3, ">"), (4, "&amp")], "i bigint, t string"
    )
    got = {
        x["i"]: x["s"]
        for x in w.select("i", strip_markup(F.col("t")).alias("s")).collect()
    }
    assert got[1] is None and got[2] == "<" and got[3] == ">" and got[4] == "&amp"

    train = spark.createDataFrame([(1, "aa bb")], "doc_id bigint, text string")
    v = unigram_lm_learn(train, "text", vocab_size=6, em_rounds=1)
    test = spark.createDataFrame([(9, "zzz qq")], "doc_id bigint, text string")
    r = unigram_encode(test, "text", "doc_id", v).collect()[0]
    assert r["n_tokens"] == 2 and r["n_subwords"] == 5  # per-char fallback

    big = spark.createDataFrame(
        [(1, "w " * 10), (2, "w " * 11)], "doc_id bigint, text string"
    )
    r = pack_sequences(
        big, "doc_id", text_col="text", max_tokens=4, mode="greedy", buckets=1
    ).collect()
    assert len(r) == 2 and all(x["oversize"] == 1 for x in r)
    assert len({x["pack_id"] for x in r}) == 2


def test_packing_efficiency_card_and_twin(spark):
    """The packing audit card == the DuckDB twin and a hand recount
    over planted packs: capacity counts only packs holding a regular
    doc, oversize docs are excluded from waste, greedy waste >= 0, and
    the fill rate is the exact rational fill_num/fill_den."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.packing import (
        pack_sequences,
        packing_efficiency,
        packing_efficiency_sql,
    )

    rows = [(i, "w " * n) for i, n in enumerate([3, 4, 2, 9, 1, 5, 5, 7])]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = pack_sequences(
        docs, "doc_id", text_col="text", max_tokens=6, buckets=2, mode="greedy"
    )
    card = packing_efficiency(packed, 6, group_col="bucket").collect()
    pdf = packed.toPandas()
    con = duckdb.connect()
    con.register("p", pdf)
    want = con.execute(
        packing_efficiency_sql(
            "SELECT doc_id, n_tokens, pack_id, oversize, bucket FROM p",
            6,
            group_col="bucket",
        )
        + " ORDER BY 1"
    ).fetchall()
    got = sorted(map(tuple, card))
    assert got == sorted(map(tuple, want))
    # hand invariants: greedy waste >= 0, capacity = regular-packs * 6,
    # totals add up, the 9- and 7-token docs are the two oversize rides
    tot = {
        "docs": sum(r[1] for r in got),
        "over": sum(r[3] for r in got),
        "tok": sum(r[4] for r in got),
    }
    assert tot["docs"] == 8 and tot["over"] == 2
    assert tot["tok"] == 3 + 4 + 2 + 9 + 1 + 5 + 5 + 7
    for r in got:
        (_, n_docs, n_packs, n_over, _tt, otok, cap, waste, num, den) = r
        assert waste >= 0 and cap == den and num + waste == cap
        assert num <= cap
    # the ALL-group form (group_col=None) returns one '' row
    allrow = packing_efficiency(packed, 6).collect()
    assert len(allrow) == 1 and allrow[0]["group"] == ""
    assert allrow[0]["n_docs"] == 8


def test_pack_related_documents_clusters_and_totality(spark):
    """Planted two-cluster embeddings: packs NEVER mix clusters (domain
    partitions the packs), pack budgets hold (cumsum semantics: one
    boundary overflow doc max), a doc without an embedding lands in the
    missing_domain partition — output total, nothing dropped."""
    import itertools

    from pyspark_dist_explore_spark.operators.packing import (
        pack_related_documents,
    )
    from pyspark_dist_explore_spark.operators.similarity import _unit

    # cluster A around +x, cluster B around +y
    emb_rows = []
    for i in range(20):
        if i % 2 == 0:
            emb_rows.append((i, [10.0, float(i % 5), 0.0]))
        else:
            emb_rows.append((i, [float(i % 5), 10.0, 0.0]))
    emb = spark.createDataFrame(emb_rows, "vec_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cent_id bigint, cv array<double>",
    )
    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(21)],  # doc 20 has no embedding
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pack_related_documents(
            docs, emb, text_col="text", max_tokens=8, centroids=cents
        ).collect()
    }
    assert len(out) == 21  # total
    assert out[20]["domain"] == -1
    for i in range(20):
        assert out[i]["domain"] == (0 if i % 2 == 0 else 1), i
    # no pack id is shared across domains
    by_pack: dict = {}
    for r in out.values():
        by_pack.setdefault(r["pack_id"], set()).add(r["domain"])
    assert all(len(doms) == 1 for doms in by_pack.values())
    # cumsum budget: total tokens per pack <= max + one boundary doc
    packs: dict = {}
    for r in out.values():
        packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(t <= 8 + 7 for t in packs.values())


def test_pack_related_documents_beats_random_adjacency(spark):
    """The point of X50: on the real embeddings, mean within-pack
    pairwise cosine under related-packing strictly exceeds the
    md5-bucketed pack_sequences baseline (random adjacency)."""
    import numpy as np

    from pyspark_dist_explore_spark.operators.packing import (
        pack_related_documents,
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.collect()
    }
    for v in vecs.values():
        v /= np.linalg.norm(v)

    def mean_within_pack_cos(assign):  # {doc_id: pack_id}
        by_pack: dict = {}
        for d, p in assign.items():
            if d in vecs:
                by_pack.setdefault(p, []).append(vecs[d])
        sims = []
        for members in by_pack.values():
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    sims.append(float(members[i] @ members[j]))
        return sum(sims) / len(sims)

    rel = {
        r["doc_id"]: r["pack_id"]
        for r in pack_related_documents(
            docs, emb, text_col="text", max_tokens=512, n_domains=8,
            fit_sample_mod=None, max_fit_rows=None,
        ).collect()
    }
    base = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(
            docs, "doc_id", text_col="text", max_tokens=512, buckets=8
        ).collect()
    }
    rel_cos, base_cos = mean_within_pack_cos(rel), mean_within_pack_cos(base)
    assert rel_cos > base_cos + 0.02, (rel_cos, base_cos)


def test_pack_related_greedy_nn_chain_and_guard(spark):
    """order='greedy_nn' (the paper-faithful ICLM path): the chain
    visits max-cosine unvisited neighbors from the smallest id, so on a
    hand-built line of vectors the pack grouping follows the chain
    (0 -> 3 -> 1 -> 2 -> 4 at 2 docs/pack); on the real corpus it
    strictly beats the JL order's within-pack cosine; an over-budget
    domain raises the named guard."""
    import numpy as np
    import pytest

    from pyspark_dist_explore_spark.operators.packing import (
        pack_related_documents,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.5, 0.5]),
         (3, [0.95, 0.05]), (4, [0.2, 0.8])],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cent_id bigint, cv array<double>"
    )
    docs = spark.createDataFrame(
        [(i, "w w") for i in range(5)], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r["pack_id"]
        for r in pack_related_documents(
            docs, emb, text_col="text", max_tokens=4,
            centroids=cents, order="greedy_nn",
        ).collect()
    }
    # chain 0,3,1,2,4 at 4-token packs (2 docs each): {0,3},{1,2},{4}
    assert out[0] == out[3] and out[1] == out[2]
    assert len({out[0], out[1], out[4]}) == 3

    docsR = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embR = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in embR.collect()
    }
    for v in vecs.values():
        v /= np.linalg.norm(v)

    def quality(assign):
        by = {}
        for d, pk in assign.items():
            if d in vecs:
                by.setdefault(pk, []).append(vecs[d])
        sims = [
            float(ms[i] @ ms[j])
            for ms in by.values()
            for i in range(len(ms))
            for j in range(i + 1, len(ms))
        ]
        return sum(sims) / len(sims)

    kw = dict(
        text_col="text", max_tokens=512, n_domains=8,
        fit_sample_mod=None, max_fit_rows=None,
    )
    rp = {
        r["doc_id"]: r["pack_id"]
        for r in pack_related_documents(docsR, embR, **kw).collect()
    }
    gn = {
        r["doc_id"]: r["pack_id"]
        for r in pack_related_documents(
            docsR, embR, order="greedy_nn", **kw
        ).collect()
    }
    assert quality(gn) > quality(rp)

    with pytest.raises(Exception, match="max_domain_rows"):
        pack_related_documents(
            docsR, embR, text_col="text", max_tokens=512,
            n_domains=2, fit_sample_mod=None, max_fit_rows=None,
            order="greedy_nn", max_domain_rows=10,
        ).collect()
    with pytest.raises(ValueError, match="order must be"):
        pack_related_documents(
            docsR, embR, text_col="text", max_tokens=512, order="zigzag"
        )


def test_pack_related_documents_plan_no_python_one_window(spark):
    """X50 scale shape: the whole chain is JVM-side (broadcast-argmax
    domains + JL ordering are expressions — zero Python stages) with
    exactly ONE window exchange (partitioned by domain) and no
    cartesian/NL join beyond the K-row broadcast."""
    from pyspark_dist_explore_spark.operators.packing import (
        pack_related_documents,
    )
    from pyspark_dist_explore_spark.operators.similarity import _unit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), _unit(F.col("embedding")).alias("cv")
    )
    plan = (
        pack_related_documents(
            docs, emb, text_col="text", max_tokens=256, centroids=cents
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Window") == 1
    assert "partial_max_by" in plan  # the payload-free argmax buffer
    assert "CartesianProduct" not in plan


def test_tokenizer_fertility_ab_bpe_vs_unigram(spark):
    """The A/B the shared fertility schema exists for: learn BOTH
    tokenizers on the real sf0.001 corpus at comparable vocab budgets
    and compare per-corpus fertility (subwords per word).  Pins the
    schema contract (joinable on doc_id, same column names), the
    sanity bounds (each tokenizer emits >= 1 piece per word, <= chars
    per word), and that both beat char-level segmentation."""
    from pyspark_dist_explore_spark.operators.textstats import (
        bpe_encode,
        bpe_learn,
        unigram_encode,
        unigram_lm_learn,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_learn(docs, "text", k=16, batch_merges=4)
    vocab = unigram_lm_learn(
        docs, "text", vocab_size=64, max_piece_len=4, seed_size=128
    )
    b = bpe_encode(docs, "text", "doc_id", merges)
    u = unigram_encode(docs, "text", "doc_id", vocab)
    ab = (
        b.selectExpr("doc_id", "n_tokens", "n_subwords AS bpe_sub")
        .join(u.selectExpr("doc_id", "n_subwords AS uni_sub"), "doc_id")
    )
    tot = ab.groupBy().agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("bpe_sub").alias("bpe"),
        F.sum("uni_sub").alias("uni"),
    ).collect()[0]
    assert tot["tok"] > 0
    # >= one piece per word for both tokenizers
    assert tot["bpe"] >= tot["tok"] and tot["uni"] >= tot["tok"]
    # both strictly beat char-level segmentation on this corpus
    chars = docs.select(
        F.aggregate(
            F.transform(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                    lambda x: x != "",
                ),
                lambda w: F.length(w),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("n")
    ).groupBy().sum("n").collect()[0][0]
    assert tot["bpe"] < chars and tot["uni"] < chars
    # fertility card is finite and sane for a 64-piece unigram vocab
    fert_uni = tot["uni"] / tot["tok"]
    fert_bpe = tot["bpe"] / tot["tok"]
    assert 1.0 <= fert_uni < 20 and 1.0 <= fert_bpe < 20


def test_canonicalize_url_semantics_and_twin(spark):
    """X42: the canonical form collapses a crawl's URL variants —
    case, www, default ports, trackers in every position, fragments —
    while preserving path/query case and parameter order; non-URL
    passes through; NULL stays NULL.  DuckDB twin string-for-string."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.dedup import (
        canonicalize_url,
        canonicalize_url_sql,
        url_host,
        url_host_sql,
    )

    cases = [
        ("HTTP://WWW.Example.COM:80/A/B?x=1#frag", "http://example.com/A/B?x=1"),
        ("https://example.com:443/", "https://example.com"),
        ("https://example.com:8080/p", "https://example.com:8080/p"),
        ("http://example.com:443/p", "http://example.com:443/p"),
        ("http://a.com/p?utm_source=x&id=2", "http://a.com/p?id=2"),
        ("http://a.com/p?id=2&utm_a=1&utm_b=2", "http://a.com/p?id=2"),
        ("http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p"),
        ("http://a.com/p?gclid=g&fbclid=f&ref=r", "http://a.com/p"),
        ("http://a.com/p?b=2&a=1", "http://a.com/p?b=2&a=1"),  # order kept
        ("http://a.com/CaseSensitive/Path", "http://a.com/CaseSensitive/Path"),
        ("  http://a.com/p  ", "http://a.com/p"),
        ("not a url", "not a url"),
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i int, u string")
    got = {r["i"]: (r["c"], r["h"]) for r in df.select(
        "i", canonicalize_url(F.col("u")).alias("c"), url_host(F.col("u")).alias("h")
    ).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i][0] == want, f"{u!r}: {got[i][0]!r} != {want!r}"
    assert got[0][1] == "example.com" and got[11][1] == "" and got[13][1] is None

    con = duckdb.connect()
    con.register("t", pd.DataFrame([(i, u) for i, (u, _) in enumerate(cases)], columns=["i", "u"]))
    duck = {r[0]: (r[1], r[2]) for r in con.execute(
        f"SELECT i, {canonicalize_url_sql('u')} AS c, {url_host_sql('u')} AS h FROM t"
    ).fetchall()}
    con.close()
    # NULL propagates through trim/extract in both engines
    assert duck == {i: got[i] for i in duck}


def test_cap_per_key_accepts_column_key(spark):
    """X41+X42 composition: cap_per_key keyed on a COLUMN expression —
    url_host over raw messy URLs — caps per canonical host."""
    from pyspark_dist_explore_spark.operators.dedup import url_host
    from pyspark_dist_explore_spark.operators.sampling import cap_per_key

    rows = [(i, f"HTTP://WWW.Host{i % 3}.com:80/p{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id bigint, url string")
    kept = cap_per_key(docs, url_host(F.col("url")), "doc_id", 4)
    assert kept.count() == 12  # 3 canonical hosts x cap 4
    by_host = (
        kept.groupBy(url_host(F.col("url")).alias("h")).count().collect()
    )
    assert all(r["count"] == 4 for r in by_host) and len(by_host) == 3


def test_proportional_interleave_matches_duckdb(spark):
    """X53: the full (rank, pos) assignment — two-level scale-safe rank,
    BIGINT virtual times, closed-form global position, tie-breaks —
    matches the DuckDB twin's flat single-window form row for row, with
    NULL groups reading as '' and unlisted groups dropped."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        proportional_interleave,
        proportional_interleave_sql,
    )

    rows = [
        (i, f"s{i % 3}" if i % 7 else None)  # i%7==0 -> NULL group -> ''
        for i in range(300)
    ] + [(1000 + i, "dropped") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    w = {"s0": 3, "s1": 1, "s2": 2, "": 1}
    got = sorted(
        tuple(r)
        for r in proportional_interleave(
            df, "src", "doc_id", weights=w, salt="t1", shards=8
        )
        .select("doc_id", "rank", "pos")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "src"]))
    want = sorted(
        map(
            tuple,
            con.execute(
                'SELECT doc_id, "rank", pos FROM ('
                + proportional_interleave_sql(
                    "SELECT * FROM t", "src", "doc_id", weights=w, salt="t1", shards=8
                )
                + ")"
            ).fetchall(),
        )
    )
    con.close()
    assert got == want
    assert len(got) == 300  # the 10 'dropped' rows are gone, NULLs kept


def test_proportional_interleave_invariants(spark):
    """X53 semantics: positions are EXACTLY the permutation 0..N-1;
    ranks are contiguous 1..n per group; every prefix (before any group
    exhausts, in virtual time) holds each group's share within
    ``1 + K·w_g/Σw`` docs of ``m·w_g/Σw`` — the floor-error bound of
    stride scheduling (each group's count at virtual time V is
    ``floor(V/stride)``, off by <1; the prefix length m sums K such
    floors); the result is identical under any input partitioning;
    guards raise."""
    from pyspark_dist_explore_spark.operators.sampling import (
        proportional_interleave,
    )

    rows = [(i, f"s{i % 4}") for i in range(240)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    w = {"s0": 5, "s1": 2, "s2": 2, "s3": 1}
    out = proportional_interleave(df, "src", "doc_id", weights=w, salt="p0")
    got = [(r["pos"], r["src"], r["rank"]) for r in out.collect()]
    got.sort()
    n = len(got)
    assert [p for p, _, _ in got] == list(range(n))
    per = {}
    for _, s, r in got:
        per.setdefault(s, []).append(r)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    # prefix proportionality while no group is exhausted: all groups
    # have 60 rows; s0 (weight 5/10) exhausts first at virtual time
    # 60*stride_s0 — check every prefix strictly before that
    tot_w = sum(w.values())
    from math import gcd

    lcm = 1
    for x in w.values():
        lcm = lcm * x // gcd(lcm, x)
    stride = {g: lcm // x for g, x in w.items()}
    v_exhaust = min(60 * s for s in stride.values())
    cnt = dict.fromkeys(w, 0)
    for i, (_, s, r) in enumerate(got):
        if r * stride[s] >= v_exhaust:
            break
        cnt[s] += 1
        m = i + 1
        for g in w:
            bound = 1.0 + len(w) * w[g] / tot_w
            assert abs(cnt[g] - m * w[g] / tot_w) <= bound, (m, g, cnt)
    # partitioning invariance
    again = proportional_interleave(
        df.repartition(13), "src", "doc_id", weights=w, salt="p0"
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, out.collect())
    )
    with pytest.raises(ValueError, match="positive ints"):
        proportional_interleave(df, "src", "doc_id", weights={"s0": 0})
    with pytest.raises(ValueError, match="positive ints"):
        proportional_interleave(df, "src", "doc_id", weights={"s0": 1.5})
    with pytest.raises(ValueError, match="at least one group"):
        proportional_interleave(df, "src", "doc_id", weights={})
    with pytest.raises(ValueError, match="lcm"):
        proportional_interleave(
            df, "src", "doc_id",
            weights={f"s{i}": p for i, p in enumerate([7, 11, 13, 17, 19, 23, 29, 31, 37, 41])},
        )
    with pytest.raises(ValueError, match="shards"):
        proportional_interleave(df, "src", "doc_id", weights={"s0": 1}, shards=0)


def test_kn_bigram_logprob_matches_duckdb(spark):
    """X54: the Kneser-Ney chain (pair build -> bigram table -> the
    three smoothing aggregates (continuation/fertility/context) ->
    max(c-D,0)/ctx + backoff*p_cont -> scaled-bigint per-doc sum)
    hash-matches DuckDB bit for bit, count_stats included."""
    from pyspark_dist_explore_spark.operators.textstats import (
        kn_bigram_logprob_scores,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return kn_bigram_logprob_scores(
            docs, "text", "doc_id", count_stats=True
        )

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    oracle = f"""
WITH toks AS (
  SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS idx, unnest(l) AS tok
  FROM (SELECT doc_id, string_split({norm}, ' ') AS l FROM documents) t
),
t2 AS (SELECT doc_id, idx, tok FROM toks WHERE tok <> ''),
pairs AS (
  SELECT doc_id, idx, tok, lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS prev
  FROM t2
),
bi AS (
  SELECT prev, tok AS term, count(*) AS bcnt FROM pairs
  WHERE prev IS NOT NULL GROUP BY prev, tok
),
fert AS (SELECT prev, count(*) AS nf, sum(bcnt) AS ctx FROM bi GROUP BY prev),
cont AS (SELECT term, count(*) AS nc FROM bi GROUP BY term),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS b, CAST(count(DISTINCT term) AS DOUBLE) AS v FROM bi),
scored AS (
  SELECT p.doc_id,
         CAST(round(ln(
           CASE WHEN p.prev IS NOT NULL AND COALESCE(f.ctx, 0) > 0
                THEN greatest(CAST(COALESCE(b.bcnt, 0) AS DOUBLE) - 0.75, 0.0)
                       / CAST(f.ctx AS DOUBLE)
                     + (0.75 * CAST(f.nf AS DOUBLE) / CAST(f.ctx AS DOUBLE))
                       * ((CAST(COALESCE(c.nc, 0) AS DOUBLE) + 1.0) / (tot.b + 1.0 * tot.v))
                ELSE (CAST(COALESCE(c.nc, 0) AS DOUBLE) + 1.0) / (tot.b + 1.0 * tot.v)
           END
         ) * 1e6) AS BIGINT) AS slogp,
         COALESCE(c.nc, 0) AS nc,
         CASE WHEN p.prev IS NOT NULL THEN COALESCE(f.nf, 0) ELSE 0 END AS nf,
         CASE WHEN p.prev IS NOT NULL THEN COALESCE(f.ctx, 0) ELSE 0 END AS ctx
  FROM pairs p
  LEFT JOIN cont c ON p.tok = c.term
  LEFT JOIN fert f ON p.prev = f.prev
  LEFT JOIN bi b ON p.prev = b.prev AND p.tok = b.term, tot
)
SELECT doc_id, n_tok,
       CAST(mean_e6 AS DOUBLE) / 1e6 AS mean_logprob,
       round(exp(-(CAST(mean_e6 AS DOUBLE) / 1e6)), 6) AS ppl,
       kn_cont_mass, kn_fert_mass, kn_ctx_mass
FROM (
  SELECT doc_id, count(*) AS n_tok,
         CAST(round(CAST(sum(slogp) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_e6,
         CAST(sum(nc) AS BIGINT) AS kn_cont_mass,
         CAST(sum(nf) AS BIGINT) AS kn_fert_mass,
         CAST(sum(ctx) AS BIGINT) AS kn_ctx_mass
  FROM scored GROUP BY doc_id
)
"""
    compare(spark, SF_SMOKE, build, oracle)


def test_kn_bigram_hand_example(spark):
    """X54 math pinned on a corpus small enough to derive by hand:
    'a b a b a c' — bigrams {ab:2, ba:2, ac:1}, B=3 types, V=3 terms;
    checks the continuation intuition (after 'a': 'b' has bcnt=2 but
    'c' keeps non-zero mass; an unseen successor of 'a' gets exactly
    backoff*p_cont) plus the per-doc fixed-point mean."""
    import math

    from pyspark_dist_explore_spark.operators.textstats import (
        kn_bigram_logprob_scores,
    )

    docs = spark.createDataFrame([(1, "a b a b a c")], ["doc_id", "text"])
    got = kn_bigram_logprob_scores(
        docs, "text", "doc_id", discount=0.75, alpha=1.0, count_stats=True
    ).collect()[0]
    # bigram table: (a,b):2 (b,a):2 (a,c):1 -> fert a: nf=2 ctx=3;
    # fert b: nf=1 ctx=2; cont: b nc=1, a nc=1, c nc=1; B=3, V=3
    B, V, al = 3.0, 3.0, 1.0
    pc = {t: (1 + al) / (B + al * V) for t in "abc"}  # nc=1 for all three
    p = []
    p.append(pc["a"])                                   # 'a' first token
    p.append((2 - 0.75) / 3 + (0.75 * 2 / 3) * pc["b"])  # a->b
    p.append((2 - 0.75) / 2 + (0.75 * 1 / 2) * pc["a"])  # b->a
    p.append((2 - 0.75) / 3 + (0.75 * 2 / 3) * pc["b"])  # a->b
    p.append((2 - 0.75) / 2 + (0.75 * 1 / 2) * pc["a"])  # b->a
    p.append((1 - 0.75) / 3 + (0.75 * 2 / 3) * pc["c"])  # a->c
    slog = [round(math.log(x) * 1e6) for x in p]
    mean_e6 = round(sum(slog) / len(slog))
    assert got["n_tok"] == 6
    assert got["mean_logprob"] == pytest.approx(mean_e6 / 1e6, abs=1e-12)
    assert got["ppl"] == pytest.approx(round(math.exp(-mean_e6 / 1e6), 6), abs=1e-12)
    assert got["kn_cont_mass"] == 6      # nc=1 at every position
    assert got["kn_fert_mass"] == 2 + 1 + 2 + 1 + 2  # a,b,a,b,a contexts
    assert got["kn_ctx_mass"] == 3 + 2 + 3 + 2 + 3


def test_kn_bigram_semantics_and_guards(spark):
    """KN-specific semantics: the continuation unigram ranks a word by
    CONTEXT DIVERSITY, not frequency — a token frequent after one
    single context ('francisco' after 'san') scores LOWER after an
    unseen context than an equally frequent but diverse token; D=0
    degenerates to the MLE bigram with p_cont only at unseen events;
    reference-LM training via lm_bigrams; guards raise."""
    from pyspark_dist_explore_spark.operators.textstats import (
        kn_bigram_logprob_scores,
    )

    # 'francisco' appears 6x, ALWAYS after 'san' (nc=1); 'things'
    # appears 6x after 6 different words (nc=6)
    ref = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco "
                "san francisco san francisco san francisco"),
            (2, "good things bad things new things old things "
                "red things blue things"),
        ],
        ["doc_id", "text"],
    )
    # probe: both words after the SAME unseen-context word
    probe = spark.createDataFrame(
        [(10, "zzz francisco"), (11, "zzz things")], ["doc_id", "text"]
    )
    from pyspark_dist_explore_spark.operators.textstats import normalize_text  # noqa: F401

    bi_lm = (
        ref.selectExpr("doc_id", "text")
        .transform(lambda d: _kn_bigram_table(spark, d))
    )
    got = {
        r["doc_id"]: r["mean_logprob"]
        for r in kn_bigram_logprob_scores(
            probe, "text", "doc_id", lm_bigrams=bi_lm
        ).collect()
    }
    assert got[11] > got[10]  # diverse 'things' likelier than glued 'francisco'
    # D=0: seen events become pure MLE (no discount, no backoff mass)
    import math

    docs = spark.createDataFrame([(1, "x y x y")], ["doc_id", "text"])
    r0 = kn_bigram_logprob_scores(docs, "text", "doc_id", discount=0.0).collect()[0]
    # bigrams xy:2 yx:1; ctx x=2, y=1; first tok p_cont(x)=(1+1)/(2+2)
    p = [0.5, 2 / 2, 1 / 1, 2 / 2]
    mean_e6 = round(sum(round(math.log(v) * 1e6) for v in p) / 4)
    assert r0["mean_logprob"] == pytest.approx(mean_e6 / 1e6, abs=1e-12)
    with pytest.raises(ValueError, match="discount"):
        kn_bigram_logprob_scores(docs, "text", "doc_id", discount=1.0)
    with pytest.raises(ValueError, match="alpha"):
        kn_bigram_logprob_scores(docs, "text", "doc_id", alpha=0.0)


def _kn_bigram_table(spark, docs):
    """(prev, term, cnt) bigram table via the library's own tokenizer."""
    from pyspark.sql import Window

    from pyspark_dist_explore_spark.operators.dedup import normalize_text

    toks = docs.select(
        F.col("doc_id"),
        F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias(
            "idx", "tok"
        ),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("idx")
    return (
        toks.select("doc_id", "idx", "tok", F.lag("tok", 1).over(w).alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_edit_distance_pairs_matches_duckdb(spark):
    """X55: the verify chain (normalize -> optional prefix truncate ->
    Levenshtein <= bound) matches the DuckDB twin row for row on ASCII
    text, with and without prefix_len."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.dedup import (
        edit_distance_pairs,
        edit_distance_pairs_sql,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dot"),   # dist 1
        (3, "the quick brown fox leaps over a lazy dog"),     # small dist
        (4, "completely different text about spark engines"),
        (5, "  The  Quick  Brown  Fox  jumps over the lazy dog "),  # norm-dup of 1
    ]
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 4)]
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    pdf = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    for plen in (None, 20):
        got = sorted(
            tuple(r)
            for r in edit_distance_pairs(
                ddf, pdf, "text", "doc_id", max_dist=10, prefix_len=plen
            ).collect()
        )
        con = duckdb.connect()
        con.register("d", pd.DataFrame(docs, columns=["doc_id", "text"]))
        con.register("p", pd.DataFrame(pairs, columns=["doc_a", "doc_b"]))
        want = sorted(
            map(
                tuple,
                con.execute(
                    edit_distance_pairs_sql(
                        "SELECT * FROM d",
                        "SELECT * FROM p",
                        "text",
                        "doc_id",
                        max_dist=10,
                        prefix_len=plen,
                    )
                ).fetchall(),
            )
        )
        con.close()
        assert got == want, (plen, got, want)
        assert (1, 5, 0) in got  # whitespace/case dup collapses to 0
        assert all(a != 4 and b != 4 for a, b, _ in got)  # far pair dropped


def test_edit_distance_pairs_semantics(spark):
    """X55 semantics: the banded DP bound is exact at the boundary
    (dist == max_dist kept, max_dist+1 dropped); Spark counts CODEPOINT
    edits on unicode (the documented DuckDB divergence); guards."""
    from pyspark_dist_explore_spark.operators.dedup import edit_distance_pairs

    docs = [
        (1, "aaaaaaaaaa"),
        (2, "aaaaabbbbb"),  # dist 5 from 1
        (3, "café au lait"),
        (4, "cafe au lait"),  # 1 codepoint edit
    ]
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    pdf = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a bigint, doc_b bigint"
    )
    at5 = edit_distance_pairs(ddf, pdf, "text", "doc_id", max_dist=5).collect()
    assert {(r["doc_a"], r["doc_b"], r["edit_dist"]) for r in at5} == {
        (1, 2, 5),
        (3, 4, 1),
    }
    at4 = edit_distance_pairs(ddf, pdf, "text", "doc_id", max_dist=4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in at4} == {(3, 4)}
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(ddf, pdf, "text", "doc_id", max_dist=-1)
    with pytest.raises(ValueError, match="prefix_len"):
        edit_distance_pairs(ddf, pdf, "text", "doc_id", max_dist=1, prefix_len=0)
    with pytest.raises(ValueError, match="candidates missing"):
        edit_distance_pairs(
            ddf, pdf.withColumnRenamed("doc_b", "other"), "text", "doc_id", max_dist=1
        )


def test_classifier_train_counts_match_duckdb(spark):
    """X56: the trainer's distributed half — per-bucket (cp, cn) counts
    over the scorer's exact gram/bucket chain (md5 route) — matches the
    DuckDB twin row for row on real docs; the weight table then derives
    from nb_bucket_weight on BOTH sides by construction (the X48
    one-function-transcendental technique)."""
    from pyspark_dist_explore_spark.operators.textstats import (
        classifier_train_counts_sql,
        nb_bucket_weight,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    B = 4096

    def build(spark, sf_dir):
        from pyspark_dist_explore_spark.operators.textstats import (
            _cls_bucket_expr,
            _cls_gram_col,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
            "doc_id < 200"
        )

        def counts(df, name):
            grams = _cls_gram_col(F.col("text"), bigrams=True)
            b = _cls_bucket_expr(F.col("gram"), n_buckets=B, hash_fn="md5")
            return (
                df.select(F.explode(grams).alias("gram"))
                .select(b.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias(name))
            )

        cp = counts(docs.where("doc_id % 2 = 0"), "cp")
        cn = counts(docs.where("doc_id % 2 = 1"), "cn")
        return cp.join(cn, "bucket", "full_outer").select(
            "bucket",
            F.coalesce("cp", F.lit(0)).cast("bigint").alias("cp"),
            F.coalesce("cn", F.lit(0)).cast("bigint").alias("cn"),
        )

    oracle = classifier_train_counts_sql(
        "SELECT text FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0",
        "SELECT text FROM documents WHERE doc_id < 200 AND doc_id % 2 = 1",
        n_buckets=B,
    )
    compare(spark, SF_SMOKE, build, oracle)
    # the one transcendental function: hand pins
    assert nb_bucket_weight(5, 5) == 0                      # balanced -> 0
    assert nb_bucket_weight(0, 0) == 0                      # unseen -> 0 (centered)
    assert nb_bucket_weight(9, 0) > 0 > nb_bucket_weight(0, 9)
    import math

    assert nb_bucket_weight(9, 0) == round((1 << 16) * math.log(10.0))


def test_classifier_train_and_serve_separates(spark):
    """X56 end-to-end: train NB weights on planted separable seed sets,
    serve through classifier_score(weights=) — held-out positive docs
    keep, held-out negatives drop, at the zero threshold; the emitted
    frame is the scorer's serving schema; guards raise."""
    from pyspark_dist_explore_spark.operators.textstats import (
        classifier_score,
        classifier_train,
    )

    good_words = "theory method result analysis evidence study".split()
    bad_words = "click buy cheap deal offer win".split()
    filler = "the of and to in".split()

    def doc(words, i):
        pool = words + filler
        return " ".join(pool[(i + j) % len(pool)] for j in range(18))

    pos = spark.createDataFrame(
        [(i, doc(good_words, i)) for i in range(24)], ["doc_id", "text"]
    )
    neg = spark.createDataFrame(
        [(i, doc(bad_words, i)) for i in range(24)], ["doc_id", "text"]
    )
    w = classifier_train(
        pos.where("doc_id < 16"),
        neg.where("doc_id < 16"),
        "text",
        n_buckets=1 << 14,
        hash_fn="md5",
    )
    assert w.columns == ["bucket", "weight"]
    assert w.count() > 0
    held = pos.where("doc_id >= 16").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    ).unionByName(neg.where("doc_id >= 16").select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text"
    ))
    scored = classifier_score(
        held, "text", "doc_id", n_buckets=1 << 14, weights=w,
        threshold=(0, 1), hash_fn="md5",
    ).collect()
    for r in scored:
        want = 1 if r["doc_id"] < 2000 else 0
        assert r["cls_keep"] == want, (r["doc_id"], r["cls_logit_num"])
    with pytest.raises(ValueError, match="n_buckets"):
        classifier_train(pos, neg, "text", n_buckets=1 << 23)
    with pytest.raises(ValueError, match="alpha"):
        classifier_train(pos, neg, "text", alpha=0.0)
    with pytest.raises(ValueError, match="min_count"):
        classifier_train(pos, neg, "text", min_count=0)
    with pytest.raises(ValueError, match="no grams"):
        empty = spark.createDataFrame([(1, "")], ["doc_id", "text"])
        classifier_train(empty, empty, "text")


def test_frequent_ngrams_matches_duckdb(spark):
    """X57: per-group top-k frequent n-gram census hash-matches the
    DuckDB twin on real docs (row-local gram slices, min_count prune,
    (cnt DESC, gram ASC) rank), for n in {1, 2, 3}."""
    from pyspark_dist_explore_spark.operators.textstats import (
        frequent_ngrams,
        frequent_ngrams_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    for n in (1, 2, 3):
        compare(
            spark,
            SF_SMOKE,
            lambda s, d, n=n: frequent_ngrams(
                s.read.parquet(f"{d}/documents.parquet"),
                "text",
                n=n,
                top_k=12,
                group_col="source",
                min_count=2,
            ),
            frequent_ngrams_sql(
                "SELECT source, text FROM documents",
                n=n,
                top_k=12,
                group_col="source",
                min_count=2,
            ),
        )


def test_frequent_ngrams_semantics(spark):
    """X57 semantics: planted boilerplate dominates rank 1; docs shorter
    than n contribute nothing; min_count prunes singletons; ALL-group
    form; ties break lexicographically; guards raise."""
    from pyspark_dist_explore_spark.operators.textstats import frequent_ngrams

    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [(i, f"{banner} unique{i} words here now") for i in range(9)]
        + [(100, "ab"), (101, None)],
        ["doc_id", "text"],
    )
    got = frequent_ngrams(docs, "text", n=3, top_k=3).collect()
    assert got[0]["group"] == "ALL"
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["gram"] == banner and by_rank[1]["cnt"] == 9
    # 'all cookies unique{i}' are singletons -> pruned by min_count=2
    assert all(r["cnt"] >= 2 for r in got)
    # tie-break: two grams at cnt 9 -> lexicographic order decides ranks
    ranked = [r["gram"] for r in got if r["cnt"] == 9]
    assert ranked == sorted(ranked)
    with pytest.raises(ValueError, match="n must"):
        frequent_ngrams(docs, "text", n=0)
    with pytest.raises(ValueError, match="top_k"):
        frequent_ngrams(docs, "text", top_k=0)
    with pytest.raises(ValueError, match="min_count"):
        frequent_ngrams(docs, "text", min_count=0)


def test_keyness_census_matches_duckdb(spark):
    """X61: cross-corpus chi-square keyness hash-matches the DuckDB twin
    on real docs split into two halves (type counts, min_count prune,
    identical-parenthesization double chi2, exact-integer direction,
    (chi2 DESC, tok ASC) rank)."""
    from pyspark_dist_explore_spark.operators.textstats import (
        keyness_census,
        keyness_census_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    def build(s, d):
        docs = s.read.parquet(f"{d}/documents.parquet")
        return keyness_census(
            docs.where(F.col("doc_id") % 2 == 0),
            docs.where(F.col("doc_id") % 2 == 1),
            "text",
            top_k=25,
            min_count=3,
        )

    compare(
        spark,
        SF_SMOKE,
        build,
        keyness_census_sql(
            "SELECT text FROM documents WHERE doc_id % 2 = 0",
            "SELECT text FROM documents WHERE doc_id % 2 = 1",
            top_k=25,
            min_count=3,
        ),
    )


def test_keyness_census_semantics(spark):
    """X61 semantics: hand-computed chi2 on a 5-token planted pair,
    direction by exact cross-product, rate-equal types excluded,
    min_count prune, guards."""
    from pyspark_dist_explore_spark.operators.textstats import keyness_census

    a = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "b c")], ["doc_id", "text"])
    rows = {r["tok"]: r for r in keyness_census(a, b, "text", min_count=1).collect()}
    # Na=3, Nb=2, N=5; tok 'a': (2,0) diff=4, chi2=5*16/(2*3*3*2)
    assert rows["a"]["enriched_in"] == "a" and rows["a"]["chi2"] == round(80 / 36, 6)
    assert (rows["a"]["cnt_a"], rows["a"]["cnt_b"]) == (2, 0)
    # tok 'b': (1,1) diff=1*2-1*3=-1 -> B-enriched, chi2=5/36
    assert rows["b"]["enriched_in"] == "b" and rows["b"]["chi2"] == round(5 / 36, 6)
    # tok 'c': (0,1) diff=-3, chi2=5*9/(1*4*3*2)
    assert rows["c"]["enriched_in"] == "b" and rows["c"]["chi2"] == round(45 / 24, 6)
    # per-direction rank: chi2 desc — 'c' (1.875) outranks 'b' (0.139)
    assert rows["c"]["rank"] == 1 and rows["b"]["rank"] == 2 and rows["a"]["rank"] == 1

    # rate-equal type excluded: d has 2/4 in A, 1/2 in B -> same rate
    a2 = spark.createDataFrame([(1, "d d e e")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, "d f")], ["doc_id", "text"])
    toks = {r["tok"]: r["enriched_in"]
            for r in keyness_census(a2, b2, "text", min_count=1).collect()}
    assert "d" not in toks and toks == {"e": "a", "f": "b"}

    # min_count prunes across BOTH corpora; NULL text is an empty doc
    a3 = spark.createDataFrame([(1, "x x y"), (2, None)], ["doc_id", "text"])
    b3 = spark.createDataFrame([(3, "y")], ["doc_id", "text"])
    kept = {r["tok"] for r in keyness_census(a3, b3, "text", min_count=2).collect()}
    assert kept == {"x", "y"}  # x:2+0, y:1+1 both pass; nothing else exists
    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_k"):
        keyness_census(a3, b3, "text", top_k=0)
    with _pytest.raises(ValueError, match="min_count"):
        keyness_census(a3, b3, "text", min_count=0)


def test_image_dhash_and_hamming_neardup(spark):
    """X58: perceptual image dedup end-to-end — the distributed dHash
    equals the pure-numpy reference bit for bit at any partitioning;
    brightness-shifted re-encodes (different bytes, different md5) land
    at Hamming 0; a content-different image does not pair; corrupt
    payloads drop; the generic banded hamming join equals brute force."""
    import numpy as np

    from pyspark_dist_explore_spark.operators import multimodal
    from pyspark_dist_explore_spark.operators.dedup import hamming_neardup
    from pyspark_dist_explore_spark.operators.multimodal import (
        dhash_pixels,
        encode_bmp,
        image_dhash,
    )

    h, w = 24, 32
    # range-confined pattern (< 200): the +40 brightness shift must not
    # clip, or saturated cells would legitimately flatten gradients
    y, x = np.mgrid[0:h, 0:w]
    chan = ((y * 7 + x * 13) % 200).astype(np.uint8)
    base = np.stack([chan, (chan * 2) % 200, (chan * 3) % 200], axis=-1).astype(np.uint8)
    brighter = (base.astype(np.int64) + 40).astype(np.uint8)
    other = multimodal._doc_pixels(9999, 2, w, h)
    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_bmp(brighter))),
        (3, bytearray(encode_bmp(other))),
        (4, bytearray(b"not a bmp")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary").repartition(3)
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert set(got) == {1, 2, 3}  # corrupt payload dropped
    assert got[1] == dhash_pixels(base)       # distributed == reference
    # brightness shift preserves every gradient comparison (clip can
    # flatten saturated cells; this pattern stays in range)
    assert got[2] == got[1]
    assert got[3] != got[1]
    # generic hamming join == brute force on planted signatures
    def flip(sig, mask):  # xor in the unsigned domain, back to signed i64
        u = (sig & ((1 << 64) - 1)) ^ mask
        return u - (1 << 64) if u >= 1 << 63 else u

    sigs = [(1, got[1]), (2, got[2]), (3, got[3]),
            (5, flip(got[1], 0b111)), (6, flip(got[1], 1 << 63))]
    sdf = spark.createDataFrame(sigs, "doc_id bigint, dhash bigint")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_neardup(
            sdf, "dhash", "doc_id", bits=64, max_hamming=3
        ).collect()
    }
    brute = {}
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1 :]:
            d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                brute[(ia, ib)] = d
    assert pairs == brute
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 3 and pairs[(1, 6)] == 1
    with pytest.raises(ValueError, match="grid"):
        dhash_pixels(base, grid=9)
    with pytest.raises(ValueError, match="bits"):
        hamming_neardup(sdf, "dhash", "doc_id", bits=65, max_hamming=3)
    with pytest.raises(ValueError, match="max_hamming"):
        hamming_neardup(sdf, "dhash", "doc_id", bits=8, max_hamming=8)


def test_audio_fingerprint_and_hamming(spark):
    """X59: the distributed audio fingerprint equals the pure-numpy
    reference bit for bit; a 2x-gain re-encode of a high-contrast sweep
    (different bytes, different md5) lands at Hamming 0; a different
    tone does not pair at a tight bound; corrupt/short payloads drop;
    guards raise."""
    import numpy as np

    from pyspark_dist_explore_spark.operators import multimodal
    from pyspark_dist_explore_spark.operators.dedup import hamming_neardup
    from pyspark_dist_explore_spark.operators.multimodal import (
        afp_samples,
        audio_fingerprint,
        encode_wav,
    )

    base = multimodal._doc_samples(7, 4000)
    louder = (base.astype(np.int64) * 2).clip(-32768, 32767).astype(np.int16)
    other = multimodal._doc_samples(41, 4000)
    rows = [
        (1, bytearray(encode_wav(base))),
        (2, bytearray(encode_wav(louder))),
        (3, bytearray(encode_wav(other))),
        (4, bytearray(b"RIFFxxxxWAVE")),       # truncated: no fmt/data
        (5, bytearray(encode_wav(base[:10]))),  # too short for 64 bits
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary").repartition(3)
    got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == afp_samples(base)
    # doubling the gain doubles every |sample|, so block-energy ORDER is
    # preserved up to integer-division rounding; the sweep's block
    # contrasts are far above that rounding, so the contour is identical
    assert got[2] == got[1]
    assert got[3] != got[1]
    sdf = spark.createDataFrame(
        [(k, v) for k, v in got.items()], "doc_id bigint, afp bigint"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_neardup(sdf, "afp", "doc_id", bits=64, max_hamming=2).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    with pytest.raises(ValueError, match="n_bits"):
        afp_samples(base, n_bits=65)
    with pytest.raises(ValueError, match="samples"):
        afp_samples(base[:10])


def test_proportional_interleave_output_column_clash(spark):
    """X53 guard: rank/pos output names colliding with input columns
    raise instead of silently replacing."""
    from pyspark_dist_explore_spark.operators.sampling import (
        proportional_interleave,
    )

    df = spark.createDataFrame([(1, "a", 9)], "doc_id bigint, g string, pos int")
    with pytest.raises(ValueError, match="already exist"):
        proportional_interleave(df, "g", "doc_id", weights={"a": 1})
    out = proportional_interleave(
        df, "g", "doc_id", weights={"a": 1}, pos_col="gpos"
    )
    assert {"pos", "gpos", "rank"} <= set(out.columns)


# --------------------------------------------------------------------------
# X63: deterministic negative sampling (sampling.sample_negatives)
# --------------------------------------------------------------------------


def test_sample_negatives_matches_duckdb(spark):
    """X63: the two-level distributed rank + md5 draw chain equals the
    DuckDB flat-window twin row for row, with and without the
    same-group exclusion, on real docs."""
    import duckdb

    from pyspark_dist_explore_spark.operators.sampling import (
        sample_negatives,
        sample_negatives_sql,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import compare

    compare(
        spark,
        SF_SMOKE,
        lambda s, d: sample_negatives(
            s.read.parquet(f"{d}/documents.parquet").select("doc_id", "source"),
            "doc_id", k=3, salt="t0",
        ),
        sample_negatives_sql("SELECT doc_id, source FROM documents", "doc_id", k=3, salt="t0"),
    )
    compare(
        spark,
        SF_SMOKE,
        lambda s, d: sample_negatives(
            s.read.parquet(f"{d}/documents.parquet").select("doc_id", "source"),
            "doc_id", k=3, salt="t0", group_col="source",
        ),
        sample_negatives_sql(
            "SELECT doc_id, source FROM documents", "doc_id",
            k=3, salt="t0", group_col="source",
        ),
    )


def test_sample_negatives_semantics(spark):
    """X63 invariants: k rows per anchor (no group filter), never
    self-negative, deterministic across runs AND partitionings, salt
    changes the draw, group exclusion only removes same-group rows,
    degenerate corpora (0/1 rows) yield no rows, guards raise."""
    from pyspark_dist_explore_spark.operators.sampling import sample_negatives

    df = spark.createDataFrame([(i, "g" + str(i % 3)) for i in range(24)], ["doc_id", "src"])
    out = sample_negatives(df, "doc_id", k=5, salt="s1").collect()
    assert len(out) == 24 * 5
    per = {}
    for r in out:
        assert r["neg_id"] != r["anchor_id"], "self-negative"
        per.setdefault(r["anchor_id"], []).append((r["draw"], r["neg_id"]))
    assert all(len(v) == 5 for v in per.values())
    # determinism + partitioning invariance
    again = sample_negatives(df.repartition(7), "doc_id", k=5, salt="s1").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = sample_negatives(df, "doc_id", k=5, salt="s2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    # group exclusion: subset of the unfiltered draws, no same-group pair
    grp = {r["doc_id"]: r["src"] for r in df.collect()}
    excl = sample_negatives(df, "doc_id", k=5, salt="s1", group_col="src").collect()
    assert {tuple(r) for r in excl} == {
        tuple(r) for r in out if grp[r["anchor_id"]] != grp[r["neg_id"]]
    }
    # degenerate corpora
    assert sample_negatives(df.limit(1), "doc_id", k=3).count() == 0
    assert sample_negatives(df.limit(0), "doc_id", k=3).count() == 0
    with pytest.raises(ValueError, match="k must"):
        sample_negatives(df, "doc_id", k=0)
    with pytest.raises(ValueError, match="already exists"):
        sample_negatives(df.withColumnRenamed("src", "draw"), "doc_id")


def test_sample_negatives_string_ids_match_duckdb(spark):
    """X63 with non-numeric ids (uuid/url corpora): the rank order, the
    draw arithmetic, and the lexicographic tie-break all hold on
    strings — twin-checked."""
    import duckdb
    import pandas as pd

    from pyspark_dist_explore_spark.operators.sampling import (
        sample_negatives,
        sample_negatives_sql,
    )

    rows = [(f"doc://{i:03d}", f"h{i % 4}") for i in range(30)]
    df = spark.createDataFrame(rows, ["uid", "host"])
    got = sorted(
        map(tuple, sample_negatives(
            df, "uid", k=3, salt="su0", group_col="host",
            anchor_col="anchor_id", neg_col="neg_id",
        ).collect())
    )
    con = duckdb.connect()
    try:
        con.register("docs_s", pd.DataFrame(rows, columns=["uid", "host"]))
        want = sorted(tuple(r) for r in con.execute(
            sample_negatives_sql("SELECT uid, host FROM docs_s", "uid",
                                 k=3, salt="su0", group_col="host")
        ).fetchall())
    finally:
        con.close()
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# X64: product quantization
# --------------------------------------------------------------------------

_PQ_GRID = None  # lazily built per-test: 1e-6-grid integer embeddings


def _pq_grid_emb(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * F.lit(1e6)),
        ).alias("embedding"),
    )


def test_pq_encode_matches_duckdb(spark):
    """X64: PQ codes over the fit='sample' codebooks hash-match the
    DuckDB twin cell for cell — on the 1e-6 grid the squared-L2
    distances are exact integers, so both engines run the identical
    (dist ASC, code ASC) argmin."""
    from tests.oracle_utils import duckdb_con

    emb6 = _pq_grid_emb(spark)
    cb = similarity.pq_codebooks(emb6, m=8, dim=64, n_codes=16)
    got = {
        r["vec_id"]: ",".join(str(c) for c in r["codes"])
        for r in similarity.pq_encode(emb6, cb, m=8, dim=64).collect()
    }
    con = duckdb_con("/root/testdata/sf0.001")
    try:
        want = dict(
            con.execute(
                similarity.pq_codes_sql(
                    "SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
                    "x -> round(x * 1000000)) AS embedding FROM embeddings",
                    m=8,
                    dim=64,
                    n_codes=16,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) == 500


def test_pq_adc_exactness_invariant(spark):
    """A codebook containing EVERY corpus subvector makes assignment
    distance 0 and the ADC score the exact grid dot product — pq_topk
    must then reproduce the brute-force grid-dot ranking bit for bit
    (the IVF full-probe move: correctness of encode + LUT + scan +
    re-rank in one invariant)."""
    emb6 = _pq_grid_emb(spark)
    cb = similarity.pq_codebooks(emb6, m=8, dim=64, n_codes=500)
    codes = similarity.pq_encode(emb6, cb, m=8, dim=64)
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in similarity.pq_topk(
            codes, q, cb, k=5, m=8, dim=64
        ).collect()
    }
    # brute-force grid dot on the same integers
    ref = (
        q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want and len(got) == 15


def test_pq_recall_floor_and_shape(spark):
    """Lossy-PQ recall floor on the worst-case isotropic corpus
    (m=8 subspaces, 16 sample codes): measured recall@5 vs the exact
    grid ranking — pin a floor under the measurement, the m-code
    output shape, and that candidates= restricts the scan (the IVF-PQ
    composition hook)."""
    emb6 = _pq_grid_emb(spark)
    cb = similarity.pq_codebooks(emb6, m=8, dim=64, n_codes=16)
    codes = similarity.pq_encode(emb6, cb, m=8, dim=64)
    assert codes.select(F.size("codes")).distinct().collect()[0][0] == 8
    q = emb6.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = similarity.pq_topk(codes, q, cb, k=5, m=8, dim=64)
    ref = (
        q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5).collect()
    }
    got = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.2, f"PQ recall@5 {recall:.3f}"  # lossy by design;
    # 16 codes x 8 subs on isotropic data — measured ~0.3-0.5
    # candidates= restricts the scan to the given pairs
    cand = spark.createDataFrame(
        [(0, 7), (0, 9)], ["query_id", "vec_id"]
    )
    rows = similarity.pq_topk(
        codes, q.where(F.col("query_id") == 0), cb, k=5, m=8, dim=64,
        candidates=cand,
    ).collect()
    assert {r["vec_id"] for r in rows} <= {7, 9} and len(rows) == 2


def test_pq_guards(spark):
    emb6 = _pq_grid_emb(spark)
    with pytest.raises(ValueError, match="multiple of m"):
        similarity.pq_subvectors(emb6, m=7, dim=64)
    with pytest.raises(ValueError, match="fit must be"):
        similarity.pq_codebooks(emb6, m=8, dim=64, fit="nope")
    # r13 advice: ivf_pq_topk must reject n_assign < 1 like ivf_topk —
    # n_assign=0 would slice an empty assignment list and silently
    # return an empty result
    q = emb6.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="n_assign"):
        similarity.ivf_pq_topk(emb6, q, k=5, m=8, dim=64, n_assign=0)


def test_pq_kmeans_fit_cap_engages_past_the_probe(spark):
    """r13 advice (medium): the max_fit_rows absolute cap must derive its
    keep fraction from the EXACT corpus count, not the limit(cap+1)
    probe — with the probe-truncated count, keep ≈ (1<<16)·cap/(cap+1)
    ≈ 65535 and the filter retains ~99.998% of an oversized corpus.
    Pin: for a corpus ~8× over the cap, the capped per-subspace fit
    rows land near the cap (hash-sampling tolerance), not near n."""
    from pyspark_dist_explore_spark.operators.similarity import _pq_fit_source

    n, cap = 400, 50
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") * 7 + i) % 13 for i in range(8)]
        ).cast("array<double>").alias("embedding"),
    )
    subs = similarity.pq_subvectors(emb, m=2, dim=8)
    kept = (
        _pq_fit_source(subs, None, cap)
        .where(F.col("sub") == 0)
        .count()
    )
    assert kept <= int(cap * 1.5), f"cap no-oped: kept {kept} of {n} (cap {cap})"
    assert kept >= int(cap * 0.5), f"cap over-filtered: kept {kept} (cap {cap})"
    # under the cap the source passes through untouched
    assert (
        _pq_fit_source(subs, None, n + 1).where(F.col("sub") == 0).count() == n
    )


def test_ivf_coarse_assign_matches_numpy_reference(spark):
    """The round-14 Arrow-matmul rewrite of ivf_coarse_assign, pinned
    against a brute-force numpy reference on grid inputs: for
    n_assign in {1, 2, 3} every vector's assigned cells equal the top
    cells of the exact dot ranking under the (sim DESC, cent_id ASC)
    total order — including ties, which the stable argsort must break
    to the smaller cent_id."""
    import numpy as _np

    emb6 = _pq_grid_emb(spark)
    cents = emb6.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    V = {r["vec_id"]: _np.array(r["embedding"]) for r in emb6.collect()}
    C = {r["cent_id"]: _np.array(r["cv"]) for r in cents.collect()}
    for n_assign in (1, 2, 3):
        got = {}
        for r in similarity.ivf_coarse_assign(
            emb6, cents, n_assign=n_assign
        ).collect():
            got.setdefault(r["vec_id"], []).append(r["cent_id"])
        assert set(got) == set(V)
        for vid, v in V.items():
            ranked = sorted(
                C, key=lambda c: (-float(v @ C[c]), c)
            )[:n_assign]
            assert sorted(got[vid]) == sorted(ranked), (vid, got[vid], ranked)
    # exact-duplicate centroids force ties: the smaller cent_id wins
    dup = cents.unionByName(
        cents.where(F.col("cent_id") == 0).select(
            F.lit(7_000).alias("cent_id"), "cv"
        )
    )
    one = {
        r["vec_id"]: r["cent_id"]
        for r in similarity.ivf_coarse_assign(emb6, dup, n_assign=1).collect()
    }
    assert 7_000 not in set(one.values())
    with pytest.raises(ValueError, match="empty"):
        similarity.ivf_coarse_assign(emb6, cents.where(F.lit(False)))


def test_pq_topk_batch_scan_equals_rows_scan(spark):
    """scan='batch' (round 14, the micro-batch serving path): the
    collected-LUT Arrow gather must equal the exploded-row LUT join
    bit for bit on grid inputs — full scan AND candidates-restricted,
    composed through ivf_pq_topk; a bad scan value raises."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = similarity.pq_codebooks(emb6, m=8, dim=64, n_codes=16)
    codes = similarity.pq_encode(emb6, cb, m=8, dim=64)

    def rows_of(df):
        return sorted(map(tuple, df.collect()))

    for cand in (
        None,
        spark.createDataFrame(
            [(0, 7), (0, 9), (1, 12), (3, 7)], ["query_id", "vec_id"]
        ),
    ):
        a = rows_of(similarity.pq_topk(
            codes, q, cb, k=5, m=8, dim=64, candidates=cand))
        b = rows_of(similarity.pq_topk(
            codes, q, cb, k=5, m=8, dim=64, candidates=cand, scan="batch"))
        assert a == b and a, (cand is None, a[:3], b[:3])
    a = rows_of(similarity.ivf_pq_topk(
        emb6, q, k=5, m=8, dim=64, n_codes=16, n_centroids=8, n_probe=4))
    b = rows_of(similarity.ivf_pq_topk(
        emb6, q, k=5, m=8, dim=64, n_codes=16, n_centroids=8, n_probe=4,
        scan="batch"))
    assert a == b and a
    with pytest.raises(ValueError, match="scan"):
        similarity.pq_topk(codes, q, cb, k=5, m=8, dim=64, scan="nope")


def test_pq_rotation_preserves_dots_exactly(spark):
    """The OPQ-style signed permutation is exactly orthogonal: on
    1e-6-grid inputs the rotated dot is the SAME exact integer (the
    sum's terms are merely permuted/sign-flipped in pairs), so every
    exact/ADC ranking is invariant; inverse=True undoes the rotation
    element-for-element; salts are deterministic and distinct."""
    emb6 = _pq_grid_emb(spark)
    rot = similarity.rotate_embeddings(emb6, dim=64, salt="t")
    pairs = (
        emb6.alias("a")
        .join(rot.alias("b"), F.col("a.vec_id") == F.col("b.vec_id"))
        .where(F.col("a.vec_id") < 20)
        .select(
            similarity.dot(F.col("a.embedding"), F.col("a.embedding")).alias("d0"),
            similarity.dot(F.col("b.embedding"), F.col("b.embedding")).alias("d1"),
        )
    )
    for r in pairs.collect():
        assert r["d0"] == r["d1"], (r["d0"], r["d1"])
    back = similarity.rotate_embeddings(rot, dim=64, salt="t", inverse=True)
    orig = {r["vec_id"]: r["embedding"] for r in emb6.where(F.col("vec_id") < 20).collect()}
    for r in back.where(F.col("vec_id") < 20).collect():
        assert r["embedding"] == orig[r["vec_id"]]
    r1 = similarity.pq_rotation(64, salt="a")
    assert r1 == similarity.pq_rotation(64, salt="a")
    assert r1 != similarity.pq_rotation(64, salt="b")
    assert sorted(s for s, _ in r1) == list(range(64))  # a true permutation
    with pytest.raises(ValueError, match="dim"):
        similarity.pq_rotation(0)


def test_pq_rotation_balances_heteroscedastic_corpus(spark):
    """The OPQ motivation, measured: on a corpus whose energy is
    concentrated in the first 8 (adjacent) dimensions, unrotated PQ
    wastes 7 of 8 subspace code budgets; the signed permutation spreads
    the strong dimensions md5-uniformly across subspaces and the ADC
    reconstruction error drops.  (The real testdata embeddings are
    isotropic — per-subspace variance sums within 7% of each other —
    so rotation is a no-op there by design; this corpus is the shape
    rotation exists for.)"""
    import numpy as _np

    rng = _np.random.RandomState(7)
    n, dim, m = 300, 64, 8
    a = _np.zeros((n, dim))
    a[:, :8] = _np.round(rng.randn(n, 8) * 1e6)  # strong, adjacent
    a[:, 8:] = _np.round(rng.randn(n, dim - 8) * 1e3)  # weak tail
    emb = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def adc_err(vectors):
        cb = similarity.pq_codebooks(vectors, m=m, dim=dim, n_codes=16)
        codes = similarity.pq_encode(vectors, cb, m=m, dim=dim)
        adc = similarity.pq_topk(codes, q_rot if vectors is rot else q, cb,
                                 k=n, m=m, dim=dim).select(
            "query_id", "vec_id", F.col("score").alias("adc")
        )
        ref = (
            q.crossJoin(emb.select("vec_id", F.col("embedding").alias("ve")))
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", "vec_id",
                similarity.dot(F.col("embedding"), F.col("ve")).alias("true"),
            )
        )
        row = (
            adc.join(ref, ["query_id", "vec_id"])
            .select(F.avg(F.abs(F.col("adc") - F.col("true"))).alias("e"))
            .collect()[0]
        )
        return float(row["e"])

    rot = similarity.rotate_embeddings(emb, dim=dim, salt="bal")
    q_rot = similarity.rotate_embeddings(q, dim=dim, salt="bal")
    e_plain, e_rot = adc_err(emb), adc_err(rot)
    assert e_rot < e_plain * 0.8, (e_rot, e_plain)


def test_pq_kmeans_codebooks_improve_recall(spark):
    """The fit='kmeans' codebooks (the paper's recipe) must beat the
    16-sample codebooks' quantization error: mean ADC score error vs
    the true dot shrinks, and recall@5 does not regress."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def mean_abs_err(cb):
        codes = similarity.pq_encode(emb6, cb, m=8, dim=64)
        adc = similarity.pq_topk(codes, q, cb, k=500, m=8, dim=64).select(
            "query_id", "vec_id", F.col("score").alias("adc")
        )
        ref = (
            q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", "vec_id",
                similarity.dot(F.col("embedding"), F.col("ve")).alias("true"),
            )
        )
        row = (
            adc.join(ref, ["query_id", "vec_id"])
            .select(F.avg(F.abs(F.col("adc") - F.col("true"))).alias("e"))
            .collect()[0]
        )
        return float(row["e"])

    e_sample = mean_abs_err(similarity.pq_codebooks(emb6, m=8, dim=64, n_codes=16))
    e_kmeans = mean_abs_err(
        similarity.pq_codebooks(
            emb6, m=8, dim=64, n_codes=16, fit="kmeans", fit_sample_mod=None
        )
    )
    assert e_kmeans < e_sample, (e_kmeans, e_sample)


# --------------------------------------------------------------------------
# X65: pack span map
# --------------------------------------------------------------------------


def test_pack_span_map_tiles_and_matches_duckdb(spark):
    """X65: spans tile [0, pack_tokens) with no gaps/overlaps for every
    mode, and the cumsum-mode map equals the DuckDB twin row for row."""
    from tests.oracle_utils import duckdb_con
    from pyspark_dist_explore_spark.operators.packing import (
        pack_span_map,
        pack_span_map_sql,
        pack_sequences,
        pack_sequences_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for mode, order in (("cumsum", "id"), ("greedy", "id"), ("ffd", "ffd")):
        packed = pack_sequences(
            docs, "doc_id", text_col="text", max_tokens=256, buckets=8, mode=mode
        )
        spans = pack_span_map(packed, order=order).collect()
        by_pack: dict = {}
        for r in spans:
            by_pack.setdefault(r["pack_id"], []).append(r)
        for pid, rows in by_pack.items():
            rows.sort(key=lambda r: r["start"])
            pos = 0
            for r in rows:
                assert r["start"] == pos and r["end"] == pos + r["n_tokens"], (
                    mode, pid, r,
                )
                pos = r["end"]

    # twin equality (cumsum order='id')
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    packed_sql = pack_sequences_sql(
        "documents", "doc_id", max_tokens=256, buckets=8, norm_text_expr=norm
    )
    got = sorted(
        tuple(r)
        for r in pack_span_map(
            pack_sequences(
                docs, "doc_id", text_col="text", max_tokens=256, buckets=8
            ),
            order="id",
        ).collect()
    )
    con = duckdb_con("/root/testdata/sf0.001")
    try:
        want = sorted(
            con.execute(pack_span_map_sql(packed_sql, order="id")).fetchall()
        )
    finally:
        con.close()
    assert got == want

    with pytest.raises(ValueError, match="order"):
        pack_span_map(packed, order="zigzag")


def test_ivf_pq_exactness_composition(spark):
    """X66 IVF-PQ: with a full probe (n_probe == n_centroids) and an
    all-subvector codebook, the composed path must equal the
    brute-force grid-dot ranking bit for bit — both operators'
    exactness invariants survive the composition."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in similarity.ivf_pq_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=500,
            n_centroids=16, n_probe=16,
        ).collect()
    }
    ref = (
        q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5).collect()
    }
    assert got == want and len(got) == 15


def test_ivf_pq_bounded_probe_recall(spark):
    """X66 lossy operating point: 4/16 lists probed, 2-way replicated
    index, 16 sample codes — recall@5 vs the exact grid ranking keeps a
    floor, and the result set is a subset of what the probed lists can
    see (never a full scan)."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_pq_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=16,
            n_centroids=16, n_probe=4, n_assign=2,
        ).collect()
    }
    ref = (
        q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.1, f"IVF-PQ recall@5 {recall:.3f}"  # doubly lossy
    # by design (coarse probe x 16-code ADC) on the isotropic corpus


# --------------------------------------------------------------------------
# X69: residual-encoded IVFADC
# --------------------------------------------------------------------------


def _residual_brute_force(q, emb6):
    """(query_id, rank) -> (vec_id, int score) of the exact grid-dot
    ranking — the reference both X69 exactness pins compare against."""
    from pyspark.sql import Window as W

    ref = (
        q.crossJoin(emb6.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5).collect()
    }


def test_ivf_pq_residual_exactness_composition(spark):
    """X69: with a full probe and a codebook containing every corpus
    RESIDUAL subvector, r-hat == r so the decomposed score q·c + Σ q·cv
    equals the exact grid dot bit for bit — the IVFADC analogue of the
    X66 exactness invariant."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], int(r["score"]))
        for r in similarity.ivf_pq_residual_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=500,
            n_centroids=16, n_probe=16,
        ).collect()
    }
    want = _residual_brute_force(q, emb6)
    assert got == want and len(got) == 15


def test_ivf_pq_residual_matches_duckdb(spark):
    """X69 twin: the lossy operating point (8 raw-grid centroids,
    4-probe, 16 sample residual codes) hash-matches the DuckDB twin row
    for row — coarse L2 assignment, elementwise residuals, residual
    codebook argmin, and the decomposed q·c + Σ q·cv score are all
    exact integers on the grid."""
    from tests.oracle_utils import duckdb_con

    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], int(r["score"]))
        for r in similarity.ivf_pq_residual_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=16, n_centroids=8, n_probe=4
        ).collect()
    )
    src = (
        "SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> round(x * 1000000)) AS embedding FROM embeddings"
    )
    con = duckdb_con("/root/testdata/sf0.001")
    try:
        want = sorted(
            (r[0], r[1], r[2], int(r[3]))
            for r in con.execute(
                similarity.ivf_pq_residual_sql(
                    src, m=8, dim=64, n_codes=16,
                    n_centroids=8, n_probe=4, k=5, n_queries=3,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) == 15


def test_ivf_pq_residual_beats_raw_on_clustered_corpus(spark):
    """The IVFADC motivation, measured: when the corpus has MORE coarse
    cells than the per-subspace code budget (40 clusters vs 16 codes —
    the 100 TB regime, where n_lists ~ √N is thousands against ≤256
    codes), raw-space PQ must span inter-cluster structure with codes
    it doesn't have, while residual PQ only quantizes intra-cluster
    offsets: ADC error drops ~10× at the same m·log2(n_codes) budget,
    recall never worse.  (With few clusters and n_codes ≥ n_clusters
    the sample codebook already covers the centers and the two forms
    tie — measured during development; this corpus is the shape
    residual encoding exists for.)"""
    import numpy as _np

    rng = _np.random.RandomState(11)
    n, dim, m, ncl = 300, 64, 8, 40
    centers = _np.round(rng.randn(ncl, dim) * 3e6)
    a = _np.vstack(
        [centers[i % ncl] + _np.round(rng.randn(dim) * 2e5) for i in range(n)]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).coalesce(4)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(ncl)],
        "cent_id bigint, cv array<double>",
    ).coalesce(1)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from pyspark.sql import Window as W

    ref = (
        q.crossJoin(emb.select("vec_id", F.col("embedding").alias("ve")))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            similarity.dot(F.col("embedding"), F.col("ve")).alias("true"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("true").desc(), F.col("vec_id").asc())
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5).collect()
    }

    def metrics(ranked):
        got5 = {
            (r["query_id"], r["vec_id"])
            for r in ranked.where(F.col("rank") <= 5).collect()
        }
        err = (
            ranked.join(ref, ["query_id", "vec_id"])
            .select(F.avg(F.abs(F.col("score") - F.col("true"))).alias("e"))
            .collect()[0]["e"]
        )
        return len(exact & got5) / len(exact), float(err)

    r_raw, e_raw = metrics(
        similarity.ivf_pq_topk(
            emb, q, k=n, m=m, dim=dim, n_codes=16, n_centroids=16, n_probe=16
        )
    )
    r_res, e_res = metrics(
        similarity.ivf_pq_residual_topk(
            emb, q, k=n, m=m, dim=dim, n_codes=16,
            n_centroids=ncl, n_probe=ncl, centroids=cents,
        )
    )
    assert e_res < e_raw * 0.5, (e_res, e_raw)
    assert r_res >= r_raw, (r_res, r_raw)


def test_ivf_pq_residual_prebuilt_artifacts_and_guards(spark):
    """X69 landed form: prebuilt centroids/codebooks/enc reproduce the
    derive-everything path bit for bit (vectors never read at serve
    time); n_assign=2 runs with a recall floor; the guard rails raise."""
    emb6 = _pq_grid_emb(spark)
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = emb6.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    cb = similarity.pq_residual_codebooks(emb6, cents, m=8, dim=64, n_codes=16)
    resid = similarity.ivf_residuals(emb6, cents)
    enc = similarity.pq_encode(
        resid, cb, m=8, dim=64, id_col="vec_id", vec_col="residual",
        keep=("cent_id",),
    )
    rows_of = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], int(r["score"]))
        for r in df.collect()
    )
    a = rows_of(
        similarity.ivf_pq_residual_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=16, n_centroids=8, n_probe=4
        )
    )
    b = rows_of(
        similarity.ivf_pq_residual_topk(
            None, q, k=5, m=8, dim=64, n_codes=16, n_centroids=8, n_probe=4,
            centroids=cents, codebooks=cb, enc=enc,
        )
    )
    assert a == b and len(a) == 15

    # multi-assign replication: runs, and the result is a ranking
    ma = similarity.ivf_pq_residual_topk(
        emb6, q, k=5, m=8, dim=64, n_codes=16,
        n_centroids=8, n_probe=4, n_assign=2,
    ).collect()
    assert len(ma) == 15 and all(1 <= r["rank"] <= 5 for r in ma)

    with pytest.raises(ValueError, match="n_assign"):
        similarity.ivf_pq_residual_topk(
            emb6, q, k=5, m=8, dim=64, n_assign=0
        )
    with pytest.raises(ValueError, match="landed residual index"):
        similarity.ivf_pq_residual_topk(None, q, k=5, m=8, dim=64)
    with pytest.raises(ValueError, match="n_assign"):
        similarity.ivf_residuals(emb6, cents, n_assign=0)
    with pytest.raises(ValueError, match="multiple"):
        similarity.ivf_pq_residual_sql("SELECT 1", m=7, dim=64)


# --------------------------------------------------------------------------
# X70: deterministic weighted reservoir sampling (A-ES)
# --------------------------------------------------------------------------


def test_weighted_reservoir_matches_duckdb(spark):
    """X70 twin: grouped and global forms select the identical rows
    with identical ranks on both engines — the 60-bit md5 uniform, the
    power-of-two scale, and the ln(u)/w division are the same
    arithmetic spelled twice (ln is class C; the measured min adjacent
    key gap at the gate is ~10^12 ulps — ORACLES.md)."""
    from tests.oracle_utils import duckdb_con
    from pyspark_dist_explore_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        "doc_id", "source", (F.length("text") + 1).alias("w")
    )
    con = duckdb_con("/root/testdata/sf0.001")
    try:
        for grp in ("source", None):
            got = sorted(
                (r["source"], r["doc_id"], r["wrs_rank"])
                for r in sampling.weighted_reservoir_sample(
                    scored, 5, weight_col="w", group_col=grp, salt="t1"
                ).collect()
            )
            want = sorted(
                (r[1], r[0], r[3])
                for r in con.execute(
                    sampling.weighted_reservoir_sample_sql(
                        "SELECT doc_id, source, length(text)+1 AS w "
                        "FROM documents",
                        5,
                        weight_col="w",
                        group_col=grp,
                        salt="t1",
                    )
                ).fetchall()
            )
            assert got == want
            assert len(got) == (100 if grp else 5)
    finally:
        con.close()


def test_weighted_reservoir_distribution_and_guards(spark):
    """X70 semantics: (a) Spark equals the pure numpy/hashlib reference
    rank for rank; (b) with k=1 the draw probability is w_i/Σw — the
    A-ES law — measured over 4000 salts driver-side; (c) NULL and
    non-positive weights are dropped; (d) k < 1 raises in both
    renderers."""
    import hashlib as _hl
    import math as _m

    from pyspark_dist_explore_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        "doc_id", "source", (F.length("text") + 1).alias("w")
    ).where(F.col("source") == "src0")
    rows = [(r["doc_id"], r["w"]) for r in scored.collect()]

    def np_keys(salt, sub):
        out = []
        for did, w in sub:
            h = int(_hl.md5(f"{salt}:{did}".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            out.append((_m.log(u) / w, -did, did))
        return out

    ref = [
        d for _, _, d in sorted(np_keys("t2", rows), reverse=True)[:5]
    ]
    got = [
        r["doc_id"]
        for r in sampling.weighted_reservoir_sample(
            scored, 5, weight_col="w", group_col=None, salt="t2"
        )
        .orderBy("wrs_rank")
        .collect()
    ]
    assert got == ref

    sub = rows[:6]
    wsum = sum(w for _, w in sub)
    cnt = {d: 0 for d, _ in sub}
    n_draws = 4000
    for s in range(n_draws):
        cnt[max(np_keys(f"s{s}", sub))[2]] += 1
    assert max(abs(cnt[d] / n_draws - w / wsum) for d, w in sub) < 0.03

    # NULL / non-positive weights dropped; never sampled
    bad = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 0.0), (4, -2.0), (5, 1.0)],
        "doc_id bigint, w double",
    )
    kept = sampling.weighted_reservoir_sample(
        bad, 10, weight_col="w", group_col=None, salt="g"
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 5]

    with pytest.raises(ValueError, match="k must be"):
        sampling.weighted_reservoir_sample(bad, 0, weight_col="w")
    with pytest.raises(ValueError, match="k must be"):
        sampling.weighted_reservoir_sample_sql("SELECT 1", 0, weight_col="w")


# --------------------------------------------------------------------------
# X72: length-bucketed batch shaping
# --------------------------------------------------------------------------


def test_bucket_batches_matches_duckdb(spark):
    """X72 twin: the two-level-rank batch assignment (per-length counts
    + within-length rank, no global sort) equals the DuckDB plain
    row_number form row for row — same (n DESC, id ASC) total order,
    same floor-div/mod batch arithmetic, same batch-max pad; all exact
    integers."""
    from tests.oracle_utils import duckdb_con
    from pyspark_dist_explore_spark.operators import packing

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        tuple(r)
        for r in packing.bucket_batches(
            docs, "doc_id", batch_size=16, text_col="text"
        ).collect()
    )
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    ntok = f"CASE WHEN {norm} = '' THEN 0 ELSE len(string_split({norm}, ' ')) END"
    con = duckdb_con("/root/testdata/sf0.001")
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                packing.bucket_batches_sql(
                    "SELECT doc_id, text FROM documents",
                    "doc_id",
                    batch_size=16,
                    token_count_expr=ntok,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) == 500


def test_bucket_batches_pad_efficiency_and_guards(spark):
    """X72 semantics: every batch is full except possibly the last;
    pad is the gap to the batch max; and the MOTIVATION is measured —
    bucketing by length cuts total padding waste >10× vs arrival-order
    (md5-ordered) batches of the same size on the real corpus
    (development measurement: 677 vs 19 385 wasted tokens, 28.6×)."""
    from pyspark.sql import Window as W

    from pyspark_dist_explore_spark.operators import packing

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bb = packing.bucket_batches(docs, "doc_id", batch_size=16, text_col="text")
    rows = bb.collect()
    by_batch: dict = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r)
    n_full = sum(1 for v in by_batch.values() if len(v) == 16)
    assert n_full >= len(by_batch) - 1
    for v in by_batch.values():
        mx = max(r["n_tokens"] for r in v)
        assert all(r["pad"] == mx - r["n_tokens"] for r in v)
        assert sorted(r["pos_in_batch"] for r in v) == list(range(len(v)))

    waste_bucketed = sum(r["pad"] for r in rows)
    arr = (
        docs.select(F.col("doc_id").alias("id"))
        .withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.md5(F.col("id").cast("string"))))
            - 1,
        )
        .join(bb.select("id", "n_tokens"), "id")
        .withColumn("batch_id", (F.col("rk") / 16).cast("bigint"))
        .withColumn(
            "pad",
            F.max("n_tokens").over(W.partitionBy("batch_id")) - F.col("n_tokens"),
        )
    )
    waste_arrival = arr.agg(F.sum("pad")).collect()[0][0]
    assert waste_bucketed * 10 < waste_arrival, (waste_bucketed, waste_arrival)

    with pytest.raises(ValueError, match="batch_size"):
        packing.bucket_batches(docs, "doc_id", batch_size=0, text_col="text")
    with pytest.raises(ValueError, match="exactly one"):
        packing.bucket_batches(docs, "doc_id", batch_size=4)
    with pytest.raises(ValueError, match="batch_size"):
        packing.bucket_batches_sql("SELECT 1", "doc_id", batch_size=0,
                                   token_count_expr="1")


def test_residual_coarse_stage_commutes_with_rotation(spark):
    """X67⊗X69 invariance, scoped to where it actually holds: the
    signed permutation preserves dots and squared-L2, so the COARSE
    stage — assignments and the probed candidate sets — is identical
    after rotating corpus + queries.  The ADC scores legitimately
    CHANGE (the permutation moves coordinates across PQ subspaces,
    which is the entire OPQ point), so full-score commutation is only
    expected — and separately pinned — in the all-subvector exact
    regime."""
    emb6 = _pq_grid_emb(spark)
    cents_plain = emb6.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    rot = similarity.rotate_embeddings(emb6, dim=64, salt="comm")
    cents_rot = rot.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    a = sorted(
        (r["vec_id"], r["cent_id"])
        for r in similarity.ivf_residuals(emb6, cents_plain).select(
            "vec_id", "cent_id"
        ).collect()
    )
    b = sorted(
        (r["vec_id"], r["cent_id"])
        for r in similarity.ivf_residuals(rot, cents_rot).select(
            "vec_id", "cent_id"
        ).collect()
    )
    assert a == b and len(a) == 500

    # and in the exact regime (all-residual codebook, full probe) the
    # SCORES commute too: both sides equal the brute-force dot ranking
    q = emb6.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q_rot = similarity.rotate_embeddings(q, dim=64, salt="comm")
    plain = sorted(
        (r["query_id"], r["rank"], r["vec_id"], int(r["score"]))
        for r in similarity.ivf_pq_residual_topk(
            emb6, q, k=5, m=8, dim=64, n_codes=500, n_centroids=8, n_probe=8
        ).collect()
    )
    rotated = sorted(
        (r["query_id"], r["rank"], r["vec_id"], int(r["score"]))
        for r in similarity.ivf_pq_residual_topk(
            rot, q_rot, k=5, m=8, dim=64, n_codes=500, n_centroids=8, n_probe=8
        ).collect()
    )
    assert plain == rotated and len(plain) == 15


# --------------------------------------------------------------------------
# X73: hard-negative mining
# --------------------------------------------------------------------------


def test_mine_hard_negatives_band_and_routes(spark):
    """X73: (a) every mined negative sits strictly inside the
    [floor, dup_threshold) band and below every excluded near-dup;
    (b) the exact route equals a reference built from the full scored
    ranking; (c) the ivf route's hits are a subset of the exact band
    with a recall floor; (d) guards raise."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    thr = 0.45
    got = similarity.mine_hard_negatives(
        emb, anchors, k=5, dup_threshold=thr
    ).collect()
    assert len(got) == 25 and all(r["cos_sim"] < thr for r in got)

    # reference: full exact ranking, band-filtered, re-ranked
    full = similarity.exact_topk(emb, anchors, k=500)
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cos_sim"])
        for r in full.where(F.col("cos_sim") < thr)
        .select("query_id", "vec_id", "cos_sim")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    assert sorted((r["query_id"], r["rank"], r["vec_id"], r["cos_sim"]) for r in got) == want

    # floor bounds the band from below
    floored = similarity.mine_hard_negatives(
        emb, anchors, k=50, dup_threshold=thr, floor=0.2
    ).collect()
    assert floored and all(0.2 <= r["cos_sim"] < thr for r in floored)

    # ivf route: in-band, and decent overlap with the exact band at a
    # generous probe
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.mine_hard_negatives(
            emb, anchors, k=5, dup_threshold=thr, route="ivf",
            oversample=8, n_centroids=8, n_probe=4,
        ).collect()
    }
    exact_set = {(q, v) for q, _, v, _ in want}
    assert ivf and len(ivf & exact_set) / len(exact_set) >= 0.2

    with pytest.raises(ValueError, match="route"):
        similarity.mine_hard_negatives(emb, anchors, route="hnsw")
    with pytest.raises(ValueError, match="floor"):
        similarity.mine_hard_negatives(
            emb, anchors, dup_threshold=0.5, floor=0.6
        )


# --------------------------------------------------------------------------
# X74: compressibility quality signal
# --------------------------------------------------------------------------


def test_compression_signals_match_zlib_and_separate_quality(spark):
    """X74: the distributed signal equals driver-side zlib byte for
    byte on the real corpus; templated/repetitive text lands far below
    the natural-language band while random-ish text lands above it;
    NULL/empty semantics and the level guard hold."""
    import zlib

    from pyspark_dist_explore_spark.operators import textstats as ts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["utf8_bytes"], r["zlib_ratio"])
        for r in ts.compression_signals(docs).select(
            "doc_id", "utf8_bytes", "zlib_ratio"
        ).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r["text"].encode("utf-8")
        want = (len(raw), len(zlib.compress(raw, 6)) / len(raw) if raw else None)
        assert got[r["doc_id"]] == want, r["doc_id"]

    import numpy as _np

    rng = _np.random.RandomState(3)
    alphabet = list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,!?"
    )
    high_entropy = "".join(rng.choice(alphabet) for _ in range(2000))
    probe = spark.createDataFrame(
        [
            (1, "the same line repeats here " * 80),
            (2, high_entropy),
            (3, None),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    p = {
        r["doc_id"]: (r["utf8_bytes"], r["zlib_ratio"])
        for r in ts.compression_signals(probe).collect()
    }
    assert p[1][1] < 0.1 < p[2][1], p  # template vs high-entropy band
    assert p[3] == (None, None)
    assert p[4] == (0, None)

    # corpus prose sits in the natural-language band, away from both
    # quality-suspect tails
    ratios = [v[1] for v in got.values()]
    assert 0.2 < sum(ratios) / len(ratios) < 0.9

    with pytest.raises(ValueError, match="level"):
        ts.compression_signals(docs, level=11)


# --------------------------------------------------------------------------
# r14 optimization invariants: staged/shared-intermediate forms must be
# row-identical to the lazy forms they replace in the registered queries
# --------------------------------------------------------------------------


def test_exact_scores_shared_grid_matches_per_ranker_scoring(spark):
    """The staged exact_scores grid consumed via scores= must reproduce
    exact_topk AND mine_hard_negatives row-for-row — the
    vector_exact_search slot shares one grid across both rankings."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    grid = similarity.exact_scores(emb, anchors).localCheckpoint(eager=False)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(similarity.exact_topk(emb, anchors, k=5, scores=grid)) == rows(
        similarity.exact_topk(emb, anchors, k=5)
    )
    assert rows(
        similarity.mine_hard_negatives(
            emb, anchors, k=5, dup_threshold=0.45, scores=grid
        )
    ) == rows(
        similarity.mine_hard_negatives(emb, anchors, k=5, dup_threshold=0.45)
    )
    with pytest.raises(ValueError, match="scores"):
        similarity.mine_hard_negatives(
            emb, anchors, route="ivf", scores=grid
        )


def test_simhash_neardup_staged_matches_lazy(spark):
    """stage=True (signature localCheckpoint before the chunk self-join)
    is a pure execution-shape change — identical pair rows."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def rows(stage):
        return sorted(
            tuple(r)
            for r in dedup.simhash_neardup(
                docs, "text", "doc_id", max_hamming=3, hash_fn="md5", stage=stage
            ).collect()
        )

    staged = rows(True)
    assert staged and staged == rows(False)


def test_incremental_dedup_staged_matches_lazy(spark):
    """stage=True (lazy checkpoint of the bloom-flagged batch) is a pure
    execution-shape change — identical survivor rows on both paths."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.where(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    seen = (
        docs.where(F.col("doc_id") % 7 == 0)
        .select(F.md5(dedup.normalize_text(F.col("text"))).alias("fingerprint"))
        .distinct()
    )

    def rows(stage):
        return sorted(
            tuple(r)
            for r in dedup.incremental_dedup(
                batch, seen, "text", "doc_id",
                bloom_bits=4096, bloom_hashes=5, stage=stage,
            ).collect()
        )

    staged = rows(True)
    assert staged and staged == rows(False)


def test_compute_kde_staged_matches_lazy(spark):
    """stage=True (lazy checkpoint of the pre-binned weighted histogram)
    must not move the registered surface: densities compared @10 dp,
    the rounding the registered query (and its oracle) applies exactly
    because distributed kernel-sum order is partitioning-dependent —
    raw last-ulp equality is not promised even between two lazy runs."""
    from pyspark_dist_explore_spark.operators.histogram import compute_kde

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    series = [("price", df, "l_extendedprice")]

    def rows(stage):
        return sorted(
            (r["series"], r["i"], round(r["x"], 10), round(r["density"], 10))
            for r in compute_kde(series, num=50, stage=stage).collect()
        )

    staged = rows(True)
    assert staged and staged == rows(False)


def test_incremental_minhash_derived_sigs_match_separate(spark):
    """The registered neardup_minhash_lsh derives the snapshot AND batch
    signature tables by row-local doc_id filters of ONE full-corpus
    signature frame (signatures are per-document: shingle within doc,
    min over hashes — so filter-after == filter-before).  Pin that the
    derived form returns exactly the rows of independently-computed
    snapshot/batch signatures."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full_sigs = dedup.minhash_signatures(
        docs, "text", "doc_id", num_hashes=32, shingle_n=3, hash_fn="md5"
    ).localCheckpoint(eager=False)
    snap = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)

    def pairs(snap_sigs, batch_sigs):
        bands = dedup.minhash_band_rows(
            snap, "text", "doc_id", num_hashes=32, bands=8, shingle_n=3,
            hash_fn="md5", signatures=snap_sigs,
        )
        return sorted(
            tuple(r)
            for r in dedup.incremental_minhash_neardup(
                batch, bands, snap_sigs, "text", "doc_id",
                threshold=0.8, num_hashes=32, bands=8, shingle_n=3,
                hash_fn="md5", signatures=batch_sigs,
            ).collect()
        )

    derived = pairs(
        full_sigs.where(F.col("doc_id") % 5 != 0),
        full_sigs.where(F.col("doc_id") % 5 == 0),
    )
    separate = pairs(
        dedup.minhash_signatures(
            snap, "text", "doc_id", num_hashes=32, shingle_n=3, hash_fn="md5"
        ),
        None,  # the probe re-minhashes the batch itself
    )
    assert derived and derived == separate
