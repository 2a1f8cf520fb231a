#!/usr/bin/env python
"""Round-12 two-decade scale probes for the new operator families
(BASELINE.md rows): X48 unigram-LM induction/encode and X49 corpus
snapshot diff, at 1x / 10x / 100x of the sf0.1 documents corpus.

Construction follows the house probe conventions: token-disjoint
copy-prefixed documents with shifted ids, so measured growth reflects
the operator's scaling shape (the type table really grows ~Nx, the
diff's id space really grows Nx) rather than cross-copy degeneracy.

Writes one JSON object to PROBE_R12.json (progress bars swallow stdout
lines under grep — the house rule is probe JSON to a FILE).

Usage: SPARK_GRAFT_CPUS=32 python probe_r12.py
       (100x wants spark.driver.memory=48g — set below)
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

from pyspark.sql import DataFrame, functions as F


def copies(docs: DataFrame, n: int) -> DataFrame:
    if n == 1:
        return docs
    return reduce(
        DataFrame.unionAll,
        [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.col("source"),
                F.concat(
                    F.lit(f"x{i} "), F.regexp_replace(F.col("text"), " ", f" x{i}")
                ).alias("text"),
            )
            for i in range(n)
        ],
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-r12")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.operators import dedup, textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("source").cast("string").alias("source"), "text"
    )
    docs.count()  # warm the session / footer cache
    out: dict = {}

    # ---- X48: unigram-LM learn (seed + 2 EM rounds + prune + final E/M)
    # and encode, type table grows ~Nx via copy-prefixed tokens ----------
    out["unigram"] = {}
    for n in (1, 10, 100):
        d = copies(docs, n).localCheckpoint()  # isolate probe from build cost
        t0 = time.perf_counter()
        vocab = textstats.unigram_lm_learn(
            d, "text", vocab_size=24, max_piece_len=4, seed_size=64, em_rounds=2
        )
        v_rows = vocab.count()
        t_learn = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        enc = textstats.unigram_encode(d, "text", "doc_id", vocab)
        n_docs = enc.count()
        t_enc = round(time.perf_counter() - t0, 2)
        out["unigram"][f"{n}x"] = {
            "t_learn": t_learn,
            "t_encode": t_enc,
            "vocab_rows": v_rows,
            "docs": n_docs,
        }
        d.unpersist()

    # ---- X49: corpus_diff, old = Nx corpus, new = deterministic
    # mutation (removals %11, changes %13, re-keyed additions %9==4) ----
    out["corpus_diff"] = {}
    for n in (1, 10, 100):
        d = copies(docs, n).localCheckpoint()
        new = d.where(F.col("doc_id") % 11 != 0).select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" zz"))
            ).otherwise(F.col("text")).alias("text"),
        ).unionAll(
            d.where(F.col("doc_id") % 9 == 4).select(
                (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
                "source",
                "text",
            )
        )
        t0 = time.perf_counter()
        card = dedup.corpus_diff(d, new, group_col="source").collect()
        t_diff = round(time.perf_counter() - t0, 2)
        out["corpus_diff"][f"{n}x"] = {
            "t": t_diff,
            "groups": len(card),
            "n_changed": sum(r["n_changed"] for r in card),
            "n_added": sum(r["n_added"] for r in card),
            "n_removed": sum(r["n_removed"] for r in card),
        }
        d.unpersist()

    # ---- X50: semantic-locality packing, vectors grow Nx via
    # sign-flip-rotated id-remapped copies (norms/intra-copy cosines
    # preserved; copies distinct so domains split rather than collide)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    from pyspark_dist_explore_spark.operators.packing import (
        pack_related_documents,
    )

    out["pack_related"] = {}
    for n in (1, 10, 100):
        d = copies(docs, n).localCheckpoint()
        if n == 1:
            e = emb
        else:
            from functools import reduce as _red

            e = _red(
                DataFrame.unionAll,
                [
                    emb.select(
                        (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                        F.transform(
                            "embedding",
                            lambda x, idx=i: F.when(
                                F.lit(idx % 2) == 1, -x
                            ).otherwise(x),
                        ).alias("embedding"),
                    )
                    for i in range(n)
                ],
            )
        e = e.localCheckpoint()
        t0 = time.perf_counter()
        packed = pack_related_documents(
            d,
            e,
            text_col="text",
            max_tokens=2048,
            n_domains=16,
            fit_sample_mod=4,
        )
        n_packs = packed.select("pack_id").distinct().count()
        t = round(time.perf_counter() - t0, 2)
        out["pack_related"][f"{n}x"] = {"t": t, "packs": n_packs}
        d.unpersist(); e.unpersist()

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PROBE_R12.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
