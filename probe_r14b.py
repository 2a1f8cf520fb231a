#!/usr/bin/env python
"""Round-14 second-wave two-decade scale probes (BASELINE.md rows) for
the session's new families:

- X69 residual IVFADC: index build (residual codebooks + one-Arrow-pass
  coarse-assign/residual/encode) and bounded-probe serving over PREBUILT
  artifacts, coarse lists sqrt-N-sized per decade — the claim under
  test: the residual chain adds no super-linear stage over the raw-space
  X66 path it extends.
- X70 weighted reservoir sampling: k=20 per source over Nx documents —
  the claim: one row-local hash+key projection plus ONE top-k window
  shuffle, so wall tracks the scan, never the reservoir.
- X71 tar shard sink: write + full read-back of Nx documents as
  WebDataset shards sized ~2k samples/shard — the claim: tar build cost
  is IO-proportional (bytes written), reader cost one pass.

House probe conventions: id-shifted copies so every stage sees Nx
DISTINCT rows; JSON to PROBE_R14B.json.

Usage: SPARK_GRAFT_CPUS=32 python probe_r14b.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from functools import reduce

from pyspark.sql import DataFrame, functions as F


def vec_copies(emb: DataFrame, n: int) -> DataFrame:
    if n == 1:
        return emb
    return reduce(
        DataFrame.unionAll,
        [
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.concat(
                    F.slice(F.col("embedding"), i % 64 + 1, 64 - (i % 64)),
                    F.slice(F.col("embedding"), 1, i % 64),
                ).alias("embedding"),
            )
            for i in range(n)
        ],
    )


def doc_copies(docs: DataFrame, n: int) -> DataFrame:
    if n == 1:
        return docs
    return reduce(
        DataFrame.unionAll,
        [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.col("source"),
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
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
        .appName("probe-r14b")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.operators import sampling, similarity
    from pyspark_dist_explore_spark.sources import sinks

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * F.lit(1e6)),
        ).alias("embedding"),
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="probe_r14b_")
    n_cents = {1: 16, 10: 64, 100: 256}
    mults = tuple(
        int(x) for x in os.environ.get("PROBE_MULTS", "1,10,100").split(",")
    )
    try:
        for mult in mults:
            emb = vec_copies(emb0, mult).localCheckpoint()
            n_vec = emb.count()
            q = emb.where(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            cents = emb.where(F.col("vec_id") < n_cents[mult]).select(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").cast("array<double>").alias("cv"),
            ).localCheckpoint()

            # X69 BUILD: residual codebooks + (assign, residual, encode)
            t0 = time.perf_counter()
            cb = similarity.pq_residual_codebooks(
                emb, cents, m=8, dim=64, n_codes=16
            ).localCheckpoint()
            resid = similarity.ivf_residuals(emb, cents)
            enc = similarity.pq_encode(
                resid, cb, m=8, dim=64, id_col="vec_id",
                vec_col="residual", keep=("cent_id",),
            ).localCheckpoint()
            n_enc = enc.count()
            build = time.perf_counter() - t0
            out[f"resid_build_{mult}x"] = {
                "vecs": n_vec, "enc_rows": n_enc, "wall": round(build, 2)
            }

            # X69 SERVE over prebuilt artifacts, bounded probe
            def run_serve():
                return similarity.ivf_pq_residual_topk(
                    None, q, k=5, m=8, dim=64, n_probe=4,
                    centroids=cents, codebooks=cb, enc=enc,
                ).count()

            t0 = time.perf_counter(); rows = run_serve(); cold = time.perf_counter() - t0
            t0 = time.perf_counter(); run_serve(); warm = time.perf_counter() - t0
            out[f"resid_serve_{mult}x"] = {
                "vecs": n_vec, "rows": rows,
                "warm": round(warm, 2), "cold": round(cold, 2),
            }
            emb.unpersist()

            # X70 WRS over Nx documents
            docs = doc_copies(docs0, mult).localCheckpoint()
            n_doc = docs.count()
            wsrc = docs.select(
                "doc_id", "source", (F.length("text") + 1).alias("w")
            )

            def run_wrs():
                return sampling.weighted_reservoir_sample(
                    wsrc, 20, weight_col="w", group_col="source", salt="p"
                ).count()

            t0 = time.perf_counter(); kept = run_wrs(); cold = time.perf_counter() - t0
            t0 = time.perf_counter(); run_wrs(); warm = time.perf_counter() - t0
            out[f"wrs_{mult}x"] = {
                "docs": n_doc, "kept": kept,
                "warm": round(warm, 2), "cold": round(cold, 2),
            }

            # X71 tar shards: ~2k samples per shard, write + full read
            shards = max(4, n_doc // 2000)
            path = f"{work}/wds_{mult}x"
            t0 = time.perf_counter()
            man = sinks.write_tar_shards(
                docs, path, shards=shards,
                members={"txt": "text", "src": "source"},
                key_col="doc_id", salt="p",
            )
            n_bytes = man.agg(F.sum("n_bytes")).collect()[0][0]
            wall_w = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_back = sinks.read_tar_shards(spark, path).count()
            wall_r = time.perf_counter() - t0
            out[f"tar_{mult}x"] = {
                "docs": n_doc, "shards": shards,
                "mb": round(n_bytes / 1e6, 1),
                "write": round(wall_w, 2), "read": round(wall_r, 2),
                "members_back": n_back,
            }
            shutil.rmtree(path, ignore_errors=True)
            docs.unpersist()
            print(mult, "x done:", {k: v for k, v in out.items() if k.endswith(f"_{mult}x")})
    finally:
        shutil.rmtree(work, ignore_errors=True)

    here = os.path.dirname(os.path.abspath(__file__))
    dest = os.path.join(here, "PROBE_R14B.json")
    if os.path.exists(dest) and set(mults) != {1, 10, 100}:
        with open(dest) as fh:  # partial re-run: merge over the old rows
            merged = json.load(fh)
        merged.update(out)
        out = merged
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
