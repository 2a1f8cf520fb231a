#!/usr/bin/env python
"""Round-13 two-decade scale probes for the new operator families
(BASELINE.md rows): X64 product quantization (encode + full-corpus ADC
top-k), X66 IVF-PQ (bounded probe + compressed candidate scan), and
X65 pack span maps, at 1x / 10x / 100x of the sf0.1 embeddings/
documents corpora.

House probe conventions: id-shifted copies so the code tables, LUT
joins, and span windows really see Nx distinct rows.  Probe JSON goes
to a FILE (PROBE_R13.json).

Usage: SPARK_GRAFT_CPUS=32 python probe_r13.py
"""

from __future__ import annotations

import json
import os
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
                # rotate one component per copy so copies are not exact
                # duplicates (ADC ranking would otherwise tie everywhere)
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
        .appName("probe-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.operators import similarity
    from pyspark_dist_explore_spark.operators.packing import (
        pack_sequences,
        pack_span_map,
    )

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * F.lit(1e6)),
        ).alias("embedding"),
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out: dict[str, dict] = {}

    for mult in (1, 10, 100):
        emb = vec_copies(emb0, mult).localCheckpoint()
        n_vec = emb.count()
        q = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        # X64 index BUILD (one-time, landed to parquet in production):
        # codebooks + every vector's codes
        t0 = time.perf_counter()
        cb = similarity.pq_codebooks(emb, m=8, dim=64, n_codes=16)
        codes = similarity.pq_encode(emb, cb, m=8, dim=64).localCheckpoint()
        n_codes_rows = codes.count()
        build = time.perf_counter() - t0
        out[f"pq_build_{mult}x"] = {
            "vecs": n_vec, "rows": n_codes_rows, "wall": round(build, 2)
        }

        # X64 SERVING: full-corpus compressed ADC scan over landed codes
        def run_pq():
            return similarity.pq_topk(codes, q, cb, k=5, m=8, dim=64).count()

        t0 = time.perf_counter(); rows = run_pq(); cold = time.perf_counter() - t0
        t0 = time.perf_counter(); run_pq(); warm = time.perf_counter() - t0
        out[f"pq_adc_{mult}x"] = {
            "vecs": n_vec, "rows": rows,
            "warm": round(warm, 2), "cold": round(cold, 2),
        }

        # X66 IVF-PQ SERVING: bounded probe (4/16 lists) over the same
        # landed artifacts
        cents = emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("cent_id"),
            similarity._unit(F.col("embedding")).alias("cv"),
        ).localCheckpoint()

        def run_ivfpq():
            return similarity.ivf_pq_topk(
                emb, q, k=5, m=8, dim=64, n_codes=16,
                n_centroids=16, n_probe=4,
                centroids=cents, codebooks=cb, codes=codes,
            ).count()

        t0 = time.perf_counter(); rows = run_ivfpq(); cold = time.perf_counter() - t0
        t0 = time.perf_counter(); run_ivfpq(); warm = time.perf_counter() - t0
        out[f"ivf_pq_{mult}x"] = {
            "vecs": n_vec, "rows": rows,
            "warm": round(warm, 2), "cold": round(cold, 2),
        }
        emb.unpersist()

        # X65 span map over FFD packs
        docs = doc_copies(docs0, mult).localCheckpoint()
        n_doc = docs.count()

        def run_spans():
            packed = pack_sequences(
                docs, "doc_id", text_col="text",
                max_tokens=512, buckets=256, mode="ffd",
            )
            return pack_span_map(packed, order="ffd").count()

        t0 = time.perf_counter(); rows = run_spans(); cold = time.perf_counter() - t0
        t0 = time.perf_counter(); run_spans(); warm = time.perf_counter() - t0
        out[f"span_map_{mult}x"] = {
            "docs": n_doc, "rows": rows,
            "warm": round(warm, 2), "cold": round(cold, 2),
        }
        docs.unpersist()
        print(mult, "x done:", {k: v for k, v in out.items() if k.endswith(f"_{mult}x")})

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PROBE_R13.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
