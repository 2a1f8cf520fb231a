#!/usr/bin/env python
"""Round-14 two-decade scale probes for the new serving-path families
(BASELINE.md rows): the LANDED IVF-PQ index (write_pq_index build wall,
then ivf_pq_topk serving over the LOADED artifacts with vectors=None —
the form whose scan never touches corpus vectors), X67 OPQ rotation
overhead (row-local projection), and X68 streaming PQ scoring (ONE
fixed-size micro-batch against a 1x/10x/100x index — the claim under
test: per-batch cost is bounded by probe width, not corpus size).

House probe conventions: id-shifted copies so code tables, inverted
lists, and LUT joins really see Nx distinct rows; probe JSON goes to a
FILE (PROBE_R14.json).

Usage: SPARK_GRAFT_CPUS=32 python probe_r14.py
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.operators import similarity
    from pyspark_dist_explore_spark.sources.sinks import (
        load_pq_index,
        write_pq_index,
    )
    from pyspark_dist_explore_spark.streaming.histogram_stream import (
        stream_pq_neardup_filter,
    )

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * F.lit(1e6)),
        ).alias("embedding"),
    )
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="probe_r14_")
    # one fixed 1000-row arrival batch, identical at every index scale —
    # per-batch cost must track probe width, not corpus size
    batch_src = f"{work}/arrivals"
    emb0.limit(1000).select(
        (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"), "embedding"
    ).coalesce(1).write.mode("overwrite").parquet(batch_src)

    try:
        # coarse-list sizing follows the sqrt-N discipline: fixing
        # n_centroids across decades makes per-query candidates grow
        # linearly with the corpus (the mis-sizing the scan='batch'
        # path bounds); a production index grows lists with the corpus
        n_cents = {1: 16, 10: 64, 100: 256}
        for mult in (1, 10, 100):
            emb = vec_copies(emb0, mult).localCheckpoint()
            n_vec = emb.count()
            q = emb.where(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )

            # LANDED INDEX BUILD: all four artifacts + sidecar to parquet
            # (rotation on — the OPQ production shape)
            path = f"{work}/idx_{mult}x"
            t0 = time.perf_counter()
            write_pq_index(
                emb, path, m=8, dim=64, n_codes=16,
                n_centroids=n_cents[mult], n_assign=1,
                rotation_salt="probe",
            )
            build = time.perf_counter() - t0
            out[f"pq_index_build_{mult}x"] = {
                "vecs": n_vec, "wall": round(build, 2)
            }

            # LANDED SERVING: vectors=None — probes prune the cent_id-
            # partitioned inverted lists; the corpus is never read
            cents, cb, codes, assign, params = load_pq_index(spark, path)
            q_rot = similarity.rotate_embeddings(
                q, dim=64, salt=params["rotation_salt"]
            )

            def run_serve():
                return similarity.ivf_pq_topk(
                    None, q_rot, k=5, m=8, dim=64, n_probe=4,
                    centroids=cents, codebooks=cb, codes=codes,
                    assignments=assign,
                ).count()

            t0 = time.perf_counter(); rows = run_serve(); cold = time.perf_counter() - t0
            t0 = time.perf_counter(); run_serve(); warm = time.perf_counter() - t0
            out[f"pq_index_serve_{mult}x"] = {
                "vecs": n_vec, "rows": rows,
                "warm": round(warm, 2), "cold": round(cold, 2),
            }

            # X67 rotation overhead: row-local projection, flat per row
            def run_rot():
                return similarity.rotate_embeddings(
                    emb, dim=64, salt="probe"
                ).count()

            t0 = time.perf_counter(); run_rot(); cold = time.perf_counter() - t0
            t0 = time.perf_counter(); run_rot(); warm = time.perf_counter() - t0
            out[f"rotation_{mult}x"] = {
                "vecs": n_vec, "warm": round(warm, 2), "cold": round(cold, 2),
            }

            # X68 streaming: ONE 1000-row micro-batch against this index
            got = {"n": 0}

            def sink(b, bid):
                got["n"] += b.count()

            stream = (
                spark.readStream.schema("vec_id bigint, embedding array<double>")
                .parquet(batch_src)
            )
            t0 = time.perf_counter()
            sq = (
                stream_pq_neardup_filter(
                    stream, cb, codes, sink, m=8, dim=64,
                    threshold=float(1 << 60),  # score-only probe: keep all
                    centroids=cents, assignments=assign, n_probe=4,
                    rotation_salt=params["rotation_salt"],
                )
                .option("checkpointLocation", f"{work}/ckpt_{mult}x")
                .trigger(availableNow=True)
                .start()
            )
            sq.awaitTermination(600)
            out[f"stream_batch_{mult}x"] = {
                "vecs": n_vec, "batch": 1000, "kept": got["n"],
                "wall": round(time.perf_counter() - t0, 2),
            }
            emb.unpersist()
            print(mult, "x done:", {k: v for k, v in out.items() if k.endswith(f"_{mult}x")})
    finally:
        shutil.rmtree(work, ignore_errors=True)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PROBE_R14.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
