#!/usr/bin/env python
"""Round-12 (cont.) two-decade scale probes for the late-round operator
families (BASELINE.md rows): X53 proportional interleave and X55
edit-distance candidate verification, at 1x / 10x / 100x of the sf0.1
documents corpus.

Construction follows the house probe conventions: id-shifted copies so
group totals and candidate counts really grow Nx (the interleave's
per-group rank windows and the verify's pair frame see Nx rows, not
degenerate repeats).  Probe JSON goes to a FILE (PROBE_R12B.json).

Usage: SPARK_GRAFT_CPUS=32 python probe_r12b.py
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
        .appName("probe-r12b")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.operators.dedup import edit_distance_pairs
    from pyspark_dist_explore_spark.operators.sampling import (
        proportional_interleave,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("source").cast("string").alias("source"), "text"
    )
    docs.count()  # warm the session / footer cache
    out: dict = {}

    # ---- X53: interleave over the 20 sources; per-source totals grow
    # Nx, so the rank windows, the K*S count aggregate, and the
    # closed-form projection all see Nx rows ------------------------------
    weights = {f"src{i}": 1 + (i % 5) for i in range(20)}
    out["interleave"] = {}
    for n in (1, 10, 100):
        d = copies(docs, n).select("doc_id", "source").localCheckpoint()
        dts = []
        for _ in range(2):  # min-of-2: first touch of a fresh checkpoint
            t0 = time.perf_counter()  # carries session-state noise
            il = proportional_interleave(
                d, "source", "doc_id", weights=weights, salt="probe", shards=64
            )
            got = il.groupBy().agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("pos").alias("mn"),
                F.max("pos").alias("mx"),
            ).collect()[0]
            dts.append(time.perf_counter() - t0)
            assert got["mn"] == 0 and got["mx"] == got["rows"] - 1
        out["interleave"][f"{n}x"] = {
            "t": round(min(dts), 2),
            "cold": round(dts[0], 2),
            "rows": int(got["rows"]),
        }
        print("interleave", n, out["interleave"][f"{n}x"], flush=True)
        d.unpersist()

    # ---- X55: verify Nx candidate pairs (adjacent-id pairs within each
    # copy — linear in the corpus, the banded-LSH output shape) over the
    # banded DP at prefix 256 / bound 185 ---------------------------------
    out["editdist"] = {}
    for n in (1, 10, 100):
        d = copies(docs, n).localCheckpoint()
        cands = d.select(F.col("doc_id").alias("doc_a")).withColumn(
            "doc_b", F.col("doc_a") + 1
        ).join(
            d.select(F.col("doc_id").alias("doc_b")), "doc_b", "inner"
        )
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            got = edit_distance_pairs(
                d, cands, "text", "doc_id", max_dist=185, prefix_len=256
            ).count()
            dts.append(time.perf_counter() - t0)
        out["editdist"][f"{n}x"] = {
            "t": round(min(dts), 2),
            "cold": round(dts[0], 2),
            "verified": int(got),
        }
        print("editdist", n, out["editdist"][f"{n}x"], flush=True)
        d.unpersist()

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PROBE_R12B.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
