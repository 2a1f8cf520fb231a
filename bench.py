#!/usr/bin/env python
"""Benchmark harness — runs the registered headline queries and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pyspark_dist_explore_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark_dist_explore_spark.plans.queries import REGISTRY

    # Warm up the JVM / parquet footer cache once so per-query numbers
    # measure the plan, not session startup.
    REGISTRY["hist_lineitem_price"].build(spark, sf_dir).collect()

    # min-of-N per query — shared-host load and JIT noise otherwise
    # dominate round-over-round comparisons.  Cheap queries get 2 warm
    # passes; queries whose cold pass exceeds EXPENSIVE_SEC get 3 so the
    # numbers that decide the round verdict are the most stable ones.
    # "spread" (max−min across attempts) makes run-to-run variance
    # visible next to each timing instead of being folded into it.
    EXPENSIVE_SEC = 1.5
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        dts: list[float] = []
        attempts = 2
        while len(dts) < attempts:
            t0 = time.perf_counter()
            rows = spec.build(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if not dts:
                cold[name] = round(dt, 4)
                if dt > EXPENSIVE_SEC:
                    attempts = 3
                if not rows:
                    print(f"WARNING: {name} returned 0 rows", file=sys.stderr)
            dts.append(dt)
        timings[name] = round(min(dts), 4)
        spread[name] = round(max(dts) - min(dts), 4)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "cold_total": round(sum(cold.values()), 4),
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
