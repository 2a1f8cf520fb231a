"""Parquet sources for the driver's TPC-H-ish star schema (TESTDATA.md).

At 100 TB these would be partitioned/ bucketed tables behind a catalog;
here each table is a single parquet file per scale-factor directory.  The
loader stays declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown + column pruning for free — ``.explain`` on any query
in ``plans/`` should show ``PushedFilters`` / a pruned ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: table name -> primary key column (used by deterministic dedup/top-k tie-breaks)
TABLES: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is on (runtime
    settable).  The raw int64 nanos are kept as ``ts_ns`` and a
    microsecond-precision ``ts`` timestamp is derived — hour/minute
    windowing semantics are unaffected by the dropped sub-micro digits.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {sorted(TABLES)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.select(
            "event_id",
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
            F.col("ts").alias("ts_ns"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(path)


def read_any(spark: SparkSession, path: str, fmt: str, schema=None, **options) -> DataFrame:
    """Format-agnostic scan (parquet / csv / json / orc).

    CSV and JSON get an explicit schema when provided — schema inference
    is a full extra pass over the data, never acceptable at 100 TB.  CSV
    defaults: header on.  All formats go through the DataSource V1/V2
    readers, so pushdown/pruning behave per-format (columnar formats
    prune, row formats at least push filters).
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)
