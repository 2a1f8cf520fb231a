"""pyspark_dist_explore_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference library ``Bergvca/pyspark_dist_explore`` (distribution
exploration over PySpark DataFrames: histograms, density curves, pandas
conversion), extended with the operators a large-scale training-data
pipeline needs: deduplication (exact / MinHash / SimHash / Jaccard),
vector similarity search, text analysis, multimodal column plumbing and
streaming histograms.

Design (SURVEY.md §3.2): everything is a lazy DataFrame plan handed to
Catalyst — no ``df.rdd``, no driver-side loops over data, no per-row
Python.  The reference's eager path (``df.rdd.flatMap(...).histogram``)
is replaced by a single-shuffle ``groupBy(series, bucket).count()``
pipeline with zero JVM→Python boundary crossings.
"""

from pyspark_dist_explore_spark.operators.histogram import (
    HistogramSpec,
    compute_histogram,
    compute_histogram_dense,
    compute_density,
    compute_kde,
)
from pyspark_dist_explore_spark.viz import (
    Histogram,
    hist,
    distplot,
    pandas_histogram,
)

__all__ = [
    "HistogramSpec",
    "compute_histogram",
    "compute_histogram_dense",
    "compute_density",
    "compute_kde",
    "Histogram",
    "hist",
    "distplot",
    "pandas_histogram",
]

__version__ = "0.1.0"
