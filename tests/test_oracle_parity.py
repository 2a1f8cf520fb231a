"""Every registered query with an oracle must match DuckDB at sf0.001.

This is a fast local mirror of the driver's t2 gate (which runs at
sf0.01); the driver's comparison is authoritative, this catches drift
early.
"""

from __future__ import annotations

import pytest

from pyspark_dist_explore_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

CASES = [name for name, spec in REGISTRY.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    compare(spark, SF_SMOKE, spec.build, spec.oracle)


ROWS_ONLY = [name for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = REGISTRY[name].build(spark, SF_SMOKE)
    assert df.count() > 0
