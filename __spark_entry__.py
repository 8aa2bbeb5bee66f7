"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``vector_db_service_spark``; this module only
adapts it to the driver's entrypoint shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python UDF workers don't inherit the driver's sys.path mutation; export
# it so Pandas-UDF queries unpickle no matter the driver's cwd (the
# driver may own the SparkSession, but workers spawn lazily per job, so
# an env set at import time still reaches them).
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from vector_db_service_spark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entrypoints.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entrypoints.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
