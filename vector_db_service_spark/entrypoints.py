"""Central registry wiring operators to the driver contract
(__spark_entry__.py): every implemented operator from SURVEY.md §2 gets a
named (spark, sf_dir) -> DataFrame callable and, where SQL-expressible, a
DuckDB oracle string.

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

from pyspark.sql import DataFrame, SparkSession

from . import oracles
from .operators import knn as knn_ops

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- K1-K12 / I2 / T1-T5: flat k-NN under every metric -------------------
for _metric in ("cosine", "dot_product", "euclidean", "manhattan"):
    register(
        f"knn_flat_{_metric}",
        partial(lambda s, d, m: knn_ops.knn(s, d, query_id=0, k=10, metric=m), m=_metric),
        oracles.knn_sql(query_id=0, k=10, metric=_metric),
    )

# distance-ordered variants (K3/K5 raw distances)
for _metric in ("euclidean", "manhattan"):
    register(
        f"knn_dist_{_metric}",
        partial(lambda s, d, m: knn_ops.knn_distance(s, d, query_id=0, k=10, metric=m), m=_metric),
        oracles.knn_distance_sql(query_id=0, k=10, metric=_metric),
    )

# library-scoped search (S3/S7 partition pruning + §2.7 step 1-3 semantics)
register(
    "knn_flat_cosine_library",
    lambda s, d: knn_ops.knn(s, d, query_id=0, k=10, metric="cosine", library=0),
    oracles.knn_sql(query_id=0, k=10, metric="cosine", library=0),
)

# flagship: hydrated search result (§2.7 full path, J1 inner-join hydration)
register(
    "knn_search_hydrated",
    lambda s, d: knn_ops.knn(s, d, query_id=0, k=10, metric="cosine", hydrate=True),
    oracles.knn_sql(query_id=0, k=10, metric="cosine", hydrate=True),
)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry() target: the §3.1 flagship read path end-to-end."""
    return knn_ops.knn(spark, sf_dir, query_id=0, k=10, metric="cosine", hydrate=True)
