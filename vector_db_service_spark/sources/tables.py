"""Parquet table loaders for the driver test data (TESTDATA.md).

The reference's durable store is PostgreSQL rows + an in-memory vector
dict (reference database/models.py:19-91, vector_db/storage.py:11-41).
Here both live as columnar parquet tables; at scale the chunk/embedding
tables would be written `partitionBy(library_id)` so library-scoped
searches are partition-pruned scans (reference's reverse index
vector_db/storage.py:29 for free).

Entity mapping onto the driver tables (SURVEY.md §1.4):
  library  -> `label` column of embeddings (small int domain)
  chunk    -> one row of embeddings (vec_id) / documents (doc_id)
  document -> one row of documents.parquet
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Column pruning + predicate pushdown reach the
    parquet scan because this stays a plain declarative read.

    `events` is written with nanosecond timestamps, which Spark's parquet
    reader rejects by default; we read them as raw int64 nanos
    (legacy.parquet.nanosAsLong) and expose `ts_us` = epoch microseconds
    (truncating, matching DuckDB's ns->us parquet conversion). Epoch
    arithmetic is timezone-free, so results don't depend on the session
    timezone the driver happens to configure."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer `div`, not `/`: nanos exceed 2^53, so double division
        # loses the low microsecond bits
        return df.withColumn("ts_us", F.expr("ts div 1000")).drop("ts")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be written in
    SQL as well as the DataFrame API (same Catalyst plan either way)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
