"""Observability surface (SURVEY §2.13) — the service-status and
search-response-metadata analogs of the reference API.

Reference parity targets:
  * `/vector-service/status` (reference main.py:121-144) composes
    per-library index info (services/vector_service.py:394-431) with
    vector-storage stats and memory usage (vector_db/storage.py:43-75)
    into one response. Here that is ONE declarative plan: a union of
    aggregates over the embeddings table, returned as a tall
    (section, label, metric, value) frame so heterogeneous sections
    coexist in a single typed schema.
  * `SearchResponse.search_time_ms` + `total_found`
    (schemas/search_schema.py:36, measured at
    services/vector_service.py:204,283): the Spark-native analog pairs a
    driver-side wall clock around the materialized search with the
    `Observation` API, which collects row counts and score aggregates as
    EXECUTOR-SIDE metrics of the very job that produced the result — no
    second pass over the data, exactly how a production Spark service
    surfaces per-query metrics.

At 100 TB: `service_status` is a handful of map-side-combined aggregates
over one table scan (grouping-sets shaped, no join); `timed_search`
adds zero extra jobs on top of the search it instruments.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from . import knn as knn_ops

FLOAT_BYTES = 4  # reference sizes vectors as float32 (storage.py:60-66)


def service_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed status: global storage/memory stats + per-library index
    info in one tall frame. Sections mirror the reference response keys
    (main.py:128-137): 'status', 'storage_stats', 'memory_usage',
    'indexes_info'.

    ONE rollup over ONE scan: the grand-total grouping set carries the
    global sections, the per-label sets carry indexes_info — the same
    partial-aggregation pass computes both, where a union of separate
    aggregates would scan the table twice."""
    emb = load(spark, sf_dir, "embeddings")

    # localCheckpoint: the rolled frame is <= n_libraries+1 rows but feeds
    # BOTH section branches — without it Catalyst inlines (and re-scans)
    # the whole rollup subtree once per branch.
    rolled = emb.rollup("label").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_libraries"),
        F.sum(F.size("embedding")).alias("n_floats"),
        F.first(F.size("embedding")).alias("dim"),
        F.grouping("label").alias("is_total"),
    ).localCheckpoint(eager=False)
    global_rows = rolled.filter(F.col("is_total") == 1).select(
        F.explode(
            F.create_map(
                F.lit("status.libraries_indexed"),
                F.col("n_libraries").cast("double"),
                F.lit("storage_stats.total_vectors"),
                F.col("n_vectors").cast("double"),
                F.lit("storage_stats.total_libraries"),
                F.col("n_libraries").cast("double"),
                F.lit("memory_usage.vector_bytes"),
                (F.col("n_floats") * F.lit(FLOAT_BYTES)).cast("double"),
            )
        ).alias("metric", "value")
    ).select(
        F.split(F.col("metric"), r"\.").getItem(0).alias("section"),
        F.lit(-1).cast("long").alias("label"),
        F.split(F.col("metric"), r"\.").getItem(1).alias("metric"),
        "value",
    )

    lib_rows = rolled.filter(F.col("is_total") == 0).select(
        F.lit("indexes_info").alias("section"),
        F.col("label").cast("long").alias("label"),
        F.explode(
            F.create_map(
                F.lit("n_vectors"),
                F.col("n_vectors").cast("double"),
                F.lit("dim"),
                F.col("dim").cast("double"),
            )
        ).alias("metric", "value"),
    ).select("section", "label", "metric", "value")

    return global_rows.unionByName(lib_rows)


SERVICE_STATUS_SQL = f"""
WITH g AS (
  SELECT count(*) AS n_vectors,
         count(DISTINCT label) AS n_libraries,
         sum(len(embedding)) AS n_floats
  FROM embeddings
),
p AS (
  SELECT label, count(*) AS n_vectors, first(len(embedding)) AS dim
  FROM embeddings GROUP BY label
)
SELECT 'status' AS section, CAST(-1 AS BIGINT) AS label,
       'libraries_indexed' AS metric, CAST(n_libraries AS DOUBLE) AS value FROM g
UNION ALL
SELECT 'storage_stats', -1, 'total_vectors', CAST(n_vectors AS DOUBLE) FROM g
UNION ALL
SELECT 'storage_stats', -1, 'total_libraries', CAST(n_libraries AS DOUBLE) FROM g
UNION ALL
SELECT 'memory_usage', -1, 'vector_bytes',
       CAST(n_floats * {FLOAT_BYTES} AS DOUBLE) FROM g
UNION ALL
SELECT 'indexes_info', CAST(label AS BIGINT), 'n_vectors',
       CAST(n_vectors AS DOUBLE) FROM p
UNION ALL
SELECT 'indexes_info', CAST(label AS BIGINT), 'dim', CAST(dim AS DOUBLE) FROM p
"""


def health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/health` analog (reference main.py:109-119): a one-row constant
    frame plus a real liveness signal — the table count visible to the
    engine (a parquet-footer metadata read, no scan)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.tables import TABLES

    # ten independent footer probes run concurrently (I/O-bound stats +
    # metadata reads, memoized by row_count) — the serial form cost 3 s
    # under driver host load
    with ThreadPoolExecutor(max_workers=len(TABLES)) as ex:
        n_tables = sum(ex.map(lambda t: _table_readable(sf_dir, t), TABLES))
    return spark.createDataFrame(
        [("healthy", "vector-db-spark", n_tables)],
        "status string, service string, n_tables int",
    )


def _table_readable(sf_dir: str, name: str) -> bool:
    from ..sources.tables import row_count

    try:
        row_count(sf_dir, name)
        return True
    except Exception:
        return False


def clear_library_stats(
    spark: SparkSession, sf_dir: str, library: int = 0
) -> DataFrame:
    """Clear-all analog (reference vector_db/storage.py:246-261) scoped
    the way a Spark table store clears: drop one library's partition
    (dynamic partition overwrite of `label={library}`) and report the
    post-clear storage stats. The clear is expressed as the surviving
    frame — at scale this IS the overwrite's source plan, so the stats
    check verifies exactly what the sink would commit."""
    emb = load(spark, sf_dir, "embeddings")
    remaining = emb.filter(F.col("label") != F.lit(library))
    return remaining.agg(
        F.lit(library).alias("cleared_library"),
        F.count("*").alias("total_vectors"),
        F.countDistinct("label").alias("n_libraries"),
        (F.sum(F.size("embedding")) * F.lit(FLOAT_BYTES)).cast("long").alias("vector_bytes"),
    )


def clear_library_stats_sql(library: int = 0) -> str:
    return f"""
SELECT {library} AS cleared_library,
       count(*) AS total_vectors,
       count(DISTINCT label) AS n_libraries,
       CAST(sum(len(embedding)) * {FLOAT_BYTES} AS BIGINT) AS vector_bytes
FROM embeddings WHERE label != {library}
"""


def search_meta(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "cosine",
    library: int | None = None,
) -> DataFrame:
    """Deterministic SearchResponse metadata (everything except the wall
    clock): echo of the request plus total_found and the score frontier —
    aggregates OVER the top-k result, so the oracle can reproduce them
    exactly."""
    topk = knn_ops.knn(
        spark, sf_dir, query_id=query_id, k=k, metric=metric, library=library
    )
    return topk.agg(
        F.lit(query_id).alias("query_id"),
        F.lit(library if library is not None else -1).cast("long").alias("library_id"),
        F.lit(k).alias("k"),
        F.lit(metric).alias("similarity_function"),
        F.count("*").alias("total_found"),
        F.round(F.max("score"), 6).alias("best_score"),
        F.round(F.min("score"), 6).alias("worst_score"),
    )


def search_meta_sql(
    knn_oracle_sql: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "cosine",
    library: int | None = None,
) -> str:
    """DuckDB oracle for search_meta, layered over the existing knn
    oracle so scoring/tie-break semantics are defined in exactly one
    place."""
    lib = library if library is not None else -1
    return f"""
WITH topk AS ({knn_oracle_sql})
SELECT {query_id} AS query_id, CAST({lib} AS BIGINT) AS library_id,
       {k} AS k, '{metric}' AS similarity_function,
       count(*) AS total_found,
       round(max(score), 6) AS best_score,
       round(min(score), 6) AS worst_score
FROM topk
"""


def timed_search(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "cosine",
    library: int | None = None,
) -> DataFrame:
    """SearchResponse with `search_time_ms`: run the search to completion
    under an `Observation`, clock it driver-side, and return the one-row
    response frame. The observed metrics (total_found, best_score) come
    from the SAME job that materialized the result — Spark's native
    analog of the reference timing its own search path
    (services/vector_service.py:204,283). Nondeterministic by design
    (wall clock), so registered rows-only, no oracle."""
    obs = Observation(f"search_q{query_id}")
    topk = knn_ops.knn(
        spark, sf_dir, query_id=query_id, k=k, metric=metric, library=library
    )
    t0 = time.perf_counter()
    observed = topk.observe(
        obs,
        F.count(F.lit(1)).alias("total_found"),
        F.max("score").alias("best_score"),
    )
    # Materialize the k result rows and derive the response metrics from
    # them directly. The `.observe()` node stays in the plan (the metrics
    # land on the listener bus / SQL UI), but we deliberately do NOT
    # block on `Observation.get`: under a loaded listener bus that wait
    # can dwarf the sub-second search itself (seen: 0.6 s -> 11 s under
    # the round-6 driver bench). The collected rows ARE the observed
    # dataset, so the derived values are identical by construction.
    rows = observed.collect()
    elapsed_ms = (time.perf_counter() - t0) * 1000.0
    best = max((r["score"] for r in rows), default=None)
    return spark.createDataFrame(
        [
            (
                query_id,
                library if library is not None else -1,
                k,
                metric,
                len(rows),
                float(best) if best is not None else None,
                float(elapsed_ms),
            )
        ],
        "query_id int, library_id long, k int, similarity_function string,"
        " total_found long, best_score double, search_time_ms double",
    )


def index_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-level search-strategy advisor — the reference's
    choose_search_strategy decision rules (vector_db/similarity.py:
    397-436: <10K vectors -> batch; <50K AND score buffer <100 MB ->
    batch; else heap) evaluated declaratively per library over the
    corpus stats, instead of per call inside the engine. One grouped
    aggregation; the memory estimate is the reference's own
    n_vectors * 4 bytes score-buffer formula."""
    emb = load(spark, sf_dir, "embeddings")
    per = emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.max(F.size("embedding")).alias("dim"),
    )
    est_mb = F.col("n_vectors").cast("double") * F.lit(4.0) / F.lit(1024.0 * 1024.0)
    strategy = (
        F.when(F.col("n_vectors") < 10_000, F.lit("batch"))
        .when((F.col("n_vectors") < 50_000) & (est_mb < 100.0), F.lit("batch"))
        .otherwise(F.lit("heap"))
    )
    return per.select(
        F.col("label").alias("library_id"),
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.col("dim").cast("int").alias("dim"),
        F.round(est_mb, 6).alias("est_score_buffer_mb"),
        strategy.alias("strategy"),
    )


def index_advisor_sql() -> str:
    return """
WITH per AS (
  SELECT label AS library_id, count(*) AS n_vectors,
         max(len(embedding)) AS dim
  FROM embeddings GROUP BY label
)
SELECT library_id,
       CAST(n_vectors AS BIGINT) AS n_vectors,
       CAST(dim AS INTEGER) AS dim,
       round(CAST(n_vectors AS DOUBLE) * 4.0 / (1024.0 * 1024.0), 6)
         AS est_score_buffer_mb,
       CASE WHEN n_vectors < 10000 THEN 'batch'
            WHEN n_vectors < 50000
                 AND CAST(n_vectors AS DOUBLE) * 4.0 / (1024.0 * 1024.0) < 100.0
                 THEN 'batch'
            ELSE 'heap' END AS strategy
FROM per
"""
