"""Scratch phase profiler for the refit/maintenance lifecycle heavies
(r16 optimization round): wraps Spark actions with wall timers to see
where stream_ivf_refit_served's ~11 s actually goes. Throwaway
measurement tooling, not part of the library."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from vector_db_service_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("vdbs-phase")
spark.sparkContext.setLogLevel("ERROR")

# warm
for _t in ("documents", "embeddings", "events", "lineitem"):
    spark.read.parquet(os.path.join(sf_dir, f"{_t}.parquet")).count()
from vector_db_service_spark.benchutil import prewarm_index_state

prewarm_index_state(spark, sf_dir)
from vector_db_service_spark.streaming import pipeline as sp

sp.windowed_event_counts(spark, "/root/testdata/sf0.001").count()

_t0 = [time.perf_counter()]
_marks: list[tuple[str, float]] = []


def mark(label: str) -> None:
    now = time.perf_counter()
    _marks.append((label, now - _t0[0]))
    _t0[0] = now


# --- instrumented ivf_refit_lifecycle_recall ---------------------------
import shutil
import numpy as np
from pyspark.sql import functions as F

from vector_db_service_spark.sources.tables import load
from vector_db_service_spark.operators.ann import (
    _lloyd_canonical, _coarse_centers, _list_id_matrix_expr, _routed_recall,
)
from vector_db_service_spark.operators.store import _dynamic_overwrite

from vector_db_service_spark.benchutil import release_checkpoints

for trial in range(3):
    release_checkpoints(spark)
    _marks.clear()
    _t0[0] = time.perf_counter()
    n_lists, k, nprobe, lloyd_iters, train_cap = 7, 10, 4, 8, 100_000
    base = load(spark, sf_dir, "embeddings")
    paths = sp.ivf_maintenance_init(
        spark, sf_dir, n_lists=n_lists, mutations=sp._ivf_refit_mutations(base)
    )
    mark("init (bootstrap store + stats + mutlog)")
    sp.ivf_maintenance_run(spark, sf_dir, paths)
    mark("maintenance stream (2 micro-batches)")
    post = spark.read.parquet(paths["idx"]).localCheckpoint(eager=True)
    mark("post ckpt")
    base_stats = spark.read.parquet(paths["base_stats"])
    due = (
        sp._ivf_list_stats(post)
        .join(
            base_stats.select(
                "list_id",
                F.col("n").alias("n_base"),
                F.col("sum_qerr_us").alias("sum_qerr_base_us"),
            ),
            "list_id",
        )
        .filter(
            (F.col("n") * sp._IVF_COUNT_DEN > F.col("n_base") * sp._IVF_COUNT_NUM)
            | (
                F.col("sum_qerr_us") * F.col("n_base") * sp._IVF_QERR_DEN
                > F.col("sum_qerr_base_us") * F.col("n") * sp._IVF_QERR_NUM
            )
        )
        .count()
    )
    mark("due count")
    rows = (
        post.select(
            "embedding", F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id"
        )
        .orderBy("h", "vec_id")
        .limit(train_cap)
        .select("embedding")
        .collect()
    )
    mark("train sample collect")
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    k_eff = min(n_lists, len(X))
    centers = [[float(x) for x in c] for c in _lloyd_canonical(X, k_eff, lloyd_iters)]
    mark("driver Lloyd")
    refit_idx = sp._ivf_assign(
        post.select("vec_id", "label", "embedding"), centers
    ).localCheckpoint(eager=True)
    mark("refit assign ckpt")
    refit_idx.write.mode("overwrite").partitionBy("list_id").parquet(paths["idx"])
    mark("full list rebuild write")
    out = (
        sp._ivf_list_stats(post)
        .withColumn("stage", F.lit("pre_refit"))
        .unionByName(
            sp._ivf_list_stats(refit_idx).withColumn("stage", F.lit("post_refit"))
        )
        .select("stage", "list_id", F.col("n").alias("n_vectors"), "sum_qerr_us")
        .localCheckpoint(eager=True)
    )
    mark("stats union ckpt (stream_ivf_refit output)")
    # --- serving half (lifecycle_recall) ---
    store = (
        spark.read.parquet(paths["idx"])
        .select(
            "vec_id", "label", "embedding",
            F.col("list_id").cast("int").alias("list_post"),
        )
        .localCheckpoint(eager=True)
    )
    mark("store read-back ckpt")
    cents_post = centers
    shutil.rmtree(paths["root"], ignore_errors=True)
    cents_pre = _coarse_centers(spark, sf_dir, n_lists)
    cmat = spark.createDataFrame(
        [([list(map(float, c)) for c in cents_pre],)],
        "cmat_pre array<array<double>>",
    )
    assigned = store.crossJoin(F.broadcast(cmat)).select(
        "vec_id", "label", "embedding",
        _list_id_matrix_expr(cmat_sql="cmat_pre").alias("list_pre"),
        "list_post",
    )
    query_ids = list(range(10))
    qrows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in store.filter(F.col("vec_id").isin(query_ids)).collect()
    }
    mark("qrows collect")
    queries = spark.createDataFrame(
        [(int(qid), qrows[qid]) for qid in query_ids],
        "query_id bigint, qv array<double>",
    )
    from vector_db_service_spark.functions import similarity as sim

    scored = (
        assigned.join(F.broadcast(queries))
        .select(
            "query_id", "vec_id", "list_pre", "list_post",
            F.round(sim.score("cosine", F.col("embedding"), F.col("qv")), 6).alias(
                "score"
            ),
        )
        .localCheckpoint(eager=False)
    )
    res = _routed_recall(
        spark, scored, queries, qrows, query_ids, k, nprobe,
        [("pre_refit", cents_pre, "list_pre"), ("post_refit", cents_post, "list_post")],
    )
    mark("routed_recall build")
    res.write.mode("overwrite").format("noop").save()
    mark("final noop write")
    print(f"--- trial {trial} ---")
    tot = sum(dt for _, dt in _marks)
    for lbl, dt in _marks:
        print(f"  {dt:6.2f}s  {lbl}")
    print(f"  {tot:6.2f}s  TOTAL")

spark.stop()
