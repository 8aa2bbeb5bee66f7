"""Shared measurement helpers for bench.py and scripts/scale_probe.py.

Both harnesses must apply the SAME isolation and attribution discipline
or their numbers stop being comparable — these helpers existed as
verbatim copies in each file until round 11, which is exactly how the
two would silently diverge on the next fix.
"""

from __future__ import annotations

import os


def release_checkpoints(spark) -> None:
    """Unpersist localCheckpoint blocks previous queries pinned.
    Queries must time INDEPENDENTLY: checkpointed iteration frames
    (dedup/CC) and fingerprint tables otherwise accumulate in the block
    manager across a sweep and the resulting storage-memory pressure
    taxes every later shuffle — measured 73 s vs 28 s on the allpairs
    syn10x warm run with vs without leftover blocks resident."""
    try:
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
    except Exception:
        # best-effort cleanup over py4j internals: swallows a missing/
        # stopped JVM context or a py4j API drift so a bench sweep never
        # aborts on cache RELEASE — worst case some blocks stay resident
        # and the next query's timing is taxed, which the per-query
        # busy/steal attribution fields make visible anyway
        pass


def index_state_caches() -> list[dict]:
    """Every module-level index-state / artifact memo, in one place.
    A harness that wants cache-HOMOGENEOUS timed runs snapshots these
    dicts before a query's first run and restores them around each
    re-run — so all N runs of a query execute under identical cache
    conditions (round-11 review: re-run medians that mix one cold run
    with warm-cache re-runs under-report cold cost ~5x and the spread
    becomes cache asymmetry, not host noise)."""
    from vector_db_service_spark.operators import ann, dedup, grid, knn, store
    from vector_db_service_spark.sources import tables

    return [
        dedup._LABELS_CACHE,
        ann._KM_CENTERS_CACHE,
        ann._COARSE_CACHE,
        knn._QVEC_CACHE,
        grid._BOUNDS_CACHE,
        store._FPRINT_CACHE,
        store._STORED_FPRINT_CACHE,
        tables._ROW_COUNT_CACHE,
        tables._DIM_CACHE,
    ]


def durable_km_center_dirs(sf_dir: str, root: str | None = None) -> set[str]:
    """Existing DURABLE kmeans-center dirs for this dataset. The in-memory
    memo snapshot/restore (index_state_caches) cannot undo a PERSISTED
    save_km_centers write: for any n_lists key prewarm didn't build, the
    first run would pay the distributed fit while re-runs paid only a
    bounded parquet read — the exact cold/warm asymmetry r11 flagged,
    masked only because every registered query uses n_lists=7 (r12
    advisor). bench.py snapshots this set before a query's first run and
    deletes any NEWLY-created dir before each re-run, so every run refits
    exactly like the first."""
    import glob

    from vector_db_service_spark.operators.store import index_root

    return set(
        glob.glob(os.path.join(index_root(sf_dir, root), "mllib_km_centers_*"))
    )


def prewarm_index_state(spark, sf_dir: str) -> None:
    """Build the shared index state (quantizer centers, grid bounds,
    query-vector literals) BEFORE any timed run, so fit cost is
    excluded from query timings as amortized index build — the same
    train-once/probe-many lifecycle the reference's indexes follow and
    the same precedent as bench.py's ensure_library() pre-build for the
    stored-index probes. Keys warmed here are exactly the ones the
    registry's ann/knn/grid queries request (n_lists=7 everywhere,
    query ids 0-4); a query that requests an unseen key still pays its
    own build on EVERY run (first and re-runs alike) thanks to the
    snapshot/restore discipline over index_state_caches()."""
    from vector_db_service_spark.operators import ann, grid, knn

    # driver-side Lloyd coarse quantizer (recall sweep, ivfpq, blocked
    # pairs, silhouette, cluster reps — all n_lists=7 in the registry)
    ann._coarse_centers(spark, sf_dir, 7)
    # distributed MLlib kmeans|| fit (mllib_ivf_kmeans_topk, n_lists=7)
    ann.mllib_km_centers(spark, sf_dir, 7)
    # per-dimension grid bounds: whole-corpus and the per-library scopes
    # the registered grid searches use (library=2) plus the stored-index
    # lifecycle's library 1
    for lib in (None, 1, 2):
        grid.bounds_cached(spark, sf_dir, lib)
    # query-vector literals for the search entry points (ids 0-4: the
    # recall sweep probes 0..4, every other registered search uses 0)
    knn.query_vector_rows(spark, sf_dir, [0, 1, 2, 3, 4])


def cpu_snap() -> tuple[float, float]:
    """(busy_sec, steal_sec) from the host-wide /proc/stat line.
    Busy = user+nice+system: actual on-CPU work, which a throttled
    hypervisor does NOT inflate (the VM simply isn't running).
    Steal: jiffies the hypervisor withheld — the throttle itself."""
    try:
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        hz = float(os.sysconf("SC_CLK_TCK"))
        return (v[0] + v[1] + v[2]) / hz, (v[7] if len(v) > 7 else 0) / hz
    except Exception:
        return 0.0, 0.0
