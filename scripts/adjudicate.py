"""Focused re-measurement of bench-flagged queries under the EXACT
bench discipline (prewarm, cache snapshot/restore around re-runs,
durable-state symmetry), recording wall + host-wide busy/steal + the
process-tree cpu counter that foreign host work cannot touch.

Usage:
    python scripts/adjudicate.py QUERY[,QUERY...] [N_RUNS] [OUT.json]

Writes one JSON object {query: {"runs": [...], "host_busy": [...],
"steal": [...], "proc_busy": [...]}} — per-RUN series, unlike
bench.py's last-run-wins pairs, so a single contaminated window is
visible instead of defining the query's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from vector_db_service_spark.session import get_spark  # noqa: E402
from vector_db_service_spark import entrypoints  # noqa: E402
from vector_db_service_spark.benchutil import (  # noqa: E402
    cpu_snap,
    durable_km_center_dirs,
    index_state_caches,
    prewarm_index_state,
    proc_tree_cpu,
    release_checkpoints,
)


def main() -> None:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("vdbs-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")

    # the bench preamble, verbatim in spirit: JIT/footers, stored
    # indexes, in-process index state, streaming engine warm
    for _t in ("documents", "embeddings", "events", "orders", "lineitem",
               "customer", "supplier", "part", "nation", "region"):
        try:
            spark.read.parquet(os.path.join(sf_dir, f"{_t}.parquet")).count()
        except Exception:
            pass
    from vector_db_service_spark.operators import store as _store

    for _lib in (1, 2):
        _store.ensure_library(spark, sf_dir, _lib)
    prewarm_index_state(spark, sf_dir)
    if sf_dir.rstrip("/") != "/root/testdata/sf0.001":
        try:
            from vector_db_service_spark.streaming import pipeline as _sp

            _sp.windowed_event_counts(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    caches = index_state_caches()
    results: dict[str, dict] = {}
    import shutil

    for name in names:
        fn = entrypoints.QUERIES[name]
        rec = {"runs": [], "host_busy": [], "steal": [], "proc_busy": []}
        saved = [dict(c) for c in caches]
        durable_before = durable_km_center_dirs(sf_dir)
        created: set = set()
        for i in range(n_runs):
            for c, s in zip(caches, saved):
                c.clear()
                c.update(s)
            for p in created:
                shutil.rmtree(p, ignore_errors=True)
            release_checkpoints(spark)
            b0, s0 = cpu_snap()
            p0 = proc_tree_cpu()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t0, 4)
            b1, s1 = cpu_snap()
            rec["runs"].append(wall)
            rec["host_busy"].append(round(b1 - b0, 2))
            rec["steal"].append(round(s1 - s0, 2))
            rec["proc_busy"].append(round(proc_tree_cpu() - p0, 2))
            if i == 0:
                created = durable_km_center_dirs(sf_dir) - durable_before
            print(f"# {name} run{i}: {wall:.3f}s host_busy "
                  f"{rec['host_busy'][-1]} steal {rec['steal'][-1]} "
                  f"proc {rec['proc_busy'][-1]}", file=sys.stderr)
        results[name] = rec
    print(json.dumps(results, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
