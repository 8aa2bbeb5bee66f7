"""Whole-registry oracle parity at sf0.1 — 10x the driver's sf0.01 gate.

The per-round driver compare runs at sf0.01; tests/test_sentinels_sf01
pins ten flagship queries at sf0.1, and round 16 spot-checked its nine
new ops there. This script runs EVERY registered oracle pair at sf0.1
(the full scale-independence claim, not a sample) and writes one JSON
artifact (SCALE_PARITY.json, checkpointed after every row).

A WORKER process runs the queries sequentially (one Spark session
amortized across the registry) and streams results back; the parent
enforces a per-query wall timeout — on breach it kills the worker,
records 'timeout' for the in-flight query, and respawns from the next
one. A handful of oracles are intentionally quadratic re-proofs (the
all-pairs / simhash-curve verifies) whose DuckDB cost at sf0.1 is
hours; they record as 'timeout' rows, explicitly listed rather than
silently skipped (the no-silent-caps discipline). Pinned-corpus
oracles (tests/test_oracle_parity._PINNED_SF) run at their pinned
sf0.01; the rows-only query records 'no_oracle'.

Usage:
    python scripts/scale_parity_sweep.py [out.json] [timeout_sec]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.1"


def _worker(names: list, sf_map: dict, q) -> None:  # pragma: no cover
    """Run queries sequentially in ONE Spark session; stream results."""
    import __spark_entry__ as entry_mod
    from tests.oracle_harness import compare, duckdb_con
    from vector_db_service_spark.session import get_spark

    spark = get_spark("scale-parity", cpus=16)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    cons: dict = {}
    for name in names:
        sf = sf_map[name]
        t0 = time.time()
        try:
            if name not in oracles:
                n = queries[name](spark, sf).count()
                row = {"status": "no_oracle", "rows": n}
            else:
                if sf not in cons:
                    cons[sf] = duckdb_con(sf)
                problems = compare(
                    queries[name](spark, sf), cons[sf].sql(oracles[name]).df()
                )
                row = {
                    "status": "exact" if not problems else "MISMATCH",
                    "problems": problems[:4],
                }
        except Exception as ex:  # noqa: BLE001 - recorded, not raised
            row = {"status": "ERROR",
                   "problems": [f"{type(ex).__name__}: {ex}"]}
        row["sec"] = round(time.time() - t0, 1)
        q.put((name, row))


def _counts(results: dict) -> dict:
    c: dict[str, int] = {}
    for r in results.values():
        c[r["status"]] = c.get(r["status"], 0) + 1
    return c


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALE_PARITY.json"
    )
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0

    import __spark_entry__ as entry_mod
    from tests.test_oracle_parity import _PINNED_SF

    names = sorted(entry_mod.queries())
    # optional subset re-certification (e.g. after a contract change):
    # SCALE_PARITY_ONLY=name1,name2 runs just those rows
    only = os.environ.get("SCALE_PARITY_ONLY")
    if only:
        want = {n.strip() for n in only.split(",") if n.strip()}
        unknown = want - set(names)
        if unknown:
            raise SystemExit(f"unknown queries in SCALE_PARITY_ONLY: {sorted(unknown)}")
        names = [n for n in names if n in want]
    sf_map = {n: _PINNED_SF.get(n, SF) for n in names}
    results: dict[str, dict] = {}

    def _checkpoint() -> None:
        with open(out_path, "w") as f:
            json.dump({
                "sf_default": SF,
                "timeout_sec": timeout,
                "counts": _counts(results),
                "results": results,
            }, f, indent=1, sort_keys=True)

    idx = 0
    while idx < len(names):
        remaining = names[idx:]
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_worker, args=(remaining, sf_map, q))
        p.start()
        alive = True
        for name in remaining:
            try:
                got_name, row = q.get(timeout=timeout)
                assert got_name == name, (got_name, name)
                row["sf"] = sf_map[name]
                results[name] = row
                idx += 1
                print(f"[{idx}/{len(names)}] {name}: {row['status']} "
                      f"({row.get('sec', '?')}s)", flush=True)
                _checkpoint()
            except Exception:  # timeout or queue failure
                p.terminate()
                p.join()
                results[name] = {"status": "timeout",
                                 "timeout_sec": timeout,
                                 "sf": sf_map[name]}
                idx += 1
                print(f"[{idx}/{len(names)}] {name}: timeout", flush=True)
                _checkpoint()
                alive = False
                break
        if alive:
            p.join(30)
            if p.is_alive():
                p.terminate()
                p.join()
    print("counts:", _counts(results))


if __name__ == "__main__":
    main()
