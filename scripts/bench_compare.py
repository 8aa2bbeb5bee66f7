"""Weather-aware comparison of two BENCH_DETAIL.json files.

Usage:
    python scripts/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json

Round-over-round bench totals on this infrastructure move 15-35% with
host weather alone (see bench.py's HOST CALIBRATION note), so a raw
total diff attributes nothing. This tool reads the attribution fields
the round-11 bench emits and prints only the deltas that survive them:

  - host factor: ratio of mean calibration-probe times (the pinned
    lineitem aggregate whose plan never changes). NEW wall times are
    divided by this factor before comparison.
  - per-query noise floor: a delta is reported only if it exceeds the
    query's own measured run-to-run variance on whichever side measured
    one, with an absolute floor of 0.3 s. The variance is computed from
    RE-RUNS ONLY (runs[1:]) when the detail file carries per-run lists:
    even with the round-12 cache-homogeneity discipline, a query's
    first run can carry one-time JVM JIT cost its re-runs don't, and a
    floor inflated by that asymmetry would blind the tool exactly where
    the perf targets live (round-11 review #2). Falls back to the
    `spread` field (max-min over all runs) for older detail files.
  - steal context: total steal seconds on each side are printed so a
    hot run is visible at a glance.

Exit code 0 always — this is a reading aid, not a gate.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vector_db_service_spark.benchutil import (  # noqa: E402
    cal_at,
    interp_series,
    sweep_positions,
)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    cal_o = old.get("calibration") or []
    cal_n = new.get("calibration") or []
    host = 1.0
    if cal_o and cal_n:
        # MEDIAN of each triple, not mean: round 13 added an untimed
        # warm-until-stable loop before the first timed calibration, so
        # pre-r13 triples carry a hot t0 (e.g. r12's [0.66, 0.31, 0.30])
        # that post-r13 triples don't — a mean-vs-mean ratio would read
        # that removed warmup artifact as a ~2x "faster host" and inflate
        # every normalized new wall by the same factor. The median is
        # robust to the single hot reading on either side (and is a TRUE
        # median — the upper-middle pick biased even-length lists from
        # crashed sweeps toward the slower reading, r13 advisor #3).
        host = statistics.median(cal_n) / statistics.median(cal_o)
    # POSITIONAL factors (r13 verdict #7): the calibration triple is a
    # time series over the sweep (start / after-single-shots / end), and
    # r13's triple rose 0.17->0.33 with its 22.8 s of steal concentrated
    # late — one whole-sweep factor over-corrects early queries and
    # under-corrects late ones, exactly where two of the three r13 flags
    # sat. Interpolate each side's triple at the query's own sweep
    # position (recorded since r14; reconstructed deterministically for
    # older files) and normalize per query.
    # t0 of pre-r14 triples is a single unbracketed start reading with
    # shifting semantics — interp_series replaces it with t1 before
    # interpolation (raw triples turned the r12->r13 compare into 104
    # flags, nearly all t0-extrapolation artifacts).
    pos_o = sweep_positions(old)
    pos_n = sweep_positions(new)
    ical_o = interp_series(old)
    ical_n = interp_series(new)

    def host_for(name: str) -> float:
        if (name in pos_o and name in pos_n
                and len(ical_o) >= 2 and len(ical_n) >= 2):
            return cal_at(ical_n, pos_n[name]) / cal_at(ical_o, pos_o[name])
        return host
    steal_o = round(sum(old.get("cpu_steal_sec", {}).values()), 1)
    steal_n = round(sum(new.get("cpu_steal_sec", {}).values()), 1)
    print(f"host factor (new/old calibration): {host:.3f}  "
          f"[old cal {cal_o} steal {steal_o}s | new cal {cal_n} steal {steal_n}s]")
    qo, qn = old["queries"], new["queries"]

    def _floors(detail: dict) -> dict[str, float]:
        out = dict(detail.get("spread", {}))
        for name, rs in (detail.get("runs") or {}).items():
            if len(rs) >= 3:  # >=2 re-runs: variance without the first run
                out[name] = round(max(rs[1:]) - min(rs[1:]), 4)
        return out

    so, sn = _floors(old), _floors(new)
    total_o = sum(qo.values())
    total_n = sum(qn.values())
    print(f"raw totals: old {total_o:.1f}s -> new {total_n:.1f}s; "
          f"host-normalized new: {total_n / host:.1f}s")
    rows = []
    for name in sorted(set(qo) & set(qn)):
        adj = qn[name] / host_for(name)
        delta = adj - qo[name]
        floor = max(so.get(name, 0.0), sn.get(name, 0.0), 0.3)
        if abs(delta) > floor:
            rows.append((delta, name, qo[name], qn[name], adj, floor))
    if not rows:
        print("no per-query delta exceeds its measured noise floor — "
              "nothing attributable to plans")
        return
    print(f"{len(rows)} deltas exceed their noise floor "
          f"(old -> new [normalized], floor):")
    for delta, name, o, n, adj, floor in sorted(rows):
        print(f"  {delta:+6.2f}s  {name:36s} {o:>7.2f} -> {n:>7.2f} "
              f"[{adj:.2f}]  floor {floor:.2f}")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print("removed queries:", ", ".join(only_old))
    if only_new:
        print("added queries:", ", ".join(only_new))


if __name__ == "__main__":
    main()
