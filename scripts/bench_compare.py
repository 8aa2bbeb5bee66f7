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

from vector_db_service_spark.benchutil import floor_transport  # noqa: E402


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
        host = statistics.median(cal_n) / statistics.median(cal_o)
    # NORMALIZATION (r14 verdict #2): the old scheme DIVIDED new walls
    # by this host factor — correct only for the busy-proportional wall
    # component, while most of this suite is dominated by a fixed
    # scheduling floor that does not scale with host CPU speed; a
    # factor < 1 (new host faster) inflated floor-dominated walls and
    # manufactured 69 flags out of a raw -10% sweep. floor_transport
    # instead moves each wall ADDITIVELY by the positional calibration
    # delta (wall - c_new + c_old); the host factor is printed for
    # context only. Genuinely-moved multi-second queries are then
    # adjudicated by their recorded cpu_proc_sec, which co-tenant work
    # cannot touch: a wall flag whose process-tree busy is flat on both
    # sides is host/JVM state, not a plan change, and is listed
    # separately below.
    adj_of = floor_transport(old, new)
    steal_o = round(sum(old.get("cpu_steal_sec", {}).values()), 1)
    steal_n = round(sum(new.get("cpu_steal_sec", {}).values()), 1)
    print(f"host factor (new/old calibration, context only): {host:.3f}  "
          f"[old cal {cal_o} steal {steal_o}s | new cal {cal_n} steal {steal_n}s]")
    qo, qn = old["queries"], new["queries"]
    bo = old.get("cpu_proc_sec") or {}
    bn = new.get("cpu_proc_sec") or {}
    # rows whose process-tree counter underflowed (child reparented out
    # of the tree mid-window; bench floors them to 0 and flags them)
    # carry NO busy evidence — drop them from the busy maps so the
    # flat-busy split cannot misread a floored 0 as "plan unchanged"
    # (r15 verdict #3)
    for uf in set(old.get("cpu_proc_underflow") or []) | set(
        new.get("cpu_proc_underflow") or []
    ):
        bo.pop(uf, None)
        bn.pop(uf, None)

    def _floors(detail: dict) -> dict[str, float]:
        out = dict(detail.get("spread", {}))
        for name, rs in (detail.get("runs") or {}).items():
            if len(rs) >= 3:  # >=2 re-runs: variance without the first run
                out[name] = round(max(rs[1:]) - min(rs[1:]), 4)
        return out

    so, sn = _floors(old), _floors(new)
    total_o = sum(qo.values())
    total_n = sum(qn.values())
    print(f"raw totals: old {total_o:.1f}s -> new {total_n:.1f}s")
    plan_rows, busy_flat_rows = [], []
    for name in sorted(set(qo) & set(qn)):
        adj = adj_of(name, qn[name])
        delta = adj - qo[name]
        floor = max(so.get(name, 0.0), sn.get(name, 0.0), 0.3)
        if abs(delta) <= floor:
            continue
        row = (delta, name, qo[name], qn[name], adj, floor,
               bo.get(name), bn.get(name))
        if name in bo and name in bn:
            db = bn[name] - bo[name]
            if abs(db) <= max(0.5, 0.25 * bo[name]):
                busy_flat_rows.append(row)
                continue
        plan_rows.append(row)

    def _show(rows):
        for delta, name, o, n, adj, floor, b_o, b_n in sorted(rows):
            busy = (f"  busy {b_o:.1f}->{b_n:.1f}"
                    if b_o is not None and b_n is not None else "")
            print(f"  {delta:+6.2f}s  {name:36s} {o:>7.2f} -> {n:>7.2f} "
                  f"[{adj:.2f}]  floor {floor:.2f}{busy}")

    if not plan_rows and not busy_flat_rows:
        print("no per-query delta exceeds its measured noise floor — "
              "nothing attributable to plans")
    if plan_rows:
        print(f"{len(plan_rows)} deltas exceed their noise floor WITH a "
              f"process-tree busy move (old -> new [transported], floor):")
        _show(plan_rows)
    if busy_flat_rows:
        print(f"{len(busy_flat_rows)} wall moves with FLAT process-tree busy "
              f"(host/JVM state, not plans — context only):")
        _show(busy_flat_rows)
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print("removed queries:", ", ".join(only_old))
    if only_new:
        print("added queries:", ", ".join(only_new))


if __name__ == "__main__":
    main()
