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
    query's own measured `spread` (max-min over its re-runs) on
    whichever side measured one, plus an absolute floor of 0.3 s.
  - steal context: total steal seconds on each side are printed so a
    hot run is visible at a glance.

Exit code 0 always — this is a reading aid, not a gate.
"""

from __future__ import annotations

import json
import sys


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
        host = (sum(cal_n) / len(cal_n)) / (sum(cal_o) / len(cal_o))
    steal_o = round(sum(old.get("cpu_steal_sec", {}).values()), 1)
    steal_n = round(sum(new.get("cpu_steal_sec", {}).values()), 1)
    print(f"host factor (new/old calibration): {host:.3f}  "
          f"[old cal {cal_o} steal {steal_o}s | new cal {cal_n} steal {steal_n}s]")
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spread", {}), new.get("spread", {})
    total_o = sum(qo.values())
    total_n = sum(qn.values())
    print(f"raw totals: old {total_o:.1f}s -> new {total_n:.1f}s; "
          f"host-normalized new: {total_n / host:.1f}s")
    rows = []
    for name in sorted(set(qo) & set(qn)):
        adj = qn[name] / host
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
