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
        pass


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
