"""Deterministic TIME-TIE corpus builder for parity testing — the
events-side analog of tests/ties_fixture.py (embeddings) and
tests/utf8_fixture.py (text).

The generated events table has microsecond-unique, well-spread
timestamps, so every temporal boundary contract — as-of join ties
(click and purchase at the SAME instant), sessionization gaps of
EXACTLY the threshold, events exactly ON a tumbling/sliding window
edge, the watermark's ms-floor algebra, value-ordered window
tie-breaks — is verified only where it is never load-bearing. At
100 TB those collisions are routine (second-granularity client clocks,
batched ingestion stamping, repeated prices). This fixture rewrites
`events.ts`/`events.value` with deterministic per-user transformations
that force each regime:

  per user (rows ordered by (ts, event_id), position j):
  j%6==1: ts := the previous row's (final) ts — exact duplicate
          timestamps within a user, across event types (as-of ties)
  j%6==2: ts := previous ts + exactly 30 minutes — the sessionize gap
          boundary (> vs >= decides the session split)
  j%6==3: ts := floored to the exact hour — window-edge events and
          cross-user duplicate boundary instants
  j%6==4: ts := microsecond set to 999999 — the ms-floor edge the
          watermark algebra truncates
  j%6==5: ts := floored to the 10-minute boundary (.000000) AND
          value := the previous row's value — window edges plus
          value-order ties in ranking windows
  j%6==0: unchanged (the corpus keeps realistic spread)

event_id, user_id, event_type, and props are NEVER touched: the
streaming content splits (even/odd event_id feeds) and JSON surfaces
stay exactly as the gate corpus defines them. All other tables are
copied verbatim."""

from __future__ import annotations

import datetime
import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _transform(rows: list[dict]) -> None:
    """Rewrite ts/value in place with per-user deterministic tie modes."""
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for urows in by_user.values():
        urows.sort(key=lambda r: (r["ts"], r["event_id"]))
        prev_ts: datetime.datetime | None = None
        prev_val: float | None = None
        for j, r in enumerate(urows):
            mode = j % 6
            ts = r["ts"]
            if mode == 1 and prev_ts is not None:
                ts = prev_ts
            elif mode == 2 and prev_ts is not None:
                ts = prev_ts + datetime.timedelta(minutes=30)
            elif mode == 3:
                ts = ts.replace(minute=0, second=0, microsecond=0)
            elif mode == 4:
                ts = ts.replace(microsecond=999999)
            elif mode == 5:
                ts = ts.replace(
                    minute=(ts.minute // 10) * 10, second=0, microsecond=0
                )
                if prev_val is not None:
                    r["value"] = prev_val
            r["ts"] = ts
            prev_ts, prev_val = ts, r["value"]


def build_time_ties_fixture(dst_dir: str,
                            src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the time-tie corpus under dst_dir. Deterministic:
    same src + same code -> identical rows. Returns dst_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t != "events":
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        rows = sorted(
            tbl.to_pylist(), key=lambda r: (int(r["event_id"]))
        )
        _transform(rows)
        rows.sort(key=lambda r: int(r["event_id"]))
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
