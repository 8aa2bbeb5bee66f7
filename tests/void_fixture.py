"""VOID-column corpus builder — the seventh adversarial parity corpus.

The null fixture (tests/nulls_fixture.py) nulls ~1-in-7..19 rows per
optional column, so every op still has a healthy population. This
fixture models the other real-world degenerate: a source that NEVER
populated a column — events arrive with NO user ids, NO types, NO
values, NO props and NO timestamps (only event_id), and documents
carry text but NO lang/source. Every "population after the null
filter" becomes EMPTY: sketches estimate zero keys (the HLL
small-range branch at n_nonempty = 0, KMV n < K with no rows, CMS
with no counters), time windows receive zero stamped events, language
mixtures see no domains, and every rate whose denominator is a
count-of-non-null divides by zero — exactly where Spark 4's ANSI mode
raises if a guard is missing on one engine only.

Keys (event_id, doc_id) and text stay NOT NULL; all other tables copy
verbatim.
"""

from __future__ import annotations

import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

VOID_COLS = {
    "events": ("ts", "user_id", "event_type", "value", "props"),
    "documents": ("lang", "source"),
}


def build_void_fixture(dst_dir: str,
                       src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the void-column corpus under dst_dir. Deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t not in VOID_COLS:
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        arrays = []
        for field in tbl.schema:
            if field.name in VOID_COLS[t]:
                arrays.append(pa.nulls(len(tbl), type=field.type))
            else:
                arrays.append(tbl.column(field.name).combine_chunks())
        pq.write_table(pa.Table.from_arrays(arrays, schema=tbl.schema), dst)
    return dst_dir
