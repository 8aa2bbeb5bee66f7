"""Deterministic NULL-injection corpus builder for parity testing —
the sixth adversarial corpus next to utf8 (multi-byte text), ties
(embedding ties), time-ties (temporal ties), dup-text (duplicate /
degenerate text), const-dim (zero-range normalization), and bad-JSON
(malformed props).

The gate corpora are fully populated: no column is ever NULL, so none
of the null-handling contracts is load-bearing in parity — yet at
100 TB every optional metadata column HAS nulls, and Spark and DuckDB
disagree by default in exactly these places (ASC sort: Spark puts
NULLS FIRST, DuckDB NULLS LAST; DuckDB's `concat` skips NULLs where
Spark propagates; `NOT IN` vs anti-join under a nullable subquery).
This fixture nulls ~1-in-7..19 rows per OPTIONAL column, decorrelated
by per-column prime moduli on the table's primary key. Primary /
foreign keys and the embedding payload stay NOT NULL (the store
validates vectors at insert — reference
services/vector_service.py:78-118 rejects malformed vectors — so a
stored corpus cannot contain a NULL embedding; `label` is optional
metadata and IS nulled).

All row orders and untouched columns are copied verbatim.
"""

from __future__ import annotations

import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# table -> (key expression, {column: (modulus, residue)})
# Distinct primes decorrelate the null masks; residues keep row 0 of
# each table fully populated so every query still has non-degenerate
# input.
NULL_PLAN: dict[str, dict[str, tuple[int, int]]] = {
    "documents": {
        "lang": (7, 1),
        "source": (11, 2),
        "text": (13, 3),
        "n_chars": (13, 3),  # rides with text: no phantom length for a NULL doc
    },
    "events": {
        "value": (7, 1),
        "props": (11, 2),
        "event_type": (13, 3),
        "user_id": (17, 4),
        "ts": (19, 5),
    },
    "customer": {
        "c_acctbal": (7, 1),
        "c_mktsegment": (11, 2),
        "c_name": (13, 3),
    },
    "orders": {
        "o_totalprice": (7, 1),
        "o_orderdate": (11, 2),
        "o_orderpriority": (13, 3),
        "o_orderstatus": (17, 4),
    },
    "lineitem": {
        "l_discount": (7, 1),
        "l_tax": (11, 2),
        "l_returnflag": (13, 3),
        "l_shipdate": (17, 4),
        "l_quantity": (19, 5),
    },
    "part": {
        "p_brand": (7, 1),
        "p_type": (11, 2),
        "p_size": (13, 3),
        "p_retailprice": (17, 4),
    },
    "supplier": {
        "s_acctbal": (7, 1),
        "s_name": (11, 2),
    },
    "embeddings": {
        "label": (7, 1),
    },
}

_KEYS = {
    "documents": lambda r: int(r["doc_id"]),
    "events": lambda r: int(r["event_id"]),
    "customer": lambda r: int(r["c_custkey"]),
    "orders": lambda r: int(r["o_orderkey"]),
    "lineitem": lambda r: int(r["l_orderkey"]) * 16 + int(r["l_linenumber"]),
    "part": lambda r: int(r["p_partkey"]),
    "supplier": lambda r: int(r["s_suppkey"]),
    "embeddings": lambda r: int(r["vec_id"]),
}

# Every column the fixture nulls — test_nulls_parity selects the
# oracled queries whose SQL mentions any of these.
NULLED_COLUMNS = tuple(
    sorted({c for cols in NULL_PLAN.values() for c in cols})
)


def _transform(table: str, rows: list[dict]) -> None:
    plan = NULL_PLAN[table]
    key = _KEYS[table]
    for r in rows:
        k = key(r)
        for col, (mod, res) in plan.items():
            if k % mod == res:
                r[col] = None


def build_nulls_fixture(dst_dir: str,
                        src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the null-injected corpus under dst_dir.
    Deterministic: same src + same code -> identical rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t not in NULL_PLAN:
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        rows = tbl.to_pylist()
        _transform(t, rows)
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
