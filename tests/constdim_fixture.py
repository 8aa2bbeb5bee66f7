"""Deterministic CONSTANT-DIMENSION embedding corpus builder.

Real embedding tables develop degenerate dimensions (a dead neuron, a
padded slot, an always-one bias feature), and several operators carry
explicit zero-range guards for them — grid normalization and scalar
quantization both replace a zero (max - min) range with 1
(reference algorithms.py:510-521) — but the gate corpora are random
floats where no dimension is ever constant, so the guards (engine AND
oracle) have never been parity-exercised against each other. This
fixture derives a corpus from sf0.001 with two degenerate dimensions:

  dim index 7  := exactly 0.25 for EVERY vector (constant nonzero —
                  zero range at a nonzero offset)
  dim index 13 := exactly 0.0 for EVERY vector (constant zero — zero
                  range AND zero contribution to every dot product)

Everything else — all other dims, labels, every other table — is
copied verbatim, so bounds, fits, and rankings stay non-degenerate in
the remaining dimensions."""

from __future__ import annotations

import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

CONST_DIMS = {7: 0.25, 13: 0.0}


def build_constdim_fixture(dst_dir: str,
                           src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the constant-dimension corpus under dst_dir.
    Deterministic: same src + same code -> identical rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t != "embeddings":
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        rows = tbl.to_pylist()
        for r in rows:
            v = [float(x) for x in r["embedding"]]
            for i, c in CONST_DIMS.items():
                if i < len(v):
                    v[i] = c
            r["embedding"] = v
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
