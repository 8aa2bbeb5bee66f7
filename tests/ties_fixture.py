"""Deterministic TIE-HEAVY embedding corpus builder for parity testing.

The text side has the UTF-8 fixture (tests/utf8_fixture.py); this is
the embedding-side analog. The synthetic gate corpora are near-
orthogonal random vectors, so exact score ties essentially never occur
— which means every (score DESC, vec_id) tie-break contract in the kNN
/ ANN / dedup families is verified only against corpora where the
tie-break is almost never LOAD-BEARING. At 100 TB ties are routine
(duplicated content, quantized embeddings, 6dp-rounded scores), and a
tie-break divergence between the engine and its oracle would ship
silently. This fixture derives a corpus from sf0.001 by rewriting
`embeddings.embedding` with deterministic per-row transformations that
force every tie regime:

  mode 1: EXACT duplicate of the previous row's vector — identical
          scores at every metric; only the vec_id tie-break orders them
  mode 2: previous row's vector with ONE coordinate perturbed by ~2e-7
          (a few float32 ulps) — distinct floats whose 6dp-rounded
          scores frequently collide: the rounding-tie regime
  mode 4: NEGATION of the previous row's vector — cosine -1 mirror
          pairs and sign-flip LSH signatures
  mode 5: the ZERO vector — the cosine zero-guard branch, grid cell 0
          offsets, and maximal tie groups (every zero vector scores
          identically against every query)
  modes 0, 3: unchanged (the corpus keeps enough spread that bounds,
          fits, and stats stay non-degenerate)

All other tables are copied verbatim, so every registered query runs
against the fixture unchanged."""

from __future__ import annotations

import os
import shutil

import numpy as np

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _transform(rows: list[dict]) -> None:
    """Rewrite embeddings in place. Rows must be sorted by vec_id; each
    tie mode references the PREVIOUS row's (already final) vector so
    duplicate/perturbed/negated pairs are adjacent by id."""
    prev: list[float] | None = None
    for r in rows:
        vid = int(r["vec_id"])
        mode = vid % 6
        v = [float(np.float32(x)) for x in r["embedding"]]
        if mode == 1 and prev is not None:
            v = list(prev)
        elif mode == 2 and prev is not None:
            v = list(prev)
            j = vid % len(v)
            v[j] = float(np.float32(np.float32(v[j]) + np.float32(2e-7)))
        elif mode == 4 and prev is not None:
            v = [float(np.float32(-x)) for x in prev]
        elif mode == 5:
            v = [0.0] * len(v)
        r["embedding"] = v
        prev = v


def build_ties_fixture(dst_dir: str,
                       src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the tie corpus under dst_dir (parquet per table).
    Deterministic: same src + same code -> identical rows. Returns
    dst_dir."""
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
        rows = sorted(tbl.to_pylist(), key=lambda r: int(r["vec_id"]))
        _transform(rows)
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
