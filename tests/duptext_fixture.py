"""Deterministic DUPLICATE/DEGENERATE text corpus builder for parity
testing — the third adversarial corpus next to tests/utf8_fixture.py
(multi-byte text) and tests/ties_fixture.py (embedding ties).

The gate corpus's templated documents carry uniqueness suffixes: all
500 texts at sf0.001 are DISTINCT and none is empty. So the branches
that exist precisely for duplicated and degenerate text — exact-dedup
keep-first tie-breaks, paragraph dedup on shared paragraphs, MinHash
jaccard=1.0 pairs, winnowing on identical fingerprint sets, and every
empty/short-document guard (ANSI mode raises on a divide-by-zero that a
greatest(x, 1) forgot) — are never load-bearing in parity. This fixture
rewrites `documents.text` with deterministic per-doc transformations:

  doc_id % 8 == 1: text := the previous doc's (final) text — EXACT
          duplicate across doc_ids (keep-first tie-break decides)
  doc_id % 8 == 2: previous text + one extra word — near-dup with
          jaccard just under 1 (threshold verifies, S-curve tails)
  doc_id % 8 == 3: previous text's words deterministically rotated —
          same unigram multiset, different shingles/order
  doc_id % 8 == 4: first half of the previous text + own second half,
          joined as two paragraphs — shared-paragraph dedup
  doc_id % 8 == 5: the EMPTY string — zero tokens, zero chars: the
          degenerate-input guard sweep
  doc_id % 8 == 6: a single word — one-token documents
  doc_id % 8 in (0, 7): unchanged (the corpus keeps realistic spread)

`n_chars` is recomputed as the code-point count of the new text (the
same convention the UTF-8 fixture uses). All other tables and columns
are copied verbatim."""

from __future__ import annotations

import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _transform(rows: list[dict]) -> None:
    """Rewrite text in place. Rows must be sorted by doc_id; dup modes
    reference the PREVIOUS row's final text so pairs are adjacent."""
    prev: str | None = None
    for r in rows:
        did = int(r["doc_id"])
        mode = did % 8
        text = r["text"]
        if mode == 1 and prev is not None:
            text = prev
        elif mode == 2 and prev is not None:
            text = prev + " extra"
        elif mode == 3 and prev is not None:
            w = prev.split(" ")
            k = (did // 8) % max(len(w), 1)
            text = " ".join(w[k:] + w[:k])
        elif mode == 4 and prev is not None:
            w_prev = prev.split(" ")
            w_own = text.split(" ")
            text = (
                " ".join(w_prev[: len(w_prev) // 2])
                + "\n\n"
                + " ".join(w_own[len(w_own) // 2:])
            )
        elif mode == 5:
            text = ""
        elif mode == 6:
            text = text.split(" ")[0] if text else "solo"
        r["text"] = text
        r["n_chars"] = len(text)
        prev = text


def build_duptext_fixture(dst_dir: str,
                          src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the duplicate-text corpus under dst_dir.
    Deterministic: same src + same code -> identical rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t != "documents":
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        rows = sorted(tbl.to_pylist(), key=lambda r: int(r["doc_id"]))
        _transform(rows)
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
