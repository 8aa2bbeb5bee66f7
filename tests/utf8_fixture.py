"""Deterministic non-ASCII (UTF-8) corpus builder for parity testing.

Round-8 review: three byte-vs-char bugs and a NaN-vs-NULL bug were all
found by code review, not by tests, because every test corpus is pure
ASCII — so the next byte/char divergence would ship silently. This
module derives a UTF-8 corpus from the sf0.001 testdata by rewriting
`documents.text` with deterministic per-doc transformations covering
every multi-byte regime:

  mode 0: Latin accents (2-byte UTF-8) via vowel substitution
  mode 1: CJK tokens appended (3-byte UTF-8)
  mode 2: emoji + astral-plane letters (4-byte UTF-8, UTF-16
          surrogate pairs — the length()-semantics stress case)
  mode 3: NBSP (U+00A0) replacing some inter-word spaces — multi-byte
          NON-separator bytes inside a single token
  mode 4: real paragraph structure ('\\n\\n') plus U+2029 PARAGRAPH
          SEPARATOR and CJK paragraphs — exercises paragraph dedup
  mode 5: combining marks (e + U+0301), Greek and Cyrillic words

`n_chars` is recomputed as the CODE-POINT count of the new text (the
convention all three engines — Spark numChars, DuckDB length(), Python
len() — agree on). All other tables are copied verbatim, so every
registered query runs against the fixture unchanged.
"""

from __future__ import annotations

import os
import shutil

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

_ACCENTS = str.maketrans("aeiouAEIOU", "áéíöüÁÉÍÖÜ")
_CJK = ["数据", "去重", "向量", "检索", "日本語", "處理"]
_EMOJI = ["😀🚀", "🔍📦", "𝒜𝔅", "🧪"]
_GREEK_CYR = ["αλφα", "βητα", "привет", "мир", "γάμμα"]


def _transform(doc_id: int, text: str) -> str:
    words = text.split(" ")
    mode = doc_id % 6
    if mode == 0:
        words = [
            w.translate(_ACCENTS) if i % 3 == 0 else w
            for i, w in enumerate(words)
        ]
        return " ".join(words)
    if mode == 1:
        extra = [_CJK[(doc_id + i) % len(_CJK)] for i in range(4)]
        return " ".join(words + extra)
    if mode == 2:
        extra = [_EMOJI[(doc_id + i) % len(_EMOJI)] for i in range(3)]
        return " ".join(words + extra)
    if mode == 3:
        # join every 4th word pair with NBSP: one token, multi-byte
        # non-separator inside it
        out = []
        i = 0
        while i < len(words):
            if i % 4 == 0 and i + 1 < len(words):
                out.append(words[i] + " " + words[i + 1])
                i += 2
            else:
                out.append(words[i])
                i += 1
        return " ".join(out)
    if mode == 4:
        half = len(words) // 2
        para2 = " ".join(words[half:]) + " " + "。".join(_CJK[:2])
        return " ".join(words[:half]) + "\n\n" + para2 + " " + "終わり"
    # mode 5: combining marks + Greek/Cyrillic
    extra = [_GREEK_CYR[(doc_id + i) % len(_GREEK_CYR)] for i in range(3)]
    words = [w + "é" if i % 5 == 0 else w for i, w in enumerate(words)]
    return " ".join(words + extra)


# Round-10 (r9 review #7): the fixture previously rewrote only
# documents.text, so events/orders/lineitem/dimension string columns
# never saw multi-byte input — the sketch family hashes event_type,
# rel_events_json_stats parses props, and the pivots/rollups group on
# status strings, all byte-sensitive surfaces. Every non-documents
# string column now gets a MINORITY multi-byte rewrite (every 3rd row,
# deterministic per row id): filters on literal ASCII values
# ('click', '1-URGENT', ...) keep matching the untouched majority, so
# no query goes vacuous, while group-bys/hashes/JSON paths all see
# 2-4-byte code points. `props` is rewritten JSON-aware (a multi-byte
# key+value inserted before the closing brace) so json-path extraction
# stays live.
_TAGS = ["é", "数据", "😀", "привет", "ωμέγα", "日本語"]


def _tag(i: int) -> str:
    return _TAGS[i % len(_TAGS)]


def _transform_row_strings(t: str, idx: int, r: dict) -> None:
    if idx % 3 != 0:
        return
    k = idx // 3  # cycle through ALL tags (idx itself is ≡ 0 mod 3)
    for col, v in r.items():
        if not isinstance(v, str):
            continue
        if t == "events" and col == "props":
            # keep valid JSON: {"k": 87} -> {"k": 87, "täg😀": "数据"};
            # an EMPTY object gets the pair without the leading comma
            # (v[:-1].rstrip() would otherwise leave '{,' — invalid)
            if v.endswith("}"):
                body = v[:-1].rstrip()
                sep = "" if body.rstrip().endswith("{") else ", "
                r[col] = body + sep + f'"täg{_tag(k)}": "{_tag(k + 1)}"' + "}"
        else:
            r[col] = v + "·" + _tag(k)


def build_utf8_fixture(dst_dir: str,
                       src_dir: str = "/root/testdata/sf0.001") -> str:
    """Materialize the UTF-8 corpus under dst_dir (parquet per table).
    Deterministic: same src + same code -> byte-identical rows
    (parquet metadata aside). Returns dst_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t == "embeddings":
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        rows = tbl.to_pylist()
        if t == "documents":
            for r in rows:
                r["text"] = _transform(int(r["doc_id"]), r["text"])
                r["n_chars"] = len(r["text"])
                # minority rewrite of the NON-text string columns too
                # (source/lang/title feed group-bys and filters)
                if int(r["doc_id"]) % 3 == 0:
                    for col, v in r.items():
                        if col != "text" and isinstance(v, str):
                            r[col] = v + "·" + _tag(int(r["doc_id"]) // 3)
        else:
            for i, r in enumerate(rows):
                _transform_row_strings(t, i, r)
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, dst)
    return dst_dir
