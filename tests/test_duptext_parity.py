"""Oracle parity over the DUPLICATE/DEGENERATE text corpus.

Every documents-scanning oracled query runs Spark-vs-DuckDB over the
dup-text fixture (exact duplicate texts across doc_ids, near-dups one
word apart, rotated word orders, shared paragraphs, EMPTY documents,
single-word documents). Any divergence in keep-first tie-breaks,
jaccard-1.0 handling, paragraph canonicalization, or an
empty-input guard present on one engine and missing on the other
(Spark 4 ANSI mode raises on unguarded division) surfaces as a
value-hash mismatch — none of these branches is load-bearing on the
all-distinct, never-empty gate corpora."""

from __future__ import annotations

import atexit
import os
import re
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.duptext_fixture import build_duptext_fixture  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402
from tests.test_oracle_parity import _PINNED_SF  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

DOC_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if re.search(r"\bdocuments\b", sql) and n not in _PINNED_SF
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def dt_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_duptext_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_duptext_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def dt_con(dt_dir):
    c = duckdb_con(dt_dir)
    yield c
    c.close()


def test_fixture_is_genuinely_degenerate(dt_dir):
    """The corpus must actually contain duplicate, empty, and one-word
    documents."""
    import pyarrow.parquet as pq

    texts = pq.read_table(
        os.path.join(dt_dir, "documents.parquet")
    ).column("text").to_pylist()
    n = len(texts)
    n_dup = n - len(set(texts))
    n_empty = sum(1 for t in texts if t == "")
    n_single = sum(1 for t in texts if t and " " not in t)
    assert n_dup > 30, f"too few duplicate texts: {n_dup}"
    assert n_empty > 30, f"too few empty documents: {n_empty}"
    assert n_single > 30, f"too few single-word documents: {n_single}"


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_duptext_parity(spark, dt_con, dt_dir, name):
    sdf = QUERIES[name](spark, dt_dir)
    odf = dt_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
