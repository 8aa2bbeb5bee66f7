"""Oracle parity over a TIE-HEAVY embedding corpus — the embedding-side
analog of the round-9 UTF-8 fixture gate.

Every embedding-scanning oracled query (selected automatically: its
oracle SQL scans `embeddings`) is run Spark-vs-DuckDB over the ties
fixture (exact duplicates, few-ulp perturbations that collide after 6dp
rounding, negated mirrors, zero vectors). Any divergence in tie-break
order, zero-score guards, sign conventions at exactly 0, or rounding
direction between the engines surfaces here as a value-hash mismatch
instead of shipping silently on the near-orthogonal gate corpora where
ties never decide a result."""

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
from tests.oracle_harness import compare, duckdb_con  # noqa: E402
from tests.test_oracle_parity import _PINNED_SF  # noqa: E402
from tests.ties_fixture import build_ties_fixture  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# every oracled query whose SQL scans the rewritten table — automatic,
# so future embedding operators are covered the day they register.
# Corpus-scoped pinned oracles (centers fit on sf0.01 literals) can
# only run on their pinned corpus and are excluded here; their pins are
# covered by tests/test_mllib_oracles.py.
TIE_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if re.search(r"\bembeddings\b", sql) and n not in _PINNED_SF
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def ties_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_ties_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_ties_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def ties_con(ties_dir):
    c = duckdb_con(ties_dir)
    yield c
    c.close()


def test_fixture_is_genuinely_tied(ties_dir, spark):
    """The corpus must actually contain the tie regimes: duplicate
    vectors, zero vectors, and 6dp-score collisions against query 0."""
    import pyarrow.parquet as pq

    rows = pq.read_table(
        os.path.join(ties_dir, "embeddings.parquet")
    ).to_pylist()
    by_vec: dict[tuple, int] = {}
    n_zero = 0
    for r in rows:
        key = tuple(r["embedding"])
        by_vec[key] = by_vec.get(key, 0) + 1
        if all(x == 0.0 for x in r["embedding"]):
            n_zero += 1
    n_dup_groups = sum(1 for c in by_vec.values() if c > 1)
    assert n_dup_groups > 20, "fixture lost its duplicate pairs"
    assert n_zero > 20, "fixture lost its zero vectors"

    # 6dp-rounded cosine against query 0 must collide beyond the exact
    # duplicates (the perturbation regime)
    import math

    q = rows[0]["embedding"]
    seen: dict[float, int] = {}
    for r in rows:
        v = r["embedding"]
        nv = math.sqrt(sum(x * x for x in v))
        nq = math.sqrt(sum(x * x for x in q))
        s = 0.0 if nv == 0 or nq == 0 else sum(
            a * b for a, b in zip(v, q)
        ) / (nv * nq)
        s = round(s, 6)
        seen[s] = seen.get(s, 0) + 1
    assert sum(c - 1 for c in seen.values() if c > 1) > 30


@pytest.mark.parametrize("name", TIE_QUERIES)
def test_ties_parity(spark, ties_con, ties_dir, name):
    sdf = QUERIES[name](spark, ties_dir)
    odf = ties_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
